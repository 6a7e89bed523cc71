#!/usr/bin/env python
"""Benchmark: reads/sec/chip for barcode classification (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": "classify_reads_per_sec_per_chip", "value": N,
   "unit": "reads/s/chip", "vs_baseline": N}

- "value": end-to-end streaming classify throughput (fast5 reading + fused
  trim/normalise/window/CNN/call on device) on the default JAX platform
  (the real TPU chip under the driver), flagship full-size DemuxNet.
- "vs_baseline": value ÷ the reference-equivalent CPU pipeline's reads/s.
  The reference itself is unrunnable here (empty mount, no network —
  SURVEY.md §0), so the baseline is the same architecture + pipeline on
  torch-CPU (the reference's compute stack is Keras→TF-CPU), measured on
  this host and cached in BENCH_BASELINE.json.  Target: ≥20×.

Usage: python bench.py [--reads N] [--batch-size B] [--measure-baseline]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

BENCH_DIR = "/tmp/deepbinner_tpu_bench"
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")
MODEL_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "deepbinner_tpu", "models", "data", "EXP-NBD103_read_starts.dbt",
)


def ensure_dataset(n_reads: int, seed: int = 1234, genome_length: int = 3000) -> str:
    from deepbinner_tpu.utils.simulate import make_dataset

    tag = f"ds_n{n_reads}_s{seed}_g{genome_length}"
    path = os.path.join(BENCH_DIR, tag)
    marker = os.path.join(path, "truth.tsv")
    if not os.path.exists(marker):
        per_barcode = max(1, n_reads // 13)
        make_dataset(
            path, kit="EXP-NBD103",
            reads_per_barcode=per_barcode,
            none_reads=n_reads - 12 * per_barcode,
            genome_length=genome_length, seed=seed, write_fastq=False,
        )
    return os.path.join(path, "fast5s")


def load_flagship():
    import jax

    from deepbinner_tpu.models.checkpoint import load_model
    from deepbinner_tpu.models.network import NetworkConfig, init_params

    if os.path.exists(MODEL_FILE):
        model, variables, net_cfg, _meta = load_model(MODEL_FILE)
        return model, variables, net_cfg
    net_cfg = NetworkConfig()
    model, variables = init_params(jax.random.PRNGKey(0), net_cfg)
    return model, variables, net_cfg


def measure_tpu(fast5_dir: str, batch_size: int, num_readers: int,
                use_pallas: bool = False, native_reader: bool = False,
                reader_processes: int = 0) -> dict:
    import jax

    from deepbinner_tpu.ops.calling import CallingConfig
    from deepbinner_tpu.ops.preprocess import PreprocessConfig
    from deepbinner_tpu.runner.executor import ExecutorStats, classify_files
    from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram
    from deepbinner_tpu.utils.fast5 import find_all_fast5s

    model, variables, net_cfg = load_flagship()
    cfg = ClassifyConfig(
        preprocess=PreprocessConfig(),  # flagship geometry: 6144/1024/512
        calling=CallingConfig(),
        dual_model=False,
        use_pallas=use_pallas,
    )
    program = ClassifyProgram(model, cfg, variables)
    files = find_all_fast5s(os.path.dirname(fast5_dir))

    read_fn = None
    if native_reader:
        from deepbinner_tpu.native import fast5_reader

        if not fast5_reader.available():
            # g++ + libhdf5 are in the image; build on first use.  The native
            # reader reads off the GIL — h5py's GIL churn against the device
            # dispatch threads collapses throughput ~30x (measured).
            try:
                from deepbinner_tpu.native.build import build

                build(verbose=False)
                fast5_reader._load_failed = False
            except Exception as error:  # noqa: BLE001 — bench must not die
                print(f"[bench] native reader build failed ({error}); "
                      f"using h5py", file=sys.stderr)
        if fast5_reader.available():
            read_fn = fast5_reader.read_file

    t0 = time.monotonic()
    program.warm_up(batch_size)
    compile_s = time.monotonic() - t0

    # Warm the file cache + one timed measurement pass.
    stats = ExecutorStats()
    t0 = time.monotonic()
    n = 0
    if reader_processes > 0:
        from deepbinner_tpu.runner.executor import classify_stream
        from deepbinner_tpu.runner.mp_reader import iter_signals_mp

        results = classify_stream(
            program,
            iter_signals_mp(files, num_workers=reader_processes, stats=stats),
            batch_size=batch_size, stats=stats,
        )
    else:
        kwargs = {"read_fn": read_fn} if read_fn else {}
        results = classify_files(
            program, files, batch_size=batch_size, num_readers=num_readers,
            stats=stats, **kwargs,
        )
    for _result in results:
        n += 1
    elapsed = time.monotonic() - t0
    return {
        "reads": n,
        "reads_per_s": n / elapsed,
        "elapsed_s": elapsed,
        "compile_s": compile_s,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }


def measure_latency(batch_size: int = 16, trials: int = 20) -> dict:
    """Realtime-mode latency: signal-ready → calls-on-host for a small batch.

    This is the number the MinKNOW latency budget constrains (BASELINE.json
    config 5): how long after a batch of fresh reads appears until their
    calls are available to move files.
    """
    import numpy as np

    from deepbinner_tpu.ops.calling import CallingConfig
    from deepbinner_tpu.ops.preprocess import PreprocessConfig
    from deepbinner_tpu.runner.executor import build_batch
    from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram

    model, variables, _net = load_flagship()
    cfg = ClassifyConfig(PreprocessConfig(), CallingConfig(), False)
    program = ClassifyProgram(model, cfg, variables)
    program.warm_up(batch_size)

    rng = np.random.default_rng(0)
    reads = [
        (f"r{i}", rng.integers(300, 600, 20000).astype(np.int16))
        for i in range(batch_size)
    ]
    latencies = []
    for _ in range(trials):
        t0 = time.monotonic()
        _ids, sig, lens, _e, _el = build_batch(
            reads, cfg.preprocess, batch_size, False
        )
        out = program(sig, lens)
        np.asarray(out.calls)  # host-visible
        latencies.append(time.monotonic() - t0)
    latencies.sort()
    return {
        "p50_ms": round(latencies[len(latencies) // 2] * 1e3, 1),
        "p90_ms": round(latencies[int(len(latencies) * 0.9)] * 1e3, 1),
        "batch_size": batch_size,
    }


def measure_baseline(n_reads: int = 64) -> dict:
    """Reference-equivalent torch-CPU pipeline reads/s on this host."""
    from deepbinner_tpu.ops.calling import CallingConfig
    from deepbinner_tpu.ops.preprocess import PreprocessConfig
    from deepbinner_tpu.utils.fast5 import find_all_fast5s, iterate_reads_in_fast5
    from deepbinner_tpu.utils.torch_baseline import torch_classify_fn

    fast5_dir = ensure_dataset(n_reads)
    model, variables, net_cfg = load_flagship()
    import jax

    variables = jax.device_get(variables)
    classify = torch_classify_fn(
        net_cfg, variables, PreprocessConfig(), CallingConfig()
    )
    files = find_all_fast5s(os.path.dirname(fast5_dir))
    reads = []
    for path in files:
        reads.extend(iterate_reads_in_fast5(path))
    classify(reads[:4])  # warm-up
    t0 = time.monotonic()
    results = classify(reads)
    elapsed = time.monotonic() - t0
    return {
        "reads": len(results),
        "reads_per_s": len(results) / elapsed,
        "elapsed_s": elapsed,
        "kind": "torch-cpu reference-equivalent (proxy; see SURVEY.md §0)",
    }


def get_baseline(args) -> dict:
    if args.measure_baseline or not os.path.exists(BASELINE_FILE):
        baseline = measure_baseline()
        with open(BASELINE_FILE, "w") as handle:
            json.dump(baseline, handle, indent=2)
        return baseline
    with open(BASELINE_FILE) as handle:
        return json.load(handle)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--reads", type=int, default=768)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--num-readers", type=int, default=8)
    parser.add_argument("--measure-baseline", action="store_true")
    parser.add_argument("--pallas", action="store_true",
                        help="run the CNN through the fused Pallas kernels")
    parser.add_argument("--no-native-reader", action="store_true",
                        help="force the h5py reader (native is the default; "
                             "it is built on first use)")
    parser.add_argument("--reader-processes", type=int, default=0,
                        help="reader worker processes (0 = in-process)")
    parser.add_argument("--latency", action="store_true",
                        help="measure realtime per-batch latency instead of "
                             "throughput")
    args = parser.parse_args()

    if args.latency:
        result = measure_latency()
        print(json.dumps({
            "metric": "realtime_batch_latency_p50",
            "value": result["p50_ms"],
            "unit": "ms",
            "vs_baseline": None,
        }))
        print(f"[bench] latency {result}", file=sys.stderr)
        return

    baseline = get_baseline(args)
    fast5_dir = ensure_dataset(args.reads)
    result = measure_tpu(fast5_dir, args.batch_size, args.num_readers,
                         use_pallas=args.pallas,
                         native_reader=not args.no_native_reader,
                         reader_processes=args.reader_processes)

    value = result["reads_per_s"]
    vs = value / baseline["reads_per_s"] if baseline.get("reads_per_s") else None
    print(json.dumps({
        "metric": "classify_reads_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "reads/s/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }))
    # Details to stderr for humans; the JSON line above is the contract.
    print(
        f"[bench] {result['reads']} reads in {result['elapsed_s']:.2f}s on "
        f"{result['device']} (compile {result['compile_s']:.1f}s); baseline "
        f"{baseline['reads_per_s']:.2f} reads/s ({baseline.get('kind', 'cached')})",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
