#!/usr/bin/env python
"""Benchmark: reads/sec/chip for barcode classification (BASELINE.json metric).

Prints ONE JSON line to stdout:
  {"metric": "classify_reads_per_sec_per_chip", "value": N,
   "unit": "reads/s/chip", "vs_baseline": N}

- "value": steady-state end-to-end streaming classify throughput (fast5
  decode in reader worker processes + fused trim/normalise/window/CNN/call
  on device) on the default JAX platform (the real TPU chip under the
  driver), flagship full-size DemuxNet.  Methodology: persistent reader
  pool, one untimed warm pass (page cache + dispatch path), then
  ``--passes`` timed passes over ``--reads`` (default 4096) reads; the
  reported value is the MEDIAN of the passes (default 3 — matching the
  baseline denominator's treatment), per-pass numbers stay in the JSON
  line so run-to-run variance is attributable.
- "vs_baseline": value ÷ the reference-equivalent CPU pipeline's reads/s.
  The reference itself is unrunnable here (empty mount, no network —
  SURVEY.md §0), so the baseline is the same architecture + pipeline on
  torch-CPU (the reference's compute stack is Keras→TF-CPU), measured on
  this host and cached in BENCH_BASELINE.json.  Target: ≥20×.

Secondary metrics (BASELINE.json configs 2 and 5) are printed as JSON lines
to *stderr* in the default run: dual-model (start+end) throughput and
realtime small-batch latency.  ``--no-extras`` skips them.

Usage: python bench.py [--reads N] [--batch-size B] [--passes P]
                       [--pallas] [--measure-baseline] [--no-extras]
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
MODEL_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "deepbinner_tpu", "models", "data",
)
MODEL_FILE = os.path.join(MODEL_DIR, "EXP-NBD103_read_starts.dbt")
END_MODEL_FILE = os.path.join(MODEL_DIR, "EXP-NBD103_read_ends.dbt")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepbinner_tpu_jax_cache")


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


def ensure_dataset_pod5(n_reads: int, reads_per_file: int = 256) -> str:
    """Convert the bench fast5 dataset to pod5 containers (cached).

    Real pod5 runs pack hundreds of reads per file; 256/file here.  The
    same reads/truth as the fast5 dataset, so rates are comparable and
    calls checkable.  Returns the pod5 directory.
    """
    from deepbinner_tpu.utils.fast5 import find_all_fast5s, iterate_reads_in_fast5
    from deepbinner_tpu.utils.pod5 import write_pod5

    fast5_dir = ensure_dataset(n_reads)
    out_dir = fast5_dir.rstrip("/") + "_pod5"
    marker = os.path.join(out_dir, ".complete")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    reads = []
    for path in find_all_fast5s(os.path.dirname(fast5_dir)):
        reads.extend(iterate_reads_in_fast5(path))
    reads.sort(key=lambda item: item[0])  # deterministic packing
    for k in range(0, len(reads), reads_per_file):
        write_pod5(os.path.join(out_dir, f"batch_{k // reads_per_file:04d}.pod5"),
                   reads[k : k + reads_per_file])
    with open(marker, "w") as handle:
        handle.write(f"{len(reads)}\n")
    return out_dir


def ensure_dataset_multiread(n_reads: int, reads_per_file: int = 256) -> str:
    """Repack the bench dataset as multi-read fast5s (cached).

    Modern MinKNOW writes multi-read files (hundreds-thousands of reads
    each); the single-read layout pays a libhdf5 file open per read
    (150-226 µs/file on this host).  Same reads/truth as the single-read
    dataset.  Returns the multi-read directory.
    """
    from deepbinner_tpu.utils.fast5 import (
        find_all_fast5s,
        iterate_reads_in_fast5,
        write_multi_read_fast5,
    )

    fast5_dir = ensure_dataset(n_reads)
    out_dir = fast5_dir.rstrip("/") + "_multi"
    marker = os.path.join(out_dir, ".complete")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    reads = []
    for path in find_all_fast5s(os.path.dirname(fast5_dir)):
        reads.extend(iterate_reads_in_fast5(path))
    reads.sort(key=lambda item: item[0])  # deterministic packing
    for k in range(0, len(reads), reads_per_file):
        write_multi_read_fast5(
            os.path.join(out_dir, f"batch_{k // reads_per_file:04d}.fast5"),
            reads[k : k + reads_per_file],
        )
    with open(marker, "w") as handle:
        handle.write(f"{len(reads)}\n")
    return out_dir


def load_flagship(path: str = MODEL_FILE):
    import jax

    from deepbinner_tpu.models.checkpoint import load_model
    from deepbinner_tpu.models.network import NetworkConfig, init_params

    if os.path.exists(path):
        model, variables, net_cfg, _meta = load_model(path)
        return model, variables, net_cfg
    net_cfg = NetworkConfig()
    model, variables = init_params(jax.random.PRNGKey(0), net_cfg)
    return model, variables, net_cfg


def _build_program(use_pallas: bool, dual: bool, host_trim: bool = True,
                   wire: str = "int16"):
    from deepbinner_tpu.ops.calling import CallingConfig
    from deepbinner_tpu.ops.preprocess import PreprocessConfig
    from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram

    model, variables, net_cfg = load_flagship()
    end_vars = None
    end_model = None
    if dual:
        end_model, end_vars, end_cfg = load_flagship(END_MODEL_FILE)
        if end_cfg != net_cfg:
            raise ValueError("start and end models have different architectures")
    cfg = ClassifyConfig(
        # Flagship geometry 6144/1024/512; host_trim mirrors the classify
        # CLI default — workers trim open-pore signal so the device payload
        # is the scan region only (25% fewer tunnel bytes).
        preprocess=PreprocessConfig(host_trim=host_trim, wire=wire),
        calling=CallingConfig(),
        dual_model=dual,
        use_pallas=use_pallas,
    )
    return ClassifyProgram(model, cfg, variables, end_vars,
                           end_model=end_model), cfg


def measure_tpu(fast5_dir: str, batch_size: int, reader_workers: int,
                use_pallas: bool = False, native_reader: bool = True,
                passes: int = 3, dual: bool = False,
                host_trim: bool = True, shm_slots: int = 20,
                wire: str = "int16", files=None) -> dict:
    """Steady-state end-to-end throughput: warm pass + `passes` timed passes.

    File decode runs in worker *processes* (runner.mp_reader.ReaderPool):
    in-process readers (threads) sharing the process with the live TPU
    client stall for minutes on first use (round-1 VERDICT root cause), and
    a long-lived pool also amortises spawn cost the way a real pipeline
    service would.  Workers assemble the fixed-shape device batches
    themselves (runner.hostbatch), so queue traffic is bounded at
    batch-buffer size regardless of raw read lengths (bit-identical
    batches — tested in tests/test_mp_reader.py).
    """
    import jax

    from deepbinner_tpu.runner.executor import (
        ExecutorStats,
        batch_spec_for,
        classify_batches,
    )
    from deepbinner_tpu.runner.mp_reader import ReaderPool
    from deepbinner_tpu.utils.fast5 import find_all_fast5s

    if files is None:
        files = find_all_fast5s(os.path.dirname(fast5_dir))

    if native_reader:
        from deepbinner_tpu.native import fast5_reader

        if not fast5_reader.available():
            # g++ + libhdf5 are in the image; build on first use.
            try:
                from deepbinner_tpu.native.build import build

                build(verbose=False)
                fast5_reader._load_failed = False
            except Exception as error:  # noqa: BLE001 — bench must not die
                print(f"[bench] native reader build failed ({error}); "
                      f"workers will use h5py", file=sys.stderr)

    t0 = time.monotonic()
    program, cfg = _build_program(use_pallas, dual, host_trim=host_trim,
                                  wire=wire)
    setup_s = time.monotonic() - t0
    spec = batch_spec_for(cfg.preprocess, batch_size, dual)
    # H2D payload per batch (signal at the wire itemsize + int32 lengths,
    # ×2 when dual) — the denominator for achieved-MB/s so a slow pass is
    # attributable to the tunnel vs the pipeline (round-3 VERDICT weak #4).
    per_end = spec.batch_size * (spec.wire_row_bytes + 4)
    batch_bytes = per_end * (2 if dual else 1)

    print(f"[bench] program built ({setup_s:.1f}s); compiling + first-D2H "
          f"handshake …", file=sys.stderr, flush=True)
    with ReaderPool(
        num_workers=reader_workers, use_native=native_reader, batch_spec=spec,
        # Default transport is the shared-memory ring: the r4 stream_tuning
        # A/B measured every shm config ~2x faster than every pickle+pipe
        # config on this host (2095 vs 985 peak reads/s, same knobs).
        shm_slots=shm_slots,
    ) as pool:
        t0 = time.monotonic()
        program.warm_up(batch_size)
        compile_s = time.monotonic() - t0
        print(f"[bench] warm ({compile_s:.1f}s); streaming …",
              file=sys.stderr, flush=True)

        # Untimed warm pass: fills the page cache, exercises the dispatch
        # path end to end, and settles allocators on both sides.
        warm_stats = ExecutorStats()
        t0 = time.monotonic()
        for _ in classify_batches(
            program, pool.iter_batches(files, warm_stats, copy=False),
            stats=warm_stats,
        ):
            pass
        warm_s = time.monotonic() - t0

        per_pass = []
        per_pass_mbps = []
        n = 0
        for _ in range(max(1, passes)):
            stats = ExecutorStats()
            t0 = time.monotonic()
            n = 0
            for _result in classify_batches(
                program, pool.iter_batches(files, stats, copy=False),
                stats=stats,
            ):
                n += 1
            elapsed = time.monotonic() - t0
            per_pass.append(n / elapsed)
            per_pass_mbps.append(stats.batches * batch_bytes / elapsed / 1e6)

        link_capacity = measure_link_capacity(batch_bytes)

    # The reported value is the MEDIAN of the timed passes (the baseline
    # denominator gets the same treatment): int8 streaming passes have
    # swung 2.5x within one artifact on this host (BENCH_WIRE_r04.jsonl),
    # so a single slow pass must not define a round (round-4 VERDICT
    # weak #5).  Per-pass numbers stay in the JSON for attribution.
    ranked = sorted(per_pass)
    return {
        "reads": n,
        "reads_per_s": ranked[len(ranked) // 2],
        "mean_reads_per_s": sum(per_pass) / len(per_pass),
        "per_pass_reads_per_s": [round(v, 1) for v in per_pass],
        "h2d_mbps": round(sum(per_pass_mbps) / len(per_pass_mbps), 1),
        "per_pass_h2d_mbps": [round(v, 1) for v in per_pass_mbps],
        "link_capacity_mbps": round(link_capacity, 1) if link_capacity else None,
        "link_utilization": (
            round(sum(per_pass_mbps) / len(per_pass_mbps) / link_capacity, 3)
            if link_capacity else None
        ),
        "warm_pass_s": round(warm_s, 2),
        "setup_s": round(setup_s, 2),
        "compile_s": compile_s,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }


def measure_link_capacity(batch_bytes: int, streams: int = 3,
                          puts_per_stream: int = 6) -> float:
    """Achieved H2D capacity of the link RIGHT NOW, in MB/s.

    Uploads bench-sized int16 buffers from `streams` threads (3 = the
    measured multiplexing sweet spot, scripts/tunnel_probe.py) and returns
    the aggregate rate.  Measured at bench time — the tunnel's capacity
    varies day to day, so utilisation% must use a same-run denominator,
    not a constant.  Costs ~1-2 s; returns 0.0 on any failure (bench must
    not die for a diagnostic).
    """
    import concurrent.futures

    import jax
    import numpy as np

    try:
        n = max(1, batch_bytes // 2)
        bufs = [np.random.default_rng(i).integers(
            0, 1000, n, dtype=np.int16) for i in range(streams)]
        dev = jax.devices()[0]
        jax.device_put(bufs[0], dev).block_until_ready()  # warm path

        def put_many(buf):
            for _ in range(puts_per_stream):
                jax.device_put(buf, dev).block_until_ready()

        t0 = time.monotonic()
        with concurrent.futures.ThreadPoolExecutor(streams) as pool:
            list(pool.map(put_many, bufs))
        elapsed = time.monotonic() - t0
        return streams * puts_per_stream * batch_bytes / elapsed / 1e6
    except Exception as error:  # noqa: BLE001
        print(f"[bench] link capacity probe failed: {error}", file=sys.stderr)
        return 0.0


def measure_latency(batch_size: int = 16, trials: int = 20,
                    wire: str = "int8") -> dict:
    """Realtime-mode latency: signal-ready → calls-on-host for a small batch.

    This is the number the MinKNOW latency budget constrains (BASELINE.json
    config 5): how long after a batch of fresh reads appears until their
    calls are available to move files.  The timed loop includes the batch
    build (trim + quantise at the production-default wire) exactly as
    realtime pays it.
    """
    import numpy as np

    from deepbinner_tpu.runner.executor import build_batch

    program, cfg = _build_program(False, False, wire=wire)
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
        out = program.call_packed(sig, lens)
        np.asarray(out)  # host-visible
        latencies.append(time.monotonic() - t0)
    latencies.sort()
    return {
        "p50_ms": round(latencies[len(latencies) // 2] * 1e3, 1),
        "p90_ms": round(latencies[int(len(latencies) * 0.9)] * 1e3, 1),
        "batch_size": batch_size,
    }


def measure_baseline(n_reads: int = 256, repeats: int = 3) -> dict:
    """Reference-equivalent torch-CPU pipeline reads/s on this host.

    Batched the way the reference batches — every window of a 256-read
    chunk stacked into one forward (SURVEY.md §3.1) — with the combine and
    call rules an exact numpy port of ops.calling (parity-tested in
    tests/test_torch_baseline.py).  The reported rate is the MEDIAN of
    `repeats` measurement passes with the min/median/max spread recorded:
    this 2-core host's rate swings ±40% run-to-run under load, and the
    headline multiple's denominator must be attributable (round-3 VERDICT
    weak #2).  Host-load metadata is recorded so a contended measurement
    is diagnosable after the fact, and the contract run re-measures
    alongside the TPU number rather than trusting a stale cache.
    """
    import torch

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
    classify(reads[: min(32, len(reads))])  # warm-up
    rates = []
    n_results = 0
    for _ in range(max(1, repeats)):
        t0 = time.monotonic()
        results = classify(reads)
        elapsed = time.monotonic() - t0
        n_results = len(results)
        rates.append(n_results / elapsed)
    rates.sort()
    median = rates[len(rates) // 2]
    return {
        "reads": n_results,
        "reads_per_s": median,
        "spread_reads_per_s": [round(rates[0], 2), round(median, 2),
                               round(rates[-1], 2)],
        "repeats": len(rates),
        "torch_threads": torch.get_num_threads(),
        "cpu_count": os.cpu_count(),
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "batched": "all windows of a 256-read chunk per forward",
        "kind": "torch-cpu reference-equivalent (proxy; see SURVEY.md §0)",
    }


def get_baseline(args) -> dict:
    """Measure the CPU baseline for this run (cache only opts out).

    The denominator of the headline multiple is re-measured alongside each
    contract run so host CPU contention on the measurement day can't
    silently skew vs_baseline; --cached-baseline reuses BENCH_BASELINE.json
    for quick iteration.
    """
    if args.cached_baseline and os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as handle:
            return json.load(handle)
    baseline = measure_baseline()
    with open(BASELINE_FILE, "w") as handle:
        json.dump(baseline, handle, indent=2)
    return baseline


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--reads", type=int, default=4096)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--passes", type=int, default=3,
                        help="timed measurement passes (median is reported)")
    parser.add_argument("--reader-processes", type=int, default=2,
                        help="fast5 decode worker processes")
    parser.add_argument("--measure-baseline", action="store_true",
                        help="(default behaviour now; kept for compat)")
    parser.add_argument("--cached-baseline", action="store_true",
                        help="reuse BENCH_BASELINE.json instead of "
                             "re-measuring the CPU denominator")
    parser.add_argument("--pallas", action="store_true",
                        help="run the CNN through the fused Pallas kernels")
    parser.add_argument("--no-native-reader", action="store_true",
                        help="force h5py decode inside the reader workers")
    parser.add_argument("--wire", default=None,
                        choices=["int16", "int8", "int4"],
                        help="signal wire format (default int8: host "
                             "z-score + sigma/16 quantisation, half the "
                             "link bytes — 1.8x the upload ceiling and "
                             "100%% call agreement vs int16 on 4096 reads, "
                             "BENCH_WIRE_r04.jsonl; int16 = lossless raw)")
    parser.add_argument("--format", default="fast5",
                        choices=["fast5", "multifast5", "pod5"],
                        help="signal container format for the dataset: "
                             "fast5 = one read per file (the r1-r5 "
                             "contract workload); multifast5 = modern "
                             "MinKNOW multi-read files (256/file); pod5 "
                             "= same reads repacked 256/container "
                             "through the native vbz decoder")
    parser.add_argument("--no-shm", action="store_true",
                        help="use the pickled-queue batch transport instead "
                             "of the shared-memory ring (A/B the transport)")
    parser.add_argument("--device-trim", action="store_true",
                        help="run open-pore trimming in-graph instead of in "
                             "the reader workers (A/B the transfer saving)")
    parser.add_argument("--dual", action="store_true",
                        help="measure dual-model (start+end) throughput as "
                             "the primary metric")
    parser.add_argument("--latency", action="store_true",
                        help="measure realtime per-batch latency instead of "
                             "throughput")
    parser.add_argument("--no-extras", action="store_true",
                        help="skip the secondary dual/latency stderr metrics")
    args = parser.parse_args()

    # Resolve the wire format ONCE, before any measurement, so every metric
    # in this run (throughput, dual, latency) measures the same wire.
    # Quantisation runs in the workers after the host-side trim, so
    # --device-trim implies the lossless int16 wire; combining it with an
    # EXPLICIT --wire int8 is an error, mirroring the classify CLI
    # (round-4 ADVICE, bench.py:427).
    if args.device_trim:
        if args.wire in ("int8", "int4"):
            parser.error(f"--wire {args.wire} requires host-side trim "
                         "(drop --device-trim)")
        wire = "int16"
    else:
        wire = args.wire or "int8"

    if args.latency:
        result = measure_latency(wire=wire)
        print(json.dumps({
            "metric": "realtime_batch_latency_p50",
            "value": result["p50_ms"],
            "unit": "ms",
            "vs_baseline": None,
        }))
        print(f"[bench] latency {result}", file=sys.stderr)
        return

    # Stage progress to stderr: the axon tunnel's chip claim and first-D2H
    # handshake can each take minutes — make a hang diagnosable.
    print(f"[bench] start {time.strftime('%H:%M:%S')}", file=sys.stderr, flush=True)
    baseline = get_baseline(args)
    fast5_dir = ensure_dataset(args.reads)
    files = None
    if args.format != "fast5":
        from deepbinner_tpu.utils.fast5 import find_signal_files

        container_dir = (ensure_dataset_pod5(args.reads)
                         if args.format == "pod5"
                         else ensure_dataset_multiread(args.reads))
        files = find_signal_files(container_dir)
        print(f"[bench] {args.format} dataset: {len(files)} container(s)",
              file=sys.stderr, flush=True)
    print("[bench] dataset+baseline ready; claiming device …",
          file=sys.stderr, flush=True)
    result = measure_tpu(fast5_dir, args.batch_size, args.reader_processes,
                         use_pallas=args.pallas,
                         native_reader=not args.no_native_reader,
                         passes=args.passes, dual=args.dual,
                         host_trim=not args.device_trim,
                         shm_slots=0 if args.no_shm else 20,
                         wire=wire, files=files)

    value = result["reads_per_s"]
    vs = value / baseline["reads_per_s"] if baseline.get("reads_per_s") else None
    metric = ("classify_dual_reads_per_sec_per_chip" if args.dual
              else "classify_reads_per_sec_per_chip")
    print(json.dumps({
        "metric": metric,
        "value": round(value, 2),
        "unit": "reads/s/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        # Diagnostics: the denominator's run-to-run spread (min/median/max of
        # 3 CPU passes) and the tunnel wall (achieved H2D vs a same-run
        # capacity probe) so a slow headline is attributable ex post.
        "baseline_spread": baseline.get("spread_reads_per_s"),
        # Median of ≥3 timed passes (round-4 VERDICT item 1c): per-pass
        # rates recorded so one slow pass is visible, not definitional.
        "per_pass": result.get("per_pass_reads_per_s"),
        "wire": wire,
        "format": args.format,
        "link_mbps": result.get("h2d_mbps"),
        "link_capacity_mbps": result.get("link_capacity_mbps"),
        "link_utilization": result.get("link_utilization"),
    }))
    sys.stdout.flush()
    # Details to stderr for humans; the JSON line above is the contract.
    print(
        f"[bench] {result['reads']} reads/pass, per-pass "
        f"{result['per_pass_reads_per_s']} reads/s on {result['device']} "
        f"(setup {result['setup_s']}s, compile+first-D2H "
        f"{result['compile_s']:.1f}s, "
        f"warm pass {result['warm_pass_s']}s, "
        f"H2D {result['per_pass_h2d_mbps']} MB/s of "
        f"{result['link_capacity_mbps']} MB/s capacity); "
        f"baseline {baseline['reads_per_s']:.2f} "
        f"reads/s spread {baseline.get('spread_reads_per_s')} "
        f"({baseline.get('kind', 'cached')})",
        file=sys.stderr,
    )

    if args.no_extras or args.dual:
        return
    # Secondary contract numbers (BASELINE.json configs 2 and 5), best-effort.
    try:
        dual = measure_tpu(fast5_dir, args.batch_size, args.reader_processes,
                           use_pallas=args.pallas,
                           native_reader=not args.no_native_reader,
                           passes=3, dual=True,
                           host_trim=not args.device_trim,
                           shm_slots=0 if args.no_shm else 20,
                           wire=wire)
        dvs = dual["reads_per_s"] / baseline["reads_per_s"]
        print(json.dumps({
            "metric": "classify_dual_reads_per_sec_per_chip",
            "value": round(dual["reads_per_s"], 2),
            "unit": "reads/s/chip",
            "vs_baseline": round(dvs, 2),
            "per_pass": dual.get("per_pass_reads_per_s"),
        }), file=sys.stderr)
    except Exception as error:  # noqa: BLE001
        print(f"[bench] dual-model extra failed: {error}", file=sys.stderr)
    try:
        lat = measure_latency(trials=10, wire=wire)
        print(json.dumps({
            "metric": "realtime_batch_latency_p50",
            "value": lat["p50_ms"],
            "unit": "ms",
            "vs_baseline": None,
        }), file=sys.stderr)
    except Exception as error:  # noqa: BLE001
        print(f"[bench] latency extra failed: {error}", file=sys.stderr)


if __name__ == "__main__":
    main()
