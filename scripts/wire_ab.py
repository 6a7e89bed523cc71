#!/usr/bin/env python
"""Wire-format A/B (int16 / int8 / int4) on the real chip, one process.

Round-4 follow-on to the shm transport work: with the link as the wall,
halving signal bytes (ops.preprocess.PreprocessConfig.wire='int8') should
roughly double link-bound throughput.  This harness measures, same process:

1. device-step ceiling for each wire (pre-built batches, dispatch loop) —
   the pure upload+compute effect;
2. streaming throughput for each wire (ReaderPool + shm transport,
   production knobs);
3. call agreement between the two wires over the whole dataset, plus
   accuracy vs the simulator's truth.tsv for BOTH — the evidence that the
   quantisation is call-safe at scale.

One JSON line per measurement (tee to BENCH_WIRE_r04.jsonl).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepbinner_tpu_jax_cache")


def emit(**payload):
    print(json.dumps(payload), flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--reads", type=int, default=4096)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--passes", type=int, default=2)
    parser.add_argument("--device-step-batches", type=int, default=24)
    args = parser.parse_args()

    import numpy as np

    import bench
    from deepbinner_tpu.runner.executor import (
        ExecutorStats,
        batch_spec_for,
        classify_batches,
    )
    from deepbinner_tpu.runner.hostbatch import build_batch_arrays
    from deepbinner_tpu.runner.mp_reader import ReaderPool
    from deepbinner_tpu.utils.fast5 import find_all_fast5s

    fast5_dir = bench.ensure_dataset(args.reads)
    files = find_all_fast5s(os.path.dirname(fast5_dir))
    truth = {}
    with open(os.path.join(os.path.dirname(fast5_dir), "truth.tsv")) as handle:
        for line in handle:
            read_id, barcode = line.strip().split("\t")[:2]
            # truth labels are 'barcodeNN' / 'none' (simulate.make_dataset)
            truth[read_id] = (int(barcode.replace("barcode", ""))
                              if barcode.startswith("barcode") else 0)

    programs = {}
    for wire in ("int16", "int8", "int4"):
        programs[wire] = bench._build_program(False, False, host_trim=True,
                                              wire=wire)

    print("[ab] warming (compile + first-D2H) …", file=sys.stderr, flush=True)
    t0 = time.monotonic()
    for wire, (program, _cfg) in programs.items():
        program.warm_up(args.batch_size)
    print(f"[ab] warm in {time.monotonic() - t0:.1f}s", file=sys.stderr,
          flush=True)

    rng = np.random.default_rng(0)
    calls = {}
    for wire, (program, cfg) in programs.items():
        spec = batch_spec_for(cfg.preprocess, args.batch_size, False)
        batch_bytes = spec.batch_size * (spec.wire_row_bytes + 4)

        # Device-step ceiling: batches resident in host RAM.
        reads = [(f"r{i}",
                  rng.integers(300, 600, spec.buffer_size).astype(np.int16))
                 for i in range(spec.batch_size)]
        one = build_batch_arrays(reads, spec)
        prebuilt = [one] * args.device_step_batches
        for _ in classify_batches(programs[wire][0], iter(prebuilt)):
            pass  # settle
        t0 = time.monotonic()
        n = 0
        for _ in classify_batches(program, iter(prebuilt)):
            n += 1
        elapsed = time.monotonic() - t0
        emit(kind="device_step_ceiling", wire=wire,
             reads_per_s=round(args.device_step_batches * spec.batch_size
                               / elapsed, 1),
             h2d_mbps=round(args.device_step_batches * batch_bytes
                            / elapsed / 1e6, 1))

        # Streaming with the production transport.
        with ReaderPool(num_workers=2, use_native=True, batch_spec=spec,
                        shm_slots=20) as pool:
            wire_calls = {}
            per_pass = []
            mbps = []
            for pass_i in range(args.passes + 1):  # first pass = settle
                stats = ExecutorStats()
                t0 = time.monotonic()
                for result in classify_batches(
                    program, pool.iter_batches(files, stats, copy=False),
                    stats=stats,
                ):
                    if pass_i == 0:
                        wire_calls[result.read_id] = result.call
                elapsed = time.monotonic() - t0
                if pass_i > 0:
                    per_pass.append(round(len(wire_calls) / elapsed, 1))
                    mbps.append(round(stats.batches * batch_bytes
                                      / elapsed / 1e6, 1))
        calls[wire] = wire_calls
        exact = sum(1 for rid, t in truth.items()
                    if wire_calls.get(rid) == t)
        wrong = sum(1 for rid, t in truth.items()
                    if wire_calls.get(rid) not in (t, 0, None))
        emit(kind="streaming", wire=wire, per_pass_reads_per_s=per_pass,
             per_pass_h2d_mbps=mbps, reads=len(wire_calls),
             exact_vs_truth=exact, wrong_barcode_vs_truth=wrong)

    for a, b in (("int16", "int8"), ("int8", "int4"), ("int16", "int4")):
        shared = set(calls[a]) & set(calls[b])
        agree = sum(1 for rid in shared if calls[a][rid] == calls[b][rid])
        diffs = [(rid, calls[a][rid], calls[b][rid])
                 for rid in shared if calls[a][rid] != calls[b][rid]]
        emit(kind="agreement", pair=f"{a}-vs-{b}", reads=len(shared),
             agree=agree, agreement=round(agree / max(len(shared), 1), 5),
             first_disagreements=diffs[:10])


if __name__ == "__main__":
    main()
