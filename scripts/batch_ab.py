#!/usr/bin/env python
"""Same-process batch-size / dispatch-thread / pass-length A/B on the chip.

Streaming sits at ~55% of the same-run device-step ceiling while neither
the host CPUs (~60% busy), the link (~45%), nor the device is saturated
— the remainder is per-pass pipeline fill/drain (the contract pass is
only 8 batches of 512).  This harness separates those effects in ONE
process: for each batch size, the device-step ceiling (threads 2/3) and
streaming passes at 4096 and 8192 reads (the same 4096 files listed
twice — page-cache-warm second lap), plus a threads=2 streaming row.

Tee to BENCH_BATCH_r05.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepbinner_tpu_jax_cache")


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--reads", type=int, default=4096)
    parser.add_argument("--passes", type=int, default=3)
    args = parser.parse_args()

    import bench
    from deepbinner_tpu.runner.executor import (
        ExecutorStats,
        batch_spec_for,
        classify_batches,
    )
    from deepbinner_tpu.runner.hostbatch import build_batch_arrays
    from deepbinner_tpu.runner.mp_reader import ReaderPool
    from deepbinner_tpu.utils.fast5 import find_all_fast5s

    import numpy as np

    fast5_dir = bench.ensure_dataset(args.reads)
    files = find_all_fast5s(os.path.dirname(fast5_dir))

    def emit(kind, **payload):
        print(json.dumps({"kind": kind, **payload}), flush=True)

    first = True
    for batch_size in (512, 256):
        program, cfg = bench._build_program(False, False, host_trim=True,
                                            wire="int8")
        t0 = time.monotonic()
        program.warm_up(batch_size)
        print(f"[ab] warm b{batch_size} in {time.monotonic() - t0:.1f}s",
              file=sys.stderr, flush=True)
        spec = batch_spec_for(cfg.preprocess, batch_size, False)
        batch_bytes = spec.batch_size * (spec.buffer_size + 4)
        if first:
            cap = bench.measure_link_capacity(batch_bytes)
            emit("link_capacity", mbps=round(cap, 1))
            first = False

        rng = np.random.default_rng(0)
        reads = [(f"r{i}",
                  rng.integers(300, 600, spec.buffer_size).astype(np.int16))
                 for i in range(batch_size)]
        one = build_batch_arrays(reads, spec)
        n_step = 4096 // batch_size * 3
        for threads in (2, 3):
            t0 = time.monotonic()
            for _ in classify_batches(program, iter([one] * n_step),
                                      dispatch_threads=threads, prefetch=0):
                pass
            elapsed = time.monotonic() - t0
            emit("device_step_ceiling", batch_size=batch_size,
                 dispatch_threads=threads,
                 reads_per_s=round(n_step * batch_size / elapsed, 1))

        with ReaderPool(num_workers=2, use_native=True, batch_spec=spec,
                        shm_slots=20) as pool:
            warm_stats = ExecutorStats()
            for _ in classify_batches(
                program, pool.iter_batches(files, warm_stats, copy=False),
                stats=warm_stats,
            ):
                pass
            for threads, laps in ((3, 1), (3, 2), (2, 1)):
                per_pass = []
                for _ in range(args.passes):
                    stats = ExecutorStats()
                    t0 = time.monotonic()
                    n = 0
                    for _ in classify_batches(
                        program,
                        pool.iter_batches(files * laps, stats, copy=False),
                        stats=stats, dispatch_threads=threads,
                    ):
                        n += 1
                    per_pass.append(round(n / (time.monotonic() - t0), 1))
                ranked = sorted(per_pass)
                emit("streaming", batch_size=batch_size,
                     dispatch_threads=threads, reads_per_pass=len(files) * laps,
                     per_pass_reads_per_s=per_pass,
                     median_reads_per_s=ranked[len(ranked) // 2])


if __name__ == "__main__":
    main()
