#!/usr/bin/env python
"""Streaming-pipeline knob sweep on the real chip, one process, one warm-up.

Round-3 VERDICT item 1: streaming (2801 r/s) leaves ~18% on the table vs
the same chip's dispatch+upload+compute loop (3432 r/s).  This harness
pays the first-D2H handshake ONCE, then A/Bs pipeline configurations
back-to-back over the same ReaderPool + compiled program so the numbers
are same-tunnel-day comparable:

- the device-step ceiling (no readers: pre-built batches, dispatch loop);
- the link capacity probe (3-stream aggregate H2D);
- streaming with each (in_flight, prefetch, dispatch_threads, workers)
  candidate.

Prints one JSON line per measurement; run with the chip idle.
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


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--reads", type=int, default=4096)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--passes", type=int, default=2)
    parser.add_argument("--device-step-batches", type=int, default=24)
    parser.add_argument("--wire", default="int8", choices=["int16", "int8"])
    args = parser.parse_args()

    import bench
    from deepbinner_tpu.runner.executor import (
        ExecutorStats,
        batch_spec_for,
        classify_batches,
    )
    from deepbinner_tpu.runner.mp_reader import ReaderPool
    from deepbinner_tpu.utils.fast5 import find_all_fast5s

    fast5_dir = bench.ensure_dataset(args.reads)
    files = find_all_fast5s(os.path.dirname(fast5_dir))
    program, cfg = bench._build_program(False, False, host_trim=True,
                                        wire=args.wire)
    spec = batch_spec_for(cfg.preprocess, args.batch_size, False)
    batch_bytes = spec.batch_size * (spec.wire_row_bytes + 4)

    def emit(kind, **payload):
        print(json.dumps({"kind": kind, **payload}), flush=True)

    print("[tune] warming (compile + first-D2H) …", file=sys.stderr, flush=True)
    t0 = time.monotonic()
    program.warm_up(args.batch_size)
    print(f"[tune] warm in {time.monotonic() - t0:.1f}s", file=sys.stderr,
          flush=True)

    # Link capacity now (same-day denominator).
    cap = bench.measure_link_capacity(batch_bytes)
    emit("link_capacity", mbps=round(cap, 1))

    # Device-step ceiling: pre-built batches resident in host RAM, the
    # dispatch pool loop with no reader/queue in the way.
    import numpy as np

    from deepbinner_tpu.runner.hostbatch import build_batch_arrays

    rng = np.random.default_rng(0)
    reads = [(f"r{i}", rng.integers(300, 600, spec.buffer_size).astype(np.int16))
             for i in range(args.batch_size)]
    one = build_batch_arrays(reads, spec)
    prebuilt = [one] * args.device_step_batches

    for threads in (1, 3):
        t0 = time.monotonic()
        n = 0
        for _ in classify_batches(program, iter(prebuilt),
                                  dispatch_threads=threads, prefetch=0):
            n += 1
        elapsed = time.monotonic() - t0
        rps = args.device_step_batches * args.batch_size / elapsed
        emit("device_step_ceiling", dispatch_threads=threads,
             reads_per_s=round(rps, 1),
             h2d_mbps=round(args.device_step_batches * batch_bytes / elapsed / 1e6, 1),
             link_utilization=round(
                 args.device_step_batches * batch_bytes / elapsed / 1e6 / cap, 3
             ) if cap else None)

    # Streaming configs: (workers, in_flight, prefetch, dispatch_threads,
    # shm_slots, zero_copy) — shm_slots > 0 swaps the pickled queue for
    # the shared-memory ring; zero_copy uses iter_batches(copy=False)
    # (workers assemble into the slot, consumer device_puts from it,
    # release after the batch's result fetch — the round-5 default path).
    # Zero-copy needs shm_slots ≥ in_flight + prefetch + headroom.
    candidates = [
        (2, 8, 4, 3, 16, False),  # r4 behaviour (copy-out) reference
        (2, 8, 4, 3, 16, True),   # r5 default
        (2, 10, 5, 3, 18, True),
        (2, 12, 6, 3, 20, True),
        (3, 8, 4, 3, 16, True),
        (1, 8, 4, 3, 16, True),   # frees a core for dispatch on 2 vCPUs
        (2, 8, 4, 2, 16, True),
        (2, 8, 4, 3, 0, False),   # pickle-queue reference point
    ]
    for workers, in_flight, prefetch, threads, shm_slots, zero_copy in candidates:
        with ReaderPool(num_workers=workers, use_native=True,
                        batch_spec=spec, shm_slots=shm_slots) as pool:
            # one untimed settle pass per pool (page cache is already warm
            # after the first; keeps comparisons honest)
            warm_stats = ExecutorStats()
            for _ in classify_batches(
                program,
                pool.iter_batches(files, warm_stats, copy=not zero_copy),
                stats=warm_stats, in_flight=in_flight, prefetch=prefetch,
                dispatch_threads=threads,
            ):
                pass
            per_pass = []
            mbps = []
            for _ in range(args.passes):
                stats = ExecutorStats()
                t0 = time.monotonic()
                n = 0
                for _ in classify_batches(
                    program,
                    pool.iter_batches(files, stats, copy=not zero_copy),
                    stats=stats,
                    in_flight=in_flight, prefetch=prefetch,
                    dispatch_threads=threads,
                ):
                    n += 1
                elapsed = time.monotonic() - t0
                per_pass.append(round(n / elapsed, 1))
                mbps.append(round(stats.batches * batch_bytes / elapsed / 1e6, 1))
        emit("streaming", workers=workers, in_flight=in_flight,
             prefetch=prefetch, dispatch_threads=threads,
             shm_slots=shm_slots, zero_copy=zero_copy,
             per_pass_reads_per_s=per_pass, per_pass_h2d_mbps=mbps,
             link_utilization=round(max(mbps) / cap, 3) if cap else None)


if __name__ == "__main__":
    main()
