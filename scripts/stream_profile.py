#!/usr/bin/env python
"""Streaming CPU-saturation profile + focused window A/B on the real chip.

Round-4 VERDICT item 1 accepts either streaming ≥70% of the same-run
int8 device-step ceiling, or a committed per-stage CPU-time profile
proving both vCPUs are saturated once the zero-copy path is in.  This
harness produces both measurements in ONE process (same tunnel hour):

- device-step ceiling at dispatch_threads 1/2/3 (the multiplexing
  optimum drifts by the hour — r3 measured 3 best, r5 measured 1 best);
- for each candidate pipeline window: 3 timed passes recording wall
  time, the consumer process's CPU seconds (utime+stime), every reader
  worker's CPU seconds (via /proc/<pid>/stat), and the implied
  host-CPU utilisation  (consumer + workers) / (cores × wall).

A `cpu_utilization` near 1.0 means the 2-vCPU host is the wall and no
pipeline knob can close the remaining ceiling gap on this machine.

Prints one JSON line per measurement (same contract as stream_tuning).
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

_CLK = os.sysconf("SC_CLK_TCK")


def _proc_cpu_s(pid: int) -> float:
    """utime+stime of a process, in seconds (0.0 if it exited)."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as handle:
            fields = handle.read().rsplit(b")", 1)[1].split()
        return (int(fields[11]) + int(fields[12])) / _CLK
    except (OSError, IndexError, ValueError):
        return 0.0


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--reads", type=int, default=4096)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--passes", type=int, default=3)
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

    print("[prof] warming (compile + first-D2H) …", file=sys.stderr, flush=True)
    t0 = time.monotonic()
    program.warm_up(args.batch_size)
    print(f"[prof] warm in {time.monotonic() - t0:.1f}s", file=sys.stderr,
          flush=True)

    cap = bench.measure_link_capacity(batch_bytes)
    emit("link_capacity", mbps=round(cap, 1))

    import numpy as np

    from deepbinner_tpu.runner.hostbatch import build_batch_arrays

    rng = np.random.default_rng(0)
    reads = [(f"r{i}", rng.integers(300, 600, spec.buffer_size).astype(np.int16))
             for i in range(args.batch_size)]
    one = build_batch_arrays(reads, spec)
    n_step = 24
    prebuilt = [one] * n_step
    ceilings = {}
    for threads in (1, 2, 3):
        t0 = time.monotonic()
        for _ in classify_batches(program, iter(prebuilt),
                                  dispatch_threads=threads, prefetch=0):
            pass
        elapsed = time.monotonic() - t0
        ceilings[threads] = n_step * args.batch_size / elapsed
        emit("device_step_ceiling", dispatch_threads=threads,
             reads_per_s=round(ceilings[threads], 1),
             h2d_mbps=round(n_step * batch_bytes / elapsed / 1e6, 1))
    best_ceiling = max(ceilings.values())

    cores = os.cpu_count() or 2
    # (workers, in_flight, prefetch, dispatch_threads, shm_slots)
    candidates = [
        (2, 8, 4, 3, 16),
        (2, 12, 6, 3, 20),
        (2, 16, 8, 3, 26),
    ]
    for workers, in_flight, prefetch, threads, shm_slots in candidates:
        with ReaderPool(num_workers=workers, use_native=True,
                        batch_spec=spec, shm_slots=shm_slots) as pool:
            worker_pids = [w.pid for w in pool._workers]
            warm_stats = ExecutorStats()
            for _ in classify_batches(
                program, pool.iter_batches(files, warm_stats, copy=False),
                stats=warm_stats, in_flight=in_flight, prefetch=prefetch,
                dispatch_threads=threads,
            ):
                pass
            per_pass, utils, consumer_s, workers_s = [], [], [], []
            for _ in range(args.passes):
                stats = ExecutorStats()
                cpu0 = time.process_time()
                wk0 = [_proc_cpu_s(p) for p in worker_pids]
                t0 = time.monotonic()
                n = 0
                for _ in classify_batches(
                    program, pool.iter_batches(files, stats, copy=False),
                    stats=stats, in_flight=in_flight, prefetch=prefetch,
                    dispatch_threads=threads,
                ):
                    n += 1
                wall = time.monotonic() - t0
                c_cpu = time.process_time() - cpu0
                w_cpu = sum(_proc_cpu_s(p) - b
                            for p, b in zip(worker_pids, wk0))
                per_pass.append(round(n / wall, 1))
                consumer_s.append(round(c_cpu, 2))
                workers_s.append(round(w_cpu, 2))
                utils.append(round((c_cpu + w_cpu) / (cores * wall), 3))
        ranked = sorted(per_pass)
        emit("streaming_profiled", workers=workers, in_flight=in_flight,
             prefetch=prefetch, dispatch_threads=threads,
             shm_slots=shm_slots, zero_copy=True,
             per_pass_reads_per_s=per_pass,
             median_reads_per_s=ranked[len(ranked) // 2],
             vs_best_ceiling=round(ranked[len(ranked) // 2] / best_ceiling, 3),
             consumer_cpu_s=consumer_s, workers_cpu_s=workers_s,
             cpu_utilization=utils, cores=cores)


if __name__ == "__main__":
    main()
