#!/usr/bin/env python
"""End-to-end streaming throughput sweep (round-2 VERDICT item 7).

One process, one chip claim, one first-D2H handshake; then each config
(batch size × reader workers × in_flight × prefetch) gets a warm pass and
two timed passes over the same 4096-read dataset.  JSON line per config.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepbinner_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402

from deepbinner_tpu.runner.executor import (  # noqa: E402
    ExecutorStats,
    batch_spec_for,
    classify_batches,
)
from deepbinner_tpu.runner.mp_reader import ReaderPool  # noqa: E402
from deepbinner_tpu.utils.fast5 import find_all_fast5s  # noqa: E402

CONFIGS = [
    # (batch, workers, in_flight, prefetch, dispatch_threads, tag)
    (512, 2, 6, 3, 3, "default"),
    (512, 2, 4, 3, 2, "dt2"),
    (512, 2, 8, 6, 4, "dt4"),
    (768, 2, 6, 3, 3, "b768"),
    (1024, 2, 6, 3, 3, "b1024"),
    (512, 3, 6, 3, 3, "w3"),
]


def main() -> None:
    reads = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    fast5_dir = B.ensure_dataset(reads)
    files = find_all_fast5s(os.path.dirname(fast5_dir))
    program, cfg = B._build_program(False, False)
    t0 = time.monotonic()
    program.warm_up(512)
    program.warm_up(1024)
    print(f"# warm {time.monotonic() - t0:.1f}s, {len(files)} files",
          file=sys.stderr, flush=True)

    for batch, workers, in_flight, prefetch, dispatch_threads, tag in CONFIGS:
        spec = batch_spec_for(cfg.preprocess, batch, False)
        with ReaderPool(num_workers=workers, batch_spec=spec) as pool:
            per_pass = []
            for timed in (False, True, True):
                stats = ExecutorStats()
                t0 = time.monotonic()
                n = 0
                for _ in classify_batches(
                    program, pool.iter_batches(files, stats), stats=stats,
                    in_flight=in_flight, prefetch=prefetch,
                    dispatch_threads=dispatch_threads,
                ):
                    n += 1
                if timed:
                    per_pass.append(n / (time.monotonic() - t0))
        print(json.dumps({
            "tag": tag, "batch": batch, "workers": workers,
            "in_flight": in_flight, "prefetch": prefetch,
            "dispatch_threads": dispatch_threads,
            "per_pass": [round(v, 1) for v in per_pass],
            "mean": round(sum(per_pass) / len(per_pass), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
