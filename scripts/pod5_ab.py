#!/usr/bin/env python
"""Same-process pod5-vs-fast5 streaming A/B on the real chip.

Round-4 VERDICT item 7: pod5 decode went chunk-lazy in round 4, but its
end-to-end throughput claim was untested.  Cross-process comparisons on
this host carry a ±15% noise band and the tunnel's capacity swings by
the hour, so the ratio must come from ONE process: same compiled
program, same warmed link, alternating measure_tpu passes over the same
reads packed both ways (4096 single-read fast5s vs 16 pod5 containers
of 256 reads).

Emits one JSON line per format plus a ratio line (tee to
BENCH_POD5_r05.jsonl).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepbinner_tpu_jax_cache")


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--reads", type=int, default=4096)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--passes", type=int, default=3)
    args = parser.parse_args()

    import bench
    from deepbinner_tpu.utils.fast5 import find_signal_files

    fast5_dir = bench.ensure_dataset(args.reads)
    pod5_dir = bench.ensure_dataset_pod5(args.reads)
    pod5_files = find_signal_files(pod5_dir)

    rows = {}
    for fmt, files in (("fast5", None), ("pod5", pod5_files)):
        result = bench.measure_tpu(
            fast5_dir, args.batch_size, 2, passes=args.passes,
            wire="int8", files=files,
        )
        rows[fmt] = result
        print(json.dumps({
            "kind": "streaming", "format": fmt,
            "containers": len(files) if files else args.reads,
            "reads_per_s_median": round(result["reads_per_s"], 1),
            "per_pass_reads_per_s": result["per_pass_reads_per_s"],
            "link_capacity_mbps": result["link_capacity_mbps"],
        }), flush=True)
    ratio = rows["pod5"]["reads_per_s"] / rows["fast5"]["reads_per_s"]
    print(json.dumps({
        "kind": "verdict", "pod5_vs_fast5": round(ratio, 3),
        "target": ">=0.9",
        "ok": bool(ratio >= 0.9),
    }), flush=True)


if __name__ == "__main__":
    main()
