#!/usr/bin/env python
"""Axon-tunnel transfer characterisation: upload rate (1 vs 2 threads),
small-array D2H round-trip, and upload+drain interleave cost.

Decides where the streaming classify pipeline's 64 ms/batch overhead
(213 ms streaming vs 149 ms pure dispatch) actually goes.
"""

import json
import os
import sys
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepbinner_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    print(f"# {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    batch = rng.integers(300, 600, (512, 7168)).astype(np.int16)  # 7.3 MB
    small = np.zeros((512, 29), np.float32)                       # 59 KB

    # Pay the first-D2H handshake before timing anything.
    np.asarray(jax.device_put(small))

    def upload_loop(n):
        for _ in range(n):
            jax.device_put(batch).block_until_ready()

    # 1-thread upload rate
    upload_loop(2)
    t0 = time.monotonic()
    upload_loop(8)
    dt1 = (time.monotonic() - t0) / 8
    print(json.dumps({"probe": "upload_1thread",
                      "ms": round(dt1 * 1e3, 1),
                      "mb_per_s": round(7.3 / dt1, 1)}), flush=True)

    # N-thread concurrent uploads: how far does the tunnel multiplex?
    for nthreads in (2, 3, 4, 6):
        per_thread = 12 // nthreads
        total = per_thread * nthreads
        t0 = time.monotonic()
        threads = [threading.Thread(target=upload_loop, args=(per_thread,))
                   for _ in range(nthreads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dtn = (time.monotonic() - t0) / total
        print(json.dumps({"probe": f"upload_{nthreads}threads",
                          "ms_per_batch": round(dtn * 1e3, 1),
                          "aggregate_mb_per_s": round(7.3 / dtn, 1)}),
              flush=True)

    # Small-array D2H round-trip (the per-batch drain cost)
    dev_small = jax.device_put(jnp.asarray(small))
    np.asarray(dev_small)
    t0 = time.monotonic()
    for _ in range(20):
        np.asarray(dev_small)
    rtt = (time.monotonic() - t0) / 20
    print(json.dumps({"probe": "d2h_small_rtt",
                      "ms": round(rtt * 1e3, 2)}), flush=True)

    # Interleaved upload+drain (the streaming pattern) vs pure uploads
    dev = jax.device_put(batch)
    t0 = time.monotonic()
    for _ in range(8):
        dev = jax.device_put(batch)
        dev.block_until_ready()
        np.asarray(dev_small)
    dt3 = (time.monotonic() - t0) / 8
    print(json.dumps({"probe": "upload_plus_drain",
                      "ms_per_batch": round(dt3 * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
