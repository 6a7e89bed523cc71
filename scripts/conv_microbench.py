#!/usr/bin/env python
"""One-layer conv microbenchmark on the chip: XLA vs Pallas, f32 vs bf16.

Answers two round-3 questions with direct evidence:
- does `mxu_dtype=bfloat16` actually change on-chip arithmetic + speed?
- where does XLA's conv advantage come from (per-layer timing)?
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepbinner_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepbinner_tpu.ops.conv_pallas import (
    conv1d_bn_relu_reference,
    fused_conv1d_bn_relu,
)


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / reps, out


def main():
    print(f"# {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    # the flagship mid-stack layer: L=512, 48->64, plus a wide one
    for (n, length, c_in, c_out) in [(704, 512, 48, 64), (176, 128, 96, 128)]:
        x = jax.device_put(jnp.asarray(
            rng.normal(size=(n, length, c_in)), jnp.float32))
        k = jax.device_put(jnp.asarray(
            rng.normal(size=(3, c_in, c_out)) * 0.1, jnp.float32))
        s = jax.device_put(jnp.ones((c_out,), jnp.float32))
        b = jax.device_put(jnp.zeros((c_out,), jnp.float32))

        dt_ref, ref = timeit(jax.jit(conv1d_bn_relu_reference), x, k, s, b)
        rows = {"geom": [n, length, c_in, c_out],
                "xla_ms": round(dt_ref * 1e3, 3)}
        for name, dtype in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
            fn = jax.jit(lambda x, k, s, b, d=dtype: fused_conv1d_bn_relu(
                x, k, s, b, mxu_dtype=d, interpret=False))
            dt, out = timeit(fn, x, k, s, b)
            rows[f"pallas_{name}_ms"] = round(dt * 1e3, 3)
            rows[f"pallas_{name}_maxdiff"] = float(jnp.max(jnp.abs(out - ref)))
        print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
