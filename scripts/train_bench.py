#!/usr/bin/env python
"""Training-step throughput on the real chip (flagship DemuxNet).

The training stack's performance has only been an anecdote ("~2 s/epoch")
— this measures it: N compiled train steps (optax AdamW, in-graph crop
augmentation path disabled — raw fixed windows) over synthetic samples,
with completion forced by fetching the final step's loss D2H
(`jax.block_until_ready` is a no-op on the axon tunnel — CLAUDE.md).
Each step re-uploads its (batch, signal) f32 slab exactly as the real
epoch loop does, so the number is end-to-end steps/s, not compute-only.

One JSON line per config (tee to BENCH_TRAIN_r05.jsonl).
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
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--batch-sizes", type=int, nargs="+",
                        default=[256, 512])
    parser.add_argument("--platform", default="default",
                        choices=["default", "cpu"])
    args = parser.parse_args()
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from deepbinner_tpu.models.network import NetworkConfig
    from deepbinner_tpu.parallel import mesh as mesh_lib
    from deepbinner_tpu.train.trainer import TrainConfig, Trainer

    net = NetworkConfig()  # flagship
    signal_size = net.input_length + net.input_length // 2  # crop headroom
    rng = np.random.default_rng(0)
    device = jax.devices()[0]
    for batch in args.batch_sizes:
        cfg = TrainConfig(network=net, batch_size=batch, epochs=1,
                          test_fraction=0.0, seed=0)
        trainer = Trainer(cfg, mesh_lib.make_mesh())
        signals = rng.normal(450, 50, (batch, signal_size)).astype(np.float32)
        labels = rng.integers(0, 13, batch).astype(np.int32)
        # Warm: compile + the first-D2H handshake.
        t0 = time.monotonic()
        metrics = trainer.run_train_step(signals, labels)
        loss0 = float(jax.device_get(metrics["loss"]))
        warm_s = time.monotonic() - t0
        t0 = time.monotonic()
        for _ in range(args.steps):
            metrics = trainer.run_train_step(signals, labels)
        loss = float(jax.device_get(metrics["loss"]))  # completion fence
        elapsed = time.monotonic() - t0
        print(json.dumps({
            "kind": "train_step", "batch_size": batch,
            "signal_size": signal_size, "steps": args.steps,
            "steps_per_s": round(args.steps / elapsed, 2),
            "samples_per_s": round(args.steps * batch / elapsed, 1),
            "ms_per_step": round(elapsed / args.steps * 1e3, 1),
            "warm_s": round(warm_s, 1),
            "first_loss": round(loss0, 4), "last_loss": round(loss, 4),
            "device": str(device),
        }), flush=True)


if __name__ == "__main__":
    main()
