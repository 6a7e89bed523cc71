"""Multi-host training: 2 jax.distributed CPU processes, same global batch,
loss trajectory pinned to the single-process run (round-4 VERDICT item 10;
SURVEY.md §4 item 4 — distributed tests without a cluster)."""

import json
import os
import socket
import subprocess
import sys

# Each worker builds a GLOBAL mesh over both processes' devices, feeds the
# IDENTICAL seeded global batches (the production recipe: same training
# data + same seed on every host), and runs 5 train steps + 1 eval.  The
# single-process control (no coordinator env) runs the same script.
_WORKER = r"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
if len(sys.argv) > 1:
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=pid
    )
from deepbinner_tpu.parallel import mesh as mesh_lib
from deepbinner_tpu.train.trainer import TINY_PRESET, TrainConfig, Trainer

mesh = mesh_lib.make_mesh(jax.devices())   # global: spans both processes
cfg = TrainConfig(network=TINY_PRESET, batch_size=8, epochs=1,
                  test_fraction=0.0, seed=3)
trainer = Trainer(cfg, mesh)

rng = np.random.default_rng(11)            # identical stream on every host
signal_size = 2 * TINY_PRESET.input_length
losses = []
for _ in range(5):
    signals = rng.normal(450, 50, (cfg.batch_size, signal_size)).astype(np.float32)
    labels = rng.integers(0, 13, cfg.batch_size).astype(np.int32)
    metrics = trainer.run_train_step(signals, labels)
    losses.append(float(jax.device_get(metrics["loss"])))
eval_sig = rng.normal(450, 50, (16, signal_size)).astype(np.float32)
eval_lab = rng.integers(0, 13, 16).astype(np.int32)
ev = trainer.run_eval(eval_sig, eval_lab)
print("LOSSES:" + json.dumps({"losses": losses, "eval": ev,
                              "devices": jax.device_count(),
                              "process": jax.process_index()}))
"""


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        return sock.getsockname()[1]


def _env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # one device per process → dp=2 global
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        env.pop(var, None)
    return env


def _parse(out: str) -> dict:
    for line in out.splitlines():
        if line.startswith("LOSSES:"):
            return json.loads(line[len("LOSSES:"):])
    raise AssertionError(f"no LOSSES line in:\n{out[-2000:]}")


def test_two_process_train_matches_single_process():
    env = _env()
    single = subprocess.run(
        [sys.executable, "-c", _WORKER],
        capture_output=True, env=env, text=True, timeout=600,
    )
    assert single.returncode == 0, f"single failed:\n{single.stderr[-3000:]}"
    ref = _parse(single.stdout)
    assert ref["devices"] == 1

    coordinator = f"localhost:{_free_port()}"
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER, coordinator, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        ))
    results = []
    for proc in procs:
        out, err = proc.communicate(timeout=600)
        assert proc.returncode == 0, f"dist worker failed:\n{err[-3000:]}"
        results.append(_parse(out))

    for res in results:
        assert res["devices"] == 2  # the mesh really spanned both processes
        # Same global batch, cross-host gradient all-reduce: the trajectory
        # must match single-process up to reduction-order float noise.
        for got, want in zip(res["losses"], ref["losses"]):
            assert abs(got - want) < 1e-3, (res["losses"], ref["losses"])
        assert abs(res["eval"]["loss"] - ref["eval"]["loss"]) < 1e-3
        assert abs(res["eval"]["accuracy"] - ref["eval"]["accuracy"]) < 1e-6
    # both processes computed the identical replicated metrics
    assert results[0]["losses"] == results[1]["losses"]
