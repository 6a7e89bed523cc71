"""Real multi-process all-gather: two jax.distributed CPU processes merge
call tables identically (SURVEY.md §4 item 4 — distributed tests without a
cluster, via subprocess-spawned processes and a local coordinator)."""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
coordinator, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=2, process_id=pid
)
from deepbinner_tpu.parallel import dist

assert dist.process_count() == 2
assert dist.process_index() == pid

# Each process holds a disjoint shard of calls (as after sharded classify).
rows = [(f"read{i:03d}", f"barcode{(i % 12) + 1:02d}")
        for i in range(pid, 20, 2)]
merged = dist.merge_call_tables(rows)
print("MERGED:" + json.dumps(merged))

# File sharding must be disjoint + covering.
files = [f"f{i}.fast5" for i in range(11)]
print("SHARD:" + json.dumps(dist.shard_files(files)))

# Verbose lines gather into the identical sorted union on every host.
lines = [f"read{i:03d}\tbarcode01\t0.99" for i in range(pid, 10, 2)]
print("LINES:" + json.dumps(dist.merge_lines(lines)))
"""


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        return sock.getsockname()[1]


def test_two_process_merge_is_identical(tmp_path):
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single device per process
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coordinator, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outputs = []
    for proc in procs:
        out, err = proc.communicate(timeout=220)
        assert proc.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outputs.append(out)

    merged = []
    shards = []
    lines = []
    for out in outputs:
        for line in out.splitlines():
            if line.startswith("MERGED:"):
                merged.append(json.loads(line[len("MERGED:"):]))
            if line.startswith("SHARD:"):
                shards.append(json.loads(line[len("SHARD:"):]))
            if line.startswith("LINES:"):
                lines.append(json.loads(line[len("LINES:"):]))

    assert len(merged) == 2
    # both processes computed the identical, canonically-sorted union
    assert merged[0] == merged[1]
    assert len(merged[0]) == 20
    assert merged[0] == sorted(merged[0])

    # file shards are disjoint and cover the input
    assert len(shards) == 2
    assert not (set(map(tuple, shards[0])) & set(map(tuple, shards[1])))
    assert len(shards[0]) + len(shards[1]) == 11

    # verbose-line gather: identical sorted union on both hosts
    assert len(lines) == 2
    assert lines[0] == lines[1] == sorted(lines[0])
    assert len(lines[0]) == 10
