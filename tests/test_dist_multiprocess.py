"""Real multi-process all-gather: two jax.distributed CPU processes merge
call tables identically (SURVEY.md §4 item 4 — distributed tests without a
cluster, via subprocess-spawned processes and a local coordinator)."""

import json
import os
import socket
import subprocess
import sys

import jax
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


# The full classify CLI inside a jax.distributed process group.  The worker
# forces the CPU platform *after* importing jax (the axon sitecustomize
# overrides JAX_PLATFORMS from inside register(); see CLAUDE.md) and then
# runs the production entry point unmodified — `main` itself calls
# dist.maybe_initialize() from the JAX_COORDINATOR_ADDRESS env vars, exactly
# as a real pod launch would.
_CLASSIFY_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from deepbinner_tpu.cli.main import main
main(["classify", sys.argv[1], "-s", sys.argv[2],
      "--scan_size", "768", "--batch_size", "8"])
"""


def test_two_process_classify_e2e_matches_single_process(tmp_path):
    """Each of 2 jax.distributed processes builds a ClassifyProgram over its
    LOCAL 2-device mesh (4 global devices — the round-2 VERDICT crash case),
    classifies its file shard, and host 0's merged table is byte-identical
    to a single-process run."""
    from deepbinner_tpu.models.checkpoint import save_model
    from deepbinner_tpu.models.network import NetworkConfig, init_params
    from deepbinner_tpu.utils import simulate

    net = NetworkConfig(
        input_length=256, stem_features=8, block_features=(8,),
        inception_features=(16,), head_features=16,
    )
    root = tmp_path / "ds"
    simulate.make_dataset(root, kit="EXP-NBD103", reads_per_barcode=1,
                          none_reads=2, genome_length=600, seed=23)
    model_path = str(tmp_path / "starts.dbt")
    _, variables = init_params(jax.random.PRNGKey(0), net)
    save_model(model_path, net, variables, {"kit": "EXP-NBD103", "end": "start"})
    fast5_dir = str(root / "fast5s")

    base_env = dict(os.environ)
    base_env["JAX_PLATFORMS"] = "cpu"
    # 2 LOCAL devices per process: build_program must construct its mesh from
    # jax.local_devices(), or device_put onto non-addressable devices throws.
    base_env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    base_env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "DEEPBINNER_TPU_PROCESS_INDEX",
                "DEEPBINNER_TPU_PROCESS_COUNT"):
        base_env.pop(var, None)

    def run(extra_env):
        env = dict(base_env)
        env.update(extra_env)
        return subprocess.Popen(
            [sys.executable, "-c", _CLASSIFY_WORKER, fast5_dir, model_path],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )

    # Same one-diagnosed-retry policy as the dist pair below: subprocess
    # classify runs have flaked under full-suite load on this host with a
    # non-zero exit and empty stderr; a real failure reproduces and is
    # printed, an environmental one costs one visible retry.
    for attempt in range(2):
        single_proc = run({})
        single_out, single_err = single_proc.communicate(timeout=600)
        if single_proc.returncode == 0:
            break
        print(f"[attempt {attempt}] single failed "
              f"(rc {single_proc.returncode}):\nstdout:\n{single_out[-1000:]}"
              f"\nstderr:\n{single_err[-3000:]}", file=sys.stderr)
    assert single_proc.returncode == 0, "single-process classify failed twice"
    assert single_out.count("\n") >= 15  # header + 14 reads

    def launch_pair():
        coordinator = f"localhost:{_free_port()}"
        return [
            run({
                "JAX_COORDINATOR_ADDRESS": coordinator,
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(pid),
            })
            for pid in range(2)
        ]

    def strip_gloo(out: str) -> str:
        # jax's CPU collectives (Gloo) print connection banners on *stdout*,
        # in two observed shapes: "[Gloo] ..." and a bare "<rank> is
        # connected to N peer ranks. ..." line that appears
        # nondeterministically.  Neither is TSV; strip both.
        return "".join(
            line for line in out.splitlines(keepends=True)
            if not line.startswith("[Gloo]")
            and "connected peer ranks" not in line
        )

    # One retry: the pair launch has flaked under full-suite load (a worker
    # exiting non-zero with nothing on stderr — coordinator port/timing
    # sensitivity on this 2-vCPU host).  The retry prints the first
    # attempt's diagnostics so a REAL failure is never silent, and every
    # correctness assertion below still runs against the attempt that
    # completed.
    for attempt in range(2):
        outputs = []
        failure = None
        for proc in launch_pair():
            out, err = proc.communicate(timeout=600)
            if proc.returncode != 0 and failure is None:
                failure = (f"dist worker failed (rc {proc.returncode}):\n"
                           f"stdout:\n{out[-1000:]}\nstderr:\n{err[-3000:]}")
            outputs.append((strip_gloo(out), err))
        if failure is None:
            break
        print(f"[attempt {attempt}] {failure}", file=sys.stderr)
    assert failure is None, failure

    # both processes classified a non-empty shard (the work really split)
    # over a real LOCAL 2-device data-parallel mesh (the fixed code path)
    for _, err in outputs:
        assert "this host: " in err
        assert "data-parallel over 2 device(s)" in err
    # only host 0 emits the table, and it is byte-identical to single-process
    assert outputs[1][0] == ""
    assert outputs[0][0] == single_out
