"""Scaling-efficiency harness smoke test (round-2 VERDICT item 8).

The CPU proxy's efficiency number is contention-bound and unasserted; what
must hold everywhere: the harness runs end-to-end, reports valid JSON, and
the 2-process merged table is byte-identical to the single-process table.
"""

import json
import os
import subprocess
import sys


def test_scaling_harness_runs_and_output_is_identical(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts/scaling_efficiency.py"),
         "--reads", "32", "--work-dir", str(tmp_path)],
        # generous: under a fully loaded 2-core test run, each of the 4
        # subprocess passes can take minutes of wall clock
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    record = json.loads(proc.stdout.splitlines()[-1])
    assert record["metric"] == "scaling_efficiency_2proc"
    assert record["value"] > 0
    assert record["output_byte_identical"] is True
    assert record["processes"] == 2
    # the persisted tables match what the record claims
    single = (tmp_path / "single.tsv").read_text()
    merged = (tmp_path / "merged.tsv").read_text()
    assert single == merged and single.count("\n") >= 33
