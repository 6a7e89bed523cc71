"""parity_drill against a MOCK reference dir (round-4 VERDICT item 3).

The real /root/reference is empty (SURVEY.md §0), so the drill is proven on
a mock assembled from this repo's own fixtures: kit constants rendered into
a fake prep.py, argparse defaults into a fake deepbinner.py, a Keras-2.2
HDF5 model written by the test_keras2018_import fixture writer, simulator
fast5s, and a frozen TSV produced by the drill's own classify helper.
Clean mock → every check OK; drifted mock → the drifts are flagged.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import test_keras2018_import as k2018
from deepbinner_tpu.utils import kits, simulate
from deepbinner_tpu.utils.fast5 import write_single_read_fast5

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import parity_drill  # noqa: E402


def _write_mock_reference(root, drift_barcode=False, drift_default=False,
                          with_model=True, with_fast5s=True):
    pkg = root / "deepbinner"
    pkg.mkdir(parents=True)

    # prep.py: the kit-sequence constants, as the reference embeds them.
    barcodes = dict(kits.BARCODES)
    if drift_barcode:
        seq = barcodes[5]
        barcodes[5] = seq[:3] + ("A" if seq[3] != "A" else "C") + seq[4:]
    lines = ["# mock reference prep.py"]
    for i, seq in barcodes.items():
        lines.append(f'BARCODE_{i:02d} = "{seq}"')
    for name in ("NATIVE_START_FLANK_LEFT", "NATIVE_START_FLANK_RIGHT",
                 "NATIVE_END_FLANK_LEFT", "NATIVE_END_FLANK_RIGHT",
                 "LIGATION_ADAPTER_TOP", "LIGATION_ADAPTER_BOTTOM",
                 "RAPID_ADAPTER"):
        lines.append(f'{name} = "{getattr(kits, name)}"')
    (pkg / "prep.py").write_text("\n".join(lines) + "\n")

    # deepbinner.py: argparse defaults.
    scan_default = 6000 if drift_default else 6144
    (pkg / "deepbinner.py").write_text(f"""
import argparse

def get_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument('--scan_size', type=int, default={scan_default})
    parser.add_argument('--score_diff', type=float, default=0.5)
    parser.add_argument('--min_score', type=float, default=0.5)
    parser.add_argument('--batch_size', type=int, default=256)
    return parser.parse_args()
""")

    # classify.py: calling-semantics evidence lines.
    (pkg / "classify.py").write_text(
        "import numpy as np\n"
        "def combine(probs):\n"
        "    return np.mean(probs, axis=0)\n"
        "def call(scores, score_diff):\n"
        "    best, second = np.argmax(scores), np.sort(scores)[-2]\n"
        "    return best if scores.max() - second >= score_diff else 0\n"
    )

    if with_model:
        models = pkg / "models"
        models.mkdir()
        rng = np.random.default_rng(99)
        k2018._write_keras22_h5(
            str(models / "EXP-NBD103_read_starts"),
            k2018._model_config(), k2018._weights(rng),
        )

    fast5_dir = None
    if with_fast5s:
        fast5_dir = root / "test_data"
        fast5_dir.mkdir()
        rng = np.random.default_rng(4)
        for i in range(6):
            read = simulate.simulate_read(
                "EXP-NBD103", (i % 3) + 1, rng, genome_length=500
            )
            write_single_read_fast5(
                fast5_dir / f"{read.read_id}.fast5", read.read_id, read.signal
            )
    return fast5_dir


@pytest.fixture(scope="module")
def clean_mock(tmp_path_factory):
    root = tmp_path_factory.mktemp("mock_ref")
    fast5_dir = _write_mock_reference(root)
    # Freeze the "reference TSV" with the drill's own classify helper —
    # the scorecard must then reproduce it 100%.
    fast5s = sorted(str(p) for p in fast5_dir.iterdir())
    model = str(root / "deepbinner" / "models" / "EXP-NBD103_read_starts")
    calls = parity_drill.drill_classify(fast5s, model)
    with open(root / "test_data" / "frozen_calls.tsv", "w") as handle:
        handle.write("read_ID\tbarcode_call\n")
        for rid, call in sorted(calls.items()):
            handle.write(f"{rid}\t{call}\n")
    return root


def test_drill_clean_mock_is_clean(clean_mock):
    report = parity_drill.run_drill(str(clean_mock))
    assert report["parity_markers"]["status"] == "ok"
    assert report["parity_markers"]["count"] >= 5  # the known marker sites

    assert report["kit_sequences"]["status"] == "ok"
    assert report["kit_sequences"]["missing"] == []
    assert report["kit_sequences"]["checked"] == 19  # 12 BCs + 4 flanks + 3 adapters

    assert report["cli_defaults"]["status"] == "ok", report["cli_defaults"]
    assert report["cli_defaults"]["shared_flags"] >= 4
    assert report["cli_defaults"]["diffs"] == {}

    assert report["calling_semantics"]["status"] == "ok"
    assert report["calling_semantics"]["evidence"]  # surfaced the logic

    imported = report["keras_model_import"]
    assert imported["status"] == "ok", imported
    assert imported["models"]["EXP-NBD103_read_starts"]["params"] > 0
    assert imported["models"]["EXP-NBD103_read_starts"]["input_length"] == k2018.L

    card = report["classification_scorecard"]
    assert card["status"] == "ok", card
    assert card["reads_scored"] == 6
    assert card["matches"] == 6
    assert card["mismatches"] == {}


def test_drill_flags_drifts(tmp_path):
    root = tmp_path / "drifted_ref"
    _write_mock_reference(root, drift_barcode=True, drift_default=True,
                          with_model=False, with_fast5s=False)
    report = parity_drill.run_drill(str(root))
    assert report["kit_sequences"]["status"] == "MISMATCH"
    assert report["kit_sequences"]["missing"] == ["BC05"]
    assert report["cli_defaults"]["status"] == "MISMATCH"
    assert report["cli_defaults"]["diffs"] == {
        "--scan_size": {"reference": 6000, "ours": 6144}
    }
    # absent artifacts are reported as skipped, never as passes
    assert report["keras_model_import"]["status"] == "skipped"
    assert report["classification_scorecard"]["status"] == "skipped"


def test_drill_cli_empty_reference_exits_zero(tmp_path):
    empty = tmp_path / "empty_ref"
    empty.mkdir()
    out = tmp_path / "report.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_drill.py"),
         "--reference", str(empty), "--json", str(out)],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "EMPTY" in proc.stderr
    report = json.loads(out.read_text())
    assert report["reference_empty"]["status"] == "skipped"
