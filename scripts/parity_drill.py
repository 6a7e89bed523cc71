#!/usr/bin/env python
"""Reference-parity drill: the FIRST command to run when /root/reference/
gains content (round-3 VERDICT item 1; SURVEY.md §0 consequence 2, §4 item 2).

Every parity-sensitive decision in this repo was pinned from memory while
the reference mount was empty; each such site carries a PARITY-REVERIFY
marker.  This drill mechanically re-verifies everything it can the moment
real reference source/artifacts exist:

1. enumerate every PARITY-REVERIFY marker in the repo (the checklist);
2. diff the ONT kit sequences (utils/kits.py) against the reference source
   — every barcode, flank, and adapter must appear verbatim (or as its
   reverse complement) in the reference's constants;
3. diff CLI flag defaults against ``deepbinner/deepbinner.py`` (ast-parsed
   ``add_argument(..., default=...)`` on both sides);
4. surface the reference's window-combine / calling logic
   (``deepbinner/classify.py``) for the manual re-derivation that
   ops/calling.py's marker demands — the relevant lines are printed, the
   semantic diff is a human step;
5. import every ``deepbinner/models/*`` Keras-HDF5 artifact through
   models/keras_import.py (no TensorFlow needed);
6. classify any reference test fast5s with the imported start model and
   score the calls against any frozen reference TSV found (or
   ``--expected``).

Exit 0 = no check found a mismatch (skipped checks report why); exit 1
otherwise.  ``--json`` writes the machine-readable scorecard.

Tested against a mock reference dir assembled from this repo's own
Keras-export fixtures: tests/test_parity_drill.py.
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import re
import sys
from typing import Dict, List, Optional, Tuple

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OK, MISMATCH, SKIPPED, ERROR = "ok", "MISMATCH", "skipped", "ERROR"


def _find(reference: str, name_suffix: str) -> List[str]:
    out = []
    for root, _dirs, files in os.walk(reference):
        for name in files:
            if name.endswith(name_suffix):
                out.append(os.path.join(root, name))
    return sorted(out)


def _read_all_source(reference: str) -> str:
    chunks = []
    for path in _find(reference, ".py"):
        try:
            with open(path, errors="replace") as handle:
                chunks.append(handle.read())
        except OSError:
            pass
    return "\n".join(chunks)


# ---------------------------------------------------------------- checks

def check_markers() -> Tuple[str, dict]:
    """List every PARITY-REVERIFY marker in the repo (the work items)."""
    markers = []
    for root, dirs, files in os.walk(REPO):
        dirs[:] = [d for d in dirs
                   if d not in (".git", "__pycache__", ".claude")]
        for name in files:
            if not name.endswith((".py", ".md", ".cc")):
                continue
            path = os.path.join(root, name)
            try:
                with open(path, errors="replace") as handle:
                    for lineno, line in enumerate(handle, 1):
                        if "PARITY-REVERIFY" in line and "grep" not in line:
                            rel = os.path.relpath(path, REPO)
                            if rel.startswith("scripts/parity_drill"):
                                continue
                            markers.append(f"{rel}:{lineno}")
            except OSError:
                pass
    return OK, {"count": len(markers), "sites": markers}


def check_kit_sequences(reference: str) -> Tuple[str, dict]:
    """Every kit constant must appear verbatim (or revcomp) in ref source."""
    from deepbinner_tpu.utils import kits

    source = _read_all_source(reference)
    if not re.search(r"[ACGT]{20,}", source):
        return SKIPPED, {"reason": "no sequence constants found in any "
                                   "reference .py (mount empty or stripped)"}
    probes: Dict[str, str] = {
        f"BC{i:02d}": seq for i, seq in kits.BARCODES.items()
    }
    probes.update({
        "NATIVE_START_FLANK_LEFT": kits.NATIVE_START_FLANK_LEFT,
        "NATIVE_START_FLANK_RIGHT": kits.NATIVE_START_FLANK_RIGHT,
        "NATIVE_END_FLANK_LEFT": kits.NATIVE_END_FLANK_LEFT,
        "NATIVE_END_FLANK_RIGHT": kits.NATIVE_END_FLANK_RIGHT,
        "LIGATION_ADAPTER_TOP": kits.LIGATION_ADAPTER_TOP,
        "LIGATION_ADAPTER_BOTTOM": kits.LIGATION_ADAPTER_BOTTOM,
        "RAPID_ADAPTER": kits.RAPID_ADAPTER,
    })
    missing = []
    for name, seq in probes.items():
        if seq in source or kits.reverse_complement(seq) in source:
            continue
        missing.append(name)
    status = OK if not missing else MISMATCH
    return status, {"checked": len(probes), "missing": missing}


def _argparse_defaults(tree: ast.AST) -> Dict[str, object]:
    """{--flag: default} for every add_argument call with a literal default."""
    defaults: Dict[str, object] = {}
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"):
            continue
        flags = [a.value for a in node.args
                 if isinstance(a, ast.Constant) and isinstance(a.value, str)
                 and a.value.startswith("--")]
        if not flags:
            continue
        for kw in node.keywords:
            if kw.arg == "default":
                try:
                    defaults[flags[-1]] = ast.literal_eval(kw.value)
                except ValueError:
                    pass
    return defaults


def check_cli_defaults(reference: str) -> Tuple[str, dict]:
    """Shared flags must default identically to the reference CLI."""
    candidates = [p for p in _find(reference, ".py")
                  if "add_argument" in open(p, errors="replace").read()]
    if not candidates:
        return SKIPPED, {"reason": "no argparse source in the reference"}
    ref_defaults: Dict[str, object] = {}
    for path in candidates:
        with open(path, errors="replace") as handle:
            try:
                ref_defaults.update(_argparse_defaults(ast.parse(handle.read())))
            except SyntaxError:
                pass
    with open(os.path.join(REPO, "deepbinner_tpu", "cli", "main.py")) as handle:
        ours = _argparse_defaults(ast.parse(handle.read()))
    shared = sorted(set(ref_defaults) & set(ours))
    diffs = {
        flag: {"reference": ref_defaults[flag], "ours": ours[flag]}
        for flag in shared if ref_defaults[flag] != ours[flag]
    }
    status = OK if shared and not diffs else (MISMATCH if diffs else SKIPPED)
    detail = {"shared_flags": len(shared), "diffs": diffs,
              "reference_only": sorted(set(ref_defaults) - set(ours)),
              "ours_only_sample": sorted(set(ours) - set(ref_defaults))[:10]}
    if not shared:
        detail["reason"] = "no overlapping flag names"
    return status, detail


def check_calling_semantics(reference: str) -> Tuple[str, dict]:
    """Surface the reference's combine/calling lines for manual re-derive."""
    classify = [p for p in _find(reference, ".py")
                if os.path.basename(p) == "classify.py"]
    if not classify:
        return SKIPPED, {"reason": "no reference classify.py"}
    interesting = []
    pattern = re.compile(
        r"score_diff|np\.(mean|max|amax|argmax)|softmax|require_|second", re.I
    )
    for path in classify:
        with open(path, errors="replace") as handle:
            for lineno, line in enumerate(handle, 1):
                if pattern.search(line):
                    interesting.append(
                        f"{os.path.relpath(path, reference)}:{lineno}: "
                        f"{line.rstrip()[:120]}"
                    )
    return OK, {
        "action": "MANUAL: re-derive ops/calling.py (combine_window_probs, "
                  "call_one_end, reconcile_calls) from these lines",
        "evidence": interesting[:40],
    }


def check_model_import(reference: str) -> Tuple[str, dict]:
    """Import every deepbinner/models/* artifact through keras_import."""
    model_files = []
    for path in _find(reference, ""):
        parent = os.path.basename(os.path.dirname(path))
        if parent == "models" and not path.endswith(".py"):
            model_files.append(path)
    if not model_files:
        return SKIPPED, {"reason": "no reference model artifacts"}
    from deepbinner_tpu.models.keras_import import load_keras_model

    results = {}
    failed = False
    for path in model_files:
        name = os.path.basename(path)
        try:
            _model, variables, config, meta = load_keras_model(path)
            import jax

            n_params = sum(
                x.size for x in jax.tree_util.tree_leaves(variables)
            )
            results[name] = {
                "params": int(n_params),
                "input_length": getattr(config, "input_length", None),
                "keras_version": meta.get("keras_version"),
            }
        except Exception as error:  # noqa: BLE001 — report, don't die
            results[name] = {"error": repr(error)[:200]}
            failed = True
    return (ERROR if failed else OK), {"models": results}


def drill_classify(fast5s: List[str], start_model: str) -> Dict[str, str]:
    """Classify `fast5s` with `start_model` using the reference CLI defaults
    (scan 6144, thresholds from CallingConfig) on CPU; → {read_id: call}."""
    import jax

    jax.config.update("jax_platforms", "cpu")  # never claim the bench chip
    from deepbinner_tpu.models.checkpoint import load_model
    from deepbinner_tpu.ops.calling import CallingConfig
    from deepbinner_tpu.ops.preprocess import PreprocessConfig
    from deepbinner_tpu.runner.executor import classify_files
    from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram
    from deepbinner_tpu.utils import table

    model, variables, net_cfg, _meta = load_model(start_model)
    window = net_cfg.input_length
    stride = max(window // 2, 1)
    scan = 6144
    scan = window + ((scan - window + stride - 1) // stride) * stride
    pre = PreprocessConfig(scan_size=scan, window=window, stride=stride,
                           trim_scan=min(2048, scan))
    program = ClassifyProgram(
        model, ClassifyConfig(pre, CallingConfig()), variables
    )
    calls = {}
    for result in classify_files(program, fast5s, batch_size=32,
                                 num_readers=2):
        calls[result.read_id] = table.class_index_to_call(result.call)
    return calls


def check_classification_scorecard(
    reference: str,
    fast5_dir: Optional[str],
    expected_tsv: Optional[str],
) -> Tuple[str, dict]:
    """Classify reference test fast5s with the imported start model and
    score against the frozen reference TSV."""
    fast5s = ([os.path.join(fast5_dir, f) for f in sorted(os.listdir(fast5_dir))
               if f.endswith(".fast5")] if fast5_dir
              else _find(reference, ".fast5"))
    if not fast5s:
        return SKIPPED, {"reason": "no reference test fast5s found"}

    start_model = None
    for path in _find(reference, ""):
        if (os.path.basename(os.path.dirname(path)) == "models"
                and "start" in os.path.basename(path)
                and not path.endswith(".py")):
            start_model = path
            break
    if start_model is None:
        return SKIPPED, {"reason": "no reference start model to classify with"}

    tsvs = [expected_tsv] if expected_tsv else _find(reference, ".tsv")
    expected: Dict[str, str] = {}
    for path in tsvs:
        if not path:
            continue
        with open(path, errors="replace") as handle:
            for line in handle:
                parts = line.rstrip("\n").split("\t")
                if len(parts) >= 2 and parts[0] != "read_ID":
                    expected[parts[0]] = parts[1]
    if not expected:
        return SKIPPED, {"reason": "no frozen reference TSV to score against "
                                   "(pass --expected)"}

    calls = drill_classify(fast5s, start_model)

    scored = {rid: want for rid, want in expected.items() if rid in calls}
    matches = sum(1 for rid, want in scored.items() if calls[rid] == want)
    mismatches = {rid: {"reference": want, "ours": calls[rid]}
                  for rid, want in scored.items() if calls[rid] != want}
    status = OK if scored and not mismatches else (
        MISMATCH if mismatches else SKIPPED)
    return status, {
        "reads_classified": len(calls),
        "reads_scored": len(scored),
        "matches": matches,
        "mismatches": dict(list(mismatches.items())[:20]),
        "unscored_reads": len(calls) - len(scored),
    }


# ------------------------------------------------------------------ main

def run_drill(reference: str, fast5_dir: Optional[str] = None,
              expected_tsv: Optional[str] = None) -> Dict[str, dict]:
    report: Dict[str, dict] = {}

    def run(name, fn, *args):
        try:
            status, detail = fn(*args)
        except Exception as error:  # noqa: BLE001 — one check must not kill the drill
            status, detail = ERROR, {"error": repr(error)[:300]}
        report[name] = {"status": status, **detail}

    run("parity_markers", check_markers)
    run("kit_sequences", check_kit_sequences, reference)
    run("cli_defaults", check_cli_defaults, reference)
    run("calling_semantics", check_calling_semantics, reference)
    run("keras_model_import", check_model_import, reference)
    run("classification_scorecard", check_classification_scorecard,
        reference, fast5_dir, expected_tsv)
    return report


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--reference", default="/root/reference",
                        help="Reference checkout root (default /root/reference)")
    parser.add_argument("--fast5s", help="Override: test fast5 directory")
    parser.add_argument("--expected",
                        help="Override: frozen reference classification TSV")
    parser.add_argument("--json", help="Write the scorecard JSON here")
    args = parser.parse_args()

    if not os.path.isdir(args.reference) or not os.listdir(args.reference):
        print(f"reference at {args.reference} is absent or EMPTY — nothing "
              f"to drill against yet (SURVEY.md §0). Re-run when it "
              f"populates.", file=sys.stderr)
        report = {"reference_empty": {"status": SKIPPED,
                                      "path": args.reference}}
        if args.json:
            with open(args.json, "w") as handle:
                json.dump(report, handle, indent=2)
        return 0

    report = run_drill(args.reference, args.fast5s, args.expected)
    worst = 0
    for name, entry in report.items():
        status = entry["status"]
        flag = {OK: " ", SKIPPED: "-", MISMATCH: "!", ERROR: "!"}[status]
        print(f"[{flag}] {name}: {status}")
        for key, value in entry.items():
            if key == "status":
                continue
            text = json.dumps(value) if not isinstance(value, str) else value
            if len(text) > 500:
                text = text[:500] + "…"
            print(f"      {key}: {text}")
        if status in (MISMATCH, ERROR):
            worst = 1
    if args.json:
        with open(args.json, "w") as handle:
            json.dump(report, handle, indent=2)
    print("PARITY DRILL:", "CLEAN" if worst == 0 else "DIVERGENCES FOUND")
    return worst


if __name__ == "__main__":
    raise SystemExit(main())
