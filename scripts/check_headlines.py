#!/usr/bin/env python
"""Assert every recorded headline number is backed by a committed artifact.

Round-3 and round-4 both shipped docs whose leading throughput claim
drifted from the end-of-round driver artifact (once conservative, once
not) — see VERDICT.md round 4, weak #1.  This check makes the drift a
test failure instead of a judge finding:

- every entry in HEADLINES must appear VERBATIM (a) in each doc that is
  supposed to quote it and (b) in at least one committed artifact file;
- the docs' *leading* throughput claim must be the driver artifact's
  number (driver-first rule), asserted by ordering checks below.

Run directly (``python scripts/check_headlines.py``) or via the suite
(tests/test_check_headlines.py).  Exit code 0 = all claims backed.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# claim: the number as the docs quote it (string-verbatim).
# docs: files that must contain the claim.
# artifacts: committed files, at least one of which must contain it.
HEADLINES = [
    # Round-4 driver artifact (the operative contract numbers).
    {"claim": "2234.96", "docs": ["docs/performance.md", "BASELINE.md"],
     "artifacts": ["BENCH_r04.json"]},
    {"claim": "2832.47", "docs": ["README.md", "docs/performance.md",
                                  "BASELINE.md"],
     "artifacts": ["BENCH_r04.json"]},
    {"claim": "27.9", "docs": ["README.md", "docs/performance.md",
                               "BASELINE.md"],
     "artifacts": ["BENCH_r04.json"]},
    # Round-4 builder sweep peak (secondary, quoted with link context).
    {"claim": "3903.3", "docs": ["README.md", "docs/performance.md",
                                 "BASELINE.md"],
     "artifacts": ["BENCH_STREAM_INT8_r04.jsonl"]},
    # Device-step ceilings (int8 vs int16 wire A/B).
    {"claim": "9222.5", "docs": ["docs/performance.md", "BASELINE.md"],
     "artifacts": ["BENCH_WIRE_r04.jsonl"]},
    {"claim": "5114.6", "docs": ["docs/performance.md"],
     "artifacts": ["BENCH_WIRE_r04.jsonl"]},
    # Pallas compute-only trunk timing (round-4 re-measure).
    {"claim": "14.4", "docs": ["BASELINE.md"],
     "artifacts": ["BENCH_PALLAS_r04.jsonl"]},
    {"claim": "31.55", "docs": ["BASELINE.md"],
     "artifacts": ["BENCH_PALLAS_r04.jsonl"]},
    # Round-5 Pallas candidates (hybrid / split3 / same-process XLA).
    {"claim": "36.6", "docs": ["BASELINE.md", "docs/architecture.md"],
     "artifacts": ["BENCH_PALLAS_r05.jsonl"]},
    {"claim": "31.63", "docs": ["BASELINE.md", "docs/architecture.md"],
     "artifacts": ["BENCH_PALLAS_r05.jsonl"]},
    {"claim": "14.11", "docs": ["BASELINE.md", "docs/architecture.md"],
     "artifacts": ["BENCH_PALLAS_r05.jsonl"]},
    # int8 robustness grid (production wire vs lossless, r5).  Docs quote
    # percentages; the artifact records fractions — artifact_claim maps.
    {"claim": "93.08", "artifact_claim": "0.9308", "docs": ["BASELINE.md"],
     "artifacts": ["EVAL_ROBUSTNESS_r05.jsonl"]},
    {"claim": "60.77", "artifact_claim": "0.6077", "docs": ["BASELINE.md"],
     "artifacts": ["EVAL_ROBUSTNESS_r05.jsonl"]},
    {"claim": "99.23", "artifact_claim": "0.9923", "docs": ["BASELINE.md"],
     "artifacts": ["EVAL_ROBUSTNESS_r05.jsonl"]},
    {"claim": "98.46", "artifact_claim": "0.9846", "docs": ["BASELINE.md"],
     "artifacts": ["EVAL_ROBUSTNESS_r05.jsonl"]},
    # Round-5 builder validations of the full default contract.
    {"claim": "4204.6", "docs": ["BASELINE.md"],
     "artifacts": ["BENCH_VALIDATE_r05.jsonl"]},
    {"claim": "92.99", "docs": ["BASELINE.md"],
     "artifacts": ["BENCH_VALIDATE_r05.jsonl"]},
    {"claim": "3072.12", "docs": ["BASELINE.md"],
     "artifacts": ["BENCH_VALIDATE_r05.jsonl"]},
    {"claim": "4499.91", "docs": ["README.md", "BASELINE.md"],
     "artifacts": ["BENCH_VALIDATE_r05.jsonl"]},
    {"claim": "112.58", "docs": ["README.md", "BASELINE.md"],
     "artifacts": ["BENCH_VALIDATE_r05.jsonl"]},
    {"claim": "3109.93", "docs": ["BASELINE.md"],
     "artifacts": ["BENCH_VALIDATE_r05.jsonl"]},
    # pod5-vs-fast5 same-process A/B (r5, native vbz unpack).
    {"claim": "4867.8", "docs": ["docs/performance.md"],
     "artifacts": ["BENCH_POD5_r05.jsonl"]},
    {"claim": "3925.1", "docs": ["docs/performance.md"],
     "artifacts": ["BENCH_POD5_r05.jsonl"]},
    # 8192-read pass vs same-run ceiling (fill/drain analysis).
    {"claim": "5157.2", "docs": ["docs/performance.md", "BASELINE.md"],
     "artifacts": ["BENCH_BATCH_r05.jsonl"]},
    {"claim": "7197.6", "docs": ["docs/performance.md", "BASELINE.md"],
     "artifacts": ["BENCH_BATCH_r05.jsonl"]},
    # int4 + multifast5 best-config streaming (r5 container A/B).
    {"claim": "5111.3", "docs": ["README.md", "docs/performance.md"],
     "artifacts": ["BENCH_WIRE_r05.jsonl"]},
    {"claim": "5496.4", "docs": ["docs/performance.md"],
     "artifacts": ["BENCH_WIRE_r05.jsonl"]},
    # shm-vs-pickle transport A/B per-pass peaks.
    {"claim": "2094.9", "docs": ["docs/performance.md"],
     "artifacts": ["BENCH_STREAM_r04.jsonl"]},
    {"claim": "984.8", "docs": ["docs/performance.md"],
     "artifacts": ["BENCH_STREAM_r04.jsonl"]},
]

# Driver-first rule: in each doc, the driver artifact's single-model
# number must appear BEFORE the builder sweep's number.
ORDERING = [
    ("README.md", "2234.96", "3903.3"),
    ("docs/performance.md", "2234.96", "3903.3"),
    ("BASELINE.md", "2234.96", "3903.3"),
]


def _read(path: str) -> str:
    with open(os.path.join(REPO, path), encoding="utf-8") as handle:
        return handle.read()


def check() -> list:
    problems = []
    for entry in HEADLINES:
        claim = entry["claim"]
        for doc in entry["docs"]:
            if claim not in _read(doc):
                problems.append(f"{doc}: expected headline '{claim}' missing")
        aclaim = entry.get("artifact_claim", claim)
        if not any(aclaim in _read(a) for a in entry["artifacts"]):
            problems.append(
                f"headline '{claim}' (artifact form '{aclaim}') not found in "
                f"any committed artifact ({', '.join(entry['artifacts'])})"
            )
    for doc, first, second in ORDERING:
        text = _read(doc)
        i, j = text.find(first), text.find(second)
        if i < 0 or j < 0:
            continue  # absence already reported above
        if i > j:
            problems.append(
                f"{doc}: driver number '{first}' must lead; found builder "
                f"number '{second}' first (driver-first rule)"
            )
    return problems


def main() -> int:
    problems = check()
    print(json.dumps({"headlines": len(HEADLINES),
                      "problems": problems}))
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
