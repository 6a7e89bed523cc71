#!/usr/bin/env python
"""Evaluate dual-model (read-start + read-end) EXP-NBD103 classification.

BASELINE.json config 2: start+end dual-model classify with call
reconciliation.  Simulated NBD103 reads carry the barcode at both ends; the
executor feeds the start model the head of the read and the end model the
reversed tail, and reconcile_calls merges them (either-mode by default,
--require_both for strict agreement).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reads-per-barcode", type=int, default=10)
    parser.add_argument("--require-both", action="store_true")
    parser.add_argument("--seed", type=int, default=4242)
    parser.add_argument("--platform", default="default", choices=["default", "cpu"])
    parser.add_argument("--wire", default="int16",
                        choices=["int16", "int8", "int4"])
    parser.add_argument("--noise", type=float, default=1.0,
                        help="eval-time squiggle-noise scale (robustness "
                             "grid rows for the dual modes — round-4 "
                             "VERDICT weak #4)")
    args = parser.parse_args()
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from deepbinner_tpu.models.checkpoint import load_model
    from deepbinner_tpu.ops.calling import CallingConfig
    from deepbinner_tpu.ops.preprocess import PreprocessConfig
    from deepbinner_tpu.runner.executor import classify_stream
    from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram
    from deepbinner_tpu.utils import simulate

    data_dir = os.path.join(REPO, "deepbinner_tpu", "models", "data")
    model, start_vars, net_cfg, _ = load_model(
        os.path.join(data_dir, "EXP-NBD103_read_starts.dbt"))
    _m2, end_vars, end_cfg, _ = load_model(
        os.path.join(data_dir, "EXP-NBD103_read_ends.dbt"))
    assert end_cfg == net_cfg

    pre = PreprocessConfig(window=net_cfg.input_length,
                           stride=net_cfg.input_length // 2,
                           host_trim=args.wire != "int16", wire=args.wire)
    cfg = ClassifyConfig(
        pre, CallingConfig(require_both=args.require_both), dual_model=True
    )
    program = ClassifyProgram(model, cfg, start_vars, end_vars)

    rng = np.random.default_rng(args.seed)
    reads, truth = [], {}
    n = args.reads_per_barcode
    base_noise = simulate.SIGNAL_NOISE
    simulate.SIGNAL_NOISE = base_noise * args.noise
    try:
        for barcode in list(range(1, 13)) * n + [0] * n:
            read = simulate.simulate_read("EXP-NBD103", barcode, rng,
                                          genome_length=2000)
            reads.append((read.read_id, read.signal))
            truth[read.read_id] = barcode
    finally:
        simulate.SIGNAL_NOISE = base_noise

    per_end = {"start_only": 0, "end_only": 0, "both": 0}
    calls = {}
    for r in classify_stream(program, iter(reads), batch_size=64):
        calls[r.read_id] = r.call
        if r.start_call and r.end_call:
            per_end["both"] += 1
        elif r.start_call:
            per_end["start_only"] += 1
        elif r.end_call:
            per_end["end_only"] += 1

    total = len(truth)
    exact = sum(1 for rid, t in truth.items() if calls[rid] == t)
    barcoded = {rid: t for rid, t in truth.items() if t}
    recall = sum(1 for rid, t in barcoded.items() if calls[rid] == t)
    wrong = sum(1 for rid, t in truth.items() if calls[rid] not in (t, 0))
    print(json.dumps({
        "mode": "require_both" if args.require_both else "either",
        "wire": args.wire,
        "noise_x": args.noise,
        "reads": total,
        "exact_acc": round(exact / total, 4),
        "barcode_recall": round(recall / len(barcoded), 4),
        "wrong_barcode_rate": round(wrong / total, 4),
        "called_by": per_end,
    }))


if __name__ == "__main__":
    main()
