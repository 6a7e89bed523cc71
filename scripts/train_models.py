#!/usr/bin/env python
"""Train and ship the stock barcode models (reference models/* analog).

The reference ships three trained Keras models (EXP-NBD103_read_starts,
EXP-NBD103_read_ends, SQK-RBK004_read_starts — SURVEY.md §2 item 11).  With
no real sequencing data in this environment (empty mount), the stock models
are trained on the synthetic squiggle simulator and evaluated on held-out
simulated reads; swap in real prep'd data to retrain for production.

Usage:
  python scripts/train_models.py --kit EXP-NBD103 --end start \
      --reads-per-barcode 300 --epochs 30 [--size full] [--eval-only]

Writes deepbinner_tpu/models/data/<KIT>_read_<end>s.dbt and prints a JSON
summary (window val accuracy + read-level demux accuracy).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_training_rows(kit, end, reads_per_barcode, signal_size, margin, seed,
                        noise_jitter=0.0):
    from deepbinner_tpu.train import prep as prep_mod
    from deepbinner_tpu.utils import simulate

    rng = np.random.default_rng(seed)
    base_noise = simulate.SIGNAL_NOISE
    rows = []
    # Barcode-less reads match the barcoded count, and each contributes
    # several "none" cuts spread across the scanned region: classify
    # examines ~13 windows per read end, so class 0 must cover the same
    # positional distribution or deep windows false-positive on adapter/
    # genomic signal (measured round 2).
    none_reads = max(reads_per_barcode, 4)
    labels = [0] * none_reads + [
        b for b in range(1, 13) for _ in range(reads_per_barcode)
    ]
    for barcode in labels:
        if noise_jitter > 0:
            # Noise-diverse training: vary the squiggle noise per read so
            # the model's accuracy degrades gracefully off-distribution
            # (scripts/eval_robustness.py measures the resulting margin).
            simulate.SIGNAL_NOISE = base_noise * float(
                rng.uniform(1.0, 1.0 + noise_jitter)
            )
        read = simulate.simulate_read(kit, barcode, rng, genome_length=2000)
        move = (read.signal_start_of_bases, read.dwells)
        try:
            samples = prep_mod.extract_training_samples(
                read.signal, read.sequence, move, kit, end,
                signal_size=signal_size, margin=margin,
                none_rows=3 if barcode == 0 else 1,
            )
        except ValueError:
            continue
        for label, signal in samples:
            if (label == 0) == (barcode == 0):
                rows.append((label, signal))
    simulate.SIGNAL_NOISE = base_noise
    return rows


def evaluate_read_level(model_path, kit, end, n_per_barcode, seed, scan_size,
                        batch_size=64):
    """Classify fresh simulated reads with the trained model; score vs truth."""
    from deepbinner_tpu.models.checkpoint import load_model
    from deepbinner_tpu.ops.calling import CallingConfig
    from deepbinner_tpu.ops.preprocess import PreprocessConfig
    from deepbinner_tpu.runner.executor import classify_stream
    from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram
    from deepbinner_tpu.utils import simulate

    model, variables, net_cfg, _meta = load_model(model_path)
    window = net_cfg.input_length
    pre = PreprocessConfig(scan_size=scan_size, window=window,
                           stride=window // 2)
    cfg = ClassifyConfig(pre, CallingConfig(), dual_model=False)
    program = ClassifyProgram(model, cfg, variables)

    rng = np.random.default_rng(seed)
    reads, truth = [], {}
    for barcode in list(range(1, 13)) * n_per_barcode + [0] * n_per_barcode:
        read = simulate.simulate_read(kit, barcode, rng, genome_length=2000)
        signal = read.signal if end == "start" else read.signal[::-1].copy()
        reads.append((read.read_id, signal))
        truth[read.read_id] = barcode

    calls = {
        r.read_id: r.call
        for r in classify_stream(program, iter(reads), batch_size=batch_size)
    }
    total = len(truth)
    exact = sum(1 for rid, t in truth.items() if calls[rid] == t)
    barcoded = {rid: t for rid, t in truth.items() if t != 0}
    recall = sum(1 for rid, t in barcoded.items() if calls[rid] == t)
    wrong = sum(1 for rid, t in truth.items() if calls[rid] not in (t, 0))
    return {
        "reads": total,
        "exact_acc": round(exact / total, 4),
        "barcode_recall": round(recall / max(len(barcoded), 1), 4),
        "wrong_barcode_rate": round(wrong / total, 4),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kit", default="EXP-NBD103",
                        choices=["EXP-NBD103", "SQK-RBK004"])
    parser.add_argument("--end", default="start", choices=["start", "end"])
    parser.add_argument("--reads-per-barcode", type=int, default=300)
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--learning-rate", type=float, default=2e-3)
    parser.add_argument("--aug-factor", type=int, default=2)
    parser.add_argument("--noise-jitter", type=float, default=1.0,
                        help="train-time squiggle-noise diversity: per-read "
                             "noise scale drawn from U(1, 1+j); 0 disables")
    parser.add_argument("--size", default="full", choices=["full", "tiny"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default=None)
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--eval-reads-per-barcode", type=int, default=10)
    parser.add_argument("--platform", default="default",
                        choices=["default", "cpu"],
                        help="cpu: force the host platform (the environment's "
                             "sitecustomize otherwise pins the TPU)")
    args = parser.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from deepbinner_tpu.models.checkpoint import save_model
    from deepbinner_tpu.models.network import NetworkConfig
    from deepbinner_tpu.parallel import mesh as mesh_lib
    from deepbinner_tpu.train.trainer import (
        TINY_PRESET, TrainConfig, Trainer, train_loop,
    )

    network = TINY_PRESET if args.size == "tiny" else NetworkConfig()
    window = network.input_length
    signal_size = window + window // 2
    scan_size = 6144 if args.size == "full" else 768

    out = args.out or os.path.join(
        REPO, "deepbinner_tpu", "models", "data",
        f"{args.kit}_read_{args.end}s.dbt",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)

    summary = {"kit": args.kit, "end": args.end, "model": out,
               "size": args.size}
    if not args.eval_only:
        t0 = time.time()
        rows = build_training_rows(
            args.kit, args.end, args.reads_per_barcode,
            signal_size, margin=window // 8, seed=args.seed,
            noise_jitter=args.noise_jitter,
        )
        signals = np.stack([r[1] for r in rows]).astype(np.float32)
        labels = np.asarray([r[0] for r in rows], np.int32)
        counts = np.bincount(labels, minlength=13)
        print(f"[train] {len(labels)} samples (per-class {counts.tolist()}), "
              f"built in {time.time()-t0:.0f}s", file=sys.stderr)

        cfg = TrainConfig(
            network=network, learning_rate=args.learning_rate,
            batch_size=args.batch_size, epochs=args.epochs,
            test_fraction=0.1, aug_factor=args.aug_factor, seed=args.seed,
        )
        import jax
        print(f"[train] devices: {jax.devices()}", file=sys.stderr)
        trainer = Trainer(cfg, mesh_lib.make_mesh())
        best, best_variables = train_loop(
            trainer, signals, labels, epochs=cfg.epochs,
            batch_size=cfg.batch_size, test_fraction=cfg.test_fraction,
            aug_factor=cfg.aug_factor, seed=cfg.seed,
            checkpoint_dir=os.path.join(
                tempfile.gettempdir(), f"dbt_train_{args.kit}_{args.end}"
            ),
        )
        save_model(out, network, best_variables, metadata={
            "kit": args.kit, "end": args.end, "best_val": best,
            "trained_on": "synthetic-squiggle+real-kit-sequences",
            "reads_per_barcode": args.reads_per_barcode,
        })
        summary["window_val"] = best
        print(f"[train] saved {out} (val acc {best['accuracy']:.3f})",
              file=sys.stderr)

    summary["read_level"] = evaluate_read_level(
        out, args.kit, args.end, args.eval_reads_per_barcode,
        seed=args.seed + 999, scan_size=scan_size,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
