"""Shipped stock models: load + classify sanity on fresh simulated reads.

Guards the model artifacts in deepbinner_tpu/models/data/ — a broken or
stale checkpoint shows up as chance-level calls here.
"""

import os

import numpy as np
import pytest

from deepbinner_tpu.models.checkpoint import load_model
from deepbinner_tpu.ops.calling import CallingConfig
from deepbinner_tpu.ops.preprocess import PreprocessConfig
from deepbinner_tpu.runner.executor import classify_stream
from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram
from deepbinner_tpu.utils import simulate

DATA = os.path.join(os.path.dirname(__file__), "..", "deepbinner_tpu",
                    "models", "data")


def _classify_reads(model_file, kit, end, barcodes, seed):
    model, variables, net_cfg, meta = load_model(model_file)
    pre = PreprocessConfig(window=net_cfg.input_length,
                           stride=net_cfg.input_length // 2)
    cfg = ClassifyConfig(pre, CallingConfig(), dual_model=False)
    program = ClassifyProgram(model, cfg, variables)
    rng = np.random.default_rng(seed)
    reads, truth = [], {}
    for barcode in barcodes:
        read = simulate.simulate_read(kit, barcode, rng, genome_length=1200)
        signal = read.signal if end == "start" else read.signal[::-1].copy()
        reads.append((read.read_id, signal))
        truth[read.read_id] = barcode
    calls = {r.read_id: r.call
             for r in classify_stream(program, iter(reads), batch_size=8)}
    return calls, truth, meta


@pytest.mark.parametrize("name,kit,end", [
    ("EXP-NBD103_read_starts.dbt", "EXP-NBD103", "start"),
    ("EXP-NBD103_read_ends.dbt", "EXP-NBD103", "end"),
    ("SQK-RBK004_read_starts.dbt", "SQK-RBK004", "start"),
])
def test_stock_model_classifies(name, kit, end):
    path = os.path.join(DATA, name)
    assert os.path.exists(path), f"stock model missing: {name}"
    barcodes = [1, 4, 7, 11]
    calls, truth, meta = _classify_reads(path, kit, end, barcodes, seed=31)
    assert meta.get("kit") == kit
    correct = sum(1 for rid, t in truth.items() if calls[rid] == t)
    assert correct >= 3, f"{name}: only {correct}/4 correct ({calls})"
