"""int8 wire format: host-side z-score + σ/16 quantisation of the signal.

The classify pipeline's per-window z-score (ops.preprocess.window_scan_region
→ normalise) is invariant to any per-read affine transform, so quantising the
host-normalised signal changes the CNN input only by the ±1/32 σ rounding
noise — below the 0.02 σ Gaussian augmentation the stock models train under
(models/network.py noise_stddev).  These tests pin:

1. the quantiser itself (range, padding, zero-length rows);
2. the invariance argument numerically (per-window z-score of the
   dequantised wire ≈ per-window z-score of the raw signal);
3. end-to-end accuracy on the shipped stock model — the int8 path must meet
   the SAME CI floor as the int16 path (test_stock_models.py).

No reference analog: the reference ships f32 numpy into Keras on one host
(deepbinner/classify.py :: classify_fast5_files); a wire format only exists
because this rebuild streams batches over a host→device link.
"""

import dataclasses
import os

import numpy as np
import pytest

from deepbinner_tpu.ops.preprocess import PreprocessConfig
from deepbinner_tpu.runner.executor import batch_spec_for, build_batch
from deepbinner_tpu.runner.hostbatch import WIRE_SCALE, quantise_wire

DATA = os.path.join(os.path.dirname(__file__), "..", "deepbinner_tpu",
                    "models", "data")

PRE16 = PreprocessConfig(
    scan_size=768, window=256, stride=128, trim_scan=512,
    trim_window=64, trim_stride=16, host_trim=True,
)
PRE8 = dataclasses.replace(PRE16, wire="int8")


def test_quantise_wire_range_and_padding(rng):
    sig = np.zeros((3, 100), np.int16)
    sig[0, :80] = (450 + 60 * rng.normal(size=80)).astype(np.int16)
    sig[1, :100] = (450 + 60 * rng.normal(size=100)).astype(np.int16)
    # row 2: zero-length (an all-padding row, as in a partial final batch)
    lens = np.asarray([80, 100, 0])
    q = quantise_wire(sig, lens)
    assert q.dtype == np.int8
    assert np.all(q[0, 80:] == 0), "padding must stay exactly zero"
    assert np.all(q[2] == 0), "empty rows must stay exactly zero"
    assert np.abs(q).max() <= 127
    # A z-scored read at σ/16 resolution should use a healthy value range.
    assert np.abs(q[1]).max() >= WIRE_SCALE, "quantised range collapsed"


def test_quantise_wire_constant_signal():
    """A flat (zero-variance) read must not divide by zero or explode."""
    sig = np.full((1, 64), 500, np.int16)
    q = quantise_wire(sig, np.asarray([64]))
    assert np.all(q == 0)


def test_per_window_zscore_erases_quantisation_scale(rng):
    """The invariance the whole design rests on: z-scoring a window of the
    dequantised int8 signal ≈ z-scoring the raw window, to rounding noise."""
    raw = (450 + 60 * rng.normal(size=(4, 768))).astype(np.int16)
    lens = np.full((4,), 768)
    q = quantise_wire(raw, lens).astype(np.float32)

    def zscore(mat):
        mean = mat.mean(axis=-1, keepdims=True)
        std = mat.std(axis=-1, keepdims=True)
        return (mat - mean) / (std + 1e-8)

    for w0 in (0, 256, 512):
        win_raw = zscore(raw[:, w0:w0 + 256].astype(np.float32))
        win_q = zscore(q[:, w0:w0 + 256])
        # rounding step is 1/WIRE_SCALE of the read σ; after the window
        # z-score the residual stays within a few steps everywhere.
        assert np.abs(win_raw - win_q).max() < 4.0 / WIRE_SCALE


def test_build_batch_int8_geometry(rng):
    reads = [(f"r{i}", (450 + 60 * rng.normal(size=1500)).astype(np.int16))
             for i in range(5)]
    ids, sig, lens, end, end_len = build_batch(reads, PRE8, 8, True)
    assert sig.dtype == np.int8 and end.dtype == np.int8
    assert sig.shape == (8, PRE8.scan_size)
    # lengths are identical to the int16 path (trim runs before quantise)
    _, sig16, lens16, _, el16 = build_batch(reads, PRE16, 8, True)
    np.testing.assert_array_equal(lens, lens16)
    np.testing.assert_array_equal(end_len, el16)
    # and the quantised buffers are exactly the quantiser applied to int16
    np.testing.assert_array_equal(sig, quantise_wire(sig16, lens16))


def test_wire_int8_requires_host_trim():
    with pytest.raises(ValueError):
        batch_spec_for(
            dataclasses.replace(PRE8, host_trim=False), 8, False
        )


def test_stock_model_accuracy_floor_int8():
    """The int8 wire must meet the SAME CI accuracy floor as int16
    (test_stock_models.test_stock_model_accuracy_floor): ≥95% exact,
    zero wrong-barcode, on 40 fresh-seed simulated reads."""
    from deepbinner_tpu.models.checkpoint import load_model
    from deepbinner_tpu.ops.calling import CallingConfig
    from deepbinner_tpu.runner.executor import classify_stream
    from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram
    from deepbinner_tpu.utils import simulate

    path = os.path.join(DATA, "EXP-NBD103_read_starts.dbt")
    model, variables, net_cfg, _meta = load_model(path)
    pre = PreprocessConfig(window=net_cfg.input_length,
                           stride=net_cfg.input_length // 2,
                           host_trim=True, wire="int8")
    program = ClassifyProgram(
        model, ClassifyConfig(pre, CallingConfig(), dual_model=False),
        variables)
    rng = np.random.default_rng(977)  # same seed as the int16 floor test
    barcodes = [b for b in range(1, 13) for _ in range(3)] + [0] * 4
    reads, truth = [], {}
    for barcode in barcodes:
        read = simulate.simulate_read(
            "EXP-NBD103", barcode, rng, genome_length=1200)
        reads.append((read.read_id, read.signal))
        truth[read.read_id] = barcode
    calls = {r.read_id: r.call
             for r in classify_stream(program, iter(reads), batch_size=8)}
    wrong = [(rid, t, calls[rid]) for rid, t in truth.items()
             if calls[rid] not in (t, 0)]
    exact = sum(1 for rid, t in truth.items() if calls[rid] == t)
    assert not wrong, f"wrong-barcode calls on int8 wire: {wrong}"
    assert exact >= 38, f"int8 wire exact {exact}/40 < 95% floor"


def test_quantise_wire_high_dc_offset(rng):
    """f32 accumulation of s2/n - mean^2 cancels catastrophically when the
    DC offset dwarfs sigma (scale blows up, the read clips to +-127);
    stats must accumulate in f64."""
    sig = (20000 + 10 * rng.normal(size=(2, 6144))).astype(np.int16)
    lens = np.full((2,), 6144)
    q = quantise_wire(sig, lens)
    frac_clipped = (np.abs(q) >= 127).mean()
    assert frac_clipped < 0.01, f"{frac_clipped:.1%} of samples clipped"
    # and the quantised signal still correlates with the raw one
    x = sig[0].astype(np.float64)
    c = np.corrcoef(x - x.mean(), q[0].astype(np.float64))[0, 1]
    assert c > 0.99
