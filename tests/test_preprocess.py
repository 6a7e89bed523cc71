"""Unit tests for in-graph trim/normalise/window preprocessing."""

import jax.numpy as jnp
import numpy as np

from deepbinner_tpu.ops.preprocess import (
    PreprocessConfig,
    extract_scan_region,
    find_signal_start,
    normalise,
    preprocess_batch,
    window_scan_region,
)

SMALL = PreprocessConfig(
    scan_size=768, window=256, stride=128, trim_scan=512,
    trim_window=64, trim_stride=16,
)


def test_normalise_zscore():
    x = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    out = normalise(x)
    np.testing.assert_allclose(np.mean(out), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.std(out), 1.0, atol=1e-4)


def test_normalise_constant_signal_finite():
    out = normalise(jnp.full((1, 128), 5.0))
    assert np.all(np.isfinite(np.asarray(out)))


def test_find_signal_start_detects_open_pore(rng):
    # 300 samples of flat open-pore current, then noisy strand signal.
    flat = np.full(300, 550.0) + rng.normal(0, 1.0, 300)
    real = 450 + 60 * rng.normal(size=212)
    region = jnp.asarray(np.concatenate([flat, real])[None, :])
    start = np.asarray(find_signal_start(region, jnp.asarray([512]), SMALL))[0]
    assert 200 <= start <= 310  # lands at/near the transition


def test_find_signal_start_no_trim_when_all_signal(rng):
    region = jnp.asarray(450 + 60 * rng.normal(size=(1, 512)))
    start = np.asarray(find_signal_start(region, jnp.asarray([512]), SMALL))[0]
    assert start <= 32  # uniform signal: nothing to trim


def test_short_read_pad_boundary_not_trimmed(rng):
    """The signal→zero-pad step must never read as a 'signal start'.

    A clean short read (window < length < trim_scan) of pure strand signal
    has nothing to trim; the padding boundary's variance spike previously
    trimmed genuine leading samples (round-2 review finding, verified).
    """
    cfg = SMALL
    length = 400  # < trim_scan=512
    sig = np.zeros((1, cfg.buffer_size), np.float32)
    sig[0, :length] = 450 + 60 * rng.normal(size=length)
    region, valid = extract_scan_region(
        jnp.asarray(sig), jnp.asarray([length]), cfg
    )
    region, valid = np.asarray(region), np.asarray(valid)
    assert valid[0] == length  # trim_pos == 0: nothing was cut
    np.testing.assert_array_equal(region[0, :length], sig[0, :length])

    # And a short read WITH a real open-pore stall still gets trimmed.
    sig2 = np.zeros((1, cfg.buffer_size), np.float32)
    sig2[0, :150] = 550 + 1.0 * rng.normal(size=150)       # flat stall
    sig2[0, 150:420] = 450 + 60 * rng.normal(size=270)     # strand signal
    _region2, valid2 = extract_scan_region(
        jnp.asarray(sig2), jnp.asarray([420]), cfg
    )
    trim2 = 420 - int(np.asarray(valid2)[0])
    assert 96 <= trim2 <= 160  # lands at/near the stall→strand transition


def test_extract_scan_region_shapes(rng):
    cfg = SMALL
    batch = 3
    sig = jnp.asarray(rng.normal(500, 50, (batch, cfg.buffer_size)))
    lengths = jnp.asarray([cfg.buffer_size, 600, 100], jnp.int32)
    region, valid = extract_scan_region(sig, lengths, cfg)
    assert region.shape == (batch, cfg.scan_size)
    assert valid.shape == (batch,)
    v = np.asarray(valid)
    assert v[0] <= cfg.scan_size and v[2] <= 100


def test_window_mask_short_reads(rng):
    cfg = SMALL
    region = jnp.asarray(rng.normal(size=(2, cfg.scan_size)))
    valid = jnp.asarray([cfg.scan_size, 100], jnp.int32)  # read 1 < one window
    windows, mask = window_scan_region(region, valid, cfg)
    assert windows.shape == (2, cfg.num_windows, cfg.window)
    mask = np.asarray(mask)
    assert mask[0].all()
    assert not mask[1].any()  # too short for even one window


def test_windows_are_normalised(rng):
    cfg = SMALL
    sig = jnp.asarray(rng.normal(500, 50, (1, cfg.buffer_size)))
    lengths = jnp.asarray([cfg.buffer_size], jnp.int32)
    windows, mask = preprocess_batch(sig, lengths, cfg)
    w = np.asarray(windows)[0, 0]
    np.testing.assert_allclose(w.mean(), 0.0, atol=1e-4)
    np.testing.assert_allclose(w.std(), 1.0, atol=1e-3)


def test_padding_does_not_leak_into_region(rng):
    """Garbage beyond `length` must not affect the extracted region."""
    cfg = SMALL
    base = rng.normal(500, 50, (1, cfg.buffer_size))
    length = 700
    a = base.copy()
    b = base.copy()
    b[0, length:] = 99999.0  # different garbage in the padding
    la = jnp.asarray([length], jnp.int32)
    ra, va = extract_scan_region(jnp.asarray(a), la, cfg)
    rb, vb = extract_scan_region(jnp.asarray(b), la, cfg)
    valid = int(np.asarray(va)[0])
    np.testing.assert_array_equal(
        np.asarray(ra)[0, :valid], np.asarray(rb)[0, :valid]
    )
