"""Host-side pre-trim (reader workers) vs in-graph trim parity.

The classify CLI and bench default to host_trim: reader workers run the
open-pore trim (runner.hostbatch.pretrim_read, a numpy mirror of
ops.preprocess.find_signal_start) and ship only the scan region — 25%
fewer host→device bytes at the flagship 2048+6144 geometry, which is the
whole win on the transfer-bound TPU tunnel.  These tests pin that the two
modes are the SAME function: identical extracted regions, identical calls,
identical probabilities.

Reference parity: the reference trims on the host too
(``deepbinner/trim_signal.py`` feeding ``classify.py`` — SURVEY.md §2
items 2 & 9), so host_trim is in fact the reference-shaped split; the
in-graph path remains for --device_trim and training-free environments.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from deepbinner_tpu.models.network import NetworkConfig, init_params
from deepbinner_tpu.ops.calling import CallingConfig
from deepbinner_tpu.ops.preprocess import PreprocessConfig, extract_scan_region
from deepbinner_tpu.runner.executor import batch_spec_for, build_batch
from deepbinner_tpu.runner.hostbatch import TrimSpec, pretrim_read
from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram

PRE = PreprocessConfig(
    scan_size=768, window=256, stride=128, trim_scan=512,
    trim_window=64, trim_stride=16,
)
HOST_PRE = dataclasses.replace(PRE, host_trim=True)
TINY_NET = NetworkConfig(
    input_length=256,
    stem_features=8,
    block_features=(8,),
    inception_features=(16,),
    head_features=16,
)


def _trim_spec(cfg: PreprocessConfig) -> TrimSpec:
    return TrimSpec(
        trim_scan=cfg.trim_scan, trim_window=cfg.trim_window,
        trim_stride=cfg.trim_stride, trim_threshold=cfg.trim_threshold,
        window=cfg.window, scan_size=cfg.scan_size,
    )


def _reads(rng):
    """Reads covering the trim edge cases: open-pore prefixes of varied
    length, no-prefix reads, and lengths from sub-window to beyond the
    raw buffer."""
    reads = []
    for i, (flat, total) in enumerate([
        (300, 4000),   # classic: open-pore then strand, long read
        (0, 4000),     # nothing to trim
        (300, 700),    # shorter than trim_scan + scan_size
        (100, 400),    # shorter than trim_scan
        (0, 180),      # shorter than one window → none call
        (450, 900),    # trim lands near the clamp
        (300, 20000),  # longer than the raw buffer
        (0, 1300),
    ]):
        prefix = np.full(flat, 550.0) + rng.normal(0, 1.0, flat)
        strand = 450 + 60 * rng.normal(size=max(total - flat, 0))
        sig = np.concatenate([prefix, strand]).astype(np.int16)
        reads.append((f"r{i:02d}", sig))
    return reads


def test_pretrim_matches_device_extract_region(rng):
    """pretrim_read + zero-pad == extract_scan_region, sample for sample."""
    spec = _trim_spec(PRE)
    for read_id, sig in _reads(rng):
        # Device path: padded raw buffer through the in-graph trim.
        buf = np.zeros((1, PRE.buffer_size), np.int16)
        n = min(sig.size, PRE.buffer_size)
        buf[0, :n] = sig[:n]
        region_dev, valid_dev = extract_scan_region(
            jnp.asarray(buf), jnp.asarray([n], jnp.int32), PRE
        )
        # Host path: trim in numpy, pad to scan_size.
        trimmed = pretrim_read(sig, spec)
        host = np.zeros((PRE.scan_size,), np.float32)
        host[: trimmed.size] = trimmed.astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(region_dev)[0], host, err_msg=read_id
        )
        assert int(valid_dev[0]) == trimmed.size, read_id


def test_host_trim_program_matches_device_trim_program(rng):
    """Same model, same reads: host_trim and in-graph trim give identical
    calls and probabilities (the two modes are one function)."""
    model, variables = init_params(jax.random.PRNGKey(0), TINY_NET)
    calling = CallingConfig(min_score=0.0, score_diff=0.0)
    prog_dev = ClassifyProgram(
        model, ClassifyConfig(preprocess=PRE, calling=calling), variables
    )
    prog_host = ClassifyProgram(
        model, ClassifyConfig(preprocess=HOST_PRE, calling=calling), variables
    )
    reads = _reads(rng)
    _, sig_d, len_d, _, _ = build_batch(reads, PRE, len(reads), False)
    _, sig_h, len_h, _, _ = build_batch(reads, HOST_PRE, len(reads), False)
    assert sig_d.shape[1] == PRE.trim_scan + PRE.scan_size
    assert sig_h.shape[1] == PRE.scan_size
    out_d = prog_dev(sig_d, len_d)
    out_h = prog_host(sig_h, len_h)
    np.testing.assert_array_equal(np.asarray(out_d.calls),
                                  np.asarray(out_h.calls))
    np.testing.assert_allclose(np.asarray(out_d.start_probs),
                               np.asarray(out_h.start_probs),
                               rtol=0, atol=1e-6)


def test_host_trim_dual_end_buffers(rng):
    """Dual mode: the end buffer is the REVERSED tail, trimmed the same way
    under both modes."""
    reads = _reads(rng)
    _, _, _, end_d, endlen_d = build_batch(reads, PRE, len(reads), True)
    _, _, _, end_h, endlen_h = build_batch(reads, HOST_PRE, len(reads), True)
    spec = _trim_spec(PRE)
    for i, (read_id, sig) in enumerate(reads):
        trimmed = pretrim_read(sig[::-1], spec)
        assert endlen_h[i] == trimmed.size, read_id
        np.testing.assert_array_equal(end_h[i, : trimmed.size], trimmed,
                                      err_msg=read_id)
        # The untrimmed end buffer still starts with the reversed tail.
        n = int(endlen_d[i])
        np.testing.assert_array_equal(end_d[i, :n], sig[::-1][:n],
                                      err_msg=read_id)


def test_batch_spec_for_host_trim():
    spec = batch_spec_for(HOST_PRE, 8, False)
    assert spec.buffer_size == HOST_PRE.scan_size
    assert spec.trim is not None and spec.trim.raw_size == PRE.buffer_size
    plain = batch_spec_for(PRE, 8, False)
    assert plain.trim is None and plain.buffer_size == PRE.buffer_size
