"""Tests for the fused classify program (single and dual model)."""

import jax
import jax.numpy as jnp
import numpy as np

from deepbinner_tpu import NUM_CLASSES
from deepbinner_tpu.models.network import NetworkConfig, init_params
from deepbinner_tpu.ops.calling import CallingConfig
from deepbinner_tpu.ops.preprocess import PreprocessConfig
from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram

TINY_NET = NetworkConfig(
    input_length=256,
    stem_features=8,
    block_features=(8,),
    inception_features=(16,),
    head_features=16,
)
TINY_PRE = PreprocessConfig(
    scan_size=768, window=256, stride=128, trim_scan=512,
    trim_window=64, trim_stride=16,
)


def _program(dual=False):
    model, variables = init_params(jax.random.PRNGKey(0), TINY_NET)
    end_vars = None
    if dual:
        _, end_vars = init_params(jax.random.PRNGKey(1), TINY_NET)
    cfg = ClassifyConfig(
        preprocess=TINY_PRE,
        calling=CallingConfig(min_score=0.0, score_diff=0.0),
        dual_model=dual,
    )
    return ClassifyProgram(model, cfg, variables, end_vars)


def _batch(rng, batch=4):
    buf = TINY_PRE.buffer_size
    sig = jnp.asarray(rng.normal(500, 50, (batch, buf)), jnp.float32)
    lengths = jnp.full((batch,), buf, jnp.int32)
    return sig, lengths


def test_single_model_output_shapes(rng):
    program = _program()
    sig, lengths = _batch(rng)
    out = program(sig, lengths)
    assert out.calls.shape == (4,)
    assert out.start_probs.shape == (4, NUM_CLASSES)
    scores = np.asarray(out.start_probs)
    # max-combine: per-class best-window scores in [0, 1] (not a distribution)
    assert scores.min() >= 0.0 and scores.max() <= 1.0
    np.testing.assert_array_equal(np.asarray(out.calls), np.asarray(out.start_calls))


def test_short_read_gets_none(rng):
    program = _program()
    sig, lengths = _batch(rng, batch=2)
    lengths = jnp.asarray([TINY_PRE.buffer_size, 100], jnp.int32)
    out = program(sig, lengths)
    assert int(np.asarray(out.calls)[1]) == 0  # < one window → none


def test_dual_model_runs(rng):
    program = _program(dual=True)
    sig, lengths = _batch(rng, batch=2)
    out = program(sig, lengths, sig, lengths)
    assert out.calls.shape == (2,)
    assert np.asarray(out.end_probs).sum() > 0


def test_deterministic_across_calls(rng):
    program = _program()
    buf = TINY_PRE.buffer_size
    raw = rng.normal(500, 50, (4, buf)).astype(np.float32)
    lengths = np.full((4,), buf, np.int32)
    out1 = np.asarray(program(jnp.asarray(raw), jnp.asarray(lengths)).start_probs)
    out2 = np.asarray(program(jnp.asarray(raw), jnp.asarray(lengths)).start_probs)
    np.testing.assert_array_equal(out1, out2)


def test_warm_up_compiles(rng):
    program = _program()
    program.warm_up(batch_size=2)
