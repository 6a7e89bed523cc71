"""Unit tests for the DemuxNet model and .dbt checkpoint round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from deepbinner_tpu import NUM_CLASSES
from deepbinner_tpu.models.checkpoint import load_model, save_model
from deepbinner_tpu.models.network import (
    DemuxNet,
    NetworkConfig,
    apply_inference,
    count_params,
    init_params,
)

# Small config so CPU tests stay fast.
TINY = NetworkConfig(
    input_length=256,
    stem_features=8,
    block_features=(8,),
    inception_features=(16,),
    head_features=16,
)


def test_forward_shapes_and_softmax():
    model, variables = init_params(jax.random.PRNGKey(0), TINY)
    x = jnp.zeros((4, TINY.input_length), jnp.float32)
    probs = apply_inference(model, variables, x)
    assert probs.shape == (4, NUM_CLASSES)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


def test_train_mode_uses_noise_and_dropout():
    model, variables = init_params(jax.random.PRNGKey(0), TINY)
    x = jnp.ones((2, TINY.input_length, 1), jnp.float32)
    out1 = model.apply(
        variables, x, train=True,
        rngs={"noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )[0]
    out2 = model.apply(
        variables, x, train=True,
        rngs={"noise": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )[0]
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_inference_is_deterministic():
    model, variables = init_params(jax.random.PRNGKey(0), TINY)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, TINY.input_length)))
    p1 = np.asarray(apply_inference(model, variables, x.astype(jnp.float32)))
    p2 = np.asarray(apply_inference(model, variables, x.astype(jnp.float32)))
    np.testing.assert_array_equal(p1, p2)


def test_param_count_nonzero():
    _, variables = init_params(jax.random.PRNGKey(0), TINY)
    assert count_params(variables) > 1000


def test_checkpoint_roundtrip(tmp_path):
    model, variables = init_params(jax.random.PRNGKey(7), TINY)
    path = tmp_path / "model.dbt"
    save_model(path, TINY, variables, metadata={"kit": "EXP-NBD103", "end": "start"})
    model2, variables2, config2, meta = load_model(path)
    assert config2 == TINY
    assert meta["kit"] == "EXP-NBD103"
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, TINY.input_length)), jnp.float32
    )
    p1 = np.asarray(apply_inference(model, variables, x))
    p2 = np.asarray(apply_inference(model2, variables2, x))
    np.testing.assert_array_equal(p1, p2)
