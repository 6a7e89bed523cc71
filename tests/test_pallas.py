"""Pallas kernel parity vs lax reference (interpret mode on CPU).

SURVEY.md §4 item 3: kernel tests against lax.conv_general_dilated on random
inputs with tight tolerances gate the Pallas swap-in.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepbinner_tpu.models.network import NetworkConfig, init_params
from deepbinner_tpu.models.pallas_apply import (
    apply_inference_pallas,
    apply_inference_pallas_fused,
)
from deepbinner_tpu.ops.conv_pallas import (
    conv1d_bn_relu_reference,
    fold_batchnorm,
    fused_conv1d_bn_relu,
)

TINY_NET = NetworkConfig(
    input_length=256, stem_features=8, block_features=(8,),
    inception_features=(16,), head_features=16,
)


@pytest.mark.parametrize("taps,dilation,c_in,c_out", [
    (3, 1, 8, 16),
    (1, 1, 16, 8),
    (3, 2, 8, 8),
    (3, 4, 16, 32),
    (5, 1, 8, 8),
])
def test_conv_kernel_parity(rng, taps, dilation, c_in, c_out):
    n, length = 5, 128  # deliberately not a tile multiple of 8
    x = jnp.asarray(rng.normal(size=(n, length, c_in)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(taps, c_in, c_out)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(c_out,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c_out,)), jnp.float32)

    got = fused_conv1d_bn_relu(
        x, kernel, scale, bias, dilation=dilation, interpret=True,
        mxu_dtype=jnp.float32,
    )
    want = conv1d_bn_relu_reference(x, kernel, scale, bias, dilation=dilation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv_kernel_no_relu(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 8)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 8, 8)), jnp.float32)
    ones = jnp.ones((8,), jnp.float32)
    zeros = jnp.zeros((8,), jnp.float32)
    got = fused_conv1d_bn_relu(x, kernel, ones, zeros, relu=False,
                               interpret=True, mxu_dtype=jnp.float32)
    assert float(np.asarray(got).min()) < 0  # negatives survive without relu


def test_fold_batchnorm():
    gamma = jnp.asarray([2.0]); beta = jnp.asarray([1.0])
    mean = jnp.asarray([3.0]); var = jnp.asarray([4.0])
    scale, bias = fold_batchnorm(gamma, beta, mean, var, eps=0.0)
    np.testing.assert_allclose(float(scale[0]), 1.0)
    np.testing.assert_allclose(float(bias[0]), -2.0)


@pytest.mark.parametrize("pool", [False, True])
def test_conv_kernel_fused_pool_parity(rng, pool):
    """The in-epilogue maxpool2 matches a separate pool after the oracle."""
    x = jnp.asarray(rng.normal(size=(3, 64, 8)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 8, 16)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    got = fused_conv1d_bn_relu(x, kernel, scale, bias, pool=pool,
                               interpret=True, mxu_dtype=jnp.float32)
    want = conv1d_bn_relu_reference(x, kernel, scale, bias, pool=pool)
    assert got.shape == ((3, 32, 16) if pool else (3, 64, 16))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_full_network_parity(rng):
    """Whole DemuxNet: Pallas path == flax path on the same weights."""
    model, variables = init_params(jax.random.PRNGKey(1), TINY_NET)
    x = jnp.asarray(rng.normal(size=(4, TINY_NET.input_length)), jnp.float32)
    want = np.asarray(
        jax.nn.softmax(model.apply(variables, x[:, :, None], train=False), -1)
    )
    got = np.asarray(
        apply_inference_pallas(TINY_NET, variables, x, interpret=True, mxu_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_full_network_megakernel_parity(rng):
    """Single-kernel conv trunk == flax path, including a non-tile batch."""
    model, variables = init_params(jax.random.PRNGKey(2), TINY_NET)
    x = jnp.asarray(rng.normal(size=(7, TINY_NET.input_length)), jnp.float32)
    want = np.asarray(
        jax.nn.softmax(model.apply(variables, x[:, :, None], train=False), -1)
    )
    got = np.asarray(
        apply_inference_pallas_fused(TINY_NET, variables, x, interpret=True, mxu_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_full_network_split_trunk_parity(rng):
    """Two-stage trunk ({stem2+blocks} / {inceptions+head+GAP}) == flax,
    including a batch that tiles neither stage evenly (round-4 tile sweep:
    the split lets deep layers run larger matmul tiles than the single
    megakernel's longest-layer VMEM cap allows)."""
    from deepbinner_tpu.models.pallas_apply import apply_inference_pallas_split

    net = NetworkConfig(input_length=512, stem_features=16,
                        block_features=(16, 32), inception_features=(32, 32),
                        head_features=32)
    model, variables = init_params(jax.random.PRNGKey(5), net)
    x = jnp.asarray(rng.normal(size=(11, net.input_length)), jnp.float32)
    want = np.asarray(
        jax.nn.softmax(model.apply(variables, x[:, :, None], train=False), -1)
    )
    got = np.asarray(
        apply_inference_pallas_split(net, variables, x, interpret=True,
                                     tile_early=4, tile_late=8,
                                     mxu_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_full_network_split3_trunk_parity(rng):
    """Three-kernel trunk ({stem2+blocks} / {inc0} / {inc1+head+GAP}) ==
    flax, including a batch that tiles no stage evenly.  The first
    inception concat spills to HBM so the deep stages can run tiles the
    two-stage split OOM'd at on the chip (BENCH_PALLAS_r04.jsonl)."""
    from deepbinner_tpu.models.pallas_apply import apply_inference_pallas_split3

    net = NetworkConfig(input_length=512, stem_features=16,
                        block_features=(16, 32), inception_features=(32, 32),
                        head_features=32)
    model, variables = init_params(jax.random.PRNGKey(6), net)
    x = jnp.asarray(rng.normal(size=(11, net.input_length)), jnp.float32)
    want = np.asarray(
        jax.nn.softmax(model.apply(variables, x[:, :, None], train=False), -1)
    )
    got = np.asarray(
        apply_inference_pallas_split3(net, variables, x, interpret=True,
                                      tile_early=4, tile_inc0=8, tile_late1=8,
                                      mxu_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_full_network_hybrid_parity(rng):
    """Heterogeneous trunk (Pallas only at its measured-win geometries,
    XLA elsewhere) == flax on the flagship-shaped config."""
    from deepbinner_tpu.models.pallas_apply import (
        apply_inference_pallas_hybrid,
    )

    net = NetworkConfig(input_length=512, stem_features=16,
                        block_features=(16, 32), inception_features=(32, 32),
                        head_features=32)
    model, variables = init_params(jax.random.PRNGKey(7), net)
    x = jnp.asarray(rng.normal(size=(9, net.input_length)), jnp.float32)
    want = np.asarray(
        jax.nn.softmax(model.apply(variables, x[:, :, None], train=False), -1)
    )
    got = np.asarray(
        apply_inference_pallas_hybrid(net, variables, x, interpret=True,
                                      mxu_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_bf16_mxu_mode_calls_identical(rng):
    """Optional bf16-multiplicand mode (f32 accumulate): probabilities
    drift ≤4e-3 from the f32 flax oracle and argmax calls never move — the
    decision is the parity target (SURVEY.md §7 risk 1).  Kept for
    re-evaluation on non-tunnelled hosts; default stays f32 (on the v5e
    chip Mosaic folded the cast — no speed or numeric change)."""
    model, variables = init_params(jax.random.PRNGKey(4), TINY_NET)
    x = jnp.asarray(rng.normal(size=(8, TINY_NET.input_length)), jnp.float32)
    want = np.asarray(
        jax.nn.softmax(model.apply(variables, x[:, :, None], train=False), -1)
    )
    for apply_fn in (apply_inference_pallas, apply_inference_pallas_fused):
        got = np.asarray(apply_fn(TINY_NET, variables, x, interpret=True,
                                  mxu_dtype=jnp.bfloat16))
        np.testing.assert_allclose(got, want, atol=4e-3)
        np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_megakernel_multi_block_config(rng):
    """Deeper config (2 blocks, 2 inceptions — the flagship shape) stays
    exact through the megakernel's static unrolling."""
    net = NetworkConfig(input_length=512, stem_features=16,
                        block_features=(16, 32), inception_features=(32, 32),
                        head_features=32)
    model, variables = init_params(jax.random.PRNGKey(3), net)
    x = jnp.asarray(rng.normal(size=(3, net.input_length)), jnp.float32)
    want = np.asarray(
        jax.nn.softmax(model.apply(variables, x[:, :, None], train=False), -1)
    )
    got = np.asarray(
        apply_inference_pallas_fused(net, variables, x, interpret=True, mxu_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
