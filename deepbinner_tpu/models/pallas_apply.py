"""DemuxNet inference on the fused Pallas conv kernels.

A hand-scheduled mirror of :class:`deepbinner_tpu.models.network.DemuxNet`
(inference only): every ConvBNRelu unit runs as one
:func:`deepbinner_tpu.ops.conv_pallas.fused_conv1d_bn_relu` call with the
BatchNorm affine folded in; pools/GAP/dense stay in XLA (they are trivially
memory-bound and XLA already emits them fused).

Numerical parity with ``model.apply`` is pinned by tests/test_pallas.py; the
classify pipeline switches between the two via ``ClassifyConfig.use_pallas``
(flax path remains the always-available fallback, SURVEY.md §7 build step 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepbinner_tpu.models.network import NetworkConfig
from deepbinner_tpu.ops.conv_pallas import fold_batchnorm, fused_conv1d_bn_relu


def _unit(params, stats, scope: str, x: jnp.ndarray, dilation: int = 1,
          interpret=None) -> jnp.ndarray:
    """One ConvBNRelu unit from the flax variable tree, as a Pallas call."""
    node_p, node_s = params, stats
    for part in scope.split("/"):
        node_p = node_p[part]
        node_s = node_s[part]
    kernel = node_p["conv"]["kernel"]
    scale, bias = fold_batchnorm(
        node_p["bn"]["scale"], node_p["bn"]["bias"],
        node_s["bn"]["mean"], node_s["bn"]["var"],
    )
    return fused_conv1d_bn_relu(
        x, kernel, scale, bias, dilation=dilation, interpret=interpret
    )


def _pool2(x: jnp.ndarray) -> jnp.ndarray:
    n, length, c = x.shape
    return x[:, : length - length % 2, :].reshape(n, length // 2, 2, c).max(axis=2)


def _pool3_same(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 1), (1, 1, 1), "SAME"
    )


def apply_inference_pallas(
    config: NetworkConfig,
    variables: dict,
    windows: jnp.ndarray,
    interpret=None,
) -> jnp.ndarray:
    """Softmax probabilities for ``(N, L)`` or ``(N, L, 1)`` signal windows."""
    params = variables["params"]
    stats = variables["batch_stats"]
    x = windows.astype(jnp.float32)
    if x.ndim == 2:
        x = x[:, :, None]

    x = _unit(params, stats, "stem1", x, interpret=interpret)
    x = _unit(params, stats, "stem2", x, interpret=interpret)
    x = _pool2(x)

    for i in range(len(config.block_features)):
        x = _unit(params, stats, f"block{i}_conv1", x, interpret=interpret)
        x = _unit(params, stats, f"block{i}_conv2", x, interpret=interpret)
        x = _pool2(x)

    for i in range(len(config.inception_features)):
        scope = f"inception{i}"
        b1 = _unit(params, stats, f"{scope}/branch1x1", x, interpret=interpret)
        b3 = _unit(params, stats, f"{scope}/branch3", x, interpret=interpret)
        bd = _unit(params, stats, f"{scope}/branch_dilated", x,
                   dilation=2 ** (i + 1), interpret=interpret)
        bp = _unit(params, stats, f"{scope}/branch_pool", _pool3_same(x),
                   interpret=interpret)
        x = jnp.concatenate([b1, b3, bd, bp], axis=-1)
        x = _pool2(x)

    x = _unit(params, stats, "head_conv", x, interpret=interpret)
    x = jnp.mean(x, axis=1)  # global average pool

    dense = params["classifier"]
    logits = x @ dense["kernel"] + dense["bias"]
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
