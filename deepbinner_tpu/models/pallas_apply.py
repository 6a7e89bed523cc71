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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepbinner_tpu.models.network import NetworkConfig
from deepbinner_tpu.ops.conv_pallas import fold_batchnorm, fused_conv1d_bn_relu


def _unit_weights(params, stats, scope: str):
    """(kernel, folded scale, folded bias) for one ConvBNRelu scope."""
    node_p, node_s = params, stats
    for part in scope.split("/"):
        node_p = node_p[part]
        node_s = node_s[part]
    kernel = node_p["conv"]["kernel"]
    scale, bias = fold_batchnorm(
        node_p["bn"]["scale"], node_p["bn"]["bias"],
        node_s["bn"]["mean"], node_s["bn"]["var"],
    )
    return kernel, scale, bias


def _unit(params, stats, scope: str, x: jnp.ndarray, dilation: int = 1,
          pool: bool = False, interpret=None,
          mxu_dtype=jnp.float32) -> jnp.ndarray:
    """One ConvBNRelu unit from the flax variable tree, as a Pallas call."""
    kernel, scale, bias = _unit_weights(params, stats, scope)
    return fused_conv1d_bn_relu(
        x, kernel, scale, bias, dilation=dilation, pool=pool,
        interpret=interpret, mxu_dtype=mxu_dtype,
    )


def _pool2(x: jnp.ndarray) -> jnp.ndarray:
    n, length, c = x.shape
    return x[:, : length - length % 2, :].reshape(n, length // 2, 2, c).max(axis=2)


def _pool3_same(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 1), (1, 1, 1), "SAME"
    )


def _mega_kernel(*refs, config: NetworkConfig, tile_n: int, mxu_dtype,
                 segment: str = "all"):
    """The conv trunk (or a segment of it) on ONE VMEM tile.

    Ref order: x, then (w, scale, bias) per unit in
    :func:`_mega_unit_scopes(config, segment)` order, then the output.
    Every activation inside the segment lives its whole life in VMEM —
    zero inter-layer HBM traffic (round-2 VERDICT item 2).

    Segments (round-4 tile sweep — the VMEM row budget is set by the
    LONGEST layer in the kernel, so splitting lets the short deep layers
    run at a much larger batch tile than L=1024 stem2 allows):
      - "all":   stem2 → head_conv → GAP (the round-3 megakernel);
      - "early": stem2 + blocks (ends at the last block pool);
      - "late":  inception stack → head_conv → GAP.
    """
    from deepbinner_tpu.ops.conv_pallas import _conv_tile

    x_ref, *rest = refs
    out_ref = rest[-1]
    weight_refs = rest[:-1]

    def unit(x, index, dilation=1, pool=False):
        w, scale, bias = (weight_refs[3 * index][:],
                          weight_refs[3 * index + 1][0],
                          weight_refs[3 * index + 2][0])
        return _conv_tile(x, w, scale, bias, taps=w.shape[0],
                          dilation=dilation, relu=True, pool=pool,
                          mxu_dtype=mxu_dtype)

    def pool3_same(x):
        padded = jnp.pad(x, ((0, 0), (1, 1), (0, 0)),
                         constant_values=-jnp.inf)
        length = x.shape[1]
        return jnp.maximum(
            jnp.maximum(padded[:, 0:length, :], padded[:, 1 : length + 1, :]),
            padded[:, 2 : length + 2, :],
        )

    x = x_ref[:]
    index = 0
    if segment in ("all", "early"):
        x = unit(x, index, pool=True)           # stem2
        index += 1
        for _feats in config.block_features:
            x = unit(x, index)
            x = unit(x, index + 1, pool=True)
            index += 2
    if segment in ("all", "late"):
        for i, _feats in enumerate(config.inception_features):
            b1 = unit(x, index, pool=True)
            b3 = unit(x, index + 1, pool=True)
            bd = unit(x, index + 2, dilation=2 ** (i + 1), pool=True)
            bp = unit(pool3_same(x), index + 3, pool=True)
            index += 4
            x = jnp.concatenate([b1, b3, bd, bp], axis=-1)
        x = unit(x, index)                      # head_conv
        out_ref[:] = jnp.mean(x, axis=1)        # global average pool
    else:
        out_ref[:] = x


def _mega_unit_scopes(config: NetworkConfig, segment: str = "all"):
    """Unit scopes in megakernel execution order (stem1 excluded — it runs
    in XLA: its C_in=1 'matmul' is MXU-useless and lane-pads 128×)."""
    scopes = []
    if segment in ("all", "early"):
        scopes.append(("stem2", 1))
        for i in range(len(config.block_features)):
            scopes += [(f"block{i}_conv1", 1), (f"block{i}_conv2", 1)]
    if segment in ("all", "late"):
        for i in range(len(config.inception_features)):
            scope = f"inception{i}"
            scopes += [(f"{scope}/branch1x1", 1), (f"{scope}/branch3", 1),
                       (f"{scope}/branch_dilated", 2 ** (i + 1)),
                       (f"{scope}/branch_pool", 1)]
        scopes.append(("head_conv", 1))
    return scopes


def _run_segment(config, params, stats, x, segment: str, tile_n: int,
                 interpret, mxu_dtype):
    """One pallas_call covering a trunk segment; x: (N, L, C) f32."""
    n, length, c_in0 = x.shape
    tile_n = min(tile_n, max(n, 1))

    weight_args = []
    in_specs = [pl.BlockSpec((tile_n, length, c_in0), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    for scope, _dilation in _mega_unit_scopes(config, segment):
        kernel, scale, bias = _unit_weights(params, stats, scope)
        taps, c_in, c_out = kernel.shape
        weight_args += [
            kernel.astype(jnp.float32),
            scale.reshape(1, c_out).astype(jnp.float32),
            bias.reshape(1, c_out).astype(jnp.float32),
        ]
        in_specs += [
            pl.BlockSpec((taps, c_in, c_out), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    n_pad = -(-n // tile_n) * tile_n
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0), (0, 0)))

    if segment == "early":
        # Ends after the last block pool: L halves once per pool.
        pools = 1 + len(config.block_features)
        out_len = length // (2 ** pools)
        c_out = (config.block_features[-1] if config.block_features
                 else config.stem_features)
        out_spec = pl.BlockSpec((tile_n, out_len, c_out),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_pad, out_len, c_out), jnp.float32)
    else:  # "all" / "late" end at the GAP
        feats = config.head_features
        out_spec = pl.BlockSpec((tile_n, feats), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_pad, feats), jnp.float32)

    kernel_fn = functools.partial(_mega_kernel, config=config, tile_n=tile_n,
                                  mxu_dtype=mxu_dtype, segment=segment)
    return pl.pallas_call(
        kernel_fn,
        grid=(n_pad // tile_n,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(x, *weight_args)[:n]


def apply_inference_pallas_fused(
    config: NetworkConfig,
    variables: dict,
    windows: jnp.ndarray,
    tile_n: int = 8,  # the (tile_n, feats) GAP output block needs ≥8 sublanes
    interpret=None,
    mxu_dtype=jnp.float32,
) -> jnp.ndarray:
    """Softmax probabilities via the single-kernel conv trunk.

    stem1 (C_in=1) and the 13-class dense head run in XLA; everything in
    between — 13 ConvBNRelu units, pools, inception concats, GAP — is ONE
    ``pallas_call``: activations never touch HBM between layers.
    ``mxu_dtype``: see :func:`deepbinner_tpu.ops.conv_pallas._conv_tile`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    params = variables["params"]
    stats = variables["batch_stats"]
    x = windows.astype(jnp.float32)
    if x.ndim == 2:
        x = x[:, :, None]

    x = _unit(params, stats, "stem1", x, interpret=interpret)  # XLA fallback
    pooled = _run_segment(config, params, stats, x, "all", tile_n,
                          interpret, mxu_dtype)
    dense = params["classifier"]
    logits = pooled @ dense["kernel"] + dense["bias"]
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def apply_inference_pallas_split(
    config: NetworkConfig,
    variables: dict,
    windows: jnp.ndarray,
    tile_early: int = 4,
    tile_late: int = 32,
    interpret=None,
    mxu_dtype=jnp.float32,
) -> jnp.ndarray:
    """Two-kernel trunk: {stem2+blocks} then {inceptions+head+GAP}.

    The single megakernel's batch tile is capped by its LONGEST layer
    (L=1024 stem2 ⇒ tile_n·L ≤ VMEM rows ⇒ tile 8), which starves the MXU
    at the deep layers (L=32 ⇒ 256-row matmuls).  Splitting lets each
    stage pick its own tile: the early stage stays small, the late stage
    (L ≤ 128) runs 4-8× larger matmul tiles.  One extra HBM round-trip of
    the (N, L/8, C_block) activation is the price — the smallest
    inter-layer tensor in the trunk.  Measured A/B: scripts/pallas_sweep.py
    → BENCH_PALLAS_r04.jsonl.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    params = variables["params"]
    stats = variables["batch_stats"]
    x = windows.astype(jnp.float32)
    if x.ndim == 2:
        x = x[:, :, None]

    x = _unit(params, stats, "stem1", x, interpret=interpret)  # XLA fallback
    x = _run_segment(config, params, stats, x, "early", tile_early,
                     interpret, mxu_dtype)
    pooled = _run_segment(config, params, stats, x, "late", tile_late,
                          interpret, mxu_dtype)
    dense = params["classifier"]
    logits = pooled @ dense["kernel"] + dense["bias"]
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def apply_inference_pallas(
    config: NetworkConfig,
    variables: dict,
    windows: jnp.ndarray,
    interpret=None,
    mxu_dtype=jnp.float32,
) -> jnp.ndarray:
    """Softmax probabilities for ``(N, L)`` or ``(N, L, 1)`` signal windows."""
    params = variables["params"]
    stats = variables["batch_stats"]
    x = windows.astype(jnp.float32)
    if x.ndim == 2:
        x = x[:, :, None]

    kw = dict(interpret=interpret, mxu_dtype=mxu_dtype)
    x = _unit(params, stats, "stem1", x, **kw)
    x = _unit(params, stats, "stem2", x, pool=True, **kw)

    for i in range(len(config.block_features)):
        x = _unit(params, stats, f"block{i}_conv1", x, **kw)
        x = _unit(params, stats, f"block{i}_conv2", x, pool=True, **kw)

    for i in range(len(config.inception_features)):
        # The trailing 2× maxpool commutes with the channel concat, so each
        # branch pools inside its own kernel epilogue (half the HBM writes).
        scope = f"inception{i}"
        b1 = _unit(params, stats, f"{scope}/branch1x1", x, pool=True, **kw)
        b3 = _unit(params, stats, f"{scope}/branch3", x, pool=True, **kw)
        bd = _unit(params, stats, f"{scope}/branch_dilated", x,
                   dilation=2 ** (i + 1), pool=True, **kw)
        bp = _unit(params, stats, f"{scope}/branch_pool", _pool3_same(x),
                   pool=True, **kw)
        x = jnp.concatenate([b1, b3, bd, bp], axis=-1)

    x = _unit(params, stats, "head_conv", x, **kw)
    x = jnp.mean(x, axis=1)  # global average pool

    dense = params["classifier"]
    logits = x @ dense["kernel"] + dense["bias"]
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
