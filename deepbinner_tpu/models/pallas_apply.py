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


def _segment_spec(config: NetworkConfig, segment: str):
    """(early, inc_lo, inc_hi, head) for a named trunk segment.

    The VMEM row budget of one pallas_call is set by its LONGEST layer,
    so named segments let callers split the trunk where it helps:
      - "all":   stem2 → head_conv → GAP (the round-3 megakernel);
      - "early": stem2 + blocks (ends at the last block pool);
      - "late":  inception stack → head_conv → GAP;
      - "inc0":  inception 0 only (round-5: spilling the first concat to
        HBM halves the late stage's VMEM footprint — the round-4
        tile_late ≥ 32 candidates OOM'd scoped VMEM by 0.19–2.8 MB,
        BENCH_PALLAS_r04.jsonl);
      - "late1": inceptions 1.. → head_conv → GAP.
    """
    n_inc = len(config.inception_features)
    return {
        "all": (True, 0, n_inc, True),
        "early": (True, 0, 0, False),
        "late": (False, 0, n_inc, True),
        "inc0": (False, 0, 1, False),
        "late1": (False, 1, n_inc, True),
    }[segment]


def _mega_kernel(*refs, config: NetworkConfig, tile_n: int, mxu_dtype,
                 segment: str = "all"):
    """The conv trunk (or a segment of it) on ONE VMEM tile.

    Ref order: x, then (w, scale, bias) per unit in
    :func:`_mega_unit_scopes(config, segment)` order, then the output.
    Every activation inside the segment lives its whole life in VMEM —
    zero inter-layer HBM traffic (round-2 VERDICT item 2).
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

    early, inc_lo, inc_hi, head = _segment_spec(config, segment)
    x = x_ref[:]
    index = 0
    if early:
        x = unit(x, index, pool=True)           # stem2
        index += 1
        for _feats in config.block_features:
            x = unit(x, index)
            x = unit(x, index + 1, pool=True)
            index += 2
    for i in range(inc_lo, inc_hi):
        b1 = unit(x, index, pool=True)
        b3 = unit(x, index + 1, pool=True)
        bd = unit(x, index + 2, dilation=2 ** (i + 1), pool=True)
        bp = unit(pool3_same(x), index + 3, pool=True)
        index += 4
        x = jnp.concatenate([b1, b3, bd, bp], axis=-1)
    if head:
        x = unit(x, index)                      # head_conv
        out_ref[:] = jnp.mean(x, axis=1)        # global average pool
    else:
        out_ref[:] = x


def _mega_unit_scopes(config: NetworkConfig, segment: str = "all"):
    """Unit scopes in megakernel execution order (stem1 excluded — it runs
    in XLA: its C_in=1 'matmul' is MXU-useless and lane-pads 128×)."""
    early, inc_lo, inc_hi, head = _segment_spec(config, segment)
    scopes = []
    if early:
        scopes.append(("stem2", 1))
        for i in range(len(config.block_features)):
            scopes += [(f"block{i}_conv1", 1), (f"block{i}_conv2", 1)]
    for i in range(inc_lo, inc_hi):
        scope = f"inception{i}"
        scopes += [(f"{scope}/branch1x1", 1), (f"{scope}/branch3", 1),
                   (f"{scope}/branch_dilated", 2 ** (i + 1)),
                   (f"{scope}/branch_pool", 1)]
    if head:
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

    early, inc_lo, inc_hi, head = _segment_spec(config, segment)
    if head:  # "all" / "late" / "late1" end at the GAP
        feats = config.head_features
        out_spec = pl.BlockSpec((tile_n, feats), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_pad, feats), jnp.float32)
    else:
        # Headless segments end on a 3D activation: L halves once per
        # fused pool (stem2 + one per block, + one per inception run).
        pools = (1 + len(config.block_features) if early else 0) \
            + (inc_hi - inc_lo)
        out_len = length // (2 ** pools)
        if inc_hi > inc_lo:
            c_out = config.inception_features[inc_hi - 1]
        else:
            c_out = (config.block_features[-1] if config.block_features
                     else config.stem_features)
        out_spec = pl.BlockSpec((tile_n, out_len, c_out),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_pad, out_len, c_out), jnp.float32)

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


def apply_inference_pallas_split3(
    config: NetworkConfig,
    variables: dict,
    windows: jnp.ndarray,
    tile_early: int = 4,
    tile_inc0: int = 32,
    tile_late1: int = 64,
    interpret=None,
    mxu_dtype=jnp.float32,
) -> jnp.ndarray:
    """Three-kernel trunk: {stem2+blocks} / {inception 0} / {inc 1+head+GAP}.

    Round-4's two-stage split could not raise tile_late past ~24: the late
    kernel holds BOTH inception stages' branches at once and OOM'd scoped
    VMEM by 0.19–2.8 MB at tile 32 (BENCH_PALLAS_r04.jsonl).  Spilling the
    first inception's concat to HBM (an (N, L/16, C_inc) tensor — small)
    halves each late kernel's VMEM footprint, so the deep layers can run
    the 32–64-row tiles where the unit sweep measured Pallas ahead.
    Measured A/B: scripts/pallas_sweep.py → BENCH_PALLAS_r05.jsonl.
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
    x = _run_segment(config, params, stats, x, "inc0", tile_inc0,
                     interpret, mxu_dtype)
    pooled = _run_segment(config, params, stats, x, "late1", tile_late1,
                          interpret, mxu_dtype)
    dense = params["classifier"]
    logits = pooled @ dense["kernel"] + dense["bias"]
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


# Units where the round-4 per-geometry sweep measured the fused Pallas
# kernel AHEAD of XLA's conv emitter on the flagship shapes
# (BENCH_PALLAS_r04.jsonl): block0_conv2 1.19×, block1_conv2 1.44×,
# head_conv 1.62×.  Everywhere else XLA wins — the hybrid trunk uses
# Pallas exactly where it measured faster.  Values: fused_conv1d_bn_relu
# tile kwargs from the winning sweep rows.
HYBRID_PALLAS_UNITS = {
    "block0_conv2": dict(tile_n=16, max_rows=8192),
    "block1_conv2": dict(tile_n=32, max_rows=8192),
    "head_conv": dict(tile_n=16, max_rows=4096),
}


def apply_inference_pallas_hybrid(
    config: NetworkConfig,
    variables: dict,
    windows: jnp.ndarray,
    interpret=None,
    mxu_dtype=jnp.float32,
    pallas_units=None,
) -> jnp.ndarray:
    """Heterogeneous trunk: Pallas only where the unit sweep measured a win.

    Identical layer math to :func:`apply_inference_pallas`, but each
    ConvBNRelu unit picks its measured-faster backend: the fused Pallas
    kernel for the scopes in ``pallas_units`` (default
    :data:`HYBRID_PALLAS_UNITS`), XLA's conv emitter elsewhere.  This is
    the round-4 verdict's missing candidate: the all-Pallas trunks lose
    to XLA 2.2× overall, yet Pallas wins 1.19–1.62× at three specific
    geometries — the hybrid keeps exactly those.
    """
    from deepbinner_tpu.ops.conv_pallas import conv1d_bn_relu_reference

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if pallas_units is None:
        pallas_units = HYBRID_PALLAS_UNITS
    params = variables["params"]
    stats = variables["batch_stats"]
    x = windows.astype(jnp.float32)
    if x.ndim == 2:
        x = x[:, :, None]

    def unit(scope, x, dilation=1, pool=False):
        kernel, scale, bias = _unit_weights(params, stats, scope)
        tile = pallas_units.get(scope.split("/")[-1],
                                pallas_units.get(scope))
        if tile is None:
            return conv1d_bn_relu_reference(x, kernel, scale, bias,
                                            dilation=dilation, relu=True,
                                            pool=pool)
        return fused_conv1d_bn_relu(x, kernel, scale, bias,
                                    dilation=dilation, pool=pool,
                                    interpret=interpret,
                                    mxu_dtype=mxu_dtype, **tile)

    x = unit("stem1", x)
    x = unit("stem2", x, pool=True)
    for i in range(len(config.block_features)):
        x = unit(f"block{i}_conv1", x)
        x = unit(f"block{i}_conv2", x, pool=True)
    for i in range(len(config.inception_features)):
        scope = f"inception{i}"
        b1 = unit(f"{scope}/branch1x1", x, pool=True)
        b3 = unit(f"{scope}/branch3", x, pool=True)
        bd = unit(f"{scope}/branch_dilated", x, dilation=2 ** (i + 1),
                  pool=True)
        bp = unit(f"{scope}/branch_pool", _pool3_same(x), pool=True)
        x = jnp.concatenate([b1, b3, bd, bp], axis=-1)
    x = unit("head_conv", x)
    x = jnp.mean(x, axis=1)
    dense = params["classifier"]
    logits = x @ dense["kernel"] + dense["bias"]
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
