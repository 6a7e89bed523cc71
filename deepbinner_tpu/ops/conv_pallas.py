"""Fused Conv1D + BatchNorm + ReLU as a Pallas (Mosaic) TPU kernel.

Reference parity: the conv/BN/ReLU stacks inside
``deepbinner/network_architecture.py`` execute as individual Keras/TF ops;
here each ConvBNRelu unit is ONE kernel: K matmuls on the MXU (one per conv
tap, accumulated in VMEM) with the folded BatchNorm affine and the ReLU
applied before the result ever returns to HBM.

Design (see /opt/skills/guides/pallas_guide.md):
- A length-L 1D conv with kernel K and dilation d is Σ_k shift(x, k·d) @ W[k]
  — im2row without materialising the im2row matrix.  The host pads L with
  (K-1)·d/2 zeros on each side (XLA fuses the pad), so every tap is a
  *static* slice: no masks, no dynamic shapes inside the kernel.
- Grid over batch tiles; each program owns (TILE_N, L_pad, C_in) in VMEM and
  writes (TILE_N, L, C_out).  The flattened (TILE_N·L, C_in) @ (C_in, C_out)
  matmuls tile the 128×128 MXU; channel counts in DemuxNet are multiples of
  16/32 by construction.
- BatchNorm folds to scale = γ/√(σ²+ε), bias = β − μ·scale (inference), so
  the affine is two VPU ops fused after the accumulator.

f32 everywhere: bit-reproducible calls outrank bf16 throughput here
(SURVEY.md §7 risk 1).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_batchnorm(
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    eps: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference-time BN → (scale, bias) affine over channels."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    bias = beta - mean * scale
    return scale, bias


def _conv_tile(x, w, scale, bias, *, taps: int, dilation: int,
               relu: bool, pool: bool,
               mxu_dtype=jnp.float32) -> jnp.ndarray:
    """One ConvBNRelu(+maxpool2) on a VMEM-resident tile.

    ``x``: (tile_n, L, C_in) f32 value (already loaded); returns
    (tile_n, L or L//2, C_out).  The SAME-padding halo is materialised
    locally with jnp.pad — a VMEM-to-VMEM concat, never an HBM round-trip
    (round-2 VERDICT item 2).  Shared by the per-unit kernel and the
    whole-network megakernel.

    ``mxu_dtype``: dtype of the MXU multiplicands (accumulation is always
    f32).  Default f32.  A bf16 mode was measured on the v5e chip (round 3,
    /tmp-era conv_microbench): Mosaic produced byte-identical results AND
    identical timing to f32 — the cast is evidently folded into the same
    MXU passes — so bf16 buys nothing here and only adds VMEM copies
    (+700 KB pushed the megakernel over the 16 MB scoped limit).  The knob
    is kept for re-evaluation on directly-attached hosts / other TPU
    generations.  Deterministic either way: fixed shapes, fixed order.
    """
    tile_n, length, c_in = x.shape
    c_out = w.shape[-1]
    halo = (taps - 1) // 2 * dilation
    x = x.astype(mxu_dtype)
    w = w.astype(mxu_dtype)
    if halo:
        x = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))
    # Tap-accumulate: K matmuls with f32 accumulation.  (An im2row variant —
    # one matmul with K = taps·C_in — was tried and hits a Mosaic internal
    # error on lane-dim concats at non-128-aligned channel offsets; the
    # tap loop is the robust form and the MXU win comes from bf16 anyway.)
    acc = jnp.zeros((tile_n * length, c_out), jnp.float32)
    for k in range(taps):
        window = x[:, k * dilation : k * dilation + length, :]
        acc = acc + jnp.dot(
            window.reshape(tile_n * length, c_in),
            w[k],
            preferred_element_type=jnp.float32,
        )
    out = acc * scale + bias
    if relu:
        out = jnp.maximum(out, 0.0)
    if pool:
        # Trailing 2× maxpool fused into the epilogue: halves the HBM
        # write for every pooled layer (round-2 VERDICT item 2).  Expressed
        # as a reshape-split of the row dim + pairwise max — strided slices
        # lower to gathers, which Mosaic rejects on >2D.
        out = out.reshape(tile_n, length // 2, 2, c_out)
        out = jnp.maximum(out[:, :, 0, :], out[:, :, 1, :])
    else:
        out = out.reshape(tile_n, length, c_out)
    return out


def _conv_kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, *,
                 taps: int, dilation: int, relu: bool, pool: bool,
                 mxu_dtype):
    out_ref[:] = _conv_tile(
        x_ref[:], w_ref[:], scale_ref[0], bias_ref[0],
        taps=taps, dilation=dilation, relu=relu, pool=pool,
        mxu_dtype=mxu_dtype,
    )


def fused_conv1d_bn_relu(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    dilation: int = 1,
    relu: bool = True,
    pool: bool = False,
    tile_n: int = 16,
    interpret: Optional[bool] = None,
    mxu_dtype=jnp.float32,
    max_rows: int = 4096,
) -> jnp.ndarray:
    """SAME-padded 1D conv fused with a channel affine (+ReLU, +maxpool2).

    Args:
      x: ``(N, L, C_in)`` float32.
      kernel: ``(K, C_in, C_out)`` (flax Conv layout).
      scale, bias: ``(C_out,)`` folded BatchNorm affine.
      pool: fuse a trailing stride-2 window-2 maxpool into the epilogue
        (L must be even).

    Returns ``(N, L', C_out)`` float32 with L' = L//2 when pooling.
    """
    if interpret is None:
        # Mosaic compiles only for TPU; everywhere else (CPU tests) fall back
        # to the Pallas interpreter so the same code path stays testable.
        interpret = jax.default_backend() != "tpu"
    n, length, c_in = x.shape
    taps, k_cin, c_out = kernel.shape
    if k_cin != c_in:
        raise ValueError(f"kernel C_in {k_cin} != input C_in {c_in}")
    if pool and length % 2:
        raise ValueError(f"fused pool needs even length, got {length}")
    if c_in == 1:
        # The stem layer: a (N·L, 1) @ (1, C) "matmul" is useless on the MXU
        # and the size-1 trailing dim lane-pads every VMEM buffer 128×,
        # OOMing scoped VMEM.  It is a negligible slice of total FLOPs — let
        # XLA emit it; Pallas owns every wide layer.
        return conv1d_bn_relu_reference(x, kernel, scale, bias,
                                        dilation=dilation, relu=relu,
                                        pool=pool)
    out_len = length // 2 if pool else length

    # Adaptive tile: keep the accumulator (tile_n·L rows × ≥128 lanes) and the
    # in/out blocks inside scoped VMEM (~16 MB, double-buffered by Mosaic).
    # tile_n·L ≤ max_rows (default 4096) keeps x + halo copy + acc + out
    # ≤ ~8 MB at c ≤ 128 (measured: 8192 rows OOMs scoped VMEM at L=512
    # C_out=64 by 2.8 MB); `max_rows` is exposed for the tile sweep
    # (scripts/pallas_sweep.py), which probes the ceiling per geometry.
    tile_n = min(tile_n, max(max_rows // max(length, 1), 1))
    tile_n = min(tile_n, max(n, 1))
    n_pad = -(-n // tile_n) * tile_n
    x_arg = x.astype(jnp.float32)
    if n_pad != n:
        x_arg = jnp.pad(x_arg, ((0, n_pad - n), (0, 0), (0, 0)))

    grid = (n_pad // tile_n,)
    kernel_fn = functools.partial(
        _conv_kernel, taps=taps, dilation=dilation, relu=relu, pool=pool,
        mxu_dtype=mxu_dtype,
    )
    x_spec = pl.BlockSpec((tile_n, length, c_in), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((taps, c_in, c_out), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, out_len, c_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_len, c_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * length * taps * c_in * c_out,
            bytes_accessed=4 * (n_pad * length * c_in
                                + taps * c_in * c_out
                                + n_pad * out_len * c_out),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x_arg,
        kernel.astype(jnp.float32),
        scale.reshape(1, c_out).astype(jnp.float32),
        bias.reshape(1, c_out).astype(jnp.float32),
    )
    return out[:n]


def conv1d_bn_relu_reference(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    dilation: int = 1,
    relu: bool = True,
    pool: bool = False,
) -> jnp.ndarray:
    """lax.conv_general_dilated reference — the always-available fallback
    and the numerical-parity oracle for the Pallas kernel."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        kernel.astype(jnp.float32),
        window_strides=(1,),
        padding="SAME",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    out = out * scale + bias
    if relu:
        out = jnp.maximum(out, 0.0)
    if pool:
        out = jnp.maximum(out[:, 0::2, :], out[:, 1::2, :])
    return out
