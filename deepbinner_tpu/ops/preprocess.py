"""Signal preprocessing as fixed-shape JAX ops, fused into the classify jit.

Reference parity: ``deepbinner/trim_signal.py`` (normalise, open-pore/stall
trimming) and the scan-region windowing inside ``deepbinner/classify.py``
(SURVEY.md §2 items 2 & 9, §3.1).  The reference does this per-read in numpy
on the host; here the whole batch is one XLA computation so trim → normalise
→ window fuses with the CNN and never bounces through HBM↔host.

Design notes (TPU-first):
- Everything is fixed shape: a batch is ``(B, S)`` int16 signal padded to the
  static scan buffer ``S`` plus an ``(B,)`` int32 length vector.  Short reads
  are handled by masks, never by dynamic shapes (no recompiles).
- The open-pore trim uses a rolling-variance scan implemented with cumulative
  sums at static offsets — pure vector ops on the VPU, no data-dependent
  Python control flow.
- Windowing materialises ``(B, W, window)`` via static strided slices, which
  XLA fuses into the consumer conv's input gather.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """Static preprocessing geometry (baked into the jit).

    Defaults mirror the reference CLI defaults where known (scan_size 6144,
    CNN input 1024 — SURVEY.md §6 model-geometry row); the rest are this
    rebuild's choices, exposed as CLI flags.
    """

    scan_size: int = 6144          # samples of each read end examined
    window: int = 1024             # CNN input width
    stride: int = 512              # window stride across the scan region
    trim_scan: int = 2048          # samples inspected for open-pore trimming
    trim_window: int = 64          # rolling-variance window
    trim_stride: int = 16          # rolling-variance stride
    trim_threshold: float = 0.25   # fraction of global std that marks "real" signal
    # Open-pore trim runs on the HOST (reader workers, numpy mirror in
    # runner.hostbatch.pretrim_read) instead of in-graph: the device then
    # receives only the scan region, cutting host→device bytes 25% at the
    # default geometry — the win that matters when the transfer link (axon
    # tunnel ~55 MB/s) is the throughput wall, not the chip.  Same trim
    # math either way (parity-tested); classify/bench default to host trim,
    # --device_trim restores the in-graph path.
    host_trim: bool = False
    # Wire format of the signal buffers crossing host→device.
    #  'int16': raw DAC samples (lossless; the default).
    #  'int8':  reader workers z-score each read end over its valid scan
    #           region and quantise at 1/16 σ (runner.hostbatch), HALVING
    #           link bytes.  Sound because the in-graph per-window z-score
    #           (window_scan_region → normalise) is invariant to any
    #           per-read affine transform, so the only divergence from the
    #           int16 path is the ±1/32 σ rounding noise — below the 0.02 σ
    #           Gaussian augmentation the stock models are trained under
    #           (models/network.py noise_stddev).  Requires host_trim.
    #  'int4':  same z-score, quantised at 1/3.5 σ into [-7, 7] nibbles
    #           packed two per byte (runner.hostbatch.quantise_wire4) and
    #           unpacked in-graph here — a QUARTER of the int16 bytes for
    #           the hours when the tunnel is the wall.  Step noise 0.082 σ;
    #           accuracy pinned across the eval-noise grid
    #           (EVAL_ROBUSTNESS artifacts).  Requires host_trim.  Opt-in:
    #           int8 stays the default wire.
    wire: str = "int16"

    @property
    def wire_cols(self) -> int:
        """Width of the device-side signal input (int4 packs 2/byte)."""
        return self.buffer_size // 2 if self.wire == "int4" else self.buffer_size

    @property
    def num_windows(self) -> int:
        return (self.scan_size - self.window) // self.stride + 1

    @property
    def buffer_size(self) -> int:
        """Host buffer per read end: trim headroom + scan region.

        Under host_trim the trim already happened in the reader worker, so
        the device buffer is exactly the scan region.
        """
        if self.host_trim:
            return self.scan_size
        return self.trim_scan + self.scan_size


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """(B, T/2) int8 of packed nibbles → (B, T) int8 samples, in-graph.

    Inverse of runner.hostbatch.quantise_wire4's packing: sample ``2i``
    is byte ``i``'s LOW nibble, sample ``2i+1`` its HIGH nibble, both
    two's-complement.  Pure VPU bit ops; XLA fuses the unpack into the
    consumer's f32 cast, so the int4 wire costs no extra HBM pass.
    """
    low = jnp.right_shift(jnp.left_shift(packed, 4), 4)  # sign-extend
    high = jnp.right_shift(packed, 4)                    # arithmetic shift
    n = packed.shape[0]
    return jnp.stack([low, high], axis=-1).reshape(n, -1)


def normalise(signal: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """Z-score normalisation along `axis` (reference trim_signal.normalise)."""
    signal = signal.astype(jnp.float32)
    mean = jnp.mean(signal, axis=axis, keepdims=True)
    std = jnp.std(signal, axis=axis, keepdims=True)
    return (signal - mean) / (std + eps)


def _rolling_std(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """Std of each length-`window` slice at static stride; x: (..., T).

    Uses the cumsum trick so it is O(T) adds + a static gather, which XLA
    vectorises on the VPU; no conv needed.
    """
    x = x.astype(jnp.float32)
    t = x.shape[-1]
    n_out = (t - window) // stride + 1
    zeros = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    c1 = jnp.concatenate([zeros, jnp.cumsum(x, axis=-1)], axis=-1)
    c2 = jnp.concatenate([zeros, jnp.cumsum(x * x, axis=-1)], axis=-1)
    starts = jnp.arange(n_out) * stride
    s1 = c1[..., starts + window] - c1[..., starts]
    s2 = c2[..., starts + window] - c2[..., starts]
    mean = s1 / window
    var = jnp.maximum(s2 / window - mean * mean, 0.0)
    return jnp.sqrt(var)


def find_signal_start(
    region: jnp.ndarray, valid: jnp.ndarray, cfg: PreprocessConfig
) -> jnp.ndarray:
    """Index where real read signal begins within `region` (B, trim_scan).

    Open-pore / stall current is flat (low variance) compared to strand
    translocation signal; the first rolling window whose std exceeds
    ``trim_threshold`` × the region's global std marks the start.  Returns 0
    when nothing exceeds the threshold (nothing to trim — matches the
    reference's "give up and keep the signal" behaviour).

    ``valid`` is the per-row count of genuine samples in `region` (samples
    past it are zero padding).  Both the global std and the candidate
    windows are restricted to the valid samples: the signal→zero-pad
    boundary step otherwise reads as a huge-variance "signal start" and
    trims genuine leading samples from every read shorter than the trim
    scan (host-side parity oracle: utils.torch_baseline.preprocess_read,
    which operates on the unpadded signal).
    """
    region = region.astype(jnp.float32)
    t = region.shape[-1]
    valid = jnp.clip(valid, 0, t)[:, None].astype(jnp.float32)
    mask = jnp.arange(t)[None, :] < valid
    masked = region * mask  # (padding is already zero; explicit for safety)
    denom = jnp.maximum(valid, 1.0)
    mean = jnp.sum(masked, axis=-1, keepdims=True) / denom
    var = jnp.sum(masked * masked, axis=-1, keepdims=True) / denom - mean * mean
    global_std = jnp.sqrt(jnp.maximum(var, 0.0))
    win_std = _rolling_std(region, cfg.trim_window, cfg.trim_stride)
    n_out = win_std.shape[-1]
    win_end = (jnp.arange(n_out) * cfg.trim_stride + cfg.trim_window)[None, :]
    in_valid = win_end <= valid  # windows straddling the pad boundary excluded
    good = (win_std >= cfg.trim_threshold * global_std) & in_valid
    any_good = jnp.any(good, axis=-1)
    first = jnp.argmax(good, axis=-1)  # first True (argmax of bool)
    return jnp.where(any_good, first * cfg.trim_stride, 0).astype(jnp.int32)


def extract_scan_region(
    signal: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: PreprocessConfig,
    end: str = "start",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trim open-pore signal and cut the scan region from a padded batch.

    Args:
      signal: ``(B, buffer)`` raw DAC values.  For ``end='start'`` this is the
        *first* ``buffer`` samples of each read; for ``end='end'`` it is the
        *last* ``buffer`` samples **reversed** by the host reader, so the trim
        logic is identical for both ends (reference classify.py takes the last
        scan_size samples for the end model).
      lengths: ``(B,)`` number of valid samples in each row (≤ buffer).

    Returns:
      region: ``(B, scan_size)`` float32 scan region (zero-padded past length)
      valid: ``(B,)`` int32 number of valid samples within the region
    """
    del end  # both ends share one code path; the host reverses end-signal
    buffer = cfg.buffer_size
    if cfg.wire == "int4":
        if signal.shape[-1] != cfg.wire_cols:
            raise ValueError(
                f"expected packed int4 buffer {cfg.wire_cols}, "
                f"got {signal.shape[-1]}"
            )
        signal = unpack_int4(signal)
    if signal.shape[-1] != buffer:
        raise ValueError(
            f"expected signal buffer {buffer}, got {signal.shape[-1]}"
        )
    signal = signal.astype(jnp.float32)
    positions = jnp.arange(buffer)[None, :]
    mask = positions < lengths[:, None]
    signal = signal * mask  # zero out padding so stats ignore garbage scale

    if cfg.host_trim:
        # The reader worker already trimmed (hostbatch.pretrim_read); the
        # buffer IS the scan region.  Static branch — shapes differ per mode,
        # so the two modes are distinct compiled programs, never mixed.
        valid = jnp.clip(lengths, 0, cfg.scan_size).astype(jnp.int32)
        return signal, valid

    trim_region = signal[:, : cfg.trim_scan]
    trim_pos = find_signal_start(
        trim_region, jnp.minimum(lengths, cfg.trim_scan), cfg
    )
    # Never trim so far that fewer than `window` samples remain.
    max_trim = jnp.maximum(lengths - cfg.window, 0)
    trim_pos = jnp.minimum(trim_pos, max_trim).astype(jnp.int32)

    region = jax.vmap(
        lambda row, start: jax.lax.dynamic_slice(row, (start,), (cfg.scan_size,))
    )(signal, trim_pos)
    valid = jnp.clip(lengths - trim_pos, 0, cfg.scan_size).astype(jnp.int32)
    return region, valid


def window_scan_region(
    region: jnp.ndarray, valid: jnp.ndarray, cfg: PreprocessConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cut ``(B, scan_size)`` into normalised ``(B, W, window)`` CNN inputs.

    Each window is z-scored independently (the reference normalises each CNN
    input chunk).  ``window_mask[b, w]`` is True when window w lies entirely
    within valid samples; reads shorter than one window get an all-False mask
    (→ "none" call downstream).
    """
    windows = jnp.stack(
        [
            region[:, w * cfg.stride : w * cfg.stride + cfg.window]
            for w in range(cfg.num_windows)
        ],
        axis=1,
    )
    windows = normalise(windows, axis=-1)
    ends = jnp.arange(cfg.num_windows) * cfg.stride + cfg.window
    window_mask = ends[None, :] <= valid[:, None]
    return windows, window_mask


def preprocess_batch(
    signal: jnp.ndarray, lengths: jnp.ndarray, cfg: PreprocessConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full preprocessing: trim → scan region → normalised windows + mask."""
    region, valid = extract_scan_region(signal, lengths, cfg)
    return window_scan_region(region, valid, cfg)
