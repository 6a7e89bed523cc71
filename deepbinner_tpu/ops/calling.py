"""Window-probability combination and barcode-calling rules, in-graph.

Reference parity: the calling logic at the bottom of
``deepbinner/classify.py`` (SURVEY.md §3.1): combine per-window softmax
probabilities into one score vector per read end, then apply a score
threshold, a top-two margin (``--score_diff``), and start/end reconciliation
(``--require_both`` vs either-is-enough).

All of it runs inside the classify jit so a batch leaves the device as a
compact call table (ints + probs) — the host only formats TSV rows.

Note on determinism: the window-combine is a fixed-order masked mean; calls
are argmax over f32 probabilities.  Keeping every reduction in a pinned
static order is what makes multi-run / multi-host output reproducible
(SURVEY.md §7 "bit-identical calls" risk).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from deepbinner_tpu import NUM_CLASSES


@dataclasses.dataclass(frozen=True)
class CallingConfig:
    """Static calling-rule parameters (CLI flags in the reference)."""

    min_score: float = 0.5    # best barcode probability must reach this
    score_diff: float = 0.5   # margin over the runner-up barcode
    require_both: bool = False  # dual-model: both ends must agree (vs either)


def combine_window_probs(
    probs: jnp.ndarray, window_mask: jnp.ndarray
) -> jnp.ndarray:
    """Masked mean of per-window probability vectors.

    Args:
      probs: ``(B, W, C)`` per-window softmax outputs.
      window_mask: ``(B, W)`` bool validity.

    Returns ``(B, C)``; rows with zero valid windows get probability 1 on
    class 0 ("none") so downstream rules need no special casing.
    """
    mask = window_mask.astype(probs.dtype)[:, :, None]
    total = jnp.sum(probs * mask, axis=1)
    count = jnp.sum(mask, axis=1)
    combined = total / jnp.maximum(count, 1.0)
    none_row = jnp.zeros((NUM_CLASSES,), probs.dtype).at[0].set(1.0)
    return jnp.where(count > 0, combined, none_row[None, :])


def call_one_end(probs: jnp.ndarray, cfg: CallingConfig) -> jnp.ndarray:
    """Barcode call for one read end from combined probabilities.

    probs: ``(B, C)`` → int32 ``(B,)`` class index (0 = none).

    Rules (reference classify.py semantics, SURVEY.md §3.1 [M]):
    - overall argmax must be a barcode class (not "none"),
    - its probability ≥ ``min_score``,
    - its probability beats the runner-up *barcode* by ≥ ``score_diff``.
    """
    best_class = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    barcode_probs = probs[:, 1:]
    order = jnp.sort(barcode_probs, axis=-1)
    top1 = order[:, -1]
    top2 = order[:, -2]
    confident = (
        (best_class != 0)
        & (top1 >= cfg.min_score)
        & (top1 - top2 >= cfg.score_diff)
    )
    return jnp.where(confident, best_class, 0).astype(jnp.int32)


def reconcile_calls(
    start_call: jnp.ndarray, end_call: jnp.ndarray, cfg: CallingConfig
) -> jnp.ndarray:
    """Merge start-model and end-model calls (EXP-NBD103 dual-model mode).

    either (default): calls agree → that call; exactly one end called → use
    it; both called but disagree → none.
    require_both: both ends must produce the same barcode.
    """
    agree = start_call == end_call
    if cfg.require_both:
        return jnp.where(agree & (start_call != 0), start_call, 0).astype(jnp.int32)
    both_called = (start_call != 0) & (end_call != 0)
    either = jnp.where(start_call != 0, start_call, end_call)
    return jnp.where(both_called & ~agree, 0, either).astype(jnp.int32)
