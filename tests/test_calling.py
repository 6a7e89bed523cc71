"""Unit tests for window-combine and barcode-calling rules."""

import jax.numpy as jnp
import numpy as np

from deepbinner_tpu import NUM_CLASSES
from deepbinner_tpu.ops.calling import (
    CallingConfig,
    call_one_end,
    combine_window_probs,
    reconcile_calls,
)

CFG = CallingConfig(min_score=0.5, score_diff=0.3)


def _probs(rows):
    out = np.zeros((len(rows), NUM_CLASSES), np.float32)
    for i, row in enumerate(rows):
        for cls, p in row.items():
            out[i, cls] = p
    return jnp.asarray(out)


def test_combine_best_evidence_window():
    """The read is represented by its strongest-barcode window's vector."""
    probs = np.zeros((1, 3, NUM_CLASSES), np.float32)
    probs[0, 0, 1] = 0.9   # window 0: strong barcode01 ← best evidence
    probs[0, 0, 2] = 0.1
    probs[0, 1, 0] = 0.55  # window 1: weaker barcode02 evidence
    probs[0, 1, 2] = 0.45
    probs[0, 2, 3] = 1.0   # masked out below
    mask = jnp.asarray([[True, True, False]])
    combined = np.asarray(combine_window_probs(jnp.asarray(probs), mask))
    # window 0's whole vector is taken — not a per-class max across windows
    np.testing.assert_allclose(combined[0], probs[0, 0], atol=1e-6)


def test_combine_neighbour_support():
    """An interior best window is averaged with its stronger neighbour;
    a masked neighbour never contributes (its probs are padding garbage)."""
    probs = np.zeros((2, 3, NUM_CLASSES), np.float32)
    # Read 0: barcode evidence peaks at window 1, bleeds into window 2.
    probs[0, 0, 0] = 1.0              # window 0: clean none
    probs[0, 1, 3] = 0.8              # window 1: best evidence
    probs[0, 2, 3] = 0.6              # window 2: stronger neighbour
    # Read 1: best at window 1 but both neighbours masked → no averaging.
    probs[1, 1, 4] = 0.9
    probs[1, 0, 5] = 1.0              # masked; must not leak in
    probs[1, 2, 6] = 1.0              # masked; must not leak in
    mask = jnp.asarray([[True, True, True], [False, True, False]])
    combined = np.asarray(combine_window_probs(jnp.asarray(probs), mask))
    np.testing.assert_allclose(
        combined[0], 0.5 * (probs[0, 1] + probs[0, 2]), atol=1e-6
    )
    np.testing.assert_allclose(combined[1], probs[1, 1], atol=1e-6)


def test_combine_best_rule_flag():
    """rule='best' restores the plain best-evidence-window combine (kept for
    reference-parity testing — round-2 ADVICE item 3) and the numpy port
    matches it exactly."""
    from deepbinner_tpu.utils.torch_baseline import combine_window_probs_np

    probs = np.zeros((1, 3, NUM_CLASSES), np.float32)
    probs[0, 0, 0] = 1.0
    probs[0, 1, 3] = 0.8   # best evidence
    probs[0, 2, 3] = 0.6   # neighbour would average under the default rule
    mask = jnp.asarray([[True, True, True]])
    best = np.asarray(combine_window_probs(jnp.asarray(probs), mask,
                                           rule="best"))
    np.testing.assert_allclose(best[0], probs[0, 1], atol=1e-6)
    neigh = np.asarray(combine_window_probs(jnp.asarray(probs), mask))
    assert not np.allclose(best[0], neigh[0])
    for rule in ("best", "neighbour"):
        device = np.asarray(combine_window_probs(jnp.asarray(probs), mask,
                                                 rule=rule))
        host = combine_window_probs_np(probs[0], rule=rule)
        np.testing.assert_allclose(device[0], host, atol=1e-6)


def test_combine_masked_window_never_selected():
    probs = np.zeros((1, 2, NUM_CLASSES), np.float32)
    probs[0, 0, 0] = 1.0   # valid window: pure none
    probs[0, 1, 5] = 1.0   # masked window: strong barcode — must be ignored
    mask = jnp.asarray([[True, False]])
    combined = np.asarray(combine_window_probs(jnp.asarray(probs), mask))
    np.testing.assert_allclose(combined[0], probs[0, 0], atol=1e-6)


def test_combine_no_valid_windows_is_none():
    probs = jnp.asarray(np.full((1, 2, NUM_CLASSES), 1.0 / NUM_CLASSES, np.float32))
    mask = jnp.asarray([[False, False]])
    combined = np.asarray(combine_window_probs(probs, mask))
    assert combined[0, 0] == 1.0  # all mass on "none"


def test_call_rules():
    probs = _probs([
        {3: 0.9, 5: 0.05},          # confident → barcode03
        {3: 0.4, 5: 0.05},          # below min_score → none
        {3: 0.55, 5: 0.45},         # margin too small → none
        {0: 0.9, 3: 0.1},           # argmax is "none" → none
    ])
    calls = np.asarray(call_one_end(probs, CFG))
    np.testing.assert_array_equal(calls, [3, 0, 0, 0])


def test_reconcile_either():
    cfg = CallingConfig(require_both=False)
    start = jnp.asarray([3, 0, 3, 3, 0], jnp.int32)
    end = jnp.asarray([3, 5, 0, 5, 0], jnp.int32)
    out = np.asarray(reconcile_calls(start, end, cfg))
    # agree→3, only-end→5, only-start→3, conflict→0, neither→0
    np.testing.assert_array_equal(out, [3, 5, 3, 0, 0])


def test_reconcile_require_both():
    cfg = CallingConfig(require_both=True)
    start = jnp.asarray([3, 0, 3, 3], jnp.int32)
    end = jnp.asarray([3, 5, 0, 5], jnp.int32)
    out = np.asarray(reconcile_calls(start, end, cfg))
    np.testing.assert_array_equal(out, [3, 0, 0, 0])
