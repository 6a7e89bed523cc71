"""The driver-facing dryrun classify check must be SENSITIVE.

Round-4's dryrun fingerprint was degenerate (random weights called every
read "none": distribution [16, 0, ..., 0]), so the dp==tp equality could
not catch a barcode-index permutation or combine-rule divergence.  Round
5 uses the committed TINY-trained checkpoint on simulated reads; these
tests pin (a) the distribution spread + truth accuracy the driver
asserts, and (b) that a class-permutation mutation visibly changes the
calls — i.e. the check would catch the bug class it exists for.
"""

import os
import sys

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _mesh():
    from deepbinner_tpu.parallel import mesh as mesh_lib

    return mesh_lib.make_mesh(jax.devices()[:8], model=2), mesh_lib


def test_dryrun_classify_distribution_is_sensitive():
    import __graft_entry__ as ge

    mesh, mesh_lib = _mesh()
    calls, truth, n_params = ge._dryrun_classify(mesh, mesh_lib)
    dist = np.bincount(calls, minlength=13)
    assert int((dist > 0).sum()) >= 3, dist.tolist()
    # The tiny model is small but trained: most simulated reads must be
    # called by their true barcode, so an index permutation cannot hide.
    assert (calls == truth).mean() >= 0.5, (calls.tolist(), truth.tolist())


def test_dryrun_classify_catches_class_permutation():
    """Mutate the softmax head by rolling the 12 barcode columns: calls
    must change vs the unmutated run (and truth accuracy must collapse),
    proving the driver's check has teeth."""
    import __graft_entry__ as ge

    mesh, mesh_lib = _mesh()
    base_calls, truth, _n = ge._dryrun_classify(mesh, mesh_lib)

    def permute(variables):
        flat = jax.tree_util.tree_flatten_with_path(variables)[0]
        # Find the final dense kernel/bias: output dim == 13 classes.
        def roll_classes(x):
            if x.ndim >= 1 and x.shape[-1] == 13:
                idx = np.r_[0, np.roll(np.arange(1, 13), 1)]
                return np.asarray(x)[..., idx]
            return x
        mutated = jax.tree_util.tree_map(roll_classes, variables)
        # Sanity: something actually changed.
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(variables),
                            jax.tree_util.tree_leaves(mutated))
        )
        assert changed, [p for p, _ in flat]
        return mutated

    mut_calls, truth2, _n = ge._dryrun_classify(
        mesh, mesh_lib, mutate_variables=permute
    )
    np.testing.assert_array_equal(truth, truth2)
    assert not np.array_equal(base_calls, mut_calls)
    assert (mut_calls == truth).mean() < (base_calls == truth).mean()
