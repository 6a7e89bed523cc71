"""Golden-fixture and invariance tests (SURVEY.md §4 item 1).

The golden fixture freezes the preprocessing numerics (trim positions,
scan regions, normalised windows, masks) for a fixed input — any silent
change to the math that would move barcode calls shows up here first.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from deepbinner_tpu.models.network import NetworkConfig, init_params
from deepbinner_tpu.ops.calling import CallingConfig
from deepbinner_tpu.ops.preprocess import (
    PreprocessConfig,
    extract_scan_region,
    preprocess_batch,
)
from deepbinner_tpu.runner.executor import classify_stream
from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "preprocess_golden.npz")
CFG = PreprocessConfig(scan_size=768, window=256, stride=128, trim_scan=512,
                       trim_window=64, trim_stride=16)


def test_preprocess_matches_golden():
    data = np.load(FIXTURE)
    region, valid = extract_scan_region(
        jnp.asarray(data["signal"]), jnp.asarray(data["lengths"]), CFG
    )
    windows, mask = preprocess_batch(
        jnp.asarray(data["signal"]), jnp.asarray(data["lengths"]), CFG
    )
    np.testing.assert_array_equal(np.asarray(valid), data["valid"])
    np.testing.assert_allclose(np.asarray(region), data["region"],
                               atol=1e-5, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask), data["mask"])
    np.testing.assert_allclose(np.asarray(windows), data["windows"],
                               atol=1e-5, rtol=1e-5)


def test_calls_invariant_to_batch_packing(rng):
    """The same read must get the same call regardless of batch packing."""
    net = NetworkConfig(input_length=256, stem_features=8, block_features=(8,),
                        inception_features=(16,), head_features=16)
    model, variables = init_params(jax.random.PRNGKey(0), net)
    cfg = ClassifyConfig(CFG, CallingConfig(0.0, 0.0), False)
    program_small = ClassifyProgram(model, cfg, variables)

    reads = [
        (f"r{i}", rng.normal(450, 55, 4000).astype(np.int16))
        for i in range(10)
    ]
    by_batch = {}
    for batch_size in (3, 10):
        results = {
            r.read_id: (r.call, r.start_probs.copy())
            for r in classify_stream(program_small, iter(reads),
                                     batch_size=batch_size)
        }
        by_batch[batch_size] = results
    for read_id in by_batch[3]:
        call3, probs3 = by_batch[3][read_id]
        call10, probs10 = by_batch[10][read_id]
        assert call3 == call10
        np.testing.assert_allclose(probs3, probs10, atol=1e-5, rtol=1e-5)
