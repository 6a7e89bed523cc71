"""Classify pipeline with use_pallas: identical calls to the flax path."""

import jax
import numpy as np

from deepbinner_tpu.models.network import NetworkConfig, init_params
from deepbinner_tpu.ops.calling import CallingConfig
from deepbinner_tpu.ops.preprocess import PreprocessConfig
from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram

TINY_NET = NetworkConfig(
    input_length=256, stem_features=8, block_features=(8,),
    inception_features=(16,), head_features=16,
)
TINY_PRE = PreprocessConfig(
    scan_size=768, window=256, stride=128, trim_scan=512,
    trim_window=64, trim_stride=16,
)


def test_pallas_pipeline_matches_flax(rng):
    model, variables = init_params(jax.random.PRNGKey(0), TINY_NET)
    sig = np.asarray(rng.normal(500, 50, (4, TINY_PRE.buffer_size)), np.float32)
    lengths = np.full((4,), TINY_PRE.buffer_size, np.int32)

    outs = {}
    for use_pallas in (False, True):
        cfg = ClassifyConfig(TINY_PRE, CallingConfig(0.0, 0.0), False,
                             use_pallas=use_pallas)
        program = ClassifyProgram(model, cfg, variables)
        outs[use_pallas] = program(sig.copy(), lengths.copy())

    np.testing.assert_array_equal(
        np.asarray(outs[False].calls), np.asarray(outs[True].calls)
    )
    # The Pallas path feeds the MXU bf16 multiplicands with f32 accumulate —
    # the same arithmetic XLA's conv emitter uses on the chip
    # (--xla_allow_excess_precision) — so probabilities may drift ~1e-3;
    # the parity target is the CALL (SURVEY.md §7 risk 1), pinned exactly
    # above.  conv_pallas tests pin strict-f32 kernel parity at 1e-5.
    np.testing.assert_allclose(
        np.asarray(outs[False].start_probs),
        np.asarray(outs[True].start_probs),
        atol=4e-3, rtol=1e-2,
    )
