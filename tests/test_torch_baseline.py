"""Cross-implementation parity: torch-CPU baseline vs the JAX pipeline.

The torch pipeline exists to be the measured CPU baseline (bench.py), which
is only honest if it computes the *same function*: same architecture, same
preprocessing, same combine.  This test feeds identical weights + reads to
both and requires matching window probabilities and calls — catching either
implementation drifting.
"""

import jax
import numpy as np
import pytest

from deepbinner_tpu.models.network import NetworkConfig, init_params
from deepbinner_tpu.ops.calling import CallingConfig
from deepbinner_tpu.ops.preprocess import PreprocessConfig
from deepbinner_tpu.runner.executor import classify_stream
from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram
from deepbinner_tpu.utils import simulate
from deepbinner_tpu.utils.torch_baseline import build_torch_model, torch_classify_fn

TINY_NET = NetworkConfig(
    input_length=256, stem_features=8, block_features=(8,),
    inception_features=(16,), head_features=16,
)
TINY_PRE = PreprocessConfig(
    scan_size=768, window=256, stride=128, trim_scan=512,
    trim_window=64, trim_stride=16,
)


@pytest.fixture(scope="module")
def weights():
    model, variables = init_params(jax.random.PRNGKey(3), TINY_NET)
    return model, jax.device_get(variables)


def test_model_forward_parity(weights):
    """Same window → same probabilities from flax and torch."""
    import torch

    model, variables = weights
    torch_model = build_torch_model(TINY_NET, variables)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (4, TINY_NET.input_length)).astype(np.float32)

    jax_probs = np.asarray(
        jax.nn.softmax(
            model.apply(variables, x[:, :, None], train=False), axis=-1
        )
    )
    with torch.no_grad():
        torch_probs = torch_model(torch.tensor(x)).numpy()
    np.testing.assert_allclose(jax_probs, torch_probs, atol=2e-5)


def test_pipeline_call_and_combine_parity(weights):
    """Same reads through both full pipelines → same COMBINED probabilities
    (numeric) and same calls at the real non-zero thresholds.

    Round-2 VERDICT item 3: zero-threshold call comparison alone let the
    baseline's combine rule drift invisibly; requiring the combined
    probability vectors to match pins the torch pipeline to exactly
    ops.calling.combine_window_probs."""
    model, variables = weights
    rng = np.random.default_rng(7)
    reads = []
    for barcode in list(range(1, 7)) + [0, 0]:
        read = simulate.simulate_read("EXP-NBD103", barcode, rng,
                                      genome_length=800)
        reads.append((read.read_id, read.signal))

    # Real production thresholds — drift in the combine shows up as a
    # different margin and therefore (eventually) a different call.
    call_cfg = CallingConfig(min_score=0.5, score_diff=0.5)
    cfg = ClassifyConfig(TINY_PRE, call_cfg, dual_model=False)
    program = ClassifyProgram(model, cfg, variables)
    jax_results = {
        r.read_id: (r.call, np.asarray(r.start_probs))
        for r in classify_stream(program, iter(reads), batch_size=8)
    }

    torch_classify = torch_classify_fn(TINY_NET, variables, TINY_PRE,
                                       call_cfg, return_probs=True)
    torch_results = {rid: (call, probs)
                     for rid, call, probs in torch_classify(reads)}
    assert set(jax_results) == set(torch_results)
    for read_id, (jax_call, jax_probs) in jax_results.items():
        torch_call, torch_probs = torch_results[read_id]
        assert jax_call == torch_call, read_id
        np.testing.assert_allclose(jax_probs, torch_probs, atol=3e-5,
                                   err_msg=read_id)


def test_torch_batching_is_invariant(weights):
    """Calls and combined probs must not depend on the read-batch size."""
    model, variables = weights
    rng = np.random.default_rng(11)
    reads = []
    for barcode in [1, 2, 3, 0, 5]:
        read = simulate.simulate_read("EXP-NBD103", barcode, rng,
                                      genome_length=600)
        reads.append((read.read_id, read.signal))
    call_cfg = CallingConfig()
    outs = []
    for read_batch in (1, 2, 256):
        fn = torch_classify_fn(TINY_NET, variables, TINY_PRE, call_cfg,
                               read_batch=read_batch, return_probs=True)
        outs.append(fn(reads))
    for other in outs[1:]:
        for (rid_a, call_a, p_a), (rid_b, call_b, p_b) in zip(outs[0], other):
            assert (rid_a, call_a) == (rid_b, call_b)
            np.testing.assert_allclose(p_a, p_b, atol=1e-6)
