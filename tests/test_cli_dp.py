"""CLI data-parallel classify on the 8-device CPU mesh == single-device."""

import jax
import pytest

from deepbinner_tpu.cli.main import main
from deepbinner_tpu.models.checkpoint import save_model
from deepbinner_tpu.models.network import NetworkConfig, init_params
from deepbinner_tpu.utils import simulate

TINY_NET = NetworkConfig(
    input_length=256, stem_features=8, block_features=(8,),
    inception_features=(16,), head_features=16,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("dp")
    truth = simulate.make_dataset(
        root, kit="EXP-NBD103", reads_per_barcode=1, none_reads=2,
        genome_length=500, seed=13,
    )
    model_path = root / "starts.dbt"
    _, variables = init_params(jax.random.PRNGKey(0), TINY_NET)
    save_model(model_path, TINY_NET, variables, {"kit": "EXP-NBD103"})
    return root, str(model_path), truth


def _run(root, model, capsys, device_count):
    main([
        "classify", str(root / "fast5s"), "-s", model,
        "--scan_size", "768", "--batch_size", "8",
        "--device_count", str(device_count),
    ])
    return capsys.readouterr().out


def test_dp8_matches_single_device(setup, capsys):
    root, model, truth = setup
    single = _run(root, model, capsys, device_count=1)
    dp8 = _run(root, model, capsys, device_count=8)
    assert len(jax.devices()) == 8
    assert single == dp8
    assert len(single.splitlines()) == len(truth) + 1
