"""Keras-HDF5 importer parity against keras itself (jax backend).

Builds a reference-shaped model (conv/pool/BN/dropout/noise/inception-style
concat/dilated conv/dense-softmax — the SURVEY.md §2 item 8 ingredient list)
in keras, saves legacy HDF5, imports with our h5py-only reader, and compares
predictions.
"""

import os

import numpy as np
import pytest

os.environ.setdefault("KERAS_BACKEND", "jax")

keras = pytest.importorskip("keras")

from deepbinner_tpu.models.keras_import import load_keras_model  # noqa: E402


def _reference_style_model():
    inputs = keras.Input(shape=(64, 1))
    x = keras.layers.GaussianNoise(0.02)(inputs)
    x = keras.layers.Conv1D(8, 3, padding="same", activation="relu")(x)
    x = keras.layers.BatchNormalization()(x)
    x = keras.layers.MaxPooling1D(2)(x)
    # inception-style parallel branches incl. a dilated conv
    b1 = keras.layers.Conv1D(4, 1, padding="same", activation="relu")(x)
    b2 = keras.layers.Conv1D(4, 3, padding="same", activation="relu")(x)
    b3 = keras.layers.Conv1D(4, 3, padding="same", dilation_rate=2,
                             activation="relu")(x)
    x = keras.layers.Concatenate()([b1, b2, b3])
    x = keras.layers.BatchNormalization()(x)
    x = keras.layers.MaxPooling1D(2)(x)
    x = keras.layers.Dropout(0.1)(x)
    x = keras.layers.Conv1D(8, 3, padding="same", activation="relu")(x)
    x = keras.layers.GlobalAveragePooling1D()(x)
    outputs = keras.layers.Dense(13, activation="softmax")(x)
    return keras.Model(inputs, outputs)


@pytest.fixture(scope="module")
def saved_model(tmp_path_factory):
    model = _reference_style_model()
    path = str(tmp_path_factory.mktemp("keras") / "model.h5")
    model.save(path)  # legacy HDF5 (extension-selected)
    return model, path


def test_import_runs_and_matches_keras(saved_model, rng):
    model, path = saved_model
    imported, variables, config, meta = load_keras_model(path)
    assert config.input_length == 64
    assert config.num_classes == 13

    x = rng.normal(size=(3, 64, 1)).astype(np.float32)
    want = np.asarray(model(x, training=False))

    import jax

    logits = imported.apply(variables, x, train=False)
    got = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_import_strips_final_softmax(saved_model, rng):
    _, path = saved_model
    imported, variables, _config, _meta = load_keras_model(path)
    x = rng.normal(size=(2, 64, 1)).astype(np.float32)
    logits = np.asarray(imported.apply(variables, x, train=False))
    # logits, not probabilities: rows must not sum to 1
    assert not np.allclose(logits.sum(-1), 1.0, atol=1e-3)


def test_import_through_checkpoint_loader(saved_model):
    """checkpoint.load_model sniffs HDF5 and routes here (CLI model files)."""
    from deepbinner_tpu.models.checkpoint import load_model

    _, path = saved_model
    model, variables, config, meta = load_model(path)
    assert config.num_classes == 13
    assert "keras_version" in meta


def test_keras2_sequential_without_input_layer(tmp_path):
    """Keras 2 Sequential configs carry no InputLayer — first layer eats x."""
    import json

    import h5py

    config = {
        "class_name": "Sequential",
        "config": {
            "name": "seq2",
            "layers": [
                {"class_name": "Conv1D", "config": {
                    "name": "conv1", "batch_input_shape": [None, 16, 1],
                    "filters": 2, "kernel_size": [3], "strides": [1],
                    "padding": "same", "dilation_rate": [1],
                    "activation": "relu", "use_bias": True}},
                {"class_name": "GlobalAveragePooling1D",
                 "config": {"name": "gap"}},
                {"class_name": "Dense", "config": {
                    "name": "dense", "units": 3, "activation": "softmax",
                    "use_bias": True}},
            ],
        },
    }
    path = str(tmp_path / "keras2_seq.h5")
    with h5py.File(path, "w") as handle:
        handle.attrs["model_config"] = json.dumps(config)
        handle.attrs["keras_version"] = "2.1.6"
        weights = handle.create_group("model_weights")
        conv = weights.create_group("conv1")
        conv.create_dataset("conv1/kernel:0", data=np.ones((3, 1, 2), np.float32))
        conv.create_dataset("conv1/bias:0", data=np.zeros((2,), np.float32))
        dense = weights.create_group("dense")
        dense.create_dataset("dense/kernel:0", data=np.ones((2, 3), np.float32))
        dense.create_dataset("dense/bias:0", data=np.zeros((3,), np.float32))

    imported, variables, config_out, _meta = load_keras_model(path)
    assert config_out.input_length == 16
    out = imported.apply(variables, np.ones((2, 16, 1), np.float32))
    assert np.asarray(out).shape == (2, 3)


def test_dual_keras_models_use_their_own_graphs(saved_model, rng, tmp_path):
    """End-model weights must run through the END model's graph (auto-named
    layers differ between separately-built models)."""
    import jax

    from deepbinner_tpu.ops.calling import CallingConfig
    from deepbinner_tpu.ops.preprocess import PreprocessConfig
    from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram

    _, start_path = saved_model
    # a second model built in the same session gets different layer names
    end_keras = _reference_style_model()
    end_path = str(tmp_path / "end.h5")
    end_keras.save(end_path)

    start_model, start_vars, cfg_s, _ = load_keras_model(start_path)
    end_model, end_vars, cfg_e, _ = load_keras_model(end_path)
    assert cfg_s == cfg_e

    pre = PreprocessConfig(scan_size=192, window=64, stride=32, trim_scan=128,
                           trim_window=32, trim_stride=8)
    program = ClassifyProgram(
        start_model,
        ClassifyConfig(pre, CallingConfig(0.0, 0.0), dual_model=True),
        start_vars, end_vars, end_model=end_model,
    )
    sig = np.asarray(rng.normal(450, 50, (2, pre.buffer_size)), np.int16)
    lens = np.full((2,), pre.buffer_size, np.int32)
    out = program(sig, lens, sig, lens)  # crashes without the end graph
    assert np.asarray(out.end_probs).shape == (2, 13)


def test_unsupported_layer_is_loud(tmp_path):
    lstm = keras.Sequential([
        keras.layers.Input(shape=(16, 1)),
        keras.layers.LSTM(4),
        keras.layers.Dense(2),
    ])
    path = str(tmp_path / "lstm.h5")
    lstm.save(path)
    imported, variables, _c, _m = load_keras_model(path)
    with pytest.raises(ValueError, match="unsupported Keras layer"):
        imported.apply(variables, np.zeros((1, 16, 1), np.float32))


def test_classify_cli_with_keras_model(saved_model, tmp_path, capsys):
    """The classify CLI accepts a reference-style Keras-HDF5 model file
    end to end (drop-in for the reference's shipped models)."""
    from deepbinner_tpu.cli.main import main
    from deepbinner_tpu.utils import simulate, table

    _model, path = saved_model
    truth = simulate.make_dataset(
        tmp_path, kit="EXP-NBD103", reads_per_barcode=1, none_reads=1,
        genome_length=400, seed=17, write_fastq=False,
    )
    main(["classify", str(tmp_path / "fast5s"), "-s", path,
          "--scan_size", "192", "--batch_size", "8"])
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l]
    assert lines[0].startswith(table.HEADER_PREFIX)
    calls = dict(l.split("\t")[:2] for l in lines[1:])
    # untrained keras weights → calls are arbitrary but present for every read
    assert set(calls) == set(truth)
