"""Keras 2.2-era HDF5 import: hand-written 2018-layout fixture, no keras.

The reference's shipped models are Keras 2.1/2.2 HDF5 artifacts
(``deepbinner/models/*`` — SURVEY.md §2 item 11).  This fixture reproduces
that exact on-disk layout by hand with h5py — ``Model`` class_name, nested
inbound-node lists, ``model_weights`` group with ``layer_names`` /
``weight_names`` byte attrs, ``<layer>/<layer>/kernel:0`` dataset paths —
and checks the importer numerically against a numpy oracle, including a
SHARED layer with two inbound nodes (round-2 VERDICT item 5: the importer
is the single load-bearing artifact for the day the mount appears).
"""

import json

import h5py
import numpy as np
import pytest

from deepbinner_tpu.models.keras_import import load_keras_model

L = 32  # input length


def _keras2_layer(name, class_name, config, inbound):
    config = dict(config)
    config.setdefault("name", name)
    config.setdefault("trainable", True)
    return {
        "name": name,
        "class_name": class_name,
        "config": config,
        "inbound_nodes": inbound,
    }


def _model_config(conv_padding="same"):
    """A Keras 2.2 functional ("Model") config with a shared Dense layer."""
    layers = [
        _keras2_layer("input_1", "InputLayer",
                      {"batch_input_shape": [None, L, 1], "dtype": "float32",
                       "sparse": False}, []),
        _keras2_layer("conv1d_1", "Conv1D",
                      {"filters": 4, "kernel_size": [3], "strides": [1],
                       "padding": conv_padding, "dilation_rate": [1],
                       "activation": "relu", "use_bias": True},
                      [[["input_1", 0, 0, {}]]]),
        _keras2_layer("batch_normalization_1", "BatchNormalization",
                      {"axis": -1, "momentum": 0.99, "epsilon": 1e-3,
                       "center": True, "scale": True},
                      [[["conv1d_1", 0, 0, {}]]]),
        # SHARED layer: two inbound nodes (4→4 channels, shape-preserving).
        # Node 0 consumes the BN output; node 1 re-applies the SAME weights
        # to its own node-0 output — the 2018 functional API's weight reuse.
        _keras2_layer("conv1d_2", "Conv1D",
                      {"filters": 4, "kernel_size": [3], "strides": [1],
                       "padding": "same", "dilation_rate": [1],
                       "activation": "relu", "use_bias": True},
                      [[["batch_normalization_1", 0, 0, {}]],
                       [["conv1d_2", 0, 0, {}]]]),
        _keras2_layer("add_1", "Add", {},
                      [[["conv1d_2", 0, 0, {}], ["conv1d_2", 1, 0, {}]]]),
        _keras2_layer("max_pooling1d_1", "MaxPooling1D",
                      {"pool_size": [2], "padding": "valid", "strides": [2]},
                      [[["add_1", 0, 0, {}]]]),
        _keras2_layer("flatten_1", "Flatten", {},
                      [[["max_pooling1d_1", 0, 0, {}]]]),
        _keras2_layer("dense_2", "Dense",
                      {"units": 13, "activation": "softmax",
                       "use_bias": True},
                      [[["flatten_1", 0, 0, {}]]]),
    ]
    return {
        "class_name": "Model",
        "config": {
            "name": "model_1",
            "layers": layers,
            "input_layers": [["input_1", 0, 0]],
            "output_layers": [["dense_2", 0, 0]],
        },
        # Keras 2.2 also stores keras_version/backend at this level inside
        # the attr in some point releases; the root attrs below are what
        # the loader reads.
    }


def _weights(rng):
    flat = 4 * (L // 2)  # channels * pooled length
    return {
        "conv1d_1": {
            "conv1d_1/kernel:0": rng.normal(size=(3, 1, 4)).astype(np.float32),
            "conv1d_1/bias:0": rng.normal(size=(4,)).astype(np.float32),
        },
        "batch_normalization_1": {
            "batch_normalization_1/gamma:0":
                rng.uniform(0.5, 1.5, 4).astype(np.float32),
            "batch_normalization_1/beta:0":
                rng.normal(size=(4,)).astype(np.float32),
            "batch_normalization_1/moving_mean:0":
                rng.normal(size=(4,)).astype(np.float32),
            "batch_normalization_1/moving_variance:0":
                rng.uniform(0.5, 2.0, 4).astype(np.float32),
        },
        "conv1d_2": {
            "conv1d_2/kernel:0":
                rng.normal(size=(3, 4, 4)).astype(np.float32),
            "conv1d_2/bias:0": rng.normal(size=(4,)).astype(np.float32),
        },
        "dense_2": {
            "dense_2/kernel:0":
                rng.normal(size=(flat, 13)).astype(np.float32),
            "dense_2/bias:0": rng.normal(size=(13,)).astype(np.float32),
        },
    }


def _write_keras22_h5(path, model_config, weights):
    """Reproduce the Keras 2.2 HDF5 saver's layout by hand."""
    with h5py.File(path, "w") as handle:
        handle.attrs["model_config"] = json.dumps(model_config).encode()
        handle.attrs["keras_version"] = b"2.2.4"
        handle.attrs["backend"] = b"tensorflow"
        mw = handle.create_group("model_weights")
        layer_names = [layer["name"] for layer in
                       model_config["config"]["layers"]]
        mw.attrs["layer_names"] = np.array(
            [n.encode() for n in layer_names], dtype="S64")
        mw.attrs["keras_version"] = b"2.2.4"
        mw.attrs["backend"] = b"tensorflow"
        for layer_name in layer_names:
            group = mw.create_group(layer_name)
            layer_weights = weights.get(layer_name, {})
            group.attrs["weight_names"] = np.array(
                [n.encode() for n in layer_weights], dtype="S128")
            for weight_name, value in layer_weights.items():
                group.create_dataset(weight_name, data=value)


def _conv_same_relu(x, kernel, bias):
    """'same'-padded width-3 Conv1D + bias + relu, straight numpy."""
    padded = np.pad(x, ((0, 0), (1, 1), (0, 0)))
    out = np.zeros((x.shape[0], x.shape[1], kernel.shape[2]), np.float32)
    for t in range(x.shape[1]):
        window = padded[:, t : t + 3, :]            # (B, 3, C_in)
        out[:, t, :] = np.einsum("bwi,wio->bo", window, kernel) + bias
    return np.maximum(out, 0.0)


def _numpy_oracle(x, w):
    """The fixture graph, computed straight in numpy."""
    conv = _conv_same_relu(x, w["conv1d_1"]["conv1d_1/kernel:0"],
                           w["conv1d_1"]["conv1d_1/bias:0"])

    bn = w["batch_normalization_1"]
    scale = bn["batch_normalization_1/gamma:0"] / np.sqrt(
        bn["batch_normalization_1/moving_variance:0"] + 1e-3)
    shift = (bn["batch_normalization_1/beta:0"]
             - bn["batch_normalization_1/moving_mean:0"] * scale)
    normed = conv * scale + shift

    # shared conv1d_2: node 1 re-applies the same weights to node 0's output
    k2 = w["conv1d_2"]["conv1d_2/kernel:0"]
    b2 = w["conv1d_2"]["conv1d_2/bias:0"]
    node0 = _conv_same_relu(normed, k2, b2)
    node1 = _conv_same_relu(node0, k2, b2)
    added = node0 + node1

    pooled = np.maximum(added[:, 0::2, :], added[:, 1::2, :])
    flat = pooled.reshape(x.shape[0], -1)

    logits = flat @ w["dense_2"]["dense_2/kernel:0"] + \
        w["dense_2"]["dense_2/bias:0"]
    return logits


def test_keras22_fixture_imports_and_matches_numpy(tmp_path, rng):
    path = str(tmp_path / "model1.h5")
    w = _weights(rng)
    _write_keras22_h5(path, _model_config(), w)

    model, variables, config, meta = load_keras_model(path)
    assert config.input_length == L
    assert config.num_classes == 13
    assert meta["keras_version"] == "2.2.4"

    x = rng.normal(size=(3, L, 1)).astype(np.float32)
    want = _numpy_oracle(x, w)
    got = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_keras22_causal_padding_rejected(tmp_path, rng):
    path = str(tmp_path / "causal.h5")
    w = _weights(rng)
    _write_keras22_h5(path, _model_config(conv_padding="causal"), w)
    model, variables, _config, _meta = load_keras_model(path)
    x = rng.normal(size=(1, L, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="padding 'causal'"):
        model.apply(variables, x, train=False)


def test_keras22_missing_weights_loud(tmp_path, rng):
    path = str(tmp_path / "missing.h5")
    w = _weights(rng)
    del w["dense_2"]["dense_2/kernel:0"]
    _write_keras22_h5(path, _model_config(), w)
    model, variables, _config, _meta = load_keras_model(path)
    x = rng.normal(size=(1, L, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="missing its kernel"):
        model.apply(variables, x, train=False)


def test_keras22_ambiguous_weights_loud(tmp_path, rng):
    """Two datasets in one layer that both basename-match must error, not
    silently pick one (the round-2 substring-matching hazard, inverted)."""
    path = str(tmp_path / "ambiguous.h5")
    w = _weights(rng)
    w["dense_2"]["dense_2_extra/kernel:0"] = \
        w["dense_2"]["dense_2/kernel:0"].copy()
    _write_keras22_h5(path, _model_config(), w)
    model, variables, _config, _meta = load_keras_model(path)
    x = rng.normal(size=(1, L, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="ambiguous"):
        model.apply(variables, x, train=False)
