"""Model serialisation: the `.dbt` model file format.

Reference parity: the reference ships Keras-HDF5 model files
(``deepbinner/models/*`` — SURVEY.md §2 item 11) and loads them with
``keras.models.load_model``.  The rebuild's native format is a zip archive
(`.dbt`) holding:

- ``config.json``  — NetworkConfig + format version + metadata (kit, end),
- ``params.msgpack`` — the flax variables pytree (params + batch_stats).

Keras-HDF5 reference models are imported via
:mod:`deepbinner_tpu.models.keras_import`; `load_model` sniffs the format so
the CLI accepts either file type, like the reference accepts its own models.
"""

from __future__ import annotations

import dataclasses
import json
import os
import zipfile
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import serialization

from deepbinner_tpu.models.network import (
    DemuxNet,
    NetworkConfig,
    abstract_variables,
)

FORMAT_VERSION = 1
_HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"


def _config_to_json(config: NetworkConfig, metadata: Dict[str, Any]) -> str:
    payload = dataclasses.asdict(config)
    payload["compute_dtype"] = np.dtype(config.compute_dtype).name
    return json.dumps(
        {"format_version": FORMAT_VERSION, "network": payload, "metadata": metadata},
        indent=2,
        sort_keys=True,
    )


def _config_from_json(text: str) -> Tuple[NetworkConfig, Dict[str, Any]]:
    payload = json.loads(text)
    net = dict(payload["network"])
    net["compute_dtype"] = jnp.dtype(net["compute_dtype"])
    net["block_features"] = tuple(net["block_features"])
    net["inception_features"] = tuple(net["inception_features"])
    return NetworkConfig(**net), payload.get("metadata", {})


def save_model(
    path: str | os.PathLike,
    config: NetworkConfig,
    variables: dict,
    metadata: Dict[str, Any] | None = None,
) -> None:
    """Write a `.dbt` model archive (atomic: tmp file + rename)."""
    path = os.fspath(path)
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as archive:
        archive.writestr("config.json", _config_to_json(config, metadata or {}))
        archive.writestr("params.msgpack", serialization.to_bytes(variables))
    os.replace(tmp, path)


def is_keras_hdf5(path: str | os.PathLike) -> bool:
    try:
        with open(path, "rb") as handle:
            return handle.read(8) == _HDF5_MAGIC
    except OSError:
        return False


def load_model(
    path: str | os.PathLike,
) -> Tuple[DemuxNet, dict, NetworkConfig, Dict[str, Any]]:
    """Load a model file (`.dbt` zip or Keras HDF5) → (module, variables, config, meta)."""
    path = os.fspath(path)
    if is_keras_hdf5(path):
        from deepbinner_tpu.models import keras_import

        return keras_import.load_keras_model(path)

    with zipfile.ZipFile(path, "r") as archive:
        config, metadata = _config_from_json(
            archive.read("config.json").decode()
        )
        raw = archive.read("params.msgpack")
    # Template via eval_shape, NOT init_params: a real init executes the
    # network on the device (≈60 s remote compile on the axon tunnel) just
    # to learn the pytree structure.
    model, template = abstract_variables(config)
    variables = serialization.from_bytes(template, raw)
    return model, variables, config, metadata
