"""The barcode-classifier 1D CNN ("DemuxNet"), in flax.linen.

Reference parity: ``deepbinner/network_architecture.py::build_network``
(SURVEY.md §2 item 8).  The reference's exact Keras graph could not be
line-verified (empty mount — SURVEY.md §0), so this is **not a translation**:
it is a new network built from the same documented ingredients — stacked
Conv1D / MaxPool / BatchNorm, a train-time GaussianNoise layer at the input,
dropout, inception-style multi-branch modules, and dilated-conv branches —
taking a ``(B, 1024, 1)`` normalised signal window to a 13-class softmax
(none + barcode01..12).

TPU-first sizing: channel counts are multiples of 32/64 so the im2row matmul
a Conv1D lowers to tiles the 128×128 MXU cleanly; spatial length halves at
every pool so the deep layers are small and the early, wide layers dominate
(where the MXU utilisation is best).  Weights and activations default to f32
— bit-reproducible calls outrank bf16 speed here (SURVEY.md §7 risk 1); a
bf16 fast path is available via ``compute_dtype`` for throughput mode.

The weight pytree layout is the interchange format: the Keras-HDF5 importer
(:mod:`deepbinner_tpu.models.keras_import`) maps reference checkpoint weights
onto these module names when real Deepbinner models are available.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepbinner_tpu import NUM_CLASSES


@dataclasses.dataclass(frozen=True)
class NetworkConfig:
    """Architecture hyper-parameters for DemuxNet."""

    num_classes: int = NUM_CLASSES
    input_length: int = 1024
    stem_features: int = 48
    block_features: Tuple[int, ...] = (64, 96)
    inception_features: Tuple[int, ...] = (128, 128)
    head_features: int = 128
    noise_stddev: float = 0.02
    dropout_rate: float = 0.15
    compute_dtype: Any = jnp.float32


class ConvBNRelu(nn.Module):
    """Conv1D + BatchNorm + ReLU — the basic unit of every block."""

    features: int
    kernel_size: int = 3
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            use_bias=False,  # folded into BatchNorm's beta
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-3,  # Keras BatchNormalization default epsilon
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x)


class InceptionModule(nn.Module):
    """Parallel conv branches concatenated (inception-style, with dilation).

    Branches: 1×1 bottleneck, k=3, k=3 dilated, and maxpool→1×1; the dilated
    branch widens the receptive field over the signal without extra pooling —
    the ingredient the reference uses for long-range barcode context.
    """

    features: int  # total output features, split across 4 branches
    dilation: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        quarter = self.features // 4
        b1 = ConvBNRelu(quarter, 1, dtype=self.dtype, name="branch1x1")(x, train)
        b3 = ConvBNRelu(self.features - 3 * quarter, 3,
                        dtype=self.dtype, name="branch3")(x, train)
        bd = ConvBNRelu(quarter, 3, dilation=self.dilation,
                        dtype=self.dtype, name="branch_dilated")(x, train)
        pooled = nn.max_pool(x, window_shape=(3,), strides=(1,), padding="SAME")
        bp = ConvBNRelu(quarter, 1, dtype=self.dtype, name="branch_pool")(pooled, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class DemuxNet(nn.Module):
    """Input ``(B, input_length, 1)`` → ``(B, num_classes)`` logits."""

    config: NetworkConfig = NetworkConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        dtype = cfg.compute_dtype
        x = x.astype(dtype)

        if train and cfg.noise_stddev > 0:
            # GaussianNoise: train-time-only input regularisation, as in the
            # reference's first layer.
            noise_rng = self.make_rng("noise")
            x = x + cfg.noise_stddev * jax.random.normal(noise_rng, x.shape, dtype)

        x = ConvBNRelu(cfg.stem_features, 3, dtype=dtype, name="stem1")(x, train)
        x = ConvBNRelu(cfg.stem_features, 3, dtype=dtype, name="stem2")(x, train)
        x = nn.max_pool(x, window_shape=(2,), strides=(2,))

        for i, feats in enumerate(cfg.block_features):
            x = ConvBNRelu(feats, 3, dtype=dtype, name=f"block{i}_conv1")(x, train)
            x = ConvBNRelu(feats, 3, dtype=dtype, name=f"block{i}_conv2")(x, train)
            x = nn.max_pool(x, window_shape=(2,), strides=(2,))

        for i, feats in enumerate(cfg.inception_features):
            x = InceptionModule(feats, dilation=2 ** (i + 1), dtype=dtype,
                                name=f"inception{i}")(x, train)
            x = nn.max_pool(x, window_shape=(2,), strides=(2,))

        x = ConvBNRelu(cfg.head_features, 3, dtype=dtype, name="head_conv")(x, train)
        x = jnp.mean(x, axis=1)  # global average pool over signal length

        if train and cfg.dropout_rate > 0:
            x = nn.Dropout(rate=cfg.dropout_rate, deterministic=False)(x)
        logits = nn.Dense(cfg.num_classes, dtype=jnp.float32, name="classifier")(x)
        return logits.astype(jnp.float32)


def init_params(
    rng: jax.Array, config: NetworkConfig | None = None
) -> Tuple[DemuxNet, dict]:
    """Initialise a DemuxNet; returns (module, variables dict)."""
    config = config or NetworkConfig()
    model = DemuxNet(config)
    dummy = jnp.zeros((1, config.input_length, 1), jnp.float32)
    variables = model.init({"params": rng}, dummy, train=False)
    return model, variables


def abstract_variables(config: NetworkConfig | None = None) -> Tuple["DemuxNet", dict]:
    """Variables *template* (numpy zeros) without touching any device.

    ``model.init`` executes the whole network — on the axon-tunnelled TPU
    that is a ~60 s remote compile+run just to learn the pytree structure.
    ``jax.eval_shape`` traces the same init abstractly in milliseconds; the
    zero-filled numpy leaves are a valid ``flax.serialization.from_bytes``
    target.
    """
    config = config or NetworkConfig()
    model = DemuxNet(config)
    dummy = jax.ShapeDtypeStruct((1, config.input_length, 1), jnp.float32)
    shapes = jax.eval_shape(
        lambda d: model.init({"params": jax.random.PRNGKey(0)}, d, train=False),
        dummy,
    )
    import numpy as np

    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes
    )
    return model, template


def apply_inference(
    model: DemuxNet, variables: dict, windows: jnp.ndarray
) -> jnp.ndarray:
    """Softmax probabilities for a flat batch of windows ``(N, L)`` or ``(N, L, 1)``."""
    if windows.ndim == 2:
        windows = windows[:, :, None]
    logits = model.apply(variables, windows, train=False)
    return jax.nn.softmax(logits, axis=-1)


def count_params(variables: dict) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
