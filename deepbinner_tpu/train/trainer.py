"""`train` workload: optax training of DemuxNet with in-graph augmentation.

Reference parity: ``deepbinner/train_network.py`` (SURVEY.md §2 item 7,
§3.4): load training TSV, train/validation split (``--test_fraction``),
data augmentation by random-cropping the stored samples down to the CNN
input width, Adam + categorical cross-entropy, periodic checkpoints, final
model save.

TPU-first differences:
- Augmentation (random crop + the model's GaussianNoise) runs **in-graph**:
  the host ships raw ``(B, signal_size)`` rows once; crop offsets are drawn
  on device per step, so every epoch sees fresh crops for free.
- The train step is one jit over a ``('data','model')`` mesh: batch sharded
  on 'data', parameters replicated (or TP-sharded on 'model' when model>1);
  XLA inserts the gradient all-reduce.  This step is what
  ``__graft_entry__.dryrun_multichip`` compiles over an N-device mesh.
- Checkpoint/resume serialises the full TrainState (params, batch_stats,
  optimiser state, step) — SURVEY.md §5 checkpoint row.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from deepbinner_tpu import NUM_CLASSES
from deepbinner_tpu.models.checkpoint import save_model
from deepbinner_tpu.models.network import DemuxNet, NetworkConfig, init_params
from deepbinner_tpu.ops.preprocess import normalise
from deepbinner_tpu.parallel import mesh as mesh_lib
from deepbinner_tpu.train import data as data_io
from deepbinner_tpu.utils.log import log, quit_with_error, section


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    network: NetworkConfig
    learning_rate: float = 1e-3
    batch_size: int = 256
    epochs: int = 100
    test_fraction: float = 0.1
    aug_factor: int = 2
    seed: int = 0


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    # Adam with light decay + clipping: the reference compiles with plain
    # Adam [M]; clipping guards the early high-variance steps.
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(cfg.learning_rate, weight_decay=1e-5),
    )


def init_train_state(
    rng: jax.Array, cfg: TrainConfig
) -> Tuple[DemuxNet, TrainState]:
    model, variables = init_params(rng, cfg.network)
    tx = make_optimizer(cfg)
    return model, TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def augment_crop(
    signals: jnp.ndarray, window: int, rng: jax.Array
) -> jnp.ndarray:
    """Random crop each row to `window` samples, then z-score normalise.

    Stored samples are longer than the CNN input precisely to allow this
    (reference train-time augmentation, SURVEY.md §2 item 7).  Normalising
    *after* the crop matches inference, where each window is z-scored.
    """
    batch, size = signals.shape
    offsets = jax.random.randint(rng, (batch,), 0, size - window + 1)
    crops = jax.vmap(
        lambda row, off: jax.lax.dynamic_slice(row, (off,), (window,))
    )(signals, offsets)
    return normalise(crops)


def center_crop(signals: jnp.ndarray, window: int) -> jnp.ndarray:
    start = (signals.shape[1] - window) // 2
    return normalise(signals[:, start : start + window])


def train_step(
    model: DemuxNet,
    tx: optax.GradientTransformation,
    window: int,
    state: TrainState,
    signals: jnp.ndarray,
    labels: jnp.ndarray,
    weights: jnp.ndarray,
    rng: jax.Array,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimiser step; `weights` (0/1 per row) masks padding rows.

    The final batch of an epoch is padded to the compiled batch shape with
    repeated real samples at weight 0 (one jit shape, no recompiles), so no
    sample is ever dropped — the reference's `model.fit` sees every sample
    too (deepbinner/train_network.py :: train).
    """
    step_rng = jax.random.fold_in(rng, state.step)
    crop_rng, noise_rng, dropout_rng = jax.random.split(step_rng, 3)
    crops = augment_crop(signals, window, crop_rng)
    denom = jnp.maximum(weights.sum(), 1.0)

    def loss_fn(params):
        logits, updates = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            crops[:, :, None],
            train=True,
            rngs={"noise": noise_rng, "dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        per_example = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        )
        loss = (per_example * weights).sum() / denom
        return loss, (updates["batch_stats"], logits)

    (loss, (batch_stats, logits)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
    accuracy = (correct * weights).sum() / denom
    new_state = TrainState(params, batch_stats, opt_state, state.step + 1)
    return new_state, {"loss": loss, "accuracy": accuracy}


def eval_step(
    model: DemuxNet,
    window: int,
    state: TrainState,
    signals: jnp.ndarray,
    labels: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Per-example loss/correct vectors — the host masks off padding rows."""
    crops = center_crop(signals, window)
    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        crops[:, :, None],
        train=False,
    )
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
    return {"loss": loss, "correct": correct}


class Trainer:
    """Compiled train/eval steps over a device mesh + host batch loop."""

    def __init__(
        self,
        cfg: TrainConfig,
        mesh=None,
    ) -> None:
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.tx = make_optimizer(cfg)
        rng = jax.random.PRNGKey(cfg.seed)
        self.model, state = init_train_state(rng, cfg)
        replicated = mesh_lib.replicated(self.mesh)
        batch_sh = mesh_lib.batch_sharding(self.mesh)
        self._replicated = replicated
        self._batch_sh = batch_sh
        # A mesh spanning other processes' devices (multi-host dp training)
        # cannot receive host numpy through device_put/jnp.asarray — inputs
        # are committed via make_array_from_callback instead, each process
        # contributing the shard rows its devices own (_on_mesh).  Every
        # process passes the IDENTICAL global batch; XLA inserts the
        # cross-host gradient all-reduce.
        self._multiprocess = any(
            d.process_index != jax.process_index()
            for d in self.mesh.devices.flat
        )
        self.state = self._put_replicated(state)
        window = cfg.network.input_length
        self._train_step = jax.jit(
            lambda state, sig, lab, wts, rng: train_step(
                self.model, self.tx, window, state, sig, lab, wts, rng
            ),
            in_shardings=(replicated, batch_sh, batch_sh, batch_sh, replicated),
            out_shardings=replicated,
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            lambda state, sig, lab: eval_step(self.model, window, state, sig, lab),
            in_shardings=(replicated, batch_sh, batch_sh),
            out_shardings=replicated,
        )
        self._data_rng = self._on_mesh(
            jax.random.PRNGKey(cfg.seed + 1), replicated
        )

    def _on_mesh(self, arr, sharding):
        """Commit a host array to `sharding`; multi-process-safe.

        Single process: plain device_put.  Multi-process: the caller holds
        the FULL global array (identical on every process — same data file,
        same seed); make_array_from_callback hands each addressable device
        exactly the rows its shard index selects, which for batch_sharding
        means this process feeds the slice of the global batch its devices
        own, and for replicated shardings the whole array.
        """
        arr = np.asarray(arr)
        if not self._multiprocess:
            return jax.device_put(arr, sharding)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    def _put_replicated(self, tree):
        if not self._multiprocess:
            return jax.device_put(tree, self._replicated)
        return jax.tree_util.tree_map(
            lambda leaf: self._on_mesh(leaf, self._replicated), tree
        )

    @property
    def data_parallelism(self) -> int:
        return self.mesh.shape["data"]

    def run_train_step(self, signals: np.ndarray, labels: np.ndarray,
                       weights: Optional[np.ndarray] = None):
        if weights is None:
            weights = np.ones((len(labels),), np.float32)
        self.state, metrics = self._train_step(
            self.state,
            self._on_mesh(signals, self._batch_sh),
            self._on_mesh(labels, self._batch_sh),
            self._on_mesh(np.asarray(weights, np.float32), self._batch_sh),
            self._data_rng,
        )
        return metrics

    def run_eval(self, signals: np.ndarray, labels: np.ndarray, batch: int = 512):
        totals = {"loss": 0.0, "accuracy": 0.0}
        count = 0
        dp = self.data_parallelism
        for start in range(0, len(labels), batch):
            sig = signals[start : start + batch]
            lab = labels[start : start + batch]
            true = len(lab)
            pad = (-true) % dp
            if pad:
                sig = np.concatenate([sig, np.repeat(sig[-1:], pad, 0)])
                lab = np.concatenate([lab, np.repeat(lab[-1:], pad, 0)])
            metrics = self._eval_step(
                self.state,
                self._on_mesh(sig, self._batch_sh),
                self._on_mesh(lab, self._batch_sh),
            )
            # rows beyond `true` are duplicated padding — excluded exactly
            totals["loss"] += float(np.asarray(metrics["loss"])[:true].sum())
            totals["accuracy"] += float(np.asarray(metrics["correct"])[:true].sum())
            count += true
        return {k: v / max(count, 1) for k, v in totals.items()}

    # -- checkpoint / resume ------------------------------------------------

    def save_checkpoint(self, directory: str, epoch: int) -> None:
        # Multi-host: state is replicated, so every process holds the same
        # bytes — only process 0 writes (shared storage would race).
        if self._multiprocess and jax.process_index() != 0:
            return
        os.makedirs(directory, exist_ok=True)
        state = jax.device_get(self.state)
        payload = serialization.to_bytes(state)
        tmp = os.path.join(directory, ".state.tmp")
        with open(tmp, "wb") as handle:
            handle.write(payload)
        os.replace(tmp, os.path.join(directory, "state.msgpack"))
        with open(os.path.join(directory, "meta.json"), "w") as handle:
            json.dump({"epoch": epoch, "step": int(state.step)}, handle)

    def restore_checkpoint(self, directory: str) -> int:
        with open(os.path.join(directory, "state.msgpack"), "rb") as handle:
            payload = handle.read()
        template = jax.device_get(self.state)
        state = serialization.from_bytes(template, payload)
        self.state = self._put_replicated(state)
        with open(os.path.join(directory, "meta.json")) as handle:
            return int(json.load(handle)["epoch"])

    def export_variables(self) -> dict:
        state = jax.device_get(self.state)
        return {"params": state.params, "batch_stats": state.batch_stats}


def iter_epoch_batches(epoch_order: np.ndarray, batch_size: int,
                       rng: Optional[np.random.Generator] = None):
    """Yield (indices, weights) batches covering every index exactly once.

    The final partial batch is padded to `batch_size` with weight-0 rows —
    one compiled batch shape, no dropped samples.  Padding rows are drawn
    at random from the epoch (not one repeated index): weight 0 masks them
    out of the loss, but BatchNorm's batch statistics still see every row,
    and a single sample repeated batch_size-1 times would skew the running
    stats; a random resample keeps them representative.
    """
    if rng is None:
        rng = np.random.default_rng(0)
    for start in range(0, len(epoch_order), batch_size):
        idx = epoch_order[start : start + batch_size]
        weights = np.ones((batch_size,), np.float32)
        if len(idx) < batch_size:
            pad = batch_size - len(idx)
            weights[len(idx):] = 0.0
            filler = rng.choice(epoch_order, size=pad)
            idx = np.concatenate([idx, filler])
        yield idx, weights


def train_loop(
    trainer: Trainer,
    signals: np.ndarray,
    labels: np.ndarray,
    epochs: int,
    batch_size: int,
    test_fraction: float,
    aug_factor: int,
    seed: int,
    checkpoint_dir: Optional[str] = None,
    resume: Optional[str] = None,
    log_every: int = 1,
) -> Dict[str, float]:
    """Host epoch loop: shuffle, batch, step; eval per epoch; checkpoints."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(labels))
    n_val = max(1, int(len(labels) * test_fraction)) if test_fraction > 0 else 0
    val_idx, train_idx = order[:n_val], order[n_val:]
    if len(train_idx) == 0:
        raise ValueError("no training samples after validation split")
    dp = trainer.data_parallelism
    batch_size = max(batch_size - batch_size % dp, dp)

    start_epoch = 0
    if resume:
        start_epoch = trainer.restore_checkpoint(resume) + 1
        log(f"  resumed from {resume} at epoch {start_epoch}")

    best = {"accuracy": -1.0, "loss": float("inf")}
    best_variables: Optional[dict] = None
    for epoch in range(start_epoch, epochs):
        t0 = time.monotonic()
        epoch_order = rng.permutation(np.repeat(train_idx, aug_factor))
        losses = []
        for batch_idx, weights in iter_epoch_batches(epoch_order, batch_size,
                                                     rng=rng):
            metrics = trainer.run_train_step(
                signals[batch_idx], labels[batch_idx], weights
            )
            losses.append(metrics)
        train_loss = float(np.mean([float(m["loss"]) for m in losses])) if losses else 0.0
        val = (
            trainer.run_eval(signals[val_idx], labels[val_idx])
            if n_val
            else {"loss": 0.0, "accuracy": 0.0}
        )
        if epoch % log_every == 0 or epoch == epochs - 1:
            log(
                f"  epoch {epoch + 1}/{epochs}: train loss {train_loss:.4f}, "
                f"val loss {val['loss']:.4f}, val acc {val['accuracy']:.3f} "
                f"({time.monotonic() - t0:.1f}s)"
            )
        if checkpoint_dir:
            trainer.save_checkpoint(checkpoint_dir, epoch)
        if val["accuracy"] >= best["accuracy"]:
            best = dict(val)
            # Snapshot the weights that achieved this validation score — the
            # exported model must be the one its metadata describes, not
            # whatever the final epoch drifted to.
            if n_val:
                best_variables = trainer.export_variables()
    if best_variables is None:
        best_variables = trainer.export_variables()
    return best, best_variables


TINY_PRESET = NetworkConfig(
    input_length=256,
    stem_features=8,
    block_features=(8,),
    inception_features=(16,),
    head_features=16,
)


def train_from_args(args) -> None:
    section("Training the barcode classifier")
    signals, labels = data_io.load_training_set(args.training_data)
    log(f"  {len(labels)} samples of size {signals.shape[1]}")
    network = TINY_PRESET if args.size == "tiny" else NetworkConfig()
    if signals.shape[1] <= network.input_length:
        quit_with_error(
            f"training samples ({signals.shape[1]}) must be longer than the "
            f"network input ({network.input_length})"
        )
    if labels.max() >= NUM_CLASSES or labels.min() < 0:
        quit_with_error("labels out of range")

    cfg = TrainConfig(
        network=network,
        learning_rate=args.learning_rate,
        batch_size=args.batch_size,
        epochs=args.epochs,
        test_fraction=args.test_fraction,
        aug_factor=args.aug_factor,
        seed=args.seed,
    )
    if jax.process_count() > 1:
        # Multi-host dp training: one GLOBAL mesh over every process's
        # devices.  Every process loads the same training TSV and walks the
        # identical seeded epoch order, so each global batch is reproduced
        # on every host and _on_mesh feeds each process's devices their
        # shard rows; XLA inserts the cross-host gradient all-reduce.
        # (Recipe + trajectory-parity test: docs/training.md,
        # tests/test_dist_train.py.)
        mesh = mesh_lib.make_mesh(jax.devices())
        log(f"  multi-host mesh: {dict(mesh.shape)} over "
            f"{jax.process_count()} process(es)")
    else:
        mesh = mesh_lib.make_mesh(data=args.dp if args.dp > 0 else 0)
        log(f"  mesh: {dict(mesh.shape)} over {mesh.devices.size} device(s)")
    trainer = Trainer(cfg, mesh)
    best, best_variables = train_loop(
        trainer, signals, labels,
        epochs=cfg.epochs, batch_size=cfg.batch_size,
        test_fraction=cfg.test_fraction, aug_factor=cfg.aug_factor,
        seed=cfg.seed, checkpoint_dir=args.checkpoint_dir, resume=args.resume,
    )
    if jax.process_index() == 0:  # replicated state; one writer
        save_model(
            args.out, network, best_variables,
            metadata={"best_val": best, "epochs": cfg.epochs},
        )
        log(f"  saved model to {args.out} (best val acc {best['accuracy']:.3f})")
