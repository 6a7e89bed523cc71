"""The fused classify program: trim → normalise → window → CNN → call, one jit.

Reference parity: the body of ``deepbinner/classify.py::classify_fast5_files``
(SURVEY.md §3.1) — but where the reference interleaves numpy preprocessing
with ``model.predict`` calls, here the entire per-batch computation is a
single XLA program.  The host's only jobs are reading fast5s into fixed-shape
buffers and formatting TSV rows from the compact call table that comes back.

The program is compiled once per (batch_bucket, config) and cached; weights
are passed as arguments (not baked in) so start/end models share one
executable shape.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from deepbinner_tpu.models.network import DemuxNet
from deepbinner_tpu.ops.calling import (
    CallingConfig,
    call_one_end,
    combine_window_probs,
    reconcile_calls,
)
from deepbinner_tpu.ops.preprocess import PreprocessConfig, preprocess_batch


class CallTable(NamedTuple):
    """Per-batch device output — everything the host needs for TSV rows."""

    calls: jnp.ndarray        # (B,) int32 final class index (0 = none)
    start_calls: jnp.ndarray  # (B,) int32 start-model call
    end_calls: jnp.ndarray    # (B,) int32 end-model call (== start when single)
    start_probs: jnp.ndarray  # (B, C) combined start probabilities
    end_probs: jnp.ndarray    # (B, C) combined end probabilities (zeros when single)


@dataclasses.dataclass(frozen=True)
class ClassifyConfig:
    """Everything static about a classify run."""

    preprocess: PreprocessConfig = PreprocessConfig()
    calling: CallingConfig = CallingConfig()
    dual_model: bool = False
    # Run the CNN through the fused Pallas conv kernels instead of the flax
    # graph (same weights, parity-tested; see models/pallas_apply.py).
    use_pallas: bool = False
    # With use_pallas: single whole-trunk megakernel (activations never
    # leave VMEM between layers) vs one kernel per ConvBNRelu unit.
    pallas_fused: bool = True
    # With use_pallas: explicit trunk variant, overriding pallas_fused —
    # "fused" (megakernel), "unit" (one kernel per ConvBNRelu),
    # "split3" (three-kernel trunk, each stage at its own batch tile),
    # "hybrid" (Pallas only at the geometries where the round-4 unit
    # sweep measured it ahead of XLA; XLA elsewhere).
    pallas_path: Optional[str] = None


def _one_end_probs(
    model: DemuxNet,
    cfg: "ClassifyConfig",
    variables: dict,
    signal: jnp.ndarray,
    lengths: jnp.ndarray,
) -> jnp.ndarray:
    """(B, buffer) signal → (B, C) combined probabilities for one read end."""
    windows, mask = preprocess_batch(signal, lengths, cfg.preprocess)
    batch, num_windows, width = windows.shape
    flat = windows.reshape(batch * num_windows, width, 1)
    if cfg.use_pallas:
        from deepbinner_tpu.models import pallas_apply

        path = cfg.pallas_path or ("fused" if cfg.pallas_fused else "unit")
        apply = {
            "fused": pallas_apply.apply_inference_pallas_fused,
            "unit": pallas_apply.apply_inference_pallas,
            "split3": pallas_apply.apply_inference_pallas_split3,
            "hybrid": pallas_apply.apply_inference_pallas_hybrid,
        }[path]
        probs = apply(model.config, variables, flat)
    else:
        logits = model.apply(variables, flat, train=False)
        probs = jax.nn.softmax(logits, axis=-1)
    probs = probs.reshape(batch, num_windows, -1)
    return combine_window_probs(probs, mask, rule=cfg.calling.combine)


def classify_step(
    model: DemuxNet,
    cfg: ClassifyConfig,
    start_variables: dict,
    end_variables: Optional[dict],
    start_signal: jnp.ndarray,
    start_lengths: jnp.ndarray,
    end_signal: Optional[jnp.ndarray] = None,
    end_lengths: Optional[jnp.ndarray] = None,
    end_model: Optional[DemuxNet] = None,
) -> CallTable:
    """Pure function computing the call table for one padded batch.

    ``end_model`` defaults to ``model`` — correct for native .dbt models
    (same architecture, different weights).  Imported Keras graphs execute
    by layer *name*, so the end model must bring its own graph object.
    """
    start_probs = _one_end_probs(
        model, cfg, start_variables, start_signal, start_lengths
    )
    start_call = call_one_end(start_probs, cfg.calling)

    if cfg.dual_model:
        assert end_variables is not None and end_signal is not None
        end_probs = _one_end_probs(
            end_model if end_model is not None else model,
            cfg, end_variables, end_signal, end_lengths
        )
        end_call = call_one_end(end_probs, cfg.calling)
        final = reconcile_calls(start_call, end_call, cfg.calling)
    else:
        end_probs = jnp.zeros_like(start_probs)
        end_call = start_call
        final = start_call

    return CallTable(final, start_call, end_call, start_probs, end_probs)


def pack_call_table(table: CallTable) -> jnp.ndarray:
    """Flatten a CallTable into ONE (B, 3 + 2C) f32 array.

    The axon tunnel pays a round trip per device→host transfer; fetching
    the five CallTable fields separately costs 5 RTTs per batch.  Calls are
    small ints (≤ NUM_CLASSES), exactly representable in f32.
    """
    return jnp.concatenate(
        [
            table.calls[:, None].astype(jnp.float32),
            table.start_calls[:, None].astype(jnp.float32),
            table.end_calls[:, None].astype(jnp.float32),
            table.start_probs,
            table.end_probs,
        ],
        axis=1,
    )


def unpack_call_table(packed) -> CallTable:
    """Host-side inverse of pack_call_table (numpy in, numpy out)."""
    import numpy as np

    packed = np.asarray(packed)
    classes = (packed.shape[1] - 3) // 2
    return CallTable(
        calls=packed[:, 0].astype(np.int32),
        start_calls=packed[:, 1].astype(np.int32),
        end_calls=packed[:, 2].astype(np.int32),
        start_probs=packed[:, 3 : 3 + classes],
        end_probs=packed[:, 3 + classes :],
    )


class ClassifyProgram:
    """A compiled classify step bound to a model architecture + config.

    One instance per run; `__call__` dispatches to a jit cached per batch
    shape (the executor buckets batch sizes so there are at most two shapes).
    """

    def __init__(
        self,
        model: DemuxNet,
        cfg: ClassifyConfig,
        start_variables: dict,
        end_variables: Optional[dict] = None,
        mesh=None,
        end_model: Optional[DemuxNet] = None,
    ) -> None:
        if cfg.dual_model and end_variables is None:
            raise ValueError("dual_model requires end_variables")
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        step = functools.partial(
            classify_step, model, cfg,
            end_model=end_model if end_model is not None else model,
        )
        packed_step = lambda *args: pack_call_table(step(*args))  # noqa: E731
        # No buffer donation: the (B, buffer) input can't alias any output
        # shape, so donation would only generate copies + warnings.
        if mesh is None:
            # Commit weights to the device once.  Passing host arrays would
            # re-upload all ~77 leaves on every call — measured 126 ms/call
            # over the TPU tunnel vs 3 ms with device-resident weights.
            self.start_variables = jax.device_put(start_variables)
            self.end_variables = (
                jax.device_put(end_variables) if end_variables is not None
                else None
            )
            self._jitted = jax.jit(step)
            self._jitted_packed = jax.jit(packed_step)
        else:
            # Data-parallel over the mesh: replicated weights, batch sharded
            # on 'data'; jit inserts any collectives. Outputs are replicated
            # so the host reads one coherent call table.
            from deepbinner_tpu.parallel import mesh as mesh_lib

            rep = mesh_lib.replicated(mesh)
            bsh = mesh_lib.batch_sharding(mesh)
            self.start_variables = jax.device_put(start_variables, rep)
            self.end_variables = (
                jax.device_put(end_variables, rep) if end_variables is not None
                else None
            )
            data_shardings = (
                (bsh, bsh, bsh, bsh) if cfg.dual_model else (bsh, bsh, None, None)
            )
            self._jitted = jax.jit(
                step,
                in_shardings=(rep, rep) + data_shardings,
                out_shardings=rep,
            )
            self._jitted_packed = jax.jit(
                packed_step,
                in_shardings=(rep, rep) + data_shardings,
                out_shardings=rep,
            )

    def _args(self, start_signal, start_lengths, end_signal, end_lengths):
        return (
            self.start_variables,
            self.end_variables,
            jnp.asarray(start_signal),
            jnp.asarray(start_lengths),
            None if end_signal is None else jnp.asarray(end_signal),
            None if end_lengths is None else jnp.asarray(end_lengths),
        )

    def __call__(
        self,
        start_signal,
        start_lengths,
        end_signal=None,
        end_lengths=None,
    ) -> CallTable:
        return self._jitted(
            *self._args(start_signal, start_lengths, end_signal, end_lengths)
        )

    def call_packed(
        self,
        start_signal,
        start_lengths,
        end_signal=None,
        end_lengths=None,
    ) -> jnp.ndarray:
        """CallTable packed into one (B, 3+2C) f32 array — ONE device→host
        transfer per batch instead of five (the tunnel charges per RTT).
        The streaming executor unpacks with :func:`unpack_call_table`."""
        return self._jitted_packed(
            *self._args(start_signal, start_lengths, end_signal, end_lengths)
        )

    def warm_up(self, batch_size: int) -> None:
        """Compile ahead of time for a batch size (realtime latency budget).

        Also forces one device→host copy: on the axon-tunnelled TPU the
        FIRST D2H transfer of a process pays a pathological handshake
        (measured 84-373 s; H2D is always fast).  Paying it here keeps the
        first real batch — and every streaming pass — at steady-state speed.
        """
        import numpy as np

        pre = self.cfg.preprocess
        buf = pre.buffer_size
        wire = jnp.int8 if pre.wire in ("int8", "int4") else jnp.int16
        sig = jnp.zeros((batch_size, pre.wire_cols), wire)
        lengths = jnp.full((batch_size,), buf, jnp.int32)
        if self.cfg.dual_model:
            out = self.call_packed(sig, lengths, sig, lengths)
        else:
            out = self.call_packed(sig, lengths)
        np.asarray(out)  # blocks on compile + the first-D2H handshake
