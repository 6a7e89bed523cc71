"""Host-side batch assembly — numpy-only, importable by reader workers.

Reference parity: the per-batch ``np.stack`` feeding ``model.predict`` in
``deepbinner/classify.py :: classify_fast5_files`` (SURVEY.md §3.1).  Kept
free of any JAX import so multiprocessing reader workers (which must never
initialise the TPU client) can build device-ready batches themselves —
the consumer process then only forwards fixed-shape buffers to the device,
which is what lets end-to-end throughput track the device bound on a
2-CPU host.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class ExecutorStats:
    reads: int = 0
    batches: int = 0
    failed_files: int = 0
    # Which files failed and why: a transient I/O failure must be
    # re-attemptable (shard resume) and a 100%-unreadable input set must
    # fail loudly instead of emitting an empty table (round-2 ADVICE 2+4).
    failed_paths: List[str] = dataclasses.field(default_factory=list)
    failed_errors: List[str] = dataclasses.field(default_factory=list)

    def record_failure(self, path: str, error: str = "") -> None:
        self.failed_files += 1
        self.failed_paths.append(path)
        self.failed_errors.append(error)


@dataclasses.dataclass(frozen=True)
class TrimSpec:
    """Open-pore trim geometry for HOST-side pre-trimming.

    Numpy mirror of ops.preprocess.find_signal_start (reference parity:
    ``deepbinner/trim_signal.py`` — SURVEY.md §2 item 9).  When a BatchSpec
    carries one, reader workers locate the signal start themselves and ship
    only the ``scan_size`` samples the CNN consumes — cutting the
    host→device payload from (trim_scan + scan_size) to scan_size per read
    end (25% fewer bytes at the default 2048+6144 geometry; the axon tunnel
    is the throughput wall, see docs/performance.md).
    """

    trim_scan: int
    trim_window: int
    trim_stride: int
    trim_threshold: float
    window: int        # never trim past (read_len - window)
    scan_size: int

    @property
    def raw_size(self) -> int:
        """Samples of raw signal the trim search + scan region need."""
        return self.trim_scan + self.scan_size


def pretrim_read(signal: np.ndarray, trim: TrimSpec) -> np.ndarray:
    """Trim open-pore signal from a read end; returns ≤ scan_size samples.

    Exactly the device trim's math on the unpadded signal (the masked-sum
    device formulation reduces to plain mean/std when no padding exists;
    parity-tested against the in-graph path in tests/test_host_trim.py).
    The returned array is a slice of the raw int16 signal — the trim index
    is computed in float32 but no sample values change.
    """
    sig = signal[: trim.raw_size]
    region = sig[: trim.trim_scan].astype(np.float32)
    start = 0
    if region.size >= trim.trim_window:
        global_std = region.std()
        view = np.lib.stride_tricks.sliding_window_view(
            region, trim.trim_window
        )[:: trim.trim_stride]
        stds = view.std(axis=1)
        good = stds >= trim.trim_threshold * global_std
        if good.any():
            start = int(np.argmax(good)) * trim.trim_stride
    start = min(start, max(sig.size - trim.window, 0))
    return sig[start : start + trim.scan_size]


@dataclasses.dataclass(frozen=True)
class BatchSpec:
    """Fixed batch geometry (must match the compiled classify program)."""

    batch_size: int
    buffer_size: int   # PreprocessConfig.buffer_size (trim headroom + scan)
    dual: bool         # also build the reversed end-of-read buffer
    # Host-side pre-trim: workers trim open-pore signal and ship only the
    # scan region (buffer_size == scan_size); the device skips its in-graph
    # trim (PreprocessConfig.host_trim=True builds the matching program).
    trim: Optional[TrimSpec] = None


# A built batch: (read_ids, start, start_len, end, end_len).  Rows beyond
# len(read_ids) are zero padding → "none" on device, dropped by the caller.
BuiltBatch = Tuple[List[str], np.ndarray, np.ndarray,
                   Optional[np.ndarray], Optional[np.ndarray]]


def build_batch_arrays(
    reads: Sequence[Tuple[str, np.ndarray]], spec: BatchSpec
) -> BuiltBatch:
    """Pad reads into fixed-shape buffers.

    start buffer: first ``buffer_size`` samples of each read.
    end buffer:   last ``buffer_size`` samples **reversed**, so open-pore
    trimming runs identically for both ends (see
    ops.preprocess.extract_scan_region).
    """
    buffer = spec.buffer_size
    trim = spec.trim
    if trim is not None and trim.scan_size != buffer:
        raise ValueError(
            f"pre-trimmed buffers must be scan_size ({trim.scan_size}), "
            f"spec has buffer_size {buffer}"
        )
    ids: List[str] = []
    # int16 end-to-end on the host: raw DAC values are int16 natively and the
    # device casts to f32 in-graph — this halves host→device transfer bytes
    # (measured ~60 MB/s on the tunnel; the batch is the dominant payload).
    start = np.zeros((spec.batch_size, buffer), np.int16)
    start_len = np.zeros((spec.batch_size,), np.int32)
    end = np.zeros((spec.batch_size, buffer), np.int16) if spec.dual else None
    end_len = np.zeros((spec.batch_size,), np.int32) if spec.dual else None

    for i, (read_id, signal) in enumerate(reads):
        ids.append(read_id)
        head = pretrim_read(signal, trim) if trim is not None else signal
        n = min(head.size, buffer)
        start[i, :n] = head[:n]
        start_len[i] = n
        if spec.dual:
            tail = signal[::-1]
            if trim is not None:
                tail = pretrim_read(tail, trim)
            m = min(tail.size, buffer)
            end[i, :m] = tail[:m]
            end_len[i] = m
    return ids, start, start_len, end, end_len
