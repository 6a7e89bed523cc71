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
class BatchSpec:
    """Fixed batch geometry (must match the compiled classify program)."""

    batch_size: int
    buffer_size: int   # PreprocessConfig.buffer_size (trim headroom + scan)
    dual: bool         # also build the reversed end-of-read buffer


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
        n = min(signal.size, buffer)
        start[i, :n] = signal[:n]
        start_len[i] = n
        if spec.dual:
            tail = signal[-n:] if signal.size else signal
            end[i, :n] = tail[::-1]
            end_len[i] = n
    return ids, start, start_len, end, end_len
