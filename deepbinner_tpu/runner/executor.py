"""Streaming batch executor: fast5 readers → fixed-shape batches → device.

Reference parity: the batching loop of ``deepbinner/classify.py`` (SURVEY.md
§3.1).  The reference reads each fast5 and predicts synchronously; here the
host side is a small pipeline engineered for TPU feeding:

- a reader thread pool pulls raw signal from fast5s (h5py or the C++ native
  reader) into a bounded queue — I/O overlaps compute, and a bounded queue
  gives backpressure instead of unbounded memory growth;
- batches are padded to a fixed bucket size so there is exactly ONE compiled
  program shape (XLA recompiles on any shape change — SURVEY.md §7 risk 3);
- JAX's async dispatch double-buffers device work: batch i+1 is enqueued
  while batch i computes; we keep a small in-flight deque and only block on
  the oldest result.

Per-file read errors are skipped and counted, matching the reference's
tolerance of partially-written files (SURVEY.md §5 failure-detection row).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from deepbinner_tpu.ops.preprocess import PreprocessConfig
from deepbinner_tpu.runner.pipeline import CallTable, ClassifyProgram
from deepbinner_tpu.utils import fast5 as fast5_io


@dataclasses.dataclass
class ReadResult:
    """One classified read, as the CLI layer consumes it."""

    read_id: str
    call: int                 # final class index, 0 = none
    start_call: int
    end_call: int
    start_probs: np.ndarray   # (C,)
    end_probs: np.ndarray     # (C,)


@dataclasses.dataclass
class ExecutorStats:
    reads: int = 0
    batches: int = 0
    failed_files: int = 0


_SENTINEL = object()

# Signature: path -> list of (read_id, int16 signal); plugged so the C++
# native reader can replace the h5py path transparently.
ReadFn = Callable[[str], List[Tuple[str, np.ndarray]]]


def _default_read_fn(path: str) -> List[Tuple[str, np.ndarray]]:
    return list(fast5_io.iterate_reads_in_fast5(path))


def _reader_worker(
    paths: "queue.Queue[object]",
    out: "queue.Queue[object]",
    stats: ExecutorStats,
    stats_lock: threading.Lock,
    read_fn: ReadFn,
) -> None:
    while True:
        path = paths.get()
        if path is _SENTINEL:
            out.put(_SENTINEL)
            return
        try:
            reads = read_fn(path)  # type: ignore[arg-type]
        except Exception:
            reads = []
        if not reads:
            with stats_lock:
                stats.failed_files += 1
            continue
        for item in reads:
            out.put(item)


def iter_signals(
    fast5_paths: Sequence[str],
    num_readers: int = 4,
    queue_depth: int = 256,
    stats: Optional[ExecutorStats] = None,
    read_fn: ReadFn = _default_read_fn,
) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (read_id, signal) from files using a reader thread pool.

    Yields in *completion* order — callers needing determinism must sort
    downstream (the call-table merge does; SURVEY.md §7 build step 6).
    """
    stats = stats or ExecutorStats()
    path_q: "queue.Queue[object]" = queue.Queue()
    out_q: "queue.Queue[object]" = queue.Queue(maxsize=queue_depth)
    for path in fast5_paths:
        path_q.put(path)
    for _ in range(num_readers):
        path_q.put(_SENTINEL)
    lock = threading.Lock()
    workers = [
        threading.Thread(
            target=_reader_worker, args=(path_q, out_q, stats, lock, read_fn),
            daemon=True,
        )
        for _ in range(num_readers)
    ]
    for worker in workers:
        worker.start()
    finished = 0
    while finished < num_readers:
        item = out_q.get()
        if item is _SENTINEL:
            finished += 1
            continue
        yield item  # type: ignore[misc]


def build_batch(
    reads: Sequence[Tuple[str, np.ndarray]],
    cfg: PreprocessConfig,
    batch_size: int,
    dual: bool,
) -> Tuple[List[str], np.ndarray, np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
    """Pad reads into fixed-shape buffers.

    start buffer: first ``buffer_size`` samples of each read.
    end buffer:   last ``buffer_size`` samples **reversed**, so open-pore
    trimming runs identically for both ends (see preprocess.extract_scan_region).
    Rows beyond ``len(reads)`` are zero-length padding → "none" on device,
    dropped by the caller.
    """
    buffer = cfg.buffer_size
    ids: List[str] = []
    # int16 end-to-end on the host: raw DAC values are int16 natively and the
    # device casts to f32 in-graph — this halves host→device transfer bytes
    # (measured ~60 MB/s on the tunnel; the batch is the dominant payload).
    start = np.zeros((batch_size, buffer), np.int16)
    start_len = np.zeros((batch_size,), np.int32)
    end = np.zeros((batch_size, buffer), np.int16) if dual else None
    end_len = np.zeros((batch_size,), np.int32) if dual else None

    for i, (read_id, signal) in enumerate(reads):
        ids.append(read_id)
        n = min(signal.size, buffer)
        start[i, :n] = signal[:n]
        start_len[i] = n
        if dual:
            tail = signal[-n:] if signal.size else signal
            end[i, :n] = tail[::-1]
            end_len[i] = n
    return ids, start, start_len, end, end_len


def classify_stream(
    program: ClassifyProgram,
    signals: Iterable[Tuple[str, np.ndarray]],
    batch_size: int = 128,
    stats: Optional[ExecutorStats] = None,
    in_flight: int = 2,
) -> Iterator[ReadResult]:
    """Classify a stream of (read_id, signal); yields ReadResults.

    Keeps up to `in_flight` device batches enqueued (JAX async dispatch) so
    host batch assembly and device compute overlap.
    """
    import collections

    stats = stats or ExecutorStats()
    cfg = program.cfg.preprocess
    dual = program.cfg.dual_model
    pending: "collections.deque[Tuple[List[str], CallTable]]" = collections.deque()

    def submit(batch_reads: Sequence[Tuple[str, np.ndarray]]) -> None:
        ids, s, sl, e, el = build_batch(batch_reads, cfg, batch_size, dual)
        out = program(s, sl, e, el) if dual else program(s, sl)
        pending.append((ids, out))
        stats.batches += 1

    def drain_one() -> Iterator[ReadResult]:
        ids, out = pending.popleft()
        calls = np.asarray(out.calls)
        start_calls = np.asarray(out.start_calls)
        end_calls = np.asarray(out.end_calls)
        start_probs = np.asarray(out.start_probs)
        end_probs = np.asarray(out.end_probs)
        for i, read_id in enumerate(ids):
            stats.reads += 1
            yield ReadResult(
                read_id=read_id,
                call=int(calls[i]),
                start_call=int(start_calls[i]),
                end_call=int(end_calls[i]),
                start_probs=start_probs[i],
                end_probs=end_probs[i],
            )

    buffered: List[Tuple[str, np.ndarray]] = []
    for item in signals:
        buffered.append(item)
        if len(buffered) == batch_size:
            submit(buffered)
            buffered = []
            if len(pending) >= in_flight:
                yield from drain_one()
    if buffered:
        submit(buffered)
    while pending:
        yield from drain_one()


def classify_files(
    program: ClassifyProgram,
    fast5_paths: Sequence[str],
    batch_size: int = 128,
    num_readers: int = 4,
    stats: Optional[ExecutorStats] = None,
    read_fn: ReadFn = _default_read_fn,
) -> Iterator[ReadResult]:
    """End-to-end: fast5 paths → classified reads (streaming)."""
    stats = stats or ExecutorStats()
    signals = iter_signals(
        fast5_paths, num_readers=num_readers, stats=stats, read_fn=read_fn
    )
    yield from classify_stream(program, signals, batch_size=batch_size, stats=stats)
