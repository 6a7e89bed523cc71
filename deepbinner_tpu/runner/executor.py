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
from deepbinner_tpu.runner.hostbatch import (  # noqa: F401 — re-exported API
    BatchSpec,
    BuiltBatch,
    ExecutorStats,
    TrimSpec,
    build_batch_arrays,
)
from deepbinner_tpu.runner.pipeline import ClassifyProgram
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


_SENTINEL = object()

# Signature: path -> list of (read_id, int16 signal); plugged so the C++
# native reader can replace the h5py path transparently.
ReadFn = Callable[[str], List[Tuple[str, np.ndarray]]]


def _default_read_fn(path: str) -> List[Tuple[str, np.ndarray]]:
    return fast5_io.read_signal_file(path)  # fast5 AND pod5 by extension


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
        error = ""
        try:
            reads = read_fn(path)  # type: ignore[arg-type]
        except Exception as exc:  # noqa: BLE001 — skip-and-count semantics
            reads = []
            error = repr(exc)
        if not reads:
            with stats_lock:
                stats.record_failure(path, error)
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


def batch_spec_for(
    cfg: PreprocessConfig, batch_size: int, dual: bool
) -> BatchSpec:
    """The BatchSpec matching a compiled program's PreprocessConfig.

    SINGLE source of truth for host↔device batch geometry: under
    ``cfg.host_trim`` the spec carries the TrimSpec so whoever assembles
    batches (reader workers or the in-process path) applies exactly the
    trim the device skips.
    """
    trim = None
    if cfg.host_trim:
        trim = TrimSpec(
            trim_scan=cfg.trim_scan,
            trim_window=cfg.trim_window,
            trim_stride=cfg.trim_stride,
            trim_threshold=cfg.trim_threshold,
            window=cfg.window,
            scan_size=cfg.scan_size,
        )
    if cfg.wire in ("int8", "int4") and trim is None:
        raise ValueError(f"wire='{cfg.wire}' requires host_trim (quantisation "
                         "must run after the open-pore trim, in the workers)")
    return BatchSpec(batch_size=batch_size, buffer_size=cfg.buffer_size,
                     dual=dual, trim=trim, wire=cfg.wire)


def build_batch(
    reads: Sequence[Tuple[str, np.ndarray]],
    cfg: PreprocessConfig,
    batch_size: int,
    dual: bool,
) -> BuiltBatch:
    """Pad reads into fixed-shape buffers (see hostbatch.build_batch_arrays)."""
    return build_batch_arrays(reads, batch_spec_for(cfg, batch_size, dual))


# Streaming pipeline window (measured optima on the tunnel host — see the
# classify_batches docstring; r5 re-tune: 12/6 measured above 8/4 and
# 16/8 in BOTH same-process sweeps, /tmp→BENCH_STREAM_r05 artifacts).
# Exported so slot-count sizing elsewhere (StreamRunner, bench) can cover
# the whole in-flight window: a zero-copy shm pass holds up to IN_FLIGHT
# pending + PREFETCH queued slots at once, so the ring needs at least
# MIN_SHM_SLOTS.
IN_FLIGHT = 12
PREFETCH = 6
MIN_SHM_SLOTS = IN_FLIGHT + PREFETCH + 2


def classify_batches(
    program: ClassifyProgram,
    batches: Iterable[BuiltBatch],
    stats: Optional[ExecutorStats] = None,
    in_flight: int = IN_FLIGHT,
    prefetch: int = PREFETCH,
    dispatch_threads: int = 3,
) -> Iterator[ReadResult]:
    """Classify pre-built fixed-shape batches; yields ReadResults.

    Keeps up to `in_flight` device batches enqueued (JAX async dispatch) so
    batch arrival and device compute overlap.  This is the hot path when
    reader worker processes build the batches themselves
    (mp_reader.ReaderPool.iter_batches) — the consumer process does nothing
    per read, only one dispatch + one result drain per batch.

    ``prefetch`` > 0 pulls the batch iterator on a small feeder thread, so
    the multiprocessing-queue deserialisation (a multi-MB numpy memcpy per
    batch) overlaps the device wait instead of serialising with dispatch.
    This thread touches ONLY pickled numpy — never libhdf5/h5py, the
    combination that wedged the TPU client in round 1.

    ``dispatch_threads`` > 1 issues `program.call_packed` from a small
    thread pool: on the axon-tunnelled TPU the multi-MB host→device batch
    upload blocks its caller, and the tunnel MULTIPLEXES — measured
    aggregate 38.6 MB/s at 1 stream, 49.8 at 2, 54.8 at 3, then WORSE at
    4+ (47.5) as streams thrash (scripts/tunnel_probe.py, round 3), so 3
    is the sweet spot.  Batch order is preserved by the pending deque;
    per-batch results are independent, so determinism is unaffected.
    Threads call only jit entry points (no libhdf5).  ``in_flight`` must
    leave the dispatch pool headroom: with 3 upload streams in flight an
    8-deep pending window keeps the tunnel saturated while the oldest
    result drains (int8-era retune, /tmp→BENCH_STREAM artifacts: 6/3 was
    the pickle-era optimum; with half-size batches the deeper 8/4 and
    10/5 windows measured consistently above it).
    """
    import collections
    import queue as queue_mod
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from deepbinner_tpu.runner.pipeline import unpack_call_table

    stats = stats or ExecutorStats()
    dual = program.cfg.dual_model
    pending: "collections.deque[Tuple[List[str], object]]" = collections.deque()
    executor = (ThreadPoolExecutor(max_workers=dispatch_threads,
                                   thread_name_prefix="classify-dispatch")
                if dispatch_threads > 1 else None)

    if prefetch > 0:
        feed: "queue_mod.Queue" = queue_mod.Queue(maxsize=prefetch)
        error: List[BaseException] = []

        def feeder() -> None:
            try:
                for item in batches:
                    feed.put(item)
            except BaseException as exc:  # noqa: BLE001 — surfaced below
                error.append(exc)
            finally:
                feed.put(None)

        threading.Thread(target=feeder, daemon=True,
                         name="classify-batch-feeder").start()

        def iter_fed() -> Iterator[BuiltBatch]:
            while True:
                item = feed.get()
                if item is None:
                    if error:
                        raise error[0]
                    return
                yield item

        batches = iter_fed()

    def drain_one() -> Iterator[ReadResult]:
        ids, packed, release = pending.popleft()
        if executor is not None:
            packed = packed.result()  # future → device array
        out = unpack_call_table(packed)  # ONE device→host transfer per batch
        if release is not None:
            # Zero-copy shm batch: the np.asarray above fetched THIS
            # batch's result D2H, which fences its own upload (the compute
            # consumed the input) — the only reliable completion signal on
            # the axon tunnel, where block_until_ready is a no-op.  Only
            # now may the slot be recycled to a writer.
            release()
        # Batch the numpy→Python conversions (one C loop per field, not
        # three `int()` calls per read) — measurable on a 2-vCPU host at
        # thousands of reads/s where this loop competes with the dispatch
        # threads for the GIL.
        calls = out.calls.tolist()
        start_calls = out.start_calls.tolist()
        end_calls = out.end_calls.tolist()
        stats.reads += len(ids)
        for i, read_id in enumerate(ids):
            yield ReadResult(
                read_id=read_id,
                call=calls[i],
                start_call=start_calls[i],
                end_call=end_calls[i],
                start_probs=out.start_probs[i],
                end_probs=out.end_probs[i],
            )

    def dispatch(s, sl, e, el):
        return (program.call_packed(s, sl, e, el) if dual
                else program.call_packed(s, sl))

    try:
        for batch in batches:
            # 5-tuple: owned arrays.  6-tuple (mp_reader iter_batches
            # copy=False): shm slot views + a release callback to recycle
            # the slot once this batch's result has been fetched.
            ids, s, sl, e, el = batch[:5]
            release = batch[5] if len(batch) > 5 else None
            if executor is not None:
                packed = executor.submit(dispatch, s, sl, e, el)
            else:
                packed = dispatch(s, sl, e, el)
            pending.append((ids, packed, release))
            stats.batches += 1
            if len(pending) >= in_flight:
                yield from drain_one()
        while pending:
            yield from drain_one()
    finally:
        if executor is not None:
            # wait=True: in-progress dispatches finish their uploads before
            # any abandoned slot below is recycled to a writer.
            executor.shutdown(wait=True, cancel_futures=True)
        # Consumer abandoned mid-pass (exception / early close): the
        # pending batches' results are discarded, so their slots can go
        # straight back (releases are idempotent; the pool also reclaims
        # at next pass as a backstop).
        for _ids, _packed, release in pending:
            if release is not None:
                release()


def classify_stream(
    program: ClassifyProgram,
    signals: Iterable[Tuple[str, np.ndarray]],
    batch_size: int = 128,
    stats: Optional[ExecutorStats] = None,
    in_flight: int = 2,
) -> Iterator[ReadResult]:
    """Classify a stream of (read_id, signal); yields ReadResults.

    Batches are assembled here on the consumer; prefer classify_batches +
    worker-side assembly for TPU-backed streaming throughput.
    """
    cfg = program.cfg.preprocess
    dual = program.cfg.dual_model

    def batch_iter() -> Iterator[BuiltBatch]:
        buffered: List[Tuple[str, np.ndarray]] = []
        for item in signals:
            buffered.append(item)
            if len(buffered) == batch_size:
                yield build_batch(buffered, cfg, batch_size, dual)
                buffered = []
        if buffered:
            yield build_batch(buffered, cfg, batch_size, dual)

    yield from classify_batches(program, batch_iter(), stats=stats,
                                in_flight=in_flight)


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
