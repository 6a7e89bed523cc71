"""Multi-process fast5 reader: N worker processes feed one consumer.

The in-process readers top out at the speed of ONE libhdf5: the system
library is not a threadsafe build, so both h5py and the native reader
serialise on a process-wide lock.  Worker *processes* each own an
independent libhdf5 (and, with the native reader, never touch the GIL), so
file decode scales with workers — the classic data-loader-worker design the
reference never needed at Keras-CPU speeds.

Workers are spawned (not forked): the parent has live JAX/axon threads that
must not leak into children.  Children import only the I/O modules — no JAX.
Arrays travel over a multiprocessing queue (pickle = one memcpy, ~µs per
read at nanopore sizes, irrelevant next to HDF5 decode).
"""

from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from deepbinner_tpu.runner.executor import ExecutorStats

_STOP = None  # sentinel on the path queue


def _worker(
    path_queue: "mp.Queue",
    out_queue: "mp.Queue",
    use_native: bool,
) -> None:
    # Import inside the child: no JAX, just HDF5 decode.
    read_file = None
    if use_native:
        from deepbinner_tpu.native import fast5_reader

        if fast5_reader.available():
            read_file = fast5_reader.read_file
    if read_file is None:
        from deepbinner_tpu.utils.fast5 import iterate_reads_in_fast5

        read_file = lambda path: list(iterate_reads_in_fast5(path))  # noqa: E731

    while True:
        path = path_queue.get()
        if path is _STOP:
            out_queue.put(_STOP)
            return
        try:
            reads = read_file(path)
        except Exception:
            reads = []
        if not reads:
            out_queue.put(("__failed__", path))
            continue
        for read_id, signal in reads:
            out_queue.put((read_id, signal))


def iter_signals_mp(
    fast5_paths: Sequence[str],
    num_workers: int = 4,
    queue_depth: int = 512,
    stats: Optional[ExecutorStats] = None,
    use_native: bool = True,
) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (read_id, int16 signal) from worker processes, completion order."""
    stats = stats or ExecutorStats()
    ctx = mp.get_context("spawn")
    path_queue: "mp.Queue" = ctx.Queue()
    out_queue: "mp.Queue" = ctx.Queue(maxsize=queue_depth)
    for path in fast5_paths:
        path_queue.put(path)
    for _ in range(num_workers):
        path_queue.put(_STOP)
    workers: List[mp.Process] = [
        ctx.Process(target=_worker, args=(path_queue, out_queue, use_native),
                    daemon=True)
        for _ in range(num_workers)
    ]
    for worker in workers:
        worker.start()
    finished = 0
    try:
        while finished < num_workers:
            try:
                item = out_queue.get(timeout=300)
            except queue_mod.Empty:
                raise RuntimeError("mp reader stalled (no reads for 300s)")
            if item is _STOP:
                finished += 1
                continue
            if item[0] == "__failed__":
                stats.failed_files += 1
                continue
            yield item
    finally:
        for worker in workers:
            worker.join(timeout=5)
            if worker.is_alive():
                worker.terminate()
