"""ctypes bindings for the C++ fast5 batch reader (libdeepbinner_fast5.so).

The reference delegates HDF5 decode to h5py→libhdf5 from Python, one call
per read (SURVEY.md §2 item 10).  The native reader drops the per-read
Python/h5py overhead: one C++ call decodes a whole file (all reads) off the
GIL directly into numpy-owned buffers, so reader threads scale with actual
I/O instead of interpreter time.

Build with ``python -m deepbinner_tpu.native.build`` (cmake+ninja, links the
system libhdf5).  Everything degrades gracefully to the h5py path when the
shared library is absent — `available()` gates the CLI's --native_reader.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import List, Optional, Tuple

import numpy as np

_LIB_NAME = "libdeepbinner_fast5.so"
_lib: Optional[ctypes.CDLL] = None
_lib_lock = threading.Lock()
_load_failed = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "lib", _LIB_NAME)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        path = _lib_path()
        if not os.path.exists(path):
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _load_failed = True
            return None
        # int db_read_fast5(const char* path, db_read_out** out, int* count)
        lib.db_read_fast5.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(_ReadOut)),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.db_read_fast5.restype = ctypes.c_int
        # int db_read_fast5_slices(path, head, tail, out, count) — head/tail
        # > 0 decode only those end slices of each signal.
        lib.db_read_fast5_slices.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(_ReadOut)),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.db_read_fast5_slices.restype = ctypes.c_int
        lib.db_free_reads.argtypes = [ctypes.POINTER(_ReadOut), ctypes.c_int]
        lib.db_free_reads.restype = None
        _lib = lib
        return _lib


class _ReadOut(ctypes.Structure):
    _fields_ = [
        ("read_id", ctypes.c_char * 64),
        ("signal", ctypes.POINTER(ctypes.c_int16)),
        ("length", ctypes.c_int64),
    ]


def available() -> bool:
    return _load() is not None


def read_file(path: str, head: int = 0,
              tail: int = 0) -> List[Tuple[str, np.ndarray]]:
    """Read all raw-signal reads from one fast5 via the C++ reader.

    Matches the h5py backend's contract exactly (same read ids, same int16
    arrays) — the parity test in tests/test_native.py enforces it.
    ``head``/``tail`` > 0 decode only those end slices per signal (HDF5
    hyperslab selections, skipping the bulk of long reads).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native fast5 reader not built")
    out = ctypes.POINTER(_ReadOut)()
    count = ctypes.c_int(0)
    status = lib.db_read_fast5_slices(
        os.fsencode(path), head, tail, ctypes.byref(out), ctypes.byref(count)
    )
    if status != 0:
        raise OSError(f"native fast5 reader failed on {path} (status {status})")
    try:
        reads: List[Tuple[str, np.ndarray]] = []
        for i in range(count.value):
            entry = out[i]
            # as_array views the C buffer as int16 already; one copy takes
            # ownership (a redundant astype here would copy a second time).
            signal = np.ctypeslib.as_array(entry.signal, (entry.length,)).copy()
            reads.append((entry.read_id.decode(), signal))
        return reads
    finally:
        lib.db_free_reads(out, count)
