"""ctypes binding for the native vbz signal unpacker (libdeepbinner_vbz.so).

One fused C pass replaces the ~8-pass numpy svb16+zigzag+cumsum chain in
``utils/pod5.vbz_decompress`` (see src/vbz_decode.cc for the measured
motivation).  Degrades gracefully: ``available()`` gates the fast path
and the numpy implementation remains the oracle (parity pinned in
tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

_LIB_NAME = "libdeepbinner_vbz.so"
_lib: Optional[ctypes.CDLL] = None
_lib_lock = threading.Lock()
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        path = os.path.join(os.path.dirname(__file__), "lib", _LIB_NAME)
        if not os.path.exists(path):
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _load_failed = True
            return None
        lib.db_vbz_unpack.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int16),
        ]
        lib.db_vbz_unpack.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def unpack(raw: bytes, count: int) -> np.ndarray:
    """svb16-unpack + zigzag + wrapping-int16 prefix sum, one C pass.

    ``raw`` is the zstd-decompressed vbz payload; returns the (count,)
    int16 signal.  Raises ValueError on a truncated stream (mirroring
    the numpy path's error).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native vbz unpacker not built")
    out = np.empty(count, np.int16)
    status = lib.db_vbz_unpack(
        raw, len(raw), count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    if status != 0:
        raise ValueError("svb16 stream truncated")
    return out
