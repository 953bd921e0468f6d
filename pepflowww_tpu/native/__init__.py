"""Native (C++) data-plane kernels with on-demand build and Python fallback.

`load()` compiles `recordstore.cpp` with g++ on first use (cached .so beside
the source) and exposes ctypes bindings; callers fall back to pure-Python
paths when no toolchain is present, so the package never hard-fails.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "recordstore.cpp")
_LIB = os.path.join(_HERE, "librecordstore.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    """Return the loaded native library, building it if needed; None if
    unavailable (no compiler / build failure)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
                     "-o", _LIB, "-lz", "-lpthread"],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.decompress_records.restype = ctypes.c_int64
            lib.compress_record.restype = ctypes.c_int64
            lib.compress_bound.restype = ctypes.c_int64
            lib.compress_bound.argtypes = [ctypes.c_int64]
            _lib = lib
        except (subprocess.CalledProcessError, OSError):
            _lib = None
        return _lib


def decompress_batch(blobs: list[bytes], out_caps: list[int], n_threads: int = 8):
    """Decompress a list of zlib blobs in parallel; returns list[bytes].

    Falls back to per-blob zlib.decompress when the native lib is absent.
    """
    lib = load()
    if lib is None:
        import zlib

        return [zlib.decompress(b) for b in blobs]

    n = len(blobs)
    src = b"".join(blobs)
    src_arr = np.frombuffer(src, dtype=np.uint8)
    src_lens = np.asarray([len(b) for b in blobs], dtype=np.int64)
    src_offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(src_lens[:-1], out=src_offsets[1:])
    caps = np.asarray(out_caps, dtype=np.int64)
    dst_offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(caps[:-1], out=dst_offsets[1:])
    dst = np.empty(int(caps.sum()), dtype=np.uint8)
    out_lens = np.zeros(n, dtype=np.int64)

    rc = lib.decompress_records(
        src_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        src_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dst_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        caps.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int32(n_threads),
    )
    if rc != 0:
        import zlib

        return [zlib.decompress(b) for b in blobs]
    return [
        dst[dst_offsets[i] : dst_offsets[i] + out_lens[i]].tobytes()
        for i in range(n)
    ]


def pad_stack_f32(items: list[np.ndarray], pad_to: int, pad_value: float = 0.0):
    """Pad/stack variable-length (L_i, ...) float32 items -> (n, pad_to, ...).

    Uses the native fused memcpy kernel when available.
    """
    lib = load()
    trailing = items[0].shape[1:]
    row_elems = int(np.prod(trailing)) if trailing else 1
    n = len(items)
    if lib is None:
        out = np.full((n, pad_to) + trailing, pad_value, dtype=np.float32)
        for i, it in enumerate(items):
            out[i, : it.shape[0]] = it
        return out

    items_c = [np.ascontiguousarray(it, dtype=np.float32) for it in items]
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[it.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for it in items_c]
    )
    lengths = np.asarray([it.shape[0] for it in items_c], dtype=np.int64)
    out = np.empty((n, pad_to) + trailing, dtype=np.float32)
    lib.pad_stack_f32(
        ptrs,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n), ctypes.c_int64(pad_to), ctypes.c_int64(row_elems),
        ctypes.c_float(pad_value),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
