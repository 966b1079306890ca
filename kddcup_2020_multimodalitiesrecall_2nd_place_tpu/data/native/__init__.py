"""ctypes bindings + on-demand build for the native preprocessing library."""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "preproc.cpp"
_LIB = _DIR / "libpreproc.so"
_lock = threading.Lock()
_lib = None

MAX_BOXES = 10
FEAT_DIM = 2048


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        str(_SRC),
        "-o",
        str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            try:
                _build()
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                raise NativeUnavailable(f"cannot build libpreproc: {e}") from e
        lib = ctypes.CDLL(str(_LIB))
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.parse_pairs.restype = ctypes.c_int64
        lib.parse_pairs.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            i64p,
            i64p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            i64p,
            i64p,
            i64p,
            i64p,
        ]
        lib.count_rows.restype = ctypes.c_int64
        lib.count_rows.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        _lib = lib
        return lib


def _split_at_lines(buf: bytes, n_chunks: int) -> list[bytes]:
    """Split a buffer into ~equal chunks on line boundaries."""
    if n_chunks <= 1 or len(buf) < 1 << 20:
        return [buf]
    chunks = []
    start = 0
    step = len(buf) // n_chunks
    for i in range(1, n_chunks):
        cut = buf.find(b"\n", min(start + step, len(buf) - 1))
        if cut == -1:
            break
        chunks.append(buf[start : cut + 1])
        start = cut + 1
    chunks.append(buf[start:])
    return [c for c in chunks if c]


def parse_pairs_native(buf: bytes, n_threads: int | None = None) -> dict[str, np.ndarray]:
    """Parse a whole TSV buffer into dense arrays (see preproc.cpp).

    The C call releases the GIL, so large buffers are split at line
    boundaries and parsed by a thread pool.
    """
    import concurrent.futures as cf
    import os

    n_threads = n_threads if n_threads is not None else min(8, os.cpu_count() or 1)
    chunks = _split_at_lines(buf, n_threads)
    if len(chunks) > 1:
        with cf.ThreadPoolExecutor(max_workers=len(chunks)) as pool:
            parts = list(pool.map(lambda c: _parse_single(c), chunks))
        out: dict = {}
        for k in parts[0]:
            if k == "n_errors":
                out[k] = sum(p[k] for p in parts)
            elif k == "queries":
                out[k] = [q for p in parts for q in p[k]]
            else:
                out[k] = np.concatenate([p[k] for p in parts], axis=0)
        return out
    return _parse_single(buf)


def _parse_single(buf: bytes) -> dict[str, np.ndarray]:
    lib = get_lib()
    n = int(lib.count_rows(buf, len(buf)))
    out = {
        "product_id": np.empty(n, np.int64),
        "query_id": np.empty(n, np.int64),
        "num_boxes": np.empty(n, np.int32),
        "boxes5": np.empty((n, MAX_BOXES, 5), np.float32),
        "boxes4": np.empty((n, MAX_BOXES, 4), np.float32),
        "features": np.empty((n, MAX_BOXES, FEAT_DIM), np.float32),
        "class_labels": np.empty((n, MAX_BOXES), np.int64),
    }
    query_off = np.empty(n, np.int64)
    query_len = np.empty(n, np.int64)
    n_errors = np.zeros(1, np.int64)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rows = int(
        lib.parse_pairs(
            buf,
            len(buf),
            n,
            ptr(out["product_id"], ctypes.c_int64),
            ptr(out["query_id"], ctypes.c_int64),
            ptr(out["num_boxes"], ctypes.c_int32),
            ptr(out["boxes5"], ctypes.c_float),
            ptr(out["boxes4"], ctypes.c_float),
            ptr(out["features"], ctypes.c_float),
            ptr(out["class_labels"], ctypes.c_int64),
            ptr(query_off, ctypes.c_int64),
            ptr(query_len, ctypes.c_int64),
            ptr(n_errors, ctypes.c_int64),
        )
    )
    result = {k: v[:rows] for k, v in out.items()}
    result["queries"] = [
        buf[query_off[i] : query_off[i] + query_len[i]].decode("utf-8", "replace")
        for i in range(rows)
    ]
    result["n_errors"] = int(n_errors[0])
    return result
