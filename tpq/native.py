"""ctypes bridge to the native host data plane (native/tpqio.cc).

Builds libtpqio.so on demand (g++ in-image; no pybind11 — C ABI +
ctypes per environment constraints) and exposes threaded seed-stable
datagen and a native lexicographic row sort. Every entry point has a
pure-numpy fallback; callers never hard-require the native library.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO = _NATIVE_DIR / "libtpqio.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = _NATIVE_DIR / "tpqio.cc"
    if not _SO.exists() or _SO.stat().st_mtime < src.stat().st_mtime:
        try:
            subprocess.run(
                ["g++", "-std=c++17", "-O3", "-shared", "-fPIC", "-pthread",
                 "-o", str(_SO), str(src)],
                check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            _lib = False
            return False
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        _lib = False
        return False
    u64, i64p, f64 = ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64), ctypes.c_double
    lib.tpqio_gen_uniform.argtypes = [i64p, u64, u64, u64]
    lib.tpqio_gen_zipf.argtypes = [i64p, u64, u64, f64, u64]
    lib.tpqio_gen_payload.argtypes = [i64p, u64, u64, u64, u64]
    lib.tpqio_lexsort_rows.argtypes = [
        ctypes.POINTER(i64p), ctypes.c_uint32, u64, ctypes.POINTER(ctypes.c_uint32)]
    _lib = lib
    return lib


def available() -> bool:
    return bool(_load())


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def gen_uniform(rows: int, nkeys: int, seed: int) -> np.ndarray | None:
    lib = _load()
    if not lib:
        return None
    out = np.empty(rows, np.int64)
    lib.tpqio_gen_uniform(_i64p(out), rows, nkeys, seed & (2**64 - 1))
    return out


def gen_zipf(rows: int, nkeys: int, theta: float, seed: int) -> np.ndarray | None:
    lib = _load()
    if not lib:
        return None
    out = np.empty(rows, np.int64)
    lib.tpqio_gen_zipf(_i64p(out), rows, nkeys, theta, seed & (2**64 - 1))
    return out


def gen_payload(rows: int, ncols: int, j: int, seed: int) -> np.ndarray | None:
    lib = _load()
    if not lib:
        return None
    out = np.empty(rows, np.int64)
    lib.tpqio_gen_payload(_i64p(out), rows, ncols, j, seed & (2**64 - 1))
    return out


def lexsort_rows(cols: list[np.ndarray]) -> np.ndarray | None:
    """Permutation sorting rows lexicographically by `cols` (primary
    first) — the canonical order of SURVEY.md §4.4.2, natively."""
    lib = _load()
    if not lib:
        return None
    n = len(cols[0])
    perm = np.arange(n, dtype=np.uint32)
    arr_t = ctypes.POINTER(ctypes.c_int64) * len(cols)
    col_ptrs = arr_t(*[_i64p(np.ascontiguousarray(c)) for c in cols])
    lib.tpqio_lexsort_rows(col_ptrs, len(cols), n,
                           perm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return perm
