"""ctypes bindings for the native instance packer (builds on first use,
falls back to numpy if no toolchain)."""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _DIR / "libpacker.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-s"], cwd=_DIR, check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.pack_coo_batch.argtypes = [
        i64p, i64p, f64p, i64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        f64p, ctypes.c_int,
    ]
    lib.pack_vec_batch.argtypes = [
        f64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        f64p, ctypes.c_int,
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def pack_coo_batch(
    triplets: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    max_rows: int,
    max_cols: int,
    n_threads: int = 8,
) -> np.ndarray:
    """Pack per-instance (rows, cols, vals) COO triplets into a dense
    (B, max_rows, max_cols) float64 batch. Uses the C++ packer when built,
    else a numpy fallback."""
    B = len(triplets)
    lib = _load()
    if lib is None:
        out = np.zeros((B, max_rows, max_cols))
        for i, (r, c, v) in enumerate(triplets):
            np.add.at(out[i], (np.asarray(r), np.asarray(c)), np.asarray(v))
        return out
    rows = np.ascontiguousarray(
        np.concatenate([np.asarray(t[0], np.int64) for t in triplets])
        if B
        else np.zeros(0, np.int64)
    )
    cols = np.ascontiguousarray(
        np.concatenate([np.asarray(t[1], np.int64) for t in triplets])
        if B
        else np.zeros(0, np.int64)
    )
    vals = np.ascontiguousarray(
        np.concatenate([np.asarray(t[2], np.float64) for t in triplets])
        if B
        else np.zeros(0)
    )
    offs = np.zeros(B + 1, np.int64)
    np.cumsum([len(t[0]) for t in triplets], out=offs[1:])
    out = np.empty((B, max_rows, max_cols))
    lib.pack_coo_batch(
        rows, cols, vals, offs, B, max_rows, max_cols,
        out.reshape(-1), n_threads,
    )
    return out


def pack_vec_batch(
    vecs: Sequence[np.ndarray], max_len: int, fill: float = 0.0,
    n_threads: int = 8,
) -> np.ndarray:
    """Pack variable-length vectors into a padded (B, max_len) batch."""
    B = len(vecs)
    lib = _load()
    if lib is None:
        out = np.full((B, max_len), fill)
        for i, v in enumerate(vecs):
            out[i, : len(v)] = v
        return out
    vals = np.ascontiguousarray(
        np.concatenate([np.asarray(v, np.float64) for v in vecs])
        if B
        else np.zeros(0)
    )
    offs = np.zeros(B + 1, np.int64)
    np.cumsum([len(v) for v in vecs], out=offs[1:])
    out = np.empty((B, max_len))
    lib.pack_vec_batch(vals, offs, B, max_len, fill, out.reshape(-1), n_threads)
    return out
