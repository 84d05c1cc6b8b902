"""ctypes bindings for the native SkNN batch predictor (sknn.cc).

Same build contract as loader.py: compiled on demand with g++, cached
content-addressed next to the source, graceful fallback when no compiler
is available (the numpy path in baselines/session_knn.py remains the
reference implementation and the test oracle).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

from .build import host_arch_digest

_SRC = Path(__file__).parent / "sknn.cc"
_lib_handle = None
_build_error: Optional[str] = None
_build_lock = threading.Lock()

SIMILARITY_CODES = {"cosine": 0, "jaccard": 1}
DECAY_CODES = {"same": 0, "div": 1, "linear": 2, "log": 3, "quadratic": 4}


def _lib_path() -> Path:
    import hashlib

    # keyed by source AND host CPU identity: -march=native binaries must
    # never be loaded by a different microarchitecture (shared/NFS checkouts)
    digest = hashlib.sha256(
        _SRC.read_bytes() + host_arch_digest()
    ).hexdigest()[:16]
    return Path(__file__).parent / f"libsknn-{digest}.so"


def _build_library() -> Optional[ctypes.CDLL]:
    global _build_error
    lib_file = _lib_path()
    with _build_lock:
        if not lib_file.exists():
            # build to a temp path + atomic rename: a concurrent reader (the
            # benchmark thread pool builds on first predict) must never
            # dlopen a partially written .so
            tmp = lib_file.with_suffix(f".tmp{os.getpid()}")
            cmd = [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-o", str(tmp), str(_SRC), "-lpthread",
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True, text=True)
                os.replace(tmp, lib_file)
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                _build_error = getattr(e, "stderr", str(e))
                return None
            finally:
                if tmp.exists():
                    tmp.unlink()
    try:
        lib = ctypes.CDLL(str(lib_file))
    except OSError as e:
        _build_error = str(e)
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.sknn_predict_batch.restype = ctypes.c_int
    lib.sknn_predict_batch.argtypes = [
        i64p, i64p, i64p, ctypes.c_int64, i64p,            # vote table
        i64p, i64p, ctypes.c_int64,                        # batch-item CSR
        i64p, ctypes.c_int64, ctypes.c_int64,              # item_idx, B, T
        i64p, ctypes.c_int64,                              # valid, V
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,    # K, nn, topk
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,    # sim, decay, nt
        i64p,                                              # out
    ]
    return lib


def native_available() -> bool:
    global _lib_handle
    if _lib_handle is None:
        _lib_handle = _build_library()
    return _lib_handle is not None


def build_error() -> Optional[str]:
    return _build_error


def _i64(arr) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(arr), np.int64)


def predict_batch(
    vote_table,
    item_arrs,
    sessions_items,
    valid_items,
    *,
    sample_size: int,
    nearest_neighbors: int,
    topk: int,
    similarity: str,
    decay: str,
    n_threads: int = 0,
) -> np.ndarray:
    """Run the native predictor.

    ``vote_table`` is session_knn's global (sids, starts, lens, items);
    ``item_arrs`` maps every distinct nonzero batch item to its sorted
    session-id array (the inverted-index slice).
    """
    if not native_available():
        raise RuntimeError(f"native sknn unavailable: {_build_error}")
    g_sids, g_starts, g_lens, g_items = (_i64(a) for a in vote_table)
    sessions_items = np.asarray(sessions_items)
    b, t = sessions_items.shape

    items_u = np.unique(sessions_items[sessions_items != 0]).astype(np.int64)
    arrs = [_i64(item_arrs(int(it))) for it in items_u]
    bi_off = np.zeros(len(arrs) + 1, np.int64)
    if arrs:
        np.cumsum([len(a) for a in arrs], out=bi_off[1:])
        bi_sids = np.concatenate(arrs) if bi_off[-1] else np.empty(0, np.int64)
    else:
        bi_sids = np.empty(0, np.int64)

    si = _i64(sessions_items)
    idx = np.searchsorted(items_u, si)
    np.clip(idx, 0, max(len(items_u) - 1, 0), out=idx)
    item_idx = np.where(si == 0, -1, idx).astype(np.int64)

    valid = _i64(valid_items)
    assert valid.shape[:2] == (b, t), valid.shape
    out = np.zeros((b, t, topk), np.int64)

    def p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    rc = _lib_handle.sknn_predict_batch(
        p(g_sids), p(g_starts), p(g_lens), ctypes.c_int64(len(g_sids)),
        p(g_items),
        p(bi_off), p(bi_sids), ctypes.c_int64(len(items_u)),
        p(item_idx), ctypes.c_int64(b), ctypes.c_int64(t),
        p(valid), ctypes.c_int64(valid.shape[2]),
        ctypes.c_int64(sample_size), ctypes.c_int64(nearest_neighbors),
        ctypes.c_int64(topk),
        ctypes.c_int32(SIMILARITY_CODES[similarity]),
        ctypes.c_int32(DECAY_CODES[decay]),
        ctypes.c_int32(n_threads),
        p(out),
    )
    if rc != 0:
        raise RuntimeError(f"sknn_predict_batch failed: rc={rc}")
    return out
