"""ctypes bindings for the native session loader (chio.cc).

Builds ``libchio.so`` on demand with g++ (cached next to the source) and
exposes the same batch dict contract as data/collate.py — so the harness can
swap in the C++ input path transparently and fall back to pure Python when
no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..config import SessionFeaturesSchema, TIME_UNIT_MS

_SRC = Path(__file__).parent / "chio.cc"
_lib_handle = None
_build_error: Optional[str] = None


def _lib_path() -> Path:
    """Content-addressed build output: the binary is keyed by a hash of the
    source AND the host CPU identity, so editing chio.cc always rebuilds and
    a stale/foreign-arch binary is never loaded (mtime checks are unreliable
    across git checkouts, and -march=native binaries must never travel
    between machines — including via a shared/NFS checkout)."""
    import hashlib

    from .build import host_arch_digest

    digest = hashlib.sha256(
        _SRC.read_bytes() + host_arch_digest()
    ).hexdigest()[:16]
    return Path(__file__).parent / f"libchio-{digest}.so"


_build_lock = threading.Lock()


def _build_library() -> Optional[ctypes.CDLL]:
    global _build_error
    lib_file = _lib_path()
    with _build_lock:
        if not lib_file.exists():
            # temp file + atomic rename: concurrent first callers must never
            # dlopen a partially written .so
            tmp = lib_file.with_suffix(f".tmp{os.getpid()}")
            cmd = [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-o", str(tmp), str(_SRC), "-lz",
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
    except OSError as e:  # wrong-arch or corrupt binary
        _build_error = str(e)
        return None
    lib.chio_load_sessions.restype = ctypes.c_void_p
    lib.chio_load_sessions.argtypes = [ctypes.c_char_p]
    lib.chio_session_count.restype = ctypes.c_int
    lib.chio_session_count.argtypes = [ctypes.c_void_p]
    lib.chio_collate.restype = ctypes.c_int
    lib.chio_free.argtypes = [ctypes.c_void_p]
    return lib


def native_available() -> bool:
    global _lib_handle
    if _lib_handle is None:
        _lib_handle = _build_library()
    return _lib_handle is not None


class NativeSessionLoader:
    """Loads one per-hour TFRecord file and yields padded batch dicts."""

    def __init__(self, path, schema: SessionFeaturesSchema, epoch_ms: int = 0):
        if not native_available():
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self.lib = _lib_handle
        self.schema = schema
        self.epoch_ms = epoch_ms
        self.handle = self.lib.chio_load_sessions(str(path).encode())
        if not self.handle:
            raise IOError(f"failed to load {path}")
        self.handle = ctypes.c_void_p(self.handle)

        ctx = schema.context_sequence_features()
        self.int_feats = [s.name for s in ctx if s.dtype != "float"]
        self.float_feats = [s.name for s in ctx if s.dtype == "float"]
        self._int_names = (ctypes.c_char_p * len(self.int_feats))(
            *[n.encode() for n in self.int_feats]
        )
        self._float_names = (ctypes.c_char_p * len(self.float_feats))(
            *[n.encode() for n in self.float_feats]
        )

    def __len__(self):
        return self.lib.chio_session_count(self.handle)

    def batch(self, start: int, batch_size: int, max_session_length: int) -> Dict[str, np.ndarray]:
        t = max_session_length - 1
        ctx = np.zeros((batch_size, 4), np.int64)
        clicks = np.zeros((batch_size, t), np.int32)
        labels = np.zeros((batch_size, t), np.int32)
        last = np.zeros((batch_size,), np.int32)
        ts = np.zeros((batch_size, t), np.int32)
        int_seq = np.zeros((len(self.int_feats), batch_size, t), np.int32)
        float_seq = np.zeros((len(self.float_feats), batch_size, t), np.float32)

        def ptr(arr, ctype):
            return arr.ctypes.data_as(ctypes.POINTER(ctype))

        self.lib.chio_collate(
            self.handle,
            ctypes.c_int(start),
            ctypes.c_int(batch_size),
            ctypes.c_int(max_session_length),
            ctypes.c_int64(self.epoch_ms),
            ctypes.c_int64(TIME_UNIT_MS),
            self._int_names,
            ctypes.c_int(len(self.int_feats)),
            self._float_names,
            ctypes.c_int(len(self.float_feats)),
            ptr(ctx, ctypes.c_int64),
            ptr(clicks, ctypes.c_int32),
            ptr(labels, ctypes.c_int32),
            ptr(last, ctypes.c_int32),
            ptr(ts, ctypes.c_int32),
            ptr(int_seq, ctypes.c_int32),
            ptr(float_seq, ctypes.c_float),
        )
        batch = {
            "user_id": ctx[:, 0],
            "session_id": ctx[:, 1],
            "session_start": ctx[:, 2],
            "session_size": ctx[:, 3].astype(np.int32),
            "item_clicked": clicks,
            "label_next_item": labels,
            "label_last_item": last[:, None],
            "event_timestamp": ts,
        }
        for i, name in enumerate(self.int_feats):
            batch[name] = int_seq[i]
        for i, name in enumerate(self.float_feats):
            batch[name] = float_seq[i]
        return batch

    def batches(self, batch_size: int, max_session_length: int):
        for start in range(0, len(self), batch_size):
            yield self.batch(start, batch_size, max_session_length)

    def close(self):
        if self.handle:
            self.lib.chio_free(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
