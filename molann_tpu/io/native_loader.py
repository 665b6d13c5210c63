"""ctypes bindings for the native C++ trajectory loader.

Loads ``libtrajloader.so`` (built from native/traj_loader.cpp); builds it
on demand with ``g++`` the first time if missing. Falls back cleanly:
:func:`available` reports whether the native path can be used, and
:class:`~molann_tpu.train.data.TrajectoryDataset` keeps a pure-numpy
fallback, so the package never hard-depends on a compiler at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "NativeTrajLoader", "build"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_native", "libtrajloader.so")
_SRC_PATH = os.path.join(
    os.path.dirname(os.path.dirname(_HERE)), "native", "traj_loader.cpp"
)

_lib = None
_lib_lock = threading.Lock()


def build(force=False):
    """Compile the native library with g++ (one-time, cached)."""
    if os.path.exists(_SO_PATH) and not force:
        return _SO_PATH
    if not os.path.exists(_SRC_PATH):
        raise FileNotFoundError(f"native source not found at {_SRC_PATH}")
    os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-std=c++17",
        _SRC_PATH, "-shared", "-pthread", "-o", _SO_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO_PATH


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH):
            build()
        lib = ctypes.CDLL(_SO_PATH)
        lib.tl_open.restype = ctypes.c_void_p
        lib.tl_open.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tl_close.argtypes = [ctypes.c_void_p]
        lib.tl_read_batch.restype = ctypes.c_int
        lib.tl_read_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.tl_read_range.restype = ctypes.c_int
        lib.tl_read_range.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.tl_prefetch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.tl_last_error.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    """Whether the native loader can be used (builds on first call)."""
    try:
        _load()
        return True
    except Exception:
        return False


class NativeTrajLoader:
    """Native mmap + threaded-gather reader for .npy / .dcd trajectories.

    Format is auto-detected by magic; DCD frames (X/Y/Z component planes)
    are interleaved to the packed atom-major layout during the gather.

    Frames come back PACKED ``[count, 3n]`` float32 — the layout the fused
    TPU kernels want (see molann_tpu/ops/fused.py on why resident
    ``[l, n, 3]`` arrays are poison on TPU).
    """

    def __init__(self, path, n_threads: int | None = None):
        lib = _load()
        nf = ctypes.c_int64()
        fpf = ctypes.c_int64()
        handle = lib.tl_open(
            str(path).encode(), ctypes.byref(nf), ctypes.byref(fpf)
        )
        if not handle:
            raise OSError(lib.tl_last_error().decode())
        self._lib = lib
        self._handle = handle
        self.n_frames = nf.value
        self.floats_per_frame = fpf.value
        self.n_atoms = self.floats_per_frame // 3
        self.n_threads = n_threads or min(8, os.cpu_count() or 1)

    def read_batch(self, indices) -> np.ndarray:
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(idx), self.floats_per_frame), dtype=np.float32)
        rc = self._lib.tl_read_batch(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n_threads,
        )
        if rc != 0:
            raise IndexError(self._lib.tl_last_error().decode())
        return out

    def read_range(self, start: int, count: int) -> np.ndarray:
        out = np.empty((count, self.floats_per_frame), dtype=np.float32)
        rc = self._lib.tl_read_range(
            self._handle, start, count,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IndexError(self._lib.tl_last_error().decode())
        return out

    def prefetch(self, indices) -> None:
        """Queue async page prefetch for the given frames (non-blocking)."""
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        # (the C side copies the index list before returning)
        self._lib.tl_prefetch(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
        )

    def close(self):
        if self._handle:
            self._lib.tl_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self):
        return self.n_frames
