"""ctypes bindings for the native IO runtime (loader.cpp).

Builds the shared library with g++ on first use (cached next to the source);
falls back gracefully — callers check ``available()`` and use the Python
decode path when the toolchain or binary is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_SO = os.path.join(_HERE, "_libcvae_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", _SRC, "-o", _SO, "-lz",
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
        if r.returncode != 0:
            return r.stderr[-2000:]
        return None
    except Exception as e:  # pragma: no cover
        return str(e)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            err = _build()
            if err:
                _build_error = err
                return None
        lib = ctypes.CDLL(_SO)
        lib.cvae_loader_create.restype = ctypes.c_void_p
        lib.cvae_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.cvae_loader_next.restype = ctypes.c_int
        lib.cvae_loader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.cvae_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.cvae_decode_image.restype = ctypes.c_int
        lib.cvae_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def decode_image(path: str, hw: Tuple[int, int], *, binarize: bool = False,
                 flip_mode: int = 0) -> Optional[np.ndarray]:
    """One-shot native decode + resize + min-max (+ binarize). None on failure."""
    lib = _load()
    if lib is None:
        return None
    H, W = hw
    out = np.empty((H, W), np.float32)
    ok = lib.cvae_decode_image(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        H, W, int(binarize), flip_mode,
    )
    return out if ok else None


class NativeBatchLoader:
    """Threaded prefetching batch loader over image files.

    Yields (images (B, H, W, 1) float32, sample_indices (B,)) with the vessel
    transform applied natively; the Python/TPU thread never blocks on decode."""

    def __init__(
        self,
        paths: Sequence[str],
        order: np.ndarray,
        hw: Tuple[int, int],
        batch_size: int,
        *,
        augs: Optional[np.ndarray] = None,
        binarize: bool = True,
        n_threads: int = 4,
        max_queue: int = 4,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        self.hw = hw
        self.batch_size = batch_size
        self._paths_buf = [p.encode() for p in paths]
        self._argv = (ctypes.c_char_p * len(paths))(*self._paths_buf)
        order = np.ascontiguousarray(order, np.int32)
        self._order = order
        self._augs = (
            np.ascontiguousarray(augs, np.int32) if augs is not None else None
        )
        self.n_batches = len(order) // batch_size
        self._handle = lib.cvae_loader_create(
            self._argv, len(paths),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._augs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            if self._augs is not None else None,
            len(order), hw[0], hw[1], batch_size, int(binarize),
            n_threads, max_queue,
        )

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        H, W = self.hw
        while True:
            data = np.empty((self.batch_size, H, W), np.float32)
            idx = np.empty((self.batch_size,), np.int32)
            ok = self._lib.cvae_loader_next(
                self._handle,
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            if not ok:
                return
            yield data[..., None], idx

    def close(self):
        if self._handle:
            self._lib.cvae_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
