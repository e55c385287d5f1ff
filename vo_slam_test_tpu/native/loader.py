"""ctypes wrapper + on-demand build for the native dataset loader."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "dataloader.cpp")
_SO = os.path.join(_DIR, "libvoio.so")

_lib = None


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", _SO, "-lpng", "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.vio_open.restype = ctypes.c_void_p
    lib.vio_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.vio_next.restype = ctypes.c_int
    lib.vio_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.vio_close.restype = None
    lib.vio_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class NativeTumLoader:
    """Ordered prefetching loader over (rgb, depth) PNG path pairs.

    Decode runs on C++ worker threads ahead of consumption; __getitem__ must
    be called in sequence (it mirrors the streaming SLAM consumption order).
    """

    def __init__(
        self,
        rgb_paths: List[str],
        depth_paths: List[str],
        timestamps: List[float],
        depth_scale: float = 5000.0,
        width: int = 640,
        height: int = 480,
        prefetch: int = 8,
        threads: int = 4,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (libpng build failed)")
        self._lib = lib
        self.timestamps = timestamps
        self.width, self.height = width, height
        self._n = len(rgb_paths)
        rgb_arr = (ctypes.c_char_p * self._n)(*[p.encode() for p in rgb_paths])
        dep_arr = (ctypes.c_char_p * self._n)(*[p.encode() for p in depth_paths])
        self._handle = lib.vio_open(
            rgb_arr, dep_arr, self._n, depth_scale, prefetch, threads,
            width, height,
        )
        self._next = 0

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray, float]:
        if i != self._next:
            raise ValueError(f"NativeTumLoader is sequential (asked {i}, next {self._next})")
        gray = np.empty((self.height, self.width), np.uint8)
        depth = np.empty((self.height, self.width), np.float32)
        w = ctypes.c_int()
        h = ctypes.c_int()
        idx = self._lib.vio_next(
            self._handle,
            gray.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(w), ctypes.byref(h),
        )
        if idx < 0:
            raise IOError(f"native loader failed at frame {i}")
        self._next = i + 1
        return gray, depth, self.timestamps[i]

    def close(self):
        if self._handle:
            self._lib.vio_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
