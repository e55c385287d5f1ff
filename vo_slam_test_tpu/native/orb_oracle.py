"""In-environment REFERENCE front-end oracle (test instrument only).

Builds /root/reference/src/ORBextractor.cpp — the actual reference code,
compiled in place, never copied — behind a C ABI (orb_oracle_wrap.cpp) and
wraps it in ctypes. This gives the test suite whole-front-end parity
evidence on real pixel data: pyramid -> FAST-20/7 retry -> quad-tree ->
per-level budget -> IC angle -> 7x7 Gaussian blur -> rBRIEF
(ORBextractor.cpp:1051-1112), straight from the reference binary.

Only an OpenCV-4 header shim is generated (the reference includes the
removed OpenCV-1 compat header <opencv/cv.h>, ORBextractor.h:26). The
build lands in a /tmp cache so no reference-derived artifact enters the
repo. Used by tests/test_orb_oracle.py; nothing in the package compute
path imports this module.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(__file__)
_WRAP = os.path.join(_DIR, "orb_oracle_wrap.cpp")
_REF_SRC = "/root/reference/src/ORBextractor.cpp"
_REF_INC = "/root/reference/include"
_BUILD = "/tmp/vo_slam_orb_oracle"
_SO = os.path.join(_BUILD, "liborb_oracle.so")

_lib = None


def _build() -> bool:
    shim = os.path.join(_BUILD, "shim", "opencv")
    os.makedirs(shim, exist_ok=True)
    with open(os.path.join(shim, "cv.h"), "w") as f:
        f.write("#include <opencv2/opencv.hpp>\n"
                "#include <opencv2/imgproc/types_c.h>\n")
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++14",
        _WRAP, _REF_SRC,
        "-I" + os.path.join(_BUILD, "shim"), "-I" + _REF_INC,
        "-I/usr/include/opencv4",
        "-o", _SO,
        "-lopencv_core", "-lopencv_imgproc", "-lopencv_features2d",
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
    if not os.path.exists(_REF_SRC):
        return None
    stale = (not os.path.exists(_SO)
             or os.path.getmtime(_SO) < os.path.getmtime(_WRAP))
    if stale and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.orb_oracle_extract.restype = ctypes.c_int
    lib.orb_oracle_extract.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.orb_oracle_pyramid_level.restype = ctypes.c_int
    lib.orb_oracle_pyramid_level.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.orb_oracle_blur_u8.restype = ctypes.c_int
    lib.orb_oracle_blur_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.orb_oracle_distribute.restype = ctypes.c_int
    lib.orb_oracle_distribute.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
    ]
    _lib = lib
    return lib


def oracle_available() -> bool:
    return _load() is not None


def reference_extract(
    img: np.ndarray,
    n_features: int = 1000,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    ini_th: int = 20,
    min_th: int = 7,
    max_out: int = 8192,
) -> Tuple[np.ndarray, np.ndarray]:
    """Run the compiled reference ORBextractor on a u8 grayscale image.

    Returns (kps [n,5] float32 — x, y, angle_deg, octave, response;
             desc [n,32] u8).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("reference ORB oracle unavailable")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    kp = np.zeros((max_out, 5), np.float32)
    desc = np.zeros((max_out, 32), np.uint8)
    n = lib.orb_oracle_extract(
        img.ctypes.data_as(ctypes.c_void_p), img.shape[0], img.shape[1],
        n_features, scale_factor, n_levels, ini_th, min_th,
        kp.ctypes.data_as(ctypes.c_void_p),
        desc.ctypes.data_as(ctypes.c_void_p), max_out,
    )
    if n < 0:
        raise RuntimeError("reference ORB oracle extraction failed")
    return kp[:n].copy(), desc[:n].copy()


def reference_blur_u8(img: np.ndarray) -> np.ndarray:
    """cv::GaussianBlur(7x7, sigma 2, REFLECT_101) on u8 through the
    reference's linked OpenCV (the exact pre-rBRIEF blur,
    ORBextractor.cpp:1094)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("reference ORB oracle unavailable")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    out = np.empty_like(img)
    rc = lib.orb_oracle_blur_u8(
        img.ctypes.data_as(ctypes.c_void_p), img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise RuntimeError("reference blur failed")
    return out


def reference_distribute(
    xs: np.ndarray, ys: np.ndarray, responses: np.ndarray,
    min_x: int, max_x: int, min_y: int, max_y: int, target: int,
) -> np.ndarray:
    """Run the reference DistributeOctTree on explicit candidates
    (coords relative to the min corner). Returns kept candidate indices."""
    lib = _load()
    if lib is None:
        raise RuntimeError("reference ORB oracle unavailable")
    n = xs.size
    cand = np.stack([xs, ys, responses], axis=1).astype(np.float32)
    cand = np.ascontiguousarray(cand)
    keep = np.zeros(n, np.int32)
    m = lib.orb_oracle_distribute(
        cand.ctypes.data_as(ctypes.c_void_p), n,
        min_x, max_x, min_y, max_y, target,
        keep.ctypes.data_as(ctypes.c_void_p), n)
    if m < 0:
        raise RuntimeError("reference distribute failed")
    return keep[:m].astype(np.int64)


def reference_pyramid_level(
    img: np.ndarray, level: int, n_levels: int = 8, scale_factor: float = 1.2
) -> np.ndarray:
    """Return the reference's mvImagePyramid[level] for a u8 image."""
    lib = _load()
    if lib is None:
        raise RuntimeError("reference ORB oracle unavailable")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    buf = np.zeros(img.shape, np.uint8)  # level <= full size
    r = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.orb_oracle_pyramid_level(
        img.ctypes.data_as(ctypes.c_void_p), img.shape[0], img.shape[1],
        n_levels, scale_factor, level,
        buf.ctypes.data_as(ctypes.c_void_p), ctypes.byref(r), ctypes.byref(c),
    )
    if rc != 0:
        raise RuntimeError("reference pyramid query failed")
    return buf.ravel()[: r.value * c.value].reshape(r.value, c.value).copy()
