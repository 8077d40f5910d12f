"""Native (C++/OpenMP) host-pipeline components, ctypes-bound.

Build-on-first-import with graceful fallback: if no compiler is available
the Python/PIL paths are used instead (`native_available()` reports which).
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SO = _HERE / "_preprocess.so"
_SRC = _HERE / "preprocess.cpp"
_STAMP = _HERE / "_preprocess.hash"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _src_hash() -> str:
    # content hash (not mtime): a stale or foreign-machine binary — built
    # with -march=native elsewhere — must never be dlopen'ed here. The .so
    # is NOT version-controlled; it is always built locally.
    return hashlib.sha256(_SRC.read_bytes()).hexdigest()


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-fopenmp",
        "-shared",
        "-fPIC",
        str(_SRC),
        "-o",
        str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        _STAMP.write_text(_src_hash())
        return True
    except Exception as e:  # pragma: no cover
        print(f"[native] build failed ({e}); using Python fallback")
        return False


def _is_fresh() -> bool:
    if not (_SO.exists() and _STAMP.exists()):
        return False
    try:
        return _STAMP.read_text().strip() == _src_hash()
    except OSError:  # pragma: no cover
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _is_fresh():
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(str(_SO))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i = ctypes.c_int
        lib.resize_area_u8.argtypes = [u8p, i, i, u8p, i, i]
        lib.resize_bilinear_u8.argtypes = [u8p, i, i, u8p, i, i]
        lib.crop_normalize_f32.argtypes = [u8p, i, i, i, i, i, i, f32p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_u8(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Resize [H, W, 3] u8: area-average when shrinking, bilinear when
    growing (the downscale/upscale filter split the reference's
    preprocessing uses, mast3r_utils.py:121-128)."""
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    sh, sw = img.shape[:2]
    out = np.empty((dh, dw, 3), np.uint8)
    if lib is None:
        from PIL import Image

        pil = Image.fromarray(img).resize(
            (dw, dh), Image.LANCZOS if dw < sw else Image.BICUBIC
        )
        return np.asarray(pil)
    fn = lib.resize_area_u8 if dw <= sw else lib.resize_bilinear_u8
    fn(_u8p(img), sh, sw, _u8p(out), dh, dw)
    return out


def crop_normalize(img: np.ndarray, cy0: int, cx0: int, ch: int, cw: int) -> np.ndarray:
    """Center-crop + normalize u8 -> float32 [-1, 1], fused."""
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    sh, sw = img.shape[:2]
    if lib is None:
        crop = img[cy0 : cy0 + ch, cx0 : cx0 + cw].astype(np.float32)
        return crop / 127.5 - 1.0
    out = np.empty((ch, cw, 3), np.float32)
    lib.crop_normalize_f32(
        _u8p(img), sh, sw, cy0, cx0, ch, cw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
