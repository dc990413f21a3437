"""ctypes bindings to the native host-ops library (`native/`).

Builds `libullava_native.so` on demand (g++ via make) and exposes the
C kernels; every caller has a pure-numpy fallback, so the framework works
with or without a toolchain. Use `available()` to check.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libullava_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-s"], cwd=_NATIVE_DIR, check=True,
                    capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.rle_decode.restype = ctypes.c_int
            lib.rle_encode.restype = ctypes.c_int
            lib.poly_counts.restype = ctypes.c_int
            _lib = lib
            logger.info("native host-ops library loaded from %s", _LIB_PATH)
        except Exception as e:  # toolchain missing -> numpy fallback
            logger.warning("native library unavailable (%s); using numpy paths", e)
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def rle_decode(counts: bytes, h: int, w: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty((h, w), np.uint8)
    rc = lib.rle_decode(
        counts, len(counts), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def rle_encode(mask: np.ndarray) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    buf = ctypes.create_string_buffer(max(h * w * 2, 64))
    n = lib.rle_encode(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, buf, len(buf)
    )
    return buf.raw[:n] if n >= 0 else None


def resize_nearest(mask: np.ndarray, oh: int, ow: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    ih, iw = mask.shape
    out = np.empty((oh, ow), np.uint8)
    lib.resize_nearest_u8(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ih, iw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), oh, ow,
    )
    return out


def poly_counts(xy: np.ndarray, h: int, w: int) -> Optional[list]:
    """Polygon -> RLE counts via the native exact pycocotools rasterizer.
    Returns None when the library isn't built (numpy fallback applies)."""
    lib = _load()
    if lib is None:
        return None
    xy = np.ascontiguousarray(np.asarray(xy, np.float64).reshape(-1))
    n_pts = xy.size // 2
    if n_pts < 1:
        return None
    # Upper bound on runs: one per dense boundary point + sentinel.
    pts = xy.reshape(-1, 2)
    per = np.abs(np.diff(np.vstack([pts, pts[:1]]), axis=0)).sum()
    max_out = int(5 * per) + 2 * n_pts + 16
    out = np.empty(max_out, np.int64)
    n = lib.poly_counts(
        xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_pts, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_out,
    )
    return out[:n].tolist() if n >= 0 else None


def sam_normalize_pad(
    image: np.ndarray, size: int, mean: np.ndarray, std: np.ndarray
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, np.uint8)
    h, w = image.shape[:2]
    out = np.empty((size, size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.sam_normalize_pad(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, size,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
