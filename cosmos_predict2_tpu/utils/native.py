"""Native (C++) host-side media ops, loaded via ctypes.

The compiled library provides the data-pipeline hot loops (frame resize /
crop / normalize) that the reference delegates to decord/torchvision
native code. Built lazily from ``csrc/media_ops.cpp`` with g++ -O3 on
first use and cached next to the source; every entry point has a NumPy
fallback so environments without a toolchain still work.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from cosmos_predict2_tpu.utils import log

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libmedia_ops.so")
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_CSRC, "media_ops.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC", "-o", _LIB_PATH, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.warning(f"native media_ops build failed ({e}); using NumPy fallbacks")
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        os.path.join(_CSRC, "media_ops.cpp")
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64 = ctypes.c_int64
        lib.resize_bilinear_u8.argtypes = [u8p, i64, i64, i64, u8p, i64, i64]
        lib.resize_nearest_u8.argtypes = [u8p, i64, i64, i64, u8p, i64, i64]
        lib.center_crop_u8.argtypes = [u8p, i64, i64, i64, u8p, i64, i64]
        lib.u8_to_pm1_f32.argtypes = [u8p, i64, f32p]
        _lib = lib
    except OSError as e:
        log.warning(f"native media_ops load failed ({e}); using NumPy fallbacks")
    return _lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bilinear(frames: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """(T, H, W, 3) uint8 -> (T, oh, ow, 3) uint8, half-pixel bilinear."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w, _ = frames.shape
    lib = get_lib()
    out = np.empty((t, oh, ow, 3), dtype=np.uint8)
    if lib is not None:
        lib.resize_bilinear_u8(_u8ptr(frames), t, h, w, _u8ptr(out), oh, ow)
        return out
    # NumPy fallback (vectorized half-pixel bilinear)
    fy = np.clip((np.arange(oh) + 0.5) * h / oh - 0.5, 0, h - 1)
    fx = np.clip((np.arange(ow) + 0.5) * w / ow - 0.5, 0, w - 1)
    y0 = fy.astype(np.int64); y1 = np.minimum(y0 + 1, h - 1); wy = (fy - y0)[None, :, None, None]
    x0 = fx.astype(np.int64); x1 = np.minimum(x0 + 1, w - 1); wx = (fx - x0)[None, None, :, None]
    f = frames.astype(np.float32)
    top = f[:, y0][:, :, x0] * (1 - wx) + f[:, y0][:, :, x1] * wx
    bot = f[:, y1][:, :, x0] * (1 - wx) + f[:, y1][:, :, x1] * wx
    return (top * (1 - wy) + bot * wy + 0.5).astype(np.uint8)


def center_crop(frames: np.ndarray, ch: int, cw: int) -> np.ndarray:
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w, _ = frames.shape
    lib = get_lib()
    if lib is not None:
        out = np.empty((t, ch, cw, 3), dtype=np.uint8)
        lib.center_crop_u8(_u8ptr(frames), t, h, w, _u8ptr(out), ch, cw)
        return out
    top, left = (h - ch) // 2, (w - cw) // 2
    return frames[:, top : top + ch, left : left + cw].copy()


def to_pm1_float(frames_u8: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1]."""
    frames_u8 = np.ascontiguousarray(frames_u8, dtype=np.uint8)
    lib = get_lib()
    if lib is not None:
        out = np.empty(frames_u8.shape, dtype=np.float32)
        lib.u8_to_pm1_f32(_u8ptr(frames_u8), frames_u8.size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    return frames_u8.astype(np.float32) / 127.5 - 1.0
