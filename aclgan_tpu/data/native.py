"""ctypes binding for the native decode/augment core (native/aclgan_data.cpp).

Auto-builds with `make -C native` on first import if the toolchain is present;
silently unavailable otherwise (the pure-Python PIL path is always there).
ctypes foreign calls release the GIL, so Python worker threads scale across
cores when this path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libaclgan_data.so")

_lib = None


def _try_build() -> None:
    try:
        subprocess.run(["make", "-C", os.path.join(_REPO_ROOT, "native")],
                       capture_output=True, timeout=120, check=True)
    except Exception:
        pass


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        _try_build()
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.aclgan_decode_jpeg.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64,
                                       i32p, i32p]
    lib.aclgan_decode_jpeg.restype = ctypes.c_int
    lib.aclgan_augment_rgb.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_float,
                                       ctypes.c_float, u8p, ctypes.c_int64]
    lib.aclgan_augment_rgb.restype = ctypes.c_int
    lib.aclgan_decode_jpeg_augment.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, u8p, ctypes.c_int64,
        i32p, i32p, u8p, ctypes.c_int64]
    lib.aclgan_decode_jpeg_augment.restype = ctypes.c_int
    lib.aclgan_normalize_batch.argtypes = [u8p, ctypes.c_int64,
                                           ctypes.POINTER(ctypes.c_float)]
    lib.aclgan_normalize_batch.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


_INIT_DECODE = 2048 * 2048 * 3  # 12 MiB starting scratch per worker thread
_MAX_DECODE = 8192 * 8192 * 3   # hard cap (grown on demand, rc=-2 retry)


class _Scratch:
    """Per-thread scratch buffers (decode target), grown on demand.

    A fixed _MAX_DECODE allocation per thread pinned ~192 MiB x workers of
    host RSS regardless of image size; the C side checks the decoded dims
    against scratch_cap right after the JPEG header (returns -2), so the
    caller grows and retries only when a genuinely huge image shows up."""

    def __init__(self):
        import threading

        self._tls = threading.local()

    def get(self, min_size: int = _INIT_DECODE) -> np.ndarray:
        buf = getattr(self._tls, "buf", None)
        if buf is None or buf.size < min_size:
            buf = np.empty(min_size, np.uint8)
            self._tls.buf = buf
        return buf


_scratch = _Scratch()


def decode_jpeg_augment(
    jpeg_bytes: bytes,
    new_size: Optional[int],
    crop_h: Optional[int],
    crop_w: Optional[int],
    flip: bool,
    crop_top_frac: float,
    crop_left_frac: float,
) -> Optional[np.ndarray]:
    """Decode + augment one JPEG. Returns HWC uint8 or None on any failure
    (caller falls back to the PIL path)."""
    lib = get_lib()
    if lib is None:
        return None
    scratch = _scratch.get()
    data = np.frombuffer(jpeg_bytes, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    while True:
        if crop_h:
            out = np.empty(crop_h * crop_w * 3, np.uint8)
        else:  # no-crop output is at most the (resized) decode size
            out = np.empty(scratch.size, np.uint8)
        rc = lib.aclgan_decode_jpeg_augment(
            data.ctypes.data_as(u8p), len(jpeg_bytes),
            int(new_size or 0), int(crop_h or 0), int(crop_w or 0), int(flip),
            float(crop_top_frac), float(crop_left_frac),
            out.ctypes.data_as(u8p), out.size,
            ctypes.byref(h), ctypes.byref(w),
            scratch.ctypes.data_as(u8p), scratch.size)
        if rc == -2 and scratch.size < _MAX_DECODE:  # image bigger than scratch
            scratch = _scratch.get(min(scratch.size * 4, _MAX_DECODE))
            continue
        break
    if rc == 0 and crop_h:
        return out.reshape(crop_h, crop_w, 3)
    if rc > 0:  # packed rh/rw for the no-crop path
        rh, rw = rc >> 16, rc & 0xFFFF
        return out[: rh * rw * 3].reshape(rh, rw, 3).copy()
    return None


def normalize_batch_native(batch_u8: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    flat = np.ascontiguousarray(batch_u8).reshape(-1)
    out = np.empty(flat.size, np.float32)
    lib.aclgan_normalize_batch(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), flat.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out.reshape(batch_u8.shape)
