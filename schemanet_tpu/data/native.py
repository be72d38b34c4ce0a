"""ctypes bindings for the native host-side image pipeline (native/imagepipe).

Provides a fused crop+flip+antialiased-resize+normalize fast path for the data
loader; falls back to the PIL/numpy path transparently when the shared library
has not been built (``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "libimagepipe.so")


def load_library(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.isfile(path) and build_if_missing:
        script = os.path.join(os.path.dirname(path), "build.sh")
        if os.path.isfile(script):
            try:
                subprocess.run([script], check=True, capture_output=True, timeout=120)
            except Exception as exc:  # pragma: no cover - toolchain missing
                logger.info("native imagepipe build failed (%s); using PIL path", exc)
                return None
    if not os.path.isfile(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as exc:  # pragma: no cover
        logger.info("cannot load %s (%s); using PIL path", path, exc)
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.ip_process_sample.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, ctypes.c_int, f32p, f32p,
    ]
    lib.ip_process_batch.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        i32p, i32p, ctypes.c_int, ctypes.c_int, i32p,
        f32p, ctypes.c_int, ctypes.c_int, f32p, f32p,
    ]
    lib.ip_version.restype = ctypes.c_int
    if hasattr(lib, "ip_process_sample_u8"):
        lib.ip_process_sample_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int,
        ]
        lib.ip_process_batch_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p, i32p, ctypes.c_int, ctypes.c_int, i32p,
            u8p, ctypes.c_int, ctypes.c_int,
        ]
    if hasattr(lib, "ip_decode_jpeg"):
        lib.ip_jpeg_dims.argtypes = [
            u8p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ip_jpeg_dims.restype = ctypes.c_int
        lib.ip_decode_jpeg.argtypes = [u8p, ctypes.c_int, u8p]
        lib.ip_decode_jpeg.restype = ctypes.c_int
        lib.ip_decode_process.argtypes = [
            u8p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int, f32p, f32p,
        ]
        lib.ip_decode_process.restype = ctypes.c_int
        if hasattr(lib, "ip_decode_process_u8"):
            lib.ip_decode_process_u8.argtypes = [
                u8p, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                u8p, ctypes.c_int, ctypes.c_int,
            ]
            lib.ip_decode_process_u8.restype = ctypes.c_int
    _LIB = lib
    logger.info("native imagepipe v%d loaded", lib.ip_version())
    return _LIB


def jpeg_available() -> bool:
    lib = load_library()
    return lib is not None and hasattr(lib, "ip_decode_jpeg")


def jpeg_dims(data: bytes):
    """(h, w) of a JPEG byte buffer, or None when undecodable."""
    lib = load_library()
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    if lib.ip_jpeg_dims(buf, len(buf), ctypes.byref(w), ctypes.byref(h), ctypes.byref(c)) != 0:
        return None
    return h.value, w.value


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """JPEG bytes -> uint8 HWC RGB, or None on failure (caller falls back)."""
    lib = load_library()
    if lib is None or not hasattr(lib, "ip_decode_jpeg"):
        return None
    dims = jpeg_dims(data)
    if dims is None:
        return None
    h, w = dims
    out = np.empty((h, w, 3), np.uint8)
    buf = np.frombuffer(data, np.uint8)
    if lib.ip_decode_jpeg(buf, len(buf), out.reshape(-1)) != 0:
        return None
    return out


def decode_process(
    data: bytes,
    top: int,
    left: int,
    crop_h: int,
    crop_w: int,
    flip: bool,
    out_size: Sequence[int],
    mean: Sequence[float],
    std: Sequence[float],
) -> Optional[np.ndarray]:
    """Fused JPEG decode + crop/flip/resize/normalize; None on failure."""
    lib = load_library()
    if lib is None or not hasattr(lib, "ip_decode_process"):
        return None
    oh, ow = out_size
    dst = np.empty((oh, ow, 3), np.float32)
    buf = np.frombuffer(data, np.uint8)
    rc = lib.ip_decode_process(
        buf, len(buf), int(top), int(left), int(crop_h), int(crop_w), int(bool(flip)),
        dst, oh, ow, np.asarray(mean, np.float32), np.asarray(std, np.float32),
    )
    return dst if rc == 0 else None


def available() -> bool:
    return load_library() is not None


def process_sample(
    img: np.ndarray,  # uint8 HWC
    top: int,
    left: int,
    crop_h: int,
    crop_w: int,
    flip: bool,
    out_size: Sequence[int],
    mean: Sequence[float],
    std: Sequence[float],
) -> np.ndarray:
    lib = load_library()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    oh, ow = out_size
    dst = np.empty((oh, ow, c), np.float32)
    lib.ip_process_sample(
        img, h, w, c, int(top), int(left), int(crop_h), int(crop_w), int(bool(flip)),
        dst, oh, ow,
        np.asarray(mean, np.float32), np.asarray(std, np.float32),
    )
    return dst


def process_batch(
    images: np.ndarray,  # uint8 [n, h, w, c] same-size batch
    tops: np.ndarray,
    lefts: np.ndarray,
    crop_h: int,
    crop_w: int,
    flips: np.ndarray,
    out_size: Sequence[int],
    mean: Sequence[float],
    std: Sequence[float],
) -> np.ndarray:
    lib = load_library()
    assert lib is not None
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, c = images.shape
    oh, ow = out_size
    dst = np.empty((n, oh, ow, c), np.float32)
    lib.ip_process_batch(
        images, n, h, w, c,
        np.ascontiguousarray(tops, np.int32), np.ascontiguousarray(lefts, np.int32),
        int(crop_h), int(crop_w), np.ascontiguousarray(flips, np.int32),
        dst, oh, ow,
        np.asarray(mean, np.float32), np.asarray(std, np.float32),
    )
    return dst


def process_sample_u8(
    img: np.ndarray, top: int, left: int, crop_h: int, crop_w: int, flip: bool,
    out_size: Sequence[int],
) -> np.ndarray:
    """crop+flip+resize with uint8 output (normalisation deferred to device)."""
    lib = load_library()
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    oh, ow = out_size
    dst = np.empty((oh, ow, c), np.uint8)
    lib.ip_process_sample_u8(
        img, h, w, c, int(top), int(left), int(crop_h), int(crop_w), int(bool(flip)),
        dst, oh, ow,
    )
    return dst


def process_batch_u8(
    images: np.ndarray, tops, lefts, crop_h: int, crop_w: int, flips,
    out_size: Sequence[int],
) -> np.ndarray:
    lib = load_library()
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, c = images.shape
    oh, ow = out_size
    dst = np.empty((n, oh, ow, c), np.uint8)
    lib.ip_process_batch_u8(
        images, n, h, w, c,
        np.ascontiguousarray(tops, np.int32), np.ascontiguousarray(lefts, np.int32),
        int(crop_h), int(crop_w), np.ascontiguousarray(flips, np.int32),
        dst, oh, ow,
    )
    return dst


def decode_process_u8(
    data: bytes, top: int, left: int, crop_h: int, crop_w: int, flip: bool,
    out_size: Sequence[int],
) -> Optional[np.ndarray]:
    lib = load_library()
    if lib is None or not hasattr(lib, "ip_decode_process_u8"):
        return None
    oh, ow = out_size
    dst = np.empty((oh, ow, 3), np.uint8)
    buf = np.frombuffer(data, np.uint8)
    rc = lib.ip_decode_process_u8(
        buf, len(buf), int(top), int(left), int(crop_h), int(crop_w), int(bool(flip)),
        dst, oh, ow,
    )
    return dst if rc == 0 else None
