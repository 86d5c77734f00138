"""ctypes bindings for the native C++ image pipeline (csrc/image_pipeline.cpp).

Builds the shared library lazily with g++ on first use (cached beside the
source); every entry point has a PIL fallback, so environments without a
toolchain still work — just slower.  This is the host-side feeding path of
the TPU activation store: fused JPEG-decode + antialiased bicubic resize +
crop + normalize + NCHW pack.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

from vit_prisma_tpu.dataloaders.transforms import CLIP_MEAN, CLIP_STD

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_SRC = os.path.join(_CSRC, "image_pipeline.cpp")
_LIB_PATH = os.path.join(_CSRC, "libimage_pipeline.so")

_lock = threading.Lock()
_lib = None
_build_failed = False

_f32p = ctypes.POINTER(ctypes.c_float)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _LIB_PATH, "-ljpeg"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build()
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _build_failed = True
            return None
        lib.ip_preprocess_rgb.restype = ctypes.c_int
        lib.ip_preprocess_rgb.argtypes = [
            _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _f32p, _f32p, _f32p]
        lib.ip_decode_jpeg.restype = ctypes.c_int
        lib.ip_decode_jpeg.argtypes = [
            _u8p, ctypes.c_long, ctypes.POINTER(_u8p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.ip_decode_preprocess.restype = ctypes.c_int
        lib.ip_decode_preprocess.argtypes = [
            _u8p, ctypes.c_long, ctypes.c_int, _f32p, _f32p, _f32p]
        lib.ip_preprocess_batch.restype = ctypes.c_int
        lib.ip_preprocess_batch.argtypes = [
            _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, _f32p, _f32p, _f32p, ctypes.c_int]
        lib.ip_free.restype = None
        lib.ip_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def _as_f32p(a: np.ndarray):
    return a.ctypes.data_as(_f32p)


def preprocess_rgb(image: np.ndarray, out_size: int = 224,
                   mean: Sequence[float] = CLIP_MEAN,
                   std: Sequence[float] = CLIP_STD) -> np.ndarray:
    """uint8 HWC (or HW) -> float32 CHW [3, out, out]."""
    lib = get_lib()
    img = np.ascontiguousarray(image)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if lib is None:
        from vit_prisma_tpu.dataloaders.transforms import make_transform
        return make_transform(out_size, mean, std)(img)
    h, w, c = img.shape
    out = np.empty((3, out_size, out_size), np.float32)
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    rc = lib.ip_preprocess_rgb(img.ctypes.data_as(_u8p), h, w, c, out_size,
                               _as_f32p(m), _as_f32p(s), _as_f32p(out))
    if rc != 0:
        raise RuntimeError(f"ip_preprocess_rgb failed: {rc}")
    return out


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 HWC RGB."""
    lib = get_lib()
    if lib is None:
        import io
        from PIL import Image
        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    out = _u8p()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.ip_decode_jpeg(ctypes.cast(buf, _u8p), len(data),
                            ctypes.byref(out), ctypes.byref(h),
                            ctypes.byref(w))
    if rc != 0:
        raise RuntimeError(f"ip_decode_jpeg failed: {rc}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(h.value, w.value, 3)).copy()
    finally:
        lib.ip_free(out)
    return arr


def decode_and_preprocess(data: bytes, out_size: int = 224,
                          mean: Sequence[float] = CLIP_MEAN,
                          std: Sequence[float] = CLIP_STD) -> np.ndarray:
    """JPEG bytes -> float32 CHW, fused decode+resize+normalize."""
    lib = get_lib()
    if lib is None:
        return preprocess_rgb(decode_jpeg(data), out_size, mean, std)
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    out = np.empty((3, out_size, out_size), np.float32)
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    rc = lib.ip_decode_preprocess(ctypes.cast(buf, _u8p), len(data), out_size,
                                  _as_f32p(m), _as_f32p(s), _as_f32p(out))
    if rc != 0:
        raise RuntimeError(f"ip_decode_preprocess failed: {rc}")
    return out


def preprocess_batch(images: np.ndarray, out_size: int = 224,
                     mean: Sequence[float] = CLIP_MEAN,
                     std: Sequence[float] = CLIP_STD,
                     n_threads: Optional[int] = None) -> np.ndarray:
    """uint8 NHWC -> float32 NCHW, threaded in native code."""
    lib = get_lib()
    imgs = np.ascontiguousarray(images)
    if imgs.dtype != np.uint8:
        imgs = (np.clip(imgs, 0, 1) * 255).astype(np.uint8)
    if imgs.ndim == 3:
        imgs = imgs[..., None]
    n, h, w, c = imgs.shape
    if lib is None:
        return np.stack([preprocess_rgb(imgs[i], out_size, mean, std)
                         for i in range(n)])
    out = np.empty((n, 3, out_size, out_size), np.float32)
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 8)
    rc = lib.ip_preprocess_batch(imgs.ctypes.data_as(_u8p), n, h, w, c,
                                 out_size, _as_f32p(m), _as_f32p(s),
                                 _as_f32p(out), n_threads)
    if rc != 0:
        raise RuntimeError(f"ip_preprocess_batch failed: {rc}")
    return out


def make_native_transform(out_size: int = 224, mean=CLIP_MEAN, std=CLIP_STD):
    """Drop-in for transforms.make_transform using the native pipeline."""
    def transform(image):
        if isinstance(image, (bytes, bytearray)):
            return decode_and_preprocess(bytes(image), out_size, mean, std)
        arr = np.asarray(image)
        if arr.ndim == 3 and arr.shape[0] in (1, 3):  # CHW -> HWC
            arr = arr.transpose(1, 2, 0)
        return preprocess_rgb(arr, out_size, mean, std)
    return transform
