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


_LOADER_SRC = os.path.join(_CSRC, "batch_loader.cpp")


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           _LOADER_SRC, "-o", _LIB_PATH, "-ljpeg", "-lpthread"]
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
        stale = os.path.exists(_LIB_PATH) and any(
            os.path.getmtime(s) > os.path.getmtime(_LIB_PATH)
            for s in (_SRC, _LOADER_SRC) if os.path.exists(s))
        path = _LIB_PATH if os.path.exists(_LIB_PATH) and not stale \
            else _build()
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
        lib.ip_loader_create.restype = ctypes.c_void_p
        lib.ip_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, _f32p, _f32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_ulonglong, ctypes.c_int]
        lib.ip_loader_next.restype = ctypes.c_int
        lib.ip_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.ip_loader_destroy.restype = None
        lib.ip_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.ip_loader_failures.restype = ctypes.c_long
        lib.ip_loader_failures.argtypes = [ctypes.c_void_p]
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


class NativeBatchLoader:
    """Asynchronous prefetching image-batch loader (csrc/batch_loader.cpp).

    The counterpart of the reference's ``DataLoader(num_workers=...)``
    feeding the activation store (activations_store.py:226-249): a C++
    worker pool reads + JPEG-decodes + preprocesses files ahead of the
    consumer into a bounded ring of host batch buffers; ``next()`` only
    memcpys a finished batch.  Yields float32 NCHW (normalized) or, with
    ``uint8_wire=True``, uint8 NCHW resized pixels for the store's
    on-device-normalize H2D path (sae/store.py).

    Epoch shuffling is deterministic from ``seed``; with ``n_workers > 1``
    batch *delivery* order is unordered (the store re-shuffles rows).
    Without the native library, a Python thread prefetches batches through
    the same per-image pipeline (itself PIL-backed when needed).

    Pass an instance directly as the ``dataset`` of
    ``VisionActivationsStore`` — the store detects the iterator protocol
    and consumes batches as-is.
    """

    def __init__(self, paths: Sequence[str], batch_size: int,
                 out_size: int = 224, mean: Sequence[float] = CLIP_MEAN,
                 std: Sequence[float] = CLIP_STD, n_workers: int = 4,
                 queue_depth: int = 4, seed: int = 0,
                 uint8_wire: bool = False):
        if len(paths) < batch_size:
            raise ValueError("need at least one full batch of paths")
        self.paths = [os.fspath(p) for p in paths]
        self.batch_size = batch_size
        self.out_size = out_size
        self.mean, self.std = mean, std
        self.uint8_wire = uint8_wire
        self.dtype = np.uint8 if uint8_wire else np.float32
        self._shape = (batch_size, 3, out_size, out_size)
        self._handle = None
        self._fallback = None
        lib = get_lib()
        if lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            m = np.asarray(mean, np.float32)
            s = np.asarray(std, np.float32)
            self._handle = lib.ip_loader_create(
                arr, len(self.paths), batch_size, out_size, _as_f32p(m),
                _as_f32p(s), n_workers, queue_depth, seed,
                1 if uint8_wire else 0)
        if self._handle is None:
            self._fallback = self._make_fallback(seed, queue_depth)

    def _make_fallback(self, seed: int, depth: int):
        import queue as _q
        import threading as _t
        out_q: "_q.Queue[np.ndarray]" = _q.Queue(maxsize=depth)
        stop = _t.Event()
        self._stop = stop
        # the producer closes over locals only (never self), so dropping
        # the loader without close() lets GC run __del__ -> stop the thread
        paths = list(self.paths)
        batch_size, out_size = self.batch_size, self.out_size
        mean, std, uint8_wire = self.mean, self.std, self.uint8_wire

        def produce():
            rng = np.random.default_rng(seed)
            while not stop.is_set():
                order = rng.permutation(len(paths))
                nb = len(paths) // batch_size
                for b in range(nb):
                    if stop.is_set():
                        return
                    idx = order[b * batch_size:(b + 1) * batch_size]
                    imgs = []
                    for j in idx:
                        with open(paths[int(j)], "rb") as f:
                            chw = decode_and_preprocess(
                                f.read(), out_size, mean, std)
                        if uint8_wire:
                            # undo normalize -> resized pixel bytes
                            m = np.asarray(mean, np.float32)[:, None, None]
                            s = np.asarray(std, np.float32)[:, None, None]
                            chw = np.clip((chw * s + m) * 255.0 + 0.5,
                                          0, 255).astype(np.uint8)
                        imgs.append(chw)
                    out_q.put(np.stack(imgs))

        th = _t.Thread(target=produce, daemon=True)
        th.start()
        return out_q

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._handle is not None:
            out = np.empty(self._shape, self.dtype)
            rc = get_lib().ip_loader_next(
                self._handle, out.ctypes.data_as(ctypes.c_void_p))
            if rc != 0:
                raise RuntimeError(f"ip_loader_next failed: {rc}")
            return out
        if self._fallback is None:
            raise RuntimeError("NativeBatchLoader is closed")
        return self._fallback.get()

    def decode_failures(self) -> int:
        """Files the native workers could not read/decode so far (each is
        also logged to stderr and delivered as a zero image)."""
        if self._handle is not None:
            return int(get_lib().ip_loader_failures(self._handle))
        return 0

    def close(self):
        if self._handle is not None:
            get_lib().ip_loader_destroy(self._handle)
            self._handle = None
        elif self._fallback is not None:
            self._stop.set()
            try:  # drain so the producer can exit its put()
                while True:
                    self._fallback.get_nowait()
            except Exception:
                pass
            self._fallback = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
