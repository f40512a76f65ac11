"""ctypes bindings for the native (C++) image loader.

The native loader (``native/loader.cc``) decodes JPEG/PNG, resamples with a
PIL-compatible antialiased triangle filter, normalizes, and fans batches
over a thread pool. It is **opt-in** (``use_native=True`` on the pipeline
loaders or ``EMIP_NATIVE_LOADER=1``): the PIL path stays the default so
decoded pixels remain bit-identical to the reference's torchvision/PIL
pipeline (PIL resamples with int16 fixed-point coefficients; the native
float path differs by <=1/255 per pixel).

The shared library is built on first use with g++ (cached next to the
source); any build or load failure degrades silently to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_DIR, "loader.cc")
_LIB = os.path.join(_DIR, "libemiploader.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-fPIC", "-shared", _SRC, "-o", _LIB,
           "-ljpeg", "-lpng", "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB) or (
            os.path.isfile(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.emip_load_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.emip_load_image.restype = ctypes.c_int
        lib.emip_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.emip_load_batch.restype = ctypes.c_int
        lib.emip_image_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.emip_image_size.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_image(path: str, size: int, gray: bool = False) -> np.ndarray:
    """Decode + resize + normalize one image -> [size, size, C] float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    c = 1 if gray else 3
    out = np.empty((size, size, c), np.float32)
    rc = lib.emip_load_image(
        path.encode(), size, int(gray),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"native decode failed: {path}")
    return out


def load_batch(paths: list[str], size: int, gray: bool = False,
               num_threads: int = 8) -> np.ndarray:
    """Threaded batch decode -> [n, size, size, C] float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    c = 1 if gray else 3
    out = np.empty((n, size, size, c), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.emip_load_batch(
        arr, n, size, int(gray),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
    )
    if failures:
        raise IOError(f"native batch decode: {failures}/{n} failures")
    return out


def image_size(path: str) -> tuple[int, int]:
    """(height, width) of an image file."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.emip_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w)):
        raise IOError(f"native probe failed: {path}")
    return h.value, w.value
