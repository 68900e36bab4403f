"""ctypes loader for the native C++ decode worker (data/native/decode.cc).

Builds the shared library on first use with g++ against the system
libjpeg/libpng (both baked into this image), caching the .so next to the
source. Every entry point degrades gracefully: if the toolchain or the
libraries are missing, ``available()`` is False and callers fall back to
PIL (data/file_operations.load_image does this automatically).

Why native: one C call per file, no PIL Image object churn, and the GIL
is released for the whole decode (ctypes foreign calls), so the decode
thread pool in data/dataset.py scales past the interpreter.
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..logger import logger

_SRC = os.path.join(os.path.dirname(__file__), "native", "decode.cc")
_SO = os.path.join(os.path.dirname(__file__), "native", "_bid_decode.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC,
           "-ljpeg", "-lpng"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.info(f"native decoder build failed ({e}); using PIL")
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.isfile(_SO) or (
                    os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                if not _build():
                    return None
            lib = ctypes.CDLL(_SO)
            lib.bid_decode.restype = ctypes.POINTER(ctypes.c_ubyte)
            lib.bid_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.bid_free.argtypes = [ctypes.POINTER(ctypes.c_ubyte)]
            _lib = lib
        except Exception as e:
            logger.info(f"native decoder unavailable ({e}); using PIL")
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def decode(path: str, num_channels: int = 3) -> Optional[np.ndarray]:
    """Decode a JPEG/PNG file to uint8 HWC, or None if the native path
    can't handle it (unsupported format, decode error, lib unavailable)."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    buf = lib.bid_decode(str(path).encode(), int(num_channels),
                         ctypes.byref(w), ctypes.byref(h), ctypes.byref(c))
    if not buf:
        return None
    try:
        n = h.value * w.value * c.value
        arr = np.ctypeslib.as_array(buf, shape=(n,)).copy()
        return arr.reshape(h.value, w.value, c.value)
    finally:
        lib.bid_free(buf)
