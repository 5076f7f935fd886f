"""ctypes binding for the native batch JPEG decoder (native/jpeg_decoder.cpp).

Builds the shared library with g++ on first use (cached next to the
source); the loaders fall back to cv2/PIL when the toolchain or libjpeg is
unavailable. Output is BGR uint8, identical layout to cv2.imread.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "jpeg_decoder.cpp")
_SO = os.path.join(_NATIVE_DIR, "libf3djpeg.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC,
           "-ljpeg", "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.f3d_decode_jpeg_batch.restype = ctypes.c_int
        lib.f3d_decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.f3d_probe_jpeg.restype = ctypes.c_int
        lib.f3d_probe_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def probe(path: str) -> Optional[Tuple[int, int]]:
    """(height, width) of a JPEG, or None."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.f3d_probe_jpeg(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    return h.value, w.value


def decode_batch(paths: List[str], height: int, width: int,
                 n_threads: int = 4) -> Optional[np.ndarray]:
    """Decode a batch of same-sized JPEGs -> (N, H, W, 3) BGR uint8.

    Returns None if the native library is unavailable; raises ValueError
    if a file fails to decode or has unexpected dimensions.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, height, width, 3), dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.f3d_decode_jpeg_batch(
        c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        height, width, n_threads)
    if rc != 0:
        raise ValueError(
            f"native JPEG decode failed for {paths[rc - 1]!r} "
            f"(expected {height}x{width}x3)")
    return out
