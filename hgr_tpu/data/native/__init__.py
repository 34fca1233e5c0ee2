"""ctypes binding + on-demand build of the native decode/resize core.

``load_native()`` returns the loaded shared library (building it with g++ on
first use) or ``None`` when no toolchain/libjpeg is available — callers fall
back to the PIL path. The ctypes call releases the GIL, so the existing
thread-pool loader scales across cores without worker processes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libhgr_decoder.so")
_SRC = os.path.join(_HERE, "decoder.cc")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        _SRC, "-o", _SO, "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_native():
    """-> ctypes CDLL with ``hgr_decode_resize`` or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.hgr_decode_resize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.hgr_decode_resize.restype = ctypes.c_int
        lib.hgr_decode_resize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.hgr_decode_resize_u8.restype = ctypes.c_int
        _lib = lib
        return _lib


def decode_resize(jpeg_bytes: bytes, out_px: int) -> Optional[np.ndarray]:
    """Decode+preprocess one JPEG -> [out_px, out_px, 3] float32 or None."""
    lib = load_native()
    if lib is None:
        return None
    buf = np.frombuffer(jpeg_bytes, dtype=np.uint8)
    out = np.empty((out_px, out_px, 3), np.float32)
    rc = lib.hgr_decode_resize(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_long(len(jpeg_bytes)),
        ctypes.c_int(out_px),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        return None
    return out


def decode_resize_u8(jpeg_bytes: bytes, out_px: int) -> Optional[np.ndarray]:
    """Decode+resize+crop one JPEG -> [out_px, out_px, 3] uint8 or None.

    The raw-uint8 host->device edge: normalization happens on device
    (4x less H2D transfer than the float32 path)."""
    lib = load_native()
    if lib is None:
        return None
    buf = np.frombuffer(jpeg_bytes, dtype=np.uint8)
    out = np.empty((out_px, out_px, 3), np.uint8)
    rc = lib.hgr_decode_resize_u8(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_long(len(jpeg_bytes)),
        ctypes.c_int(out_px),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    return out
