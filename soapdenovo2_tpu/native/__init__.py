"""Native (C++) runtime components, loaded via ctypes.

Built on first use with g++ (no pybind11 in this image); a missing
compiler degrades gracefully to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

log = logging.getLogger("soapdenovo2_tpu.native")

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libfastx.so")
_SRC = os.path.join(_DIR, "fastx.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        _SRC, "-o", _SO, "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # noqa: BLE001
        log.warning("native build failed (%s); using python fallback", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The fastx native library, building it if needed (None on failure)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            log.warning("native load failed (%s)", e)
            return None
        lib.fastx_decode.restype = ctypes.c_int64
        lib.fastx_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.gz_inflate.restype = ctypes.c_int64
        lib.gz_inflate.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.gz_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib
