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


_SCAF_SO = os.path.join(_DIR, "libscaffolder.so")
_SCAF_SRC = os.path.join(_DIR, "scaffolder.cpp")
_scaf_lib: Optional[ctypes.CDLL] = None
_scaf_tried = False


def get_scaffolder_lib() -> Optional[ctypes.CDLL]:
    """The native scaffold-ordering core (None when unavailable)."""
    global _scaf_lib, _scaf_tried
    with _lock:
        if _scaf_lib is not None or _scaf_tried:
            return _scaf_lib
        _scaf_tried = True
        if not os.path.exists(_SCAF_SO) or (
            os.path.getmtime(_SCAF_SO) < os.path.getmtime(_SCAF_SRC)
        ):
            cmd = [
                "g++", "-O3", "-march=native", "-std=c++17", "-shared",
                "-fPIC", _SCAF_SRC, "-o", _SCAF_SO,
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=180)
            except Exception as e:  # noqa: BLE001
                log.warning(
                    "native scaffolder build failed (%s); python path", e
                )
                return None
        try:
            lib = ctypes.CDLL(_SCAF_SO)
        except OSError as e:
            log.warning("native scaffolder load failed (%s)", e)
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.scaff_ordering_rank.restype = ctypes.c_int64
        lib.scaff_ordering_rank.argtypes = [
            ctypes.c_int64, i64p, u8p, f64p, u8p,          # ctg state
            ctypes.c_int64, i64p, i64p, i64p,              # chains
            ctypes.c_int64, i64p, i64p, i64p, i64p,        # links
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # params
            ctypes.c_int64,                                # k
            ctypes.c_double, ctypes.c_int64, u64p, u64p,   # snp
            ctypes.c_int64, u64p,                          # small history
            i64p, i64p, i64p, i64p, i64p,                  # outputs
        ]
        _scaf_lib = lib
        return _scaf_lib


_CG_SO = os.path.join(_DIR, "libcontiggraph.so")
_CG_SRC = os.path.join(_DIR, "contiggraph.cpp")
_cg_lib: Optional[ctypes.CDLL] = None
_cg_tried = False


def get_contiggraph_lib() -> Optional[ctypes.CDLL]:
    """The native contig-graph bubble core (tour-bus over CSR arrays;
    None when unavailable)."""
    global _cg_lib, _cg_tried
    with _lock:
        if _cg_lib is not None or _cg_tried:
            return _cg_lib
        _cg_tried = True
        if not os.path.exists(_CG_SO) or (
            os.path.getmtime(_CG_SO) < os.path.getmtime(_CG_SRC)
        ):
            cmd = [
                "g++", "-O3", "-march=native", "-std=c++17", "-shared",
                "-fPIC", _CG_SRC, "-o", _CG_SO,
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=180)
            except Exception as e:  # noqa: BLE001
                log.warning(
                    "native contiggraph build failed (%s); python path", e
                )
                return None
        try:
            lib = ctypes.CDLL(_CG_SO)
        except OSError as e:
            log.warning("native contiggraph load failed (%s)", e)
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.contig_tour_bus.restype = ctypes.c_int64
        lib.contig_tour_bus.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, u8p, i32p, i32p,
            ctypes.c_int64,                                # has_marker
            i64p, u8p,                                     # seqs
            i64p, i64p, i64p,                              # arcs CSR
            ctypes.c_double, ctypes.c_int64, ctypes.c_int64,  # params
            ctypes.c_int64, i64p, i64p, i64p,              # out arcs
            ctypes.c_int64, i64p, i64p, i64p,              # bubbles
            ctypes.c_int64, i64p,                          # snps
            i64p,                                          # counts
        ]
        _cg_lib = lib
        return _cg_lib
