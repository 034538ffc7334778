"""Build + load the native host data plane (g++ → .so → ctypes).

No pybind11 in this environment; the ABI is plain C (see byte_codec.cpp) so
ctypes binds it directly.  The library is compiled on first use and cached
next to the source; any failure degrades gracefully to the pure-Python
implementations in data/tokenizer.py / data/loader.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "byte_codec.cpp")
_LIB_PATH = os.path.join(_HERE, "libbyte_codec.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _LIB_PATH, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it if needed; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)

        lib.byte_batch_encode.argtypes = [
            u8p, i64p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, i32p, i32p,
        ]
        lib.byte_batch_encode.restype = None
        lib.pack_blocks.argtypes = [
            i32p, i32p, i64p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int64, i32p, i32p,
        ]
        lib.pack_blocks.restype = ctypes.c_int64
        lib.encode_completion_batch.argtypes = [
            u8p, i64p, u8p, i64p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, i32p, i32p, i32p,
        ]
        lib.encode_completion_batch.restype = ctypes.c_int64
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


# --------------------------------------------------------------------- bm25

_BM25_SRC = os.path.join(_HERE, "bm25.cpp")
_BM25_LIB_PATH = os.path.join(_HERE, "libbm25.so")
_bm25_lib: Optional[ctypes.CDLL] = None
_bm25_tried = False


def get_bm25_lib() -> Optional[ctypes.CDLL]:
    """The native BM25 scorer (bm25.cpp); None when unavailable."""
    global _bm25_lib, _bm25_tried
    with _lock:
        if _bm25_lib is not None or _bm25_tried:
            return _bm25_lib
        _bm25_tried = True
        if not os.path.exists(_BM25_LIB_PATH) or os.path.getmtime(
            _BM25_LIB_PATH
        ) < os.path.getmtime(_BM25_SRC):
            cmd = [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-o", _BM25_LIB_PATH, _BM25_SRC,
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_BM25_LIB_PATH)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.bm25_score.argtypes = [
            i64p, f64p, ctypes.c_int32, i64p, f64p, f64p,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            i64p, f64p,
        ]
        lib.bm25_score.restype = ctypes.c_int64
        _bm25_lib = lib
        return _bm25_lib
