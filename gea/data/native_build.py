"""Build + ctypes binding for the native C++ data loader
(gea/data/native/loader.cpp). Compiled lazily with g++ against the
system libjpeg; the .so is cached next to the source and rebuilt when the
source is newer. Falls back cleanly (returns None) when no toolchain or
libjpeg is present — callers then use the PIL path."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_SRC_DIR, "loader.cpp")
_LIB = os.path.join(_SRC_DIR, "_gealoader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-ljpeg", "-lpthread", "-o", _LIB,
    ]
    try:
        res = subprocess.run(
            cmd, capture_output=True, text=True, timeout=240
        )
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        print(f"[gea] native loader build failed:\n{res.stderr[:2000]}")
        return False
    return True


def load_library() -> Optional[ctypes.CDLL]:
    """Returns the bound library, building if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        needs_build = not os.path.exists(_LIB) or (
            os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        )
        if needs_build and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            print(f"[gea] native loader dlopen failed: {e}")
            return None
        lib.gea_decode_square.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.gea_decode_square.restype = ctypes.c_int
        lib.gea_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
            ctypes.c_int64,
        ]
        lib.gea_loader_create.restype = ctypes.c_void_p
        lib.gea_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.gea_loader_next.restype = ctypes.c_int
        lib.gea_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.gea_loader_destroy.restype = None
        _lib = lib
        return _lib
