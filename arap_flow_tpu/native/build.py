"""Build + load the native runtime (ctypes, no pybind11).

The shared library is compiled on first use into native/lib/ and cached; set
ARAP_NATIVE_DISABLE=1 to force the pure-numpy fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

_SRC = osp.join(osp.dirname(__file__), "src", "arap_native.cpp")
_LIBDIR = osp.join(osp.dirname(__file__), "lib")
_LIB = osp.join(_LIBDIR, "libarap_native.so")

_lib = None
_tried = False


def build(force: bool = False) -> str | None:
    """Compile the native library if needed; returns its path or None."""
    if osp.exists(_LIB) and not force:
        if not force and osp.getmtime(_LIB) >= osp.getmtime(_SRC):
            return _LIB
    os.makedirs(_LIBDIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import logging

        logging.getLogger(__name__).warning("native build failed: %s", e)
        return None
    return _LIB


def load() -> ctypes.CDLL | None:
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried or os.environ.get("ARAP_NATIVE_DISABLE") == "1":
        return _lib
    _tried = True
    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.raster_warp.argtypes = [
        f32p, u8p, u8p, ctypes.c_int, ctypes.c_int, u8p, u8p,
    ]
    lib.flo_write_file.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int, ctypes.c_int]
    lib.flo_write_file.restype = ctypes.c_int
    lib.flo_read_file.argtypes = [
        ctypes.c_char_p, f32p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.flo_read_file.restype = ctypes.c_int
    lib.writer_start.argtypes = [ctypes.c_int]
    lib.writer_submit_flo.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int, ctypes.c_int]
    lib.writer_submit_bytes.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long]
    lib.writer_pending.restype = ctypes.c_long
    lib.writer_errors.restype = ctypes.c_long
    _lib = lib
    return _lib
