"""Python surface over the native runtime with numpy fallbacks."""

from __future__ import annotations

import ctypes

import numpy as np

from . import build as _build
from .host_raster import rasterize_warp_exact as _np_raster


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def native_available() -> bool:
    return _build.load() is not None


def rasterize_warp(warp: np.ndarray, rgb: np.ndarray, arap_mask: np.ndarray):
    """Reference-exact forward rasterization: C++ when available, else the
    vectorised numpy implementation (identical semantics, tests assert it)."""
    lib = _build.load()
    if lib is None:
        return _np_raster(warp, rgb, arap_mask)
    H, W = arap_mask.shape
    warp = np.ascontiguousarray(warp, np.float32)
    rgb = np.ascontiguousarray(rgb, np.uint8)
    mask = np.ascontiguousarray(arap_mask, np.uint8)
    out_rgb = np.zeros((H, W, 3), np.uint8)
    out_mask = np.zeros((H, W), np.uint8)
    lib.raster_warp(_f32p(warp), _u8p(rgb), _u8p(mask), H, W,
                    _u8p(out_rgb), _u8p(out_mask))
    return out_rgb, out_mask


def flo_write(path, uv: np.ndarray) -> None:
    """(H, W, 2) float32 -> .flo; native fast path, numpy fallback."""
    lib = _build.load()
    uv = np.ascontiguousarray(uv, np.float32)
    H, W = uv.shape[:2]
    if lib is None:
        from ..io.flo import flow_write

        flow_write(path, uv)
        return
    rc = lib.flo_write_file(str(path).encode(), _f32p(uv), W, H)
    if rc != 0:
        raise IOError(f"flo_write_file({path}) failed rc={rc}")


def flo_read(path) -> tuple[np.ndarray, np.ndarray]:
    lib = _build.load()
    if lib is None:
        from ..io.flo import flow_read

        return flow_read(path)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.flo_read_file(str(path).encode(), None, 0, ctypes.byref(w),
                           ctypes.byref(h))
    if rc != 0:
        raise IOError(f"flo_read_file({path}) header failed rc={rc}")
    buf = np.empty((h.value, w.value, 2), np.float32)
    rc = lib.flo_read_file(str(path).encode(), _f32p(buf), buf.size,
                           ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"flo_read_file({path}) failed rc={rc}")
    return buf[:, :, 0].copy(), buf[:, :, 1].copy()


class AsyncWriter:
    """Threaded native file writer: .flo fields and pre-encoded bytes are
    persisted off the critical path (the do_arap-process IO replacement)."""

    def __init__(self, threads: int = 4):
        self.lib = _build.load()
        self.started = False
        if self.lib is not None:
            self.lib.writer_start(threads)
            self.started = True

    def submit_flo(self, path, uv: np.ndarray):
        uv = np.ascontiguousarray(uv, np.float32)
        H, W = uv.shape[:2]
        if not self.started:
            flo_write(path, uv)
            return
        self.lib.writer_submit_flo(str(path).encode(), _f32p(uv), W, H)

    def submit_bytes(self, path, data: bytes):
        if not self.started:
            with open(path, "wb") as f:
                f.write(data)
            return
        self.lib.writer_submit_bytes(str(path).encode(), data, len(data))

    def drain(self):
        if self.started:
            self.lib.writer_drain()

    def errors(self) -> int:
        """Failed-write count; the native counter persists after close()
        (callers check it AFTER draining to decide whether the product tree
        can be trusted — para_gen's end-of-run sweep)."""
        return int(self.lib.writer_errors()) if self.lib is not None else 0

    def close(self):
        if self.started:
            self.lib.writer_drain()
            self.lib.writer_stop()
            self.started = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
