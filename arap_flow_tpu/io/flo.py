"""Middlebury .flo flow-field IO.

Byte-compatible with the reference implementations:
- reader/writer semantics: sintel_io.py:26-73 (tag 202021.25 / 'PIEH', int32 w/h,
  rows of interleaved (u, v) float32),
- the C++ writer used by arap_deform: ARAP/deformation/src/main.cpp:53-75.

The file layout is: 4-byte tag 'PIEH' (== float32 202021.25 little-endian),
int32 width, int32 height, then height rows of width interleaved (u, v) float32
pairs (2 * width floats per row).
"""

from __future__ import annotations

import numpy as np

FLO_TAG_FLOAT = 202021.25
FLO_TAG_BYTES = b"PIEH"

_MAX_DIM = 99999  # sanity bound, mirrors warping/src/main.cpp:253-257


def flow_read(filename) -> tuple[np.ndarray, np.ndarray]:
    """Read a .flo file; returns (u, v) float32 arrays of shape (H, W).

    Mirrors sintel_io.py:26-41 (asserts on tag and size).
    """
    with open(filename, "rb") as f:
        data = f.read()
    return flow_decode(data)


def flow_decode(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode .flo bytes; returns (u, v) float32 arrays of shape (H, W)."""
    tag = np.frombuffer(data, dtype=np.float32, count=1)[0]
    if tag != np.float32(FLO_TAG_FLOAT):
        raise ValueError(
            f"flow_read: wrong tag in flow file (should be {FLO_TAG_FLOAT}, is {tag}). "
            "Big-endian machine?"
        )
    width = int(np.frombuffer(data, dtype=np.int32, count=1, offset=4)[0])
    height = int(np.frombuffer(data, dtype=np.int32, count=1, offset=8)[0])
    size = width * height
    if not (0 < width <= _MAX_DIM and 0 < height <= _MAX_DIM and 1 < size < 100000000):
        raise ValueError(f"flow_read: wrong input size (width={width}, height={height})")
    tmp = np.frombuffer(data, dtype=np.float32, offset=12, count=size * 2)
    tmp = tmp.reshape(height, width * 2)
    u = np.ascontiguousarray(tmp[:, 0::2])
    v = np.ascontiguousarray(tmp[:, 1::2])
    return u, v


def flow_encode(uv: np.ndarray, v: np.ndarray | None = None) -> bytes:
    """Encode a flow field to .flo bytes.

    ``uv`` is either an (H, W, 2) array, or the u channel with ``v`` given
    separately (sintel_io.py:43-73 convention).
    """
    if v is None:
        uv = np.asarray(uv)
        if uv.ndim != 3 or uv.shape[2] != 2:
            raise ValueError(f"flow_write: expected (H, W, 2), got {uv.shape}")
        u = uv[:, :, 0]
        v = uv[:, :, 1]
    else:
        u = np.asarray(uv)
        v = np.asarray(v)
    if u.shape != v.shape:
        raise ValueError(f"flow_write: u/v shape mismatch {u.shape} vs {v.shape}")
    height, width = u.shape
    tmp = np.empty((height, width * 2), dtype=np.float32)
    tmp[:, 0::2] = u
    tmp[:, 1::2] = v
    header = (
        FLO_TAG_BYTES
        + np.int32(width).tobytes()
        + np.int32(height).tobytes()
    )
    return header + tmp.tobytes()


def flow_write(filename, uv: np.ndarray, v: np.ndarray | None = None) -> None:
    """Write a flow field to a .flo file (byte-identical to sintel_io.py:43-73)."""
    with open(filename, "wb") as f:
        f.write(flow_encode(uv, v))
