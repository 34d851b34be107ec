"""Constraint (sparse correspondence) files.

Formats:
- Matcher output: text lines ``x1 y1 x2 y2 [score ...]`` (DeepMatching CLI contract,
  para_gen.py:227-240).
- Solver constraint file: first line N, then N whitespace-separated 4-tuples
  (para_gen.py:479 writes; ARAP/deformation/src/main.cpp:26-50 reads).
"""

from __future__ import annotations

from math import sqrt

import numpy as np

MAX_CONSTRAINT_DIST = 60.0  # para_gen.py:223


def read_matches(path) -> np.ndarray:
    """Read matcher output lines; returns (N, 4) int array of x1 y1 x2 y2."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 4:
                rows.append([int(float(p)) for p in parts[:4]])
    return np.array(rows, dtype=np.int32).reshape(-1, 4)


def read_constraint_file(path) -> np.ndarray:
    """Read a solver constraint file (N header + 4-tuples) -> (N, 4) int array.

    Parity with loadConstraints, ARAP/deformation/src/main.cpp:26-50 (whitespace
    tokenised, first token is the count).
    """
    with open(path) as f:
        tokens = f.read().split()
    if not tokens:
        return np.zeros((0, 4), dtype=np.int32)
    n = int(tokens[0])
    vals = [int(t) for t in tokens[1 : 1 + 4 * n]]
    if len(vals) != 4 * n:
        raise ValueError(f"constraint file {path}: expected {n} 4-tuples")
    return np.array(vals, dtype=np.int32).reshape(n, 4)


def write_constraint_file(path, constraints: np.ndarray) -> None:
    """Write count header + tab-separated 4-tuples (parity with para_gen.py:476-479)."""
    lines = [str(len(constraints))]
    for x1, y1, x2, y2 in np.asarray(constraints, dtype=np.int64):
        lines.append(f"{x1:d}\t{y1:d}\t{x2:d}\t{y2:d}")
    with open(path, "w") as f:
        f.write("\n".join(lines))


def valid_constraint(x1, y1, x2, y2, msk1: np.ndarray, msk2: np.ndarray) -> bool:
    """Single-match validity test; parity with valid_cnstr, para_gen.py:216-223.

    Keeps matches that are in-bounds, move by 0 < dist < 60 px, start on an object
    pixel, and land on the same segment id.

    Deliberate deviation: the reference checks only the UPPER bounds, so a
    negative coordinate (possible in external DeepMatching output) wrap-
    indexes the mask from the row's end and can validate against the wrong
    pixel; here negatives are rejected, matching the vectorized
    filter_matches predicate (the two in-repo implementations must agree).
    """
    if (
        x1 < 0 or y1 < 0 or x2 < 0 or y2 < 0
        or x1 >= msk1.shape[1]
        or x2 >= msk2.shape[1]
        or y1 >= msk1.shape[0]
        or y2 >= msk2.shape[0]
    ):
        return False
    dist = sqrt((x2 - x1) ** 2 + (y2 - y1) ** 2)
    return (
        dist < MAX_CONSTRAINT_DIST
        and dist > 0
        and msk1[y1, x1] > 0
        and msk1[y1, x1] == msk2[y2, x2]
    )


def filter_matches(
    matches: np.ndarray, msk1: np.ndarray, msk2: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorised constraint filter; returns (kept (M,4), segment ids (M,)).

    Same predicate as valid_cnstr (para_gen.py:216-223): in-bounds, 0 < dist < 60,
    source pixel on an object segment, and segment-consistent between frames.
    """
    m = np.asarray(matches, dtype=np.int64).reshape(-1, 4)
    if len(m) == 0:
        return m.astype(np.int32), np.zeros((0,), dtype=np.int64)
    x1, y1, x2, y2 = m[:, 0], m[:, 1], m[:, 2], m[:, 3]
    inb = (
        (x1 >= 0)
        & (y1 >= 0)
        & (x2 >= 0)
        & (y2 >= 0)
        & (x1 < msk1.shape[1])
        & (x2 < msk2.shape[1])
        & (y1 < msk1.shape[0])
        & (y2 < msk2.shape[0])
    )
    xi1, yi1 = np.where(inb, x1, 0), np.where(inb, y1, 0)
    xi2, yi2 = np.where(inb, x2, 0), np.where(inb, y2, 0)
    dist2 = (x2 - x1) ** 2 + (y2 - y1) ** 2
    s1 = msk1[yi1, xi1].astype(np.int64)
    s2 = msk2[yi2, xi2].astype(np.int64)
    keep = inb & (dist2 > 0) & (dist2 < MAX_CONSTRAINT_DIST ** 2) & (s1 > 0) & (s1 == s2)
    return m[keep].astype(np.int32), s1[keep]


def add_border_pins(constraints: np.ndarray, width: int, height: int) -> np.ndarray:
    """Append identity constraints pinning the full image border.

    Parity with ARAP/deformation/src/main.cpp:95-101 / 130-137 (every border pixel
    is constrained to itself; order: row-major y outer, x inner).
    """
    # border pixels in row-major order (y outer, x inner) without
    # materialising full H×W index grids (this runs per segment in the
    # pipeline's host prep loop)
    xr = np.arange(width, dtype=np.int32)
    ymid = np.arange(1, height - 1, dtype=np.int32)
    rows = [np.stack([xr, np.zeros(width, np.int32)], 1)]
    if height > 1:
        edges = np.empty((ymid.size * 2, 2), np.int32)
        edges[0::2, 0] = 0
        edges[1::2, 0] = width - 1
        edges[0::2, 1] = ymid
        edges[1::2, 1] = ymid
        rows.append(edges if width > 1 else edges[0::2])
        rows.append(
            np.stack([xr, np.full(width, height - 1, np.int32)], 1)
        )
    b = np.concatenate(rows, axis=0)
    pins = np.concatenate([b, b], axis=1)
    constraints = np.asarray(constraints, dtype=np.int32).reshape(-1, 4)
    return np.concatenate([constraints, pins], axis=0)
