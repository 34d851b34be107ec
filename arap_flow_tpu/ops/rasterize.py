"""Device-side forward-warp rasterization (XLA seed-and-gather formulation).

The reference rasterizes by scattering: sequential CPU loops over grid quads
drawing two triangles each, later writes winning (warping/src/main.cpp:110-225,
CombinedSolver.h:248-342). Dense ordered scatter is hostile to TPU, and a pure
inverse-warp gather cannot see segments that land far from their source (the
flow field is zero outside the segment). This module uses a hybrid:

1. **Seed scatter**: every drawable source pixel scatters its own linear index
   to the output cell its warped position rounds to, with `max` combining.
   Because draw priority in the reference *is* row-major source order, the max
   source index is exactly the priority winner at that cell (to rounding).
2. **Dilation**: a few 3×3 max-pool passes fill cells no source rounded into
   (triangle interiors/stretch), all with static shifts.
3. **Windowed exact test**: for each output pixel, the K×K candidate quads
   around its seed run the reference's LK edge-function coverage test and the
   accepted candidate with the highest draw priority wins — the reference's
   last-write-wins rule restricted to the candidate window. The window is
   ANCHORED ASYMMETRICALLY (offsets −2..window−3 by default): the seed is the
   max source index landing near the pixel, so the true winner — the highest-
   priority accepted quad — is never more than ~1 quad above it in index
   order, while dilation can displace seeds a couple of quads upward.
   Measured on the golden cat512 warp: offsets −2..+1 (window=4) matches the
   −2..+2 window's 99.93% mask agreement; −2..0 (window=3, the default)
   keeps 99.87% at 0.71× the in-batch cost (33 vs 46 ms/problem at B=8,
   224×384); symmetric −1..+1 collapses to 95.9%.
4. Barycentric color interpolation of the winner's corners, truncated to whole
   uint8 values (mLib vec3uc cast semantics).

Tests validate agreement against the reference-exact host rasterizer
(native/host_raster.py) on the golden cat512 fixtures.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def make_warp(flow: jnp.ndarray) -> jnp.ndarray:
    """warpField = flow + grid for flow (2, H, W) (main.cpp:159-166)."""
    H, W = flow.shape[-2:]
    gx = jnp.arange(W, dtype=jnp.float32)[None, :] * jnp.ones((H, 1), jnp.float32)
    gy = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W), jnp.float32)
    return flow + jnp.stack([gx, gy])


def _lk_accept(p0x, p0y, p1x, p1y, p2x, p2y, sx, sy):
    """LK edge-function coverage test (main.cpp:68-104) on broadcast arrays.

    Returns (accept, w0, w1, w2) with the reference's exact accept rule:
    not backfacing (all raw d < 0) and all normalised edge functions ≥ 0."""
    X0 = p0x - sx
    X1 = p1x - sx
    X2 = p2x - sx
    Y0 = p0y - sy
    Y1 = p1y - sy
    Y2 = p2y - sy
    d01 = X0 * Y1 - Y0 * X1
    d12 = X1 * Y2 - Y1 * X2
    d20 = X2 * Y0 - Y2 * X0
    backfacing = (d01 < 0) & (d12 < 0) & (d20 < 0)
    ssum = d01 + d12 + d20
    inv = jnp.where(ssum == 0.0, jnp.inf, 1.0 / ssum)
    n01 = d01 * inv
    n12 = d12 * inv
    n20 = d20 * inv
    ok = (~backfacing) & (n01 >= 0) & (n12 >= 0) & (n20 >= 0)
    ok = ok & jnp.isfinite(n01) & jnp.isfinite(n12) & jnp.isfinite(n20)
    return ok, n12, n20, n01


def _seed_map(warp: jnp.ndarray, drawable: jnp.ndarray, dilate: int) -> jnp.ndarray:
    """Scatter source indices to their rounded landing cells, then max-dilate.

    Returns (H, W) int32 of source linear indices (−1 where no seed)."""
    H, W = drawable.shape
    src_idx = (
        jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    )
    lx = jnp.clip(jnp.round(warp[0]).astype(jnp.int32), 0, W - 1)
    ly = jnp.clip(jnp.round(warp[1]).astype(jnp.int32), 0, H - 1)
    vals = jnp.where(drawable, src_idx, -1)
    seeds = jnp.full((H * W,), -1, jnp.int32)
    seeds = seeds.at[ly.ravel() * W + lx.ravel()].max(vals.ravel())
    seeds = seeds.reshape(H, W)

    def pool(_, s):
        """Fill-only dilation: empty cells take the neighborhood max; occupied
        cells keep their (accurate) seed."""
        nbr = s
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                sh = jnp.full_like(s, -1)
                ys = slice(max(dy, 0), H + min(dy, 0))
                yd = slice(max(-dy, 0), H + min(-dy, 0))
                xs = slice(max(dx, 0), W + min(dx, 0))
                xd = slice(max(-dx, 0), W + min(-dx, 0))
                sh = sh.at[yd, xd].set(s[ys, xs])
                nbr = jnp.maximum(nbr, sh)
        return jnp.where(s < 0, nbr, s)

    # fori_loop, not an unrolled Python loop: this platform charges ~1 ms
    # per HLO op, and the pool body is ~30 ops — loop-carried they count once
    return jax.lax.fori_loop(0, dilate, pool, seeds)


@partial(jax.jit, static_argnames=("window", "dilate", "anchor"))
def rasterize(
    warp: jnp.ndarray,
    rgb: jnp.ndarray,
    arap_mask: jnp.ndarray,
    window: int = 3,
    dilate: int = 3,
    anchor: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-rasterize the warped grid.

    warp: (2, H, W) absolute warped positions; rgb: (3, H, W) float32 colors;
    arap_mask: (H, W), 0 = object. Candidate quads are taken at offsets
    −anchor..window−1−anchor around each pixel's seed (anchor defaults to
    min(2, window−1); see module docstring for why the window skews negative).
    Returns (warped_rgb (3,H,W) f32 holding whole uint8 values, warped_mask
    (H,W) f32 ∈ {0,255}).
    """
    H, W = arap_mask.shape
    if anchor is None:
        anchor = min(2, window - 1)
    m = arap_mask == 0
    # quad drawable iff all 4 corners unmasked (main.cpp:190-195)
    m4 = jnp.zeros((H, W), bool)
    m4 = m4.at[: H - 1, : W - 1].set(
        m[:-1, :-1] & m[:-1, 1:] & m[1:, :-1] & m[1:, 1:]
    )

    seeds = _seed_map(warp, m4, dilate)
    sy0 = seeds // W - anchor
    sx0 = seeds % W - anchor
    has_seed = seeds >= 0

    gx = jnp.arange(W, dtype=jnp.float32)[None, :] * jnp.ones((H, 1), jnp.float32)
    gy = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W), jnp.float32)

    warp_rows = warp.reshape(2, -1).T  # (HW, 2): one gather per corner
    m4f = m4.ravel()

    def corner(cy_arr, cx):
        yy = jnp.clip(cy_arr, 0, H - 1)
        xx = jnp.clip(sx0 + cx, 0, W - 1)
        idx = yy * W + xx
        wxy = jnp.take(warp_rows, idx, axis=0)
        return wxy[..., 0], wxy[..., 1], idx

    neg = jnp.int32(-1)
    init = (
        jnp.full((H, W), neg, jnp.int32),            # best_prio
        jnp.zeros((3, H, W), jnp.float32),           # best_w
        jnp.zeros((3, H, W), jnp.int32),             # best corner indices
        jnp.zeros((H, W), bool),                     # covered
    )

    # scan over window rows (graph size ∝ window, not window²: an unrolled
    # candidate loop makes the XLA compile explode at production sizes).
    # adjacent candidate rows share a corner row: carry it through the scan
    # (halves the dominant cost — the corner gathers)
    def gather_row(cy_arr):
        parts = [corner(cy_arr, cx) for cx in range(window + 1)]
        return (
            jnp.stack([p[0] for p in parts]),
            jnp.stack([p[1] for p in parts]),
            jnp.stack([p[2] for p in parts]),
        )

    def row_body(carry, oy):
        best_prio, best_w, best_c, covered, prev = carry
        cy0 = sy0 + oy
        r0x, r0y, r0i = prev
        r1x, r1y, r1i = gather_row(cy0 + 1)
        row0 = [(r0x[cx], r0y[cx], r0i[cx]) for cx in range(window + 1)]
        row1 = [(r1x[cx], r1y[cx], r1i[cx]) for cx in range(window + 1)]
        for ox in range(window):
            c00, c01 = row0[ox], row0[ox + 1]
            c10, c11 = row1[ox], row1[ox + 1]
            qyy = cy0
            qxx = sx0 + ox
            in_range = (
                has_seed
                & (qyy >= 0)
                & (qyy < H - 1)
                & (qxx >= 0)
                & (qxx < W - 1)
            )
            qvalid = in_range & m4f[
                jnp.clip(qyy, 0, H - 1) * W + jnp.clip(qxx, 0, W - 1)
            ]
            qprio = (qyy * (W - 1) + qxx) * 2
            for t, (A, B, Cc) in enumerate(((c00, c01, c10), (c10, c01, c11))):
                ok, w0, w1, w2 = _lk_accept(
                    A[0], A[1], B[0], B[1], Cc[0], Cc[1], gx, gy
                )
                ok = ok & qvalid
                prio = qprio + t
                take = ok & (prio > best_prio)
                best_prio = jnp.where(take, prio, best_prio)
                best_w = jnp.where(take, jnp.stack([w0, w1, w2]), best_w)
                best_c = jnp.where(
                    take, jnp.stack([A[2], B[2], Cc[2]]), best_c
                )
                covered = covered | ok
        return (best_prio, best_w, best_c, covered, (r1x, r1y, r1i)), None

    first_row = gather_row(sy0)
    (best_prio, best_w, best_c, covered, _prev), _ = jax.lax.scan(
        row_body, (*init, first_row), jnp.arange(window)
    )
    best_w = [best_w[0], best_w[1], best_w[2]]
    best_c = [best_c[0], best_c[1], best_c[2]]

    rflat = rgb.reshape(rgb.shape[0], -1)
    col = (
        rflat[:, best_c[0]] * best_w[0]
        + rflat[:, best_c[1]] * best_w[1]
        + rflat[:, best_c[2]] * best_w[2]
    )
    wrgb = jnp.floor(jnp.clip(col, 0.0, 255.0))  # vec3uc C-cast truncation
    wrgb = jnp.where(best_prio[None] >= 0, wrgb, 0.0)
    wmask = jnp.where(covered, 255.0, 0.0)
    return wrgb, wmask


def rasterize_flow(
    flow: jnp.ndarray,
    rgb: jnp.ndarray,
    arap_mask: jnp.ndarray,
    window: int = 3,
    dilate: int = 3,
    anchor: int | None = None,
):
    """Rasterize from a flow field (2, H, W): warp = flow + grid (the warp_image
    entry semantics, main.cpp:159-166)."""
    return rasterize(
        make_warp(flow), rgb, arap_mask, window=window, dilate=dilate,
        anchor=anchor,
    )
