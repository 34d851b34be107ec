"""Fused z-score + exhaustive ZNCC search as ONE Pallas TPU kernel.

Motivation (measured, scripts/matcher_probe.py + HLO dump): the matcher's
device time (~0.49 s/pair at 854×480) is NOT in its searches — dropping the
rotation hypotheses saves 0.03 s and shrinking the refine radius 0.025 s.
It is the program's op COUNT: ~230 executed HLO ops (five separable cumsum
z-scores, the coarse gather stack, layout copies), on a platform that
charges ~1 ms fixed cost per executed op (CLAUDE.md). The arithmetic itself
is trivial — a full-res plane is 1.6 MB.

This kernel collapses {z-score(p1), z-score(p2), (2r+1)² shifted patch-NCC
correlations, running argmax} into a single executed op. Box sums use a
log-tree of `pltpu.roll` shifts on a zero-padded plane resident in VMEM;
the offset sweep is an in-kernel `fori_loop` with DYNAMIC roll shifts (so
the coarse level's 729-offset search stays one op too, and never
materialises the (n_off, H, W) stack the XLA path gathers).

Semantics replicate ops/matching._zscore + _search exactly up to float
summation order (box sums: log-tree adds here vs cumsum differences there);
scores match to ~1e-5 and argmax picks agree except on exact ties, which
both schedules break toward the first offset in raster order
(dy-major, −r..r). Validated against the XLA pair in
tests/test_pallas_match.py (interpret mode on CPU, real kernel on TPU).

Reference contract: the NCC patch scoring + reciprocal-verification search
this replaces stands in for DeepMatching's correlation pyramid
(reference para_gen.py:227-240).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-4


def _sh(a: jnp.ndarray, s, axis: int) -> jnp.ndarray:
    """out[i] = a[i + s] (s may be a traced int32): pltpu.roll with shift −s.

    Wrapped elements come from the far side of the plane — callers keep a
    zero margin wide enough that every wrapped-in value is zero."""
    size = a.shape[axis]
    return pltpu.roll(a, shift=(-s) % size, axis=axis)


def _box12_axis(x: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """Zero-padded k-window box sum along `axis`, window [i−k//2, i+k−1−k//2]
    (ops/matching._box_sum semantics), as a log-tree of static rolls."""
    a = k // 2
    # forward k-window sums F[i] = Σ_{j=i}^{i+k−1} x[j] by binary composition
    sums = {1: x}

    def fwd(n):
        if n in sums:
            return sums[n]
        half = 1 << (n.bit_length() - 1)
        if half == n:
            lo = fwd(half // 2)
            sums[n] = lo + _sh(lo, half // 2, axis)
        else:
            lo = fwd(half)
            sums[n] = lo + _sh(fwd(n - half), half, axis)
        return sums[n]

    return _sh(fwd(k), -a, axis)


def _box12(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return _box12_axis(_box12_axis(x, k, 0), k, 1)


def _zncc_kernel(p1_ref, p2_ref, o_du, o_dv, o_sc, *, radius: int, patch: int,
                 H: int, W: int, P: int):
    """One (Hp, Wp) block: z-score both planes, sweep (2r+1)² offsets."""
    n = float(patch * patch)
    Hp, Wp = p1_ref.shape
    iy = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    mask = (
        (iy >= P) & (iy < P + H) & (ix >= P) & (ix < P + W)
    ).astype(jnp.float32)

    def zscore(p):
        mu = _box12(p, patch) * (1.0 / n)
        var = _box12(p * p, patch) * (1.0 / n) - mu * mu
        z = (p - mu) * jax.lax.rsqrt(jnp.maximum(var, _EPS))
        return z * mask

    z1 = zscore(p1_ref[:])
    z2 = zscore(p2_ref[:])

    side = 2 * radius + 1

    def body(idx, carry):
        best, bu, bv = carry
        dy = idx // side - radius
        dx = idx % side - radius
        z2s = _sh(_sh(z2, dy, 0), dx, 1)
        corr = _box12(z1 * z2s, patch) * (1.0 / n)
        take = corr > best
        fdx = jnp.float32(dx)
        fdy = jnp.float32(dy)
        return (
            jnp.where(take, corr, best),
            jnp.where(take, fdx, bu),
            jnp.where(take, fdy, bv),
        )

    z = jnp.zeros((Hp, Wp), jnp.float32)
    best, bu, bv = jax.lax.fori_loop(
        0, side * side, body, (jnp.full((Hp, Wp), -jnp.inf, jnp.float32), z, z)
    )
    o_du[:] = bu
    o_dv[:] = bv
    o_sc[:] = best


@partial(jax.jit, static_argnames=("radius", "patch", "interpret"))
def zncc_search(p1: jnp.ndarray, p2: jnp.ndarray, radius: int,
                patch: int = 12, interpret: bool = False):
    """Fused z-score + exhaustive NCC search (drop-in for
    `_search(_zscore(p1), _zscore(p2), radius, patch)` but taking RAW
    planes). p1, p2: (H, W) float32. Returns (du, dv, score), each (H, W).

    Composes with jax.vmap (pallas batching adds a grid axis): the bidir
    pair and the coarse hypothesis bank batch through here."""
    H, W = p1.shape
    # zero margin: z2 rolls by ≤ radius, the box tree reads ≤ patch−1
    # further forward and k//2 back — pad once, every wrap lands on zeros.
    # Mosaic's dynamic_rotate requires register-aligned shapes: round the
    # padded plane up to (8, 128) multiples (extra zeros only widen margins)
    P = radius + patch
    Hp = -(-(H + 2 * P) // 8) * 8
    Wp = -(-(W + 2 * P) // 128) * 128
    pad = ((P, Hp - H - P), (P, Wp - W - P))
    p1p = jnp.pad(p1, pad)
    p2p = jnp.pad(p2, pad)
    shape = jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)
    du, dv, sc = pl.pallas_call(
        partial(_zncc_kernel, radius=radius, patch=patch, H=H, W=W, P=P),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(p1p, p2p)
    sl = (slice(P, P + H), slice(P, P + W))
    return du[sl], dv[sl], sc[sl]


def fits_vmem(H: int, W: int, radius: int, patch: int = 12) -> bool:
    """~14 live (Hp, Wp) planes must fit the VMEM budget."""
    P = radius + patch
    return 14 * (H + 2 * P) * (W + 2 * P) * 4 <= 100 * 1024 * 1024
