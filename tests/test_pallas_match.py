"""Fused z-score+ZNCC-search kernel vs the XLA pair it replaces.

Runs the kernel in interpret mode (CPU); the same code compiles on TPU
(scripts/matcher_probe.py measures it). Scores differ only in float
summation order (log-tree vs cumsum box sums), so comparisons use small
tolerances and argmax agreement is checked off exact score ties.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from arap_flow_tpu.ops.matching import _search, _zscore
from arap_flow_tpu.ops.pallas_match import zncc_search


def _mk(shape, seed):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=shape).astype(np.float32)
    # correlated texture so NCC has real structure
    k = np.ones((3, 3), np.float32) / 9.0
    from scipy.signal import convolve2d

    return convolve2d(base, k, mode="same").astype(np.float32)


def _mk_pair(H, W, dy, dx, seed):
    a = _mk((H + 40, W + 40), seed)
    p1 = a[20 : 20 + H, 20 : 20 + W]
    p2 = a[20 + dy : 20 + dy + H, 20 + dx : 20 + dx + W]
    return jnp.asarray(p1), jnp.asarray(p2.copy())


@pytest.mark.parametrize("radius", [2, 5])
def test_matches_xla_search(radius):
    H, W = 48, 64
    p1, p2 = _mk_pair(H, W, 3, -2, 0)
    du, dv, sc = zncc_search(p1, p2, radius, patch=12, interpret=True)
    z1 = _zscore(p1, 12)
    z2 = _zscore(p2, 12)
    ru, rv, rs = _search(z1, z2, radius, 12)
    du, dv, sc = np.asarray(du), np.asarray(dv), np.asarray(sc)
    ru, rv, rs = np.asarray(ru), np.asarray(rv), np.asarray(rs)
    assert np.allclose(sc, rs, atol=2e-4), np.abs(sc - rs).max()
    agree = (du == ru) & (dv == rv)
    # argmax flips require a near-exact tie between offsets
    assert agree.mean() > 0.97, agree.mean()


def test_recovers_rigid_shift():
    H, W = 40, 56
    p1, p2 = _mk_pair(H, W, 2, 3, 1)
    du, dv, sc = zncc_search(p1, p2, 4, patch=12, interpret=True)
    # interior pixels (patch support inside both planes) see the true shift
    inner = (slice(12, H - 12), slice(12, W - 12))
    # p2 was cut forward of p1: p1[y,x] == p2[y-2, x-3] -> search finds (+3,+2)
    # in its own convention (z2 sampled at [y+dv, x+du])... assert the mode
    u_mode = np.bincount((np.asarray(du)[inner] + 4).astype(int).ravel()).argmax() - 4
    v_mode = np.bincount((np.asarray(dv)[inner] + 4).astype(int).ravel()).argmax() - 4
    assert (u_mode, v_mode) == (-3, -2), (u_mode, v_mode)
    assert np.median(np.asarray(sc)[inner]) > 0.8


def test_vmap_batches():
    import jax

    H, W = 32, 48
    pairs = [_mk_pair(H, W, 1, 1, s) for s in (2, 3)]
    p1 = jnp.stack([p[0] for p in pairs])
    p2 = jnp.stack([p[1] for p in pairs])
    du, dv, sc = jax.vmap(
        lambda a, b: zncc_search(a, b, 2, patch=12, interpret=True)
    )(p1, p2)
    assert du.shape == (2, H, W)
    for i in range(2):
        su, sv, ss = zncc_search(p1[i], p2[i], 2, patch=12, interpret=True)
        assert np.allclose(np.asarray(sc[i]), np.asarray(ss), atol=1e-5)
