"""Matcher tests: the NCC-pyramid matcher must recover known synthetic motions
and produce constraint tuples that survive the pipeline filter."""

import numpy as np

from arap_flow_tpu.io.constraints import filter_matches
from arap_flow_tpu.ops.matching import match_images


def _texture(H, W, seed=0):
    """Smooth random texture with enough structure for patch matching."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((H // 4 + 2, W // 4 + 2))
    up = np.kron(base, np.ones((4, 4)))[:H, :W]
    fine = rng.standard_normal((H, W)) * 0.3
    g = up + fine
    g = (g - g.min()) / (np.ptp(g) + 1e-9) * 255
    return np.repeat(g[:, :, None], 3, axis=2).astype(np.uint8)


def test_recovers_translation():
    H, W = 96, 128
    im1 = _texture(H, W)
    dx, dy = 7, -4
    im2 = np.roll(np.roll(im1, dy, axis=0), dx, axis=1)
    m = match_images(im1, im2, radius=16, levels=2, stride=4)
    assert len(m) > 100
    u = m[:, 2] - m[:, 0]
    v = m[:, 3] - m[:, 1]
    # majority of matches recover the exact shift
    assert np.median(u) == dx and np.median(v) == dy
    good = (np.abs(u - dx) <= 1) & (np.abs(v - dy) <= 1)
    assert good.mean() > 0.8, good.mean()


def test_zero_motion():
    H, W = 64, 96
    im1 = _texture(H, W, seed=3)
    m = match_images(im1, im1, radius=8, levels=2, stride=4)
    assert len(m) > 100
    u = m[:, 2] - m[:, 0]
    v = m[:, 3] - m[:, 1]
    assert np.abs(u).max() <= 1 and np.abs(v).max() <= 1


def test_matches_feed_constraint_filter():
    """End-to-end contract: matcher tuples -> pipeline filter -> per-segment
    constraints (para_gen.py:466-479 flow)."""
    H, W = 96, 128
    im1 = _texture(H, W, seed=5)
    dx, dy = 5, 3
    im2 = np.roll(np.roll(im1, dy, axis=0), dx, axis=1)
    seg = np.zeros((H, W), np.uint8)
    seg[20:70, 30:100] = 2  # one object segment, id 2
    m = match_images(im1, im2, radius=16, levels=2, stride=4)
    kept, segs = filter_matches(m[:, :4].astype(np.int32), seg, seg)
    assert len(kept) > 20
    assert set(np.unique(segs)) == {2}
    # all kept displacements within the filter bound and nonzero
    d = np.hypot(kept[:, 2] - kept[:, 0], kept[:, 3] - kept[:, 1])
    assert (d > 0).all() and (d < 60).all()
