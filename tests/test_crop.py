"""Bounding-box-cropped solves must equal full-frame solves exactly (the crop
only removes provably-inert excluded pixels)."""

import numpy as np

from arap_flow_tpu.models.arap import ArapDeformer, crop_box
from arap_flow_tpu.ops.solver import SolverConfig


def _problem(H=56, W=72):
    rng = np.random.default_rng(0)
    arap_mask = np.full((H, W), 255, np.uint8)
    arap_mask[18:38, 20:44] = 0
    rgb = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    ys, xs = np.mgrid[20:36:4, 22:42:4]
    cons = np.stack(
        [xs.ravel(), ys.ravel(), xs.ravel() + 3, ys.ravel() + 2], 1
    ).astype(np.int32)
    return rgb, arap_mask, cons


def test_crop_box_alignment():
    _, arap_mask, cons = _problem()
    y0, x0, h, w = crop_box(arap_mask, cons, margin=4, h_mult=16, w_mult=16)
    assert h % 16 == 0 or h == arap_mask.shape[0]
    assert w % 16 == 0 or w == arap_mask.shape[1]
    ys, xs = np.where(arap_mask == 0)
    assert y0 <= ys.min() and y0 + h > ys.max()
    assert x0 <= xs.min() and x0 + w > xs.max()


def test_cropped_solve_matches_full():
    rgb, arap_mask, cons = _problem()
    cfg = SolverConfig(num_anneal=3, gn_iters=2, max_pcg_iters=80,
                       pcg_iters=80.0)
    full = ArapDeformer(cfg).deform(rgb, arap_mask, cons)
    cropped = ArapDeformer(cfg, crop=True).deform(rgb, arap_mask, cons)
    np.testing.assert_allclose(cropped.flow, full.flow, atol=2e-4)
    # warped products agree (uint8, allow the ±1 rounding band)
    diff = np.abs(
        cropped.warped_rgb.astype(int) - full.warped_rgb.astype(int)
    )
    assert (diff <= 1).all()
    np.testing.assert_array_equal(
        cropped.warped_mask > 0, full.warped_mask > 0
    )
