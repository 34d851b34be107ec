"""Unit pins for the non-rigid synthetic object behind the recurring product
gates (scripts/synth_nonrigid.py): the field's boundary invariance (which the
constant-bucket claim rests on), inverse-map accuracy (which the analytic
flow rests on), and — most importantly — the gate's DISCRIMINATIVE POWER:
a flow that recovers only the rigid translation must FAIL the EPE check,
otherwise the gate cannot catch a non-rigid-only regression."""

import os.path as osp
import sys

import numpy as np

# APPEND, not prepend: scripts/ module names must never shadow packages or
# sibling test imports for the rest of the pytest session
sys.path.append(osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                         "scripts"))

from synth_nonrigid import (_invert, draw_nonrigid, nr_check_epe, nr_field,
                            nr_phase)

RY, RX, AMP = 60, 90, 6.0


def test_field_vanishes_at_boundary():
    """Displacement is exactly zero on and outside the ellipse boundary, and
    near-zero just inside (the (1-r^2)^2 envelope has zero gradient there) —
    the invariance that keeps the object region an exact translated ellipse."""
    th = np.linspace(0, 2 * np.pi, 720)
    # on the boundary (r^2 = 1 up to float rounding): |d| at machine-eps scale
    dy, dx = nr_field(RY * np.sin(th), RX * np.cos(th), RY, RX, AMP)
    assert np.hypot(dy, dx).max() < 1e-12
    # strictly outside: exactly zero (the envelope clips)
    dy, dx = nr_field(1.01 * RY * np.sin(th), 1.01 * RX * np.cos(th),
                      RY, RX, AMP)
    np.testing.assert_array_equal(dy, 0.0)
    np.testing.assert_array_equal(dx, 0.0)
    # just inside (r = 0.99): |d| still tiny (envelope ~ (1-0.98)^2)
    dy, dx = nr_field(0.99 * RY * np.sin(th), 0.99 * RX * np.cos(th),
                      RY, RX, AMP)
    assert np.hypot(dy, dx).max() < 0.01
    # and the interior really deforms (peak ~ 0.55 * amp * phase)
    yy, xx = np.mgrid[-RY:RY:3, -RX:RX:3].astype(np.float64)
    dy, dx = nr_field(yy, xx, RY, RX, AMP)
    assert np.hypot(dy, dx).max() > 0.4 * AMP


def test_inverse_map_accuracy():
    """Fixed-point inverse: invert(p + s*D(p)) recovers p to < 1e-6 px over
    the whole interior (contraction: |grad D| << 1 by construction)."""
    yy, xx = np.mgrid[-RY:RY:2, -RX:RX:2].astype(np.float64)
    inside = (yy / RY) ** 2 + (xx / RX) ** 2 < 1.0
    py, px = yy[inside], xx[inside]
    for s in (nr_phase(0), nr_phase(1)):
        dy, dx = nr_field(py, px, RY, RX, AMP)
        qy, qx = py + s * dy, px + s * dx
        ry, rx = _invert(qy, qx, RY, RX, AMP, s)
        err = np.hypot(ry - py, rx - px)
        assert err.max() < 1e-6, err.max()


def test_mask_is_exact_translated_ellipse():
    """draw_nonrigid's painted region equals the analytic ellipse exactly at
    any phase — constant bbox across frames, no solve-bucket churn."""
    H, W = 160, 220
    tex = np.zeros((H, W, 3), np.uint8)
    for t in (0, 1):
        img = np.zeros((H, W, 3), np.uint8)
        mask = np.zeros((H, W), np.uint8)
        draw_nonrigid(img, mask, tex, 2, 80.0, 110.0, 50, 80, 5.0, t)
        yy, xx = np.mgrid[0:H, 0:W]
        expect = ((yy - 80.0) / 50) ** 2 + ((xx - 110.0) / 80) ** 2 < 1.0
        np.testing.assert_array_equal(mask == 2, expect)


def test_gate_discriminates_rigid_only_flow():
    """The EPE gate must PASS the true analytic flow and FAIL a flow that
    recovers only the rigid translation (missing the ds*D interior term) —
    this is the whole point of the round-5 non-rigid gate."""
    H, W = 200, 260
    c0, c1 = (100.0, 130.0), (104.0, 136.0)  # +6,+4 translation
    mask = np.zeros((H, W), np.uint8)
    yy, xx = np.mgrid[0:H, 0:W]
    inside = ((yy - c0[0]) / RY) ** 2 + ((xx - c0[1]) / RX) ** 2 < 1.0
    mask[inside] = 2
    ys, xs = np.nonzero(inside)
    qy, qx = ys - c0[0], xs - c0[1]
    s0, s1 = nr_phase(0), nr_phase(1)
    py, px = _invert(qy, qx, RY, RX, AMP, s0)
    dy, dx = nr_field(py, px, RY, RX, AMP)
    gt_u = (c1[1] - c0[1]) + (s1 - s0) * dx
    gt_v = (c1[0] - c0[0]) + (s1 - s0) * dy
    u = np.zeros((H, W), np.float32)
    v = np.zeros((H, W), np.float32)
    u[ys, xs], v[ys, xs] = gt_u, gt_v
    ok, msg = nr_check_epe(u, v, mask, 2, c0, c1, RY, RX, AMP, 0,
                           label="true")
    assert ok, msg
    # rigid-only flow: translation everywhere, no interior deformation
    u2 = np.zeros((H, W), np.float32)
    v2 = np.zeros((H, W), np.float32)
    u2[ys, xs], v2[ys, xs] = c1[1] - c0[1], c1[0] - c0[0]
    ok2, msg2 = nr_check_epe(u2, v2, mask, 2, c0, c1, RY, RX, AMP, 0,
                             label="rigid-only")
    assert not ok2, msg2  # median |ds*D| ~ 2.2 px >> 0.8 threshold
