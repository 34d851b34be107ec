"""Non-rigid synthetic object shared by pipeline_bench / endurance / bench e2e.

The reference pipeline's operating regime is non-rigid object motion
(/root/reference/para_gen.py:216-223 keeps only 0<dist<60 px segment-consistent
matches precisely because objects deform); the recurring product gates were
rigid-only until round 5. This module provides the non-rigid object the gates
use: a textured ellipse that translates rigidly while its INTERIOR deforms by a
sinusoidal displacement field that vanishes (value and gradient) at the ellipse
boundary, so:

  - the object region in every frame is EXACTLY the translated ellipse
    (boundary points move only by the translation) -> constant bbox, constant
    solve buckets, no compile churn in the warm steady-state measurements;
  - the frame-to-frame flow is analytic: flow(q) = dc + ds * D(p(q)) where
    p(q) is the material coordinate of frame pixel q (fixed-point inverse)
    and D is the unit-phase displacement field.

Material map at frame t:   q = c(t) + p + s(t) * D(p),   |r(p)| < 1
with s(t) = +/-0.5 alternating per frame (so each pair carries |ds| = 1.0,
i.e. the full field D as its non-rigid flow component, up to ~0.55*amp px).
"""

import numpy as np


def bounce(t, step, lo, hi):
    """Triangle-wave drift shared by the bench/endurance datasets:
    |per-frame motion| stays `step` and the value stays inside [lo, hi] for
    ANY t (objects leaving the frame would change segment bboxes -> new crop
    buckets -> cold compiles polluting warm steady-state measurements)."""
    span = hi - lo
    ph = (step * t) % (2 * span)
    return lo + (ph if ph <= span else 2 * span - ph)


def make_textures(H, W, seed=0):
    """The shared synthetic texture pair (object texture, dim background):
    blocky base + fine detail, matcher-friendly. One definition so the
    pipeline-bench / endurance / bench-e2e datasets can never desynchronize."""
    rng = np.random.default_rng(seed)
    base = np.kron(
        rng.uniform(40, 255, (H // 8 + 2, W // 8 + 2, 3)), np.ones((8, 8, 1))
    )[:H, :W]
    detail = np.kron(
        rng.uniform(-30, 30, (H // 2 + 1, W // 2 + 1, 3)), np.ones((2, 2, 1))
    )[:H, :W]
    tex = np.clip(base + detail, 0, 255).astype(np.uint8)
    bg = (np.clip(base[::-1] * 0.4, 0, 255)).astype(np.uint8)
    return tex, bg


def nr_field(py, px, ry, rx, amp):
    """Unit-phase displacement field D(p) = (dy, dx) in material coords.

    Zero value AND zero gradient at the ellipse boundary (env = (1-r^2)^2
    clipped), so the region's boundary is invariant under the deformation.
    Peak magnitude ~0.55*amp at mid-radius; exactly zero at the center.
    """
    r2 = (py / ry) ** 2 + (px / rx) ** 2
    env = np.clip(1.0 - r2, 0.0, None) ** 2
    dx = amp * env * np.sin(np.pi * py / ry) * np.cos(0.5 * np.pi * px / rx)
    dy = amp * env * np.cos(0.5 * np.pi * py / ry) * np.sin(np.pi * px / rx)
    return dy, dx


def nr_phase(t):
    """Per-frame deformation phase: alternates sign so every adjacent pair
    has |ds| = 1.0 (the full field as non-rigid flow)."""
    return 0.5 if t % 2 else -0.5


def _invert(qy, qx, ry, rx, amp, s, iters=15):
    """Fixed-point inverse of p -> p + s*D(p) on material-relative coords."""
    py, px = qy.copy(), qx.copy()
    for _ in range(iters):
        dy, dx = nr_field(py, px, ry, rx, amp)
        py, px = qy - s * dy, qx - s * dx
    return py, px


def draw_nonrigid(img, mask, tex, seg, cy, cx, ry, rx, amp, t):
    """Paste the non-rigid object at center (cy, cx) into img/mask in place.

    The texture is anchored to material coordinates (like the rigid objects'
    anchor-riding texture), sampled bilinearly through the inverse map, so the
    appearance deforms exactly by the analytic field.
    """
    H, W = mask.shape
    s = nr_phase(t) if amp > 0 else 0.0
    y0, y1 = max(0, int(cy - ry)), min(H, int(cy + ry) + 1)
    x0, x1 = max(0, int(cx - rx)), min(W, int(cx + rx) + 1)
    yy, xx = np.mgrid[y0:y1, x0:x1].astype(np.float64)
    qy, qx = yy - cy, xx - cx
    inside = (qy / ry) ** 2 + (qx / rx) ** 2 < 1.0
    py, px = _invert(qy, qx, ry, rx, amp, s)
    # bilinear texture fetch at MATERIAL coords (offset is a pure function of
    # p so the texture rides the material across frames; tex tiles the frame)
    ty, tx = (py + ry) % H, (px + rx) % W
    iy0, ix0 = np.floor(ty).astype(int), np.floor(tx).astype(int)
    fy, fx = (ty - iy0)[..., None], (tx - ix0)[..., None]
    iy1, ix1 = (iy0 + 1) % H, (ix0 + 1) % W
    iy0, ix0 = iy0 % H, ix0 % W
    val = (
        tex[iy0, ix0] * (1 - fy) * (1 - fx)
        + tex[iy0, ix1] * (1 - fy) * fx
        + tex[iy1, ix0] * fy * (1 - fx)
        + tex[iy1, ix1] * fy * fx
    )
    img[y0:y1, x0:x1][inside] = np.clip(val, 0, 255).astype(np.uint8)[inside]
    mask[y0:y1, x0:x1][inside] = seg


def nr_check_epe(u, v, mask, seg, c0, c1, ry, rx, amp, t,
                 thresh=0.8, min_px=400, label=""):
    """EPE gate for the non-rigid segment on pair (t, t+1).

    Scores the produced flow (u, v) against the analytic flow
    dc + ds*D(p(q)) over the eroded interior (r^2 < 0.75 in material
    coords — the boundary ring mixes object and background matches).
    Returns (ok, message); ok is also True when the segment is too small.
    """
    sel = mask == seg
    if sel.sum() < min_px:
        return True, f"  flow check {label}: segment too small, skipped"
    ys, xs = np.nonzero(sel)
    qy, qx = ys - float(c0[0]), xs - float(c0[1])
    s0, s1 = (nr_phase(t), nr_phase(t + 1)) if amp > 0 else (0.0, 0.0)
    py, px = _invert(qy, qx, ry, rx, amp, s0)
    dy, dx = nr_field(py, px, ry, rx, amp)
    gt_u = (c1[1] - c0[1]) + (s1 - s0) * dx
    gt_v = (c1[0] - c0[0]) + (s1 - s0) * dy
    interior = (py / ry) ** 2 + (px / rx) ** 2 < 0.75
    if interior.sum() < min_px // 2:
        return True, f"  flow check {label}: interior too small, skipped"
    epe = np.hypot(u[ys, xs] - gt_u, v[ys, xs] - gt_v)[interior]
    med = float(np.median(epe))
    nr_mag = float(np.abs((s1 - s0)) * np.median(np.hypot(dx, dy)[interior]))
    ok = med < thresh
    return ok, (
        f"  flow check {label} (non-rigid, median |d_nr|={nr_mag:.2f}px): "
        f"median EPE {med:.3f}px vs analytic "
        f"(p95 {float(np.percentile(epe, 95)):.2f}) "
        f"{'OK' if ok else f'FAIL (>{thresh})'}"
    )
