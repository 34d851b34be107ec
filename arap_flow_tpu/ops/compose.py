"""Per-segment output composition and background compositing (device-side).

Replaces the host-side flatten() / add_bg() of the reference
(para_gen.py:136-175, 50-61): later segments overwrite flow/RGB/mask wherever
their warped mask is nonzero; background pixels take the background image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def compose_segments(
    flows: jnp.ndarray, rgbs: jnp.ndarray, masks: jnp.ndarray
):
    """Compose per-segment products into one frame.

    flows (S,2,H,W), rgbs (S,3,H,W), masks (S,H,W). Segment order matters:
    segment i overwrites wherever masks[i] != 0 (flatten(), para_gen.py:151-164).
    Returns (flow (2,H,W), rgb (3,H,W), mask (H,W)).
    """

    def body(carry, xs):
        flow, rgb, mask = carry
        f, r, m = xs
        ob = m != 0
        flow = jnp.where(ob[None], f, flow)
        rgb = jnp.where(ob[None], r, rgb)
        mask = jnp.where(ob, m, mask)
        return (flow, rgb, mask), None

    init = (flows[0], rgbs[0], masks[0])
    (flow, rgb, mask), _ = jax.lax.scan(
        body, init, (flows[1:], rgbs[1:], masks[1:])
    )
    return flow, rgb, mask


@jax.jit
def add_background(
    rgb: jnp.ndarray, mask: jnp.ndarray, bg: jnp.ndarray, bgval: float = 0.0
):
    """out = rgb, except background image where mask == bgval (add_bg,
    para_gen.py:50-61). rgb/bg (3,H,W) or (H,W,3)-agnostic as long as mask
    broadcasts; mask (H,W)."""
    sel = (mask == bgval)
    if rgb.ndim == 3 and rgb.shape[0] == 3:
        sel = sel[None]
    else:
        sel = sel[..., None]
    return jnp.where(sel, bg, rgb)
