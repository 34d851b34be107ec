"""High-level ARAP deformation model.

Mirrors the arap_deform application flow (ARAP/deformation/src/main.cpp:140-160 +
CombinedSolver.h): load image/mask/constraints → pin the border → solve the
annealed GN/PCG schedule → rasterize the warped image/mask → emit flow.

Where the reference rebuilds its CUDA plan per image size
(CombinedSolver.h:149-160), jax.jit's shape-keyed cache gives the same reuse for
free; `bucket_shape` pads problems to a standard size so many segments share one
compiled executable (padding pixels are excluded by mask and provably inert —
see tests/test_energy.py::test_excluded_pixels_inert).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..io.constraints import add_border_pins
from ..ops import energy as E
from ..ops import rasterize as R
from ..ops import solver as S
from ..ops.solver import SolverConfig


@dataclass
class DeformResult:
    """Products of one ARAP deformation solve (one frame pair / segment)."""

    flow: np.ndarray  # (H, W, 2) float32, u/v
    warped_rgb: np.ndarray  # (H, W, 3) uint8
    warped_mask: np.ndarray  # (H, W) uint8, 255 = covered
    state: np.ndarray | None = None  # (3, H, W) warp positions + angle


@partial(jax.jit, static_argnames=("static_key",))
def _solve_and_raster_impl(
    ops: E.ArapOperands, rgb_f: jnp.ndarray, cfg: SolverConfig, static_key
):
    x = S.anneal_solve(ops, cfg)
    flow = S.flow_from_state(x, ops)
    arap_mask = 1.0 - ops.mask  # rasterizer wants 0 = object
    wrgb, wmask = R.rasterize(x[:2], rgb_f, arap_mask)
    return x, flow, wrgb, wmask


def _solve_and_raster(ops, rgb_f, cfg: SolverConfig):
    return _solve_and_raster_impl(ops, rgb_f, cfg, cfg.static_key)


class ArapDeformer:
    """Reusable deformation solver (the CombinedSolver equivalent).

    One instance holds the solver config and weights; jit caching keys on the
    image shape, so — like the reference's list mode (main.cpp:231-237) — frames
    of the same size reuse the compiled program.
    """

    def __init__(
        self,
        cfg: SolverConfig = SolverConfig(),
        weights: E.ArapWeights = E.ArapWeights(),
        pin_border: bool = True,
        keep_state: bool = False,
    ):
        self.cfg = cfg
        self.weights = weights
        self.pin_border = pin_border
        self.keep_state = keep_state

    def deform(
        self,
        rgb: np.ndarray,
        arap_mask: np.ndarray,
        constraints: np.ndarray,
    ) -> DeformResult:
        """Solve one frame: rgb (H,W,3) u8, arap_mask (H,W) (0 = object),
        constraints (N,4) [x1 y1 x2 y2] WITHOUT border pins (added here, parity
        with main.cpp:95-101)."""
        H, W = arap_mask.shape[:2]
        cons = np.asarray(constraints, np.int32).reshape(-1, 4)
        if self.pin_border:
            cons = add_border_pins(cons, W, H)
        ops = E.build_operands(jnp.asarray(arap_mask), cons, self.weights)
        rgb_f = jnp.asarray(rgb.transpose(2, 0, 1), jnp.float32)
        x, flow, wrgb, wmask = _solve_and_raster(ops, rgb_f, self.cfg)
        return DeformResult(
            flow=np.asarray(flow).transpose(1, 2, 0),
            warped_rgb=np.asarray(wrgb).transpose(1, 2, 0).astype(np.uint8),
            warped_mask=np.asarray(wmask).astype(np.uint8),
            state=np.asarray(x) if self.keep_state else None,
        )

    def solve_flow(
        self, arap_mask: np.ndarray, constraints: np.ndarray
    ) -> np.ndarray:
        """Flow-only solve (no rasterization); returns (H, W, 2) float32."""
        H, W = arap_mask.shape[:2]
        cons = np.asarray(constraints, np.int32).reshape(-1, 4)
        if self.pin_border:
            cons = add_border_pins(cons, W, H)
        ops = E.build_operands(jnp.asarray(arap_mask), cons, self.weights)
        _, flow = S.solve(ops, self.cfg)
        return np.asarray(flow).transpose(1, 2, 0)


def deform(
    rgb: np.ndarray,
    arap_mask: np.ndarray,
    constraints: np.ndarray,
    cfg: SolverConfig = SolverConfig(),
    weights: E.ArapWeights = E.ArapWeights(),
) -> DeformResult:
    """One-shot functional API over ArapDeformer."""
    return ArapDeformer(cfg, weights).deform(rgb, arap_mask, constraints)
