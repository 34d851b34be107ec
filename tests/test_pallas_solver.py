"""The whole-solve fused Pallas kernel must reproduce the XLA annealed solve
(interpret mode on CPU; on-TPU parity is checked by scripts/pallas_check.py)."""

import jax.numpy as jnp
import numpy as np

from arap_flow_tpu.io.constraints import add_border_pins
from arap_flow_tpu.ops import energy as E
from arap_flow_tpu.ops import solver as S
from arap_flow_tpu.ops.pallas_solver import anneal_solve_fused


def _problem(H=16, W=128, seed=0):
    arap_mask = np.full((H, W), 255, np.uint8)
    arap_mask[2 : H - 2, 8 : W - 8] = 0
    ys, xs = np.mgrid[3 : H - 3 : 4, 10 : W - 10 : 12]
    rng = np.random.default_rng(seed)
    cons = np.stack(
        [xs.ravel(), ys.ravel(),
         xs.ravel() + rng.integers(-3, 4, xs.size),
         ys.ravel() + rng.integers(-3, 4, xs.size)], 1).astype(np.int32)
    cons = add_border_pins(cons, W, H)
    return E.build_operands(arap_mask, cons)


def test_fused_solver_matches_xla():
    ops = _problem()
    cfg = S.SolverConfig(num_anneal=3, gn_iters=2, max_pcg_iters=60,
                         pcg_iters=60.0, backend="xla")
    x_ref, flow_ref = S.solve(ops, cfg)
    x_fused = anneal_solve_fused(ops, cfg, interpret=True)
    # identical schedule; CG rounding chaos keeps isolated pixels apart, so
    # compare the bulk and the energies
    d = np.abs(np.asarray(x_fused) - np.asarray(x_ref))
    assert np.median(d) < 1e-3, np.median(d)
    cimg = E.anneal_constraints(ops, 1.0)
    c_ref = float(E.cost(jnp.asarray(x_ref), ops, cimg))
    c_fused = float(E.cost(jnp.asarray(x_fused), ops, cimg))
    assert abs(c_fused - c_ref) < 0.05 * max(abs(c_ref), 1.0), (c_fused, c_ref)


def test_fused_entry_traces_with_dynamic_cfg():
    """backend='fused' inside jit: cfg.pcg_iters is a tracer there — the
    schedule row must be built with jnp (regression: int(tracer) raised
    ConcretizationTypeError at trace time via models/arap.py)."""
    import jax

    from arap_flow_tpu.models.arap import _fused_solve_raster_impl

    ops = _problem()
    compact = E.build_compact(
        np.asarray(1 - np.asarray(ops.mask), np.uint8) * 255,
        np.zeros((0, 4), np.int32),
    )
    rgb = jnp.zeros((3, *ops.mask.shape), jnp.uint8)
    cfg = S.SolverConfig(num_anneal=2, gn_iters=1, max_pcg_iters=8,
                         pcg_iters=8.0, backend="fused")
    # tracing alone reproduces the bug; no TPU execution needed
    out = jax.eval_shape(
        lambda o, r: _fused_solve_raster_impl(o, r, cfg.dynamic,
                                              cfg.static_key),
        compact, rgb,
    )
    assert out[1].shape == (2, *ops.mask.shape)
