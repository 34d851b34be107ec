"""Whole-solve Pallas kernel: the complete annealed GN/PCG ARAP schedule —
19 constraint-anneal steps × 8 Gauss-Newton linearisations × 400 PCG
iterations — as ONE TPU kernel with every operand and all solver state
resident in VMEM.

This subsumes ops/pallas_pcg.py (which keeps one linear solve resident but
returns to XLA between GN steps): here HBM is touched exactly twice per solve
(operand load, solution store), and the per-GN XLA dispatch overhead
(~150 host-queued programs per frame) disappears. The math is identical to
ops/solver.anneal_solve ≙ the reference schedule (CombinedSolverBase.h:99-120,
solverGPUGaussNewton.t): parity asserted in interpret mode and on-TPU EPE
checks.

Stencil neighbors are wrap-around rolls annihilated by vmask gating (see
ops/pallas_pcg.py docstring); the annealed constraint image is recomputed from
(con_src, con_tgt, α) on the fly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import DIRS
from .pallas_pcg import _roll2, _t_signfold


def _solve_kernel(
    # inputs
    vm_ref,     # (4, H, W) direction masks
    fit_ref,    # (H, W) fit mask
    csrc_ref,   # (2, H, W) constraint source positions
    ctgt_ref,   # (2, H, W) constraint target positions
    grid_ref,   # (2, H, W) UrShape / init positions
    w_ref,      # (1, 2) SMEM: [wf2, wr2]
    sched_ref,  # (1, 3) SMEM: [num_anneal, gn_iters, pcg_iters]
    # output
    x_ref,      # (3, H, W) final state
    # scratch
    jtf_ref,    # (3, H, W)
    pre_ref,    # (3, H, W)
    sc_ref,     # (2, H, W) sin/cos of the current linearisation
    delta_ref,  # (3, H, W)
    r_ref,      # (3, H, W)
    p_ref,      # (3, H, W)
    ap_ref,     # (3, H, W)
):
    wf2 = w_ref[0, 0]
    wr2 = w_ref[0, 1]
    num_anneal = sched_ref[0, 0]
    gn_iters = sched_ref[0, 1]
    pcg_iters = sched_ref[0, 2]

    x_ref[0] = grid_ref[0]
    x_ref[1] = grid_ref[1]
    x_ref[2] = jnp.zeros_like(grid_ref[0])

    vm = vm_ref[:]
    fit = fit_ref[:]
    degree = vm[0] + vm[1] + vm[2] + vm[3]
    diag_o = 2.0 * wr2 * degree + wf2 * fit
    pre_o = 1.0 / jnp.square(1.0 + jnp.sqrt(diag_o))
    pre_a = 1.0 / jnp.square(1.0 + jnp.sqrt(wr2 * degree))
    pre_ref[0] = pre_o
    pre_ref[1] = pre_o
    pre_ref[2] = pre_a

    def gn_step(alpha):
        # --- linearise: s, c, JtF (evalJTF analogue, energy.jtf_and_diag) ---
        a = x_ref[2]
        s = jnp.sin(a)
        c = jnp.cos(a)
        sc_ref[0] = s
        sc_ref[1] = c
        ox = x_ref[0]
        oy = x_ref[1]
        cix = (1.0 - alpha) * csrc_ref[0] + alpha * ctgt_ref[0]
        ciy = (1.0 - alpha) * csrc_ref[1] + alpha * ctgt_ref[1]
        gx = wf2 * fit * (ox - cix)
        gy = wf2 * fit * (oy - ciy)
        ga = jnp.zeros_like(a)
        for k, (dy, dx) in enumerate(DIRS):
            v = vm[k]
            oxj = _roll2(ox, dy, dx)
            oyj = _roll2(oy, dy, dx)
            sj = _roll2(s, dy, dx)
            cj = _roll2(c, dy, dx)
            ex = ox - oxj + (dx * c - dy * s)
            ey = oy - oyj + (dx * s + dy * c)
            exn = oxj - ox - (dx * cj - dy * sj)
            eyn = oyj - oy - (dx * sj + dy * cj)
            tx, ty = _t_signfold(dy, dx, s, c)
            gx = gx + wr2 * v * (ex - exn)
            gy = gy + wr2 * v * (ey - eyn)
            ga = ga + wr2 * v * (tx * ex + ty * ey)
        jtf_ref[0] = gx
        jtf_ref[1] = gy
        jtf_ref[2] = ga

        # --- PCG init (PCGInit1) ---
        r0 = -jtf_ref[:]
        z0 = pre_ref[:] * r0
        r_ref[:] = r0
        p_ref[:] = z0
        delta_ref[:] = jnp.zeros_like(r0)
        rz0 = jnp.sum(r0 * z0)

        def pcg_body(_, rz):
            p = p_ref[:]
            s_ = sc_ref[0]
            c_ = sc_ref[1]
            ax = wf2 * fit * p[0]
            ay = wf2 * fit * p[1]
            aa = jnp.zeros_like(ax)
            accx = jnp.zeros_like(ax)
            accy = jnp.zeros_like(ax)
            for k, (dy, dx) in enumerate(DIRS):
                v = vm[k]
                poxj = _roll2(p[0], dy, dx)
                poyj = _roll2(p[1], dy, dx)
                paj = _roll2(p[2], dy, dx)
                sj = _roll2(s_, dy, dx)
                cj = _roll2(c_, dy, dx)
                tx, ty = _t_signfold(dy, dx, s_, c_)
                txj, tyj = _t_signfold(dy, dx, sj, cj)
                dox = p[0] - poxj
                doy = p[1] - poyj
                accx = accx + v * (2.0 * dox + p[2] * tx + paj * txj)
                accy = accy + v * (2.0 * doy + p[2] * ty + paj * tyj)
                aa = aa + wr2 * v * (tx * dox + ty * doy + p[2])
            ap = jnp.stack([ax + wr2 * accx, ay + wr2 * accy, aa])
            ap_ref[:] = ap
            pap = jnp.sum(p * ap)
            alpha_cg = jnp.where(pap > 0.0, rz / pap, 0.0)
            delta_ref[:] = delta_ref[:] + alpha_cg * p
            r = r_ref[:] - alpha_cg * ap
            r_ref[:] = r
            z = pre_ref[:] * r
            rz_new = jnp.sum(z * r)
            beta = jnp.where(rz > 0.0, rz_new / rz, 0.0)
            p_ref[:] = z + beta * p
            return rz_new

        jax.lax.fori_loop(0, pcg_iters, pcg_body, rz0, unroll=False)
        x_ref[:] = x_ref[:] + delta_ref[:]

    def anneal_body(i, _):
        alpha = (i + 1.0).astype(jnp.float32) / num_anneal.astype(jnp.float32)
        jax.lax.fori_loop(
            0, gn_iters, lambda _, __: (gn_step(alpha), 0.0)[1], 0.0
        )
        return 0.0

    jax.lax.fori_loop(0, num_anneal, anneal_body, 0.0)


# persistent planes: 11 in + 3 out + 20 scratch + live temporaries
_PLANES = 44
_VMEM_BUDGET = 64 * 1024 * 1024


def fits_vmem(H: int, W: int) -> bool:
    return _PLANES * H * W * 4 <= _VMEM_BUDGET


@partial(jax.jit, static_argnames=("interpret",))
def _solve_call(vm, fit, csrc, ctgt, grid, w, sched, interpret=False):
    H, W = fit.shape
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _solve_kernel,
        out_shape=jax.ShapeDtypeStruct((3, H, W), jnp.float32),
        in_specs=[
            vspec, vspec, vspec, vspec, vspec,
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), memory_space=pltpu.SMEM),
        ],
        out_specs=vspec,
        scratch_shapes=[
            pltpu.VMEM((3, H, W), jnp.float32),
            pltpu.VMEM((3, H, W), jnp.float32),
            pltpu.VMEM((2, H, W), jnp.float32),
            pltpu.VMEM((3, H, W), jnp.float32),
            pltpu.VMEM((3, H, W), jnp.float32),
            pltpu.VMEM((3, H, W), jnp.float32),
            pltpu.VMEM((3, H, W), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vm, fit, csrc, ctgt, grid, w, sched)


def anneal_solve_fused(ops, cfg, interpret: bool = False):
    """Full annealed solve in one kernel; returns x (3, H, W). Drop-in for
    ops.solver.anneal_solve when the problem fits VMEM."""
    w = jnp.stack([ops.wf2, ops.wr2]).reshape(1, 2).astype(jnp.float32)
    # cfg.pcg_iters may be a tracer (jit callers rebuild cfg from traced
    # dynamics, models/arap.py:_fused_solve_raster_impl) — clamp with jnp so
    # the schedule row works both concrete and traced.
    budget = jnp.minimum(
        jnp.int32(cfg.max_pcg_iters),
        jnp.asarray(cfg.pcg_iters).astype(jnp.int32),
    )
    sched = jnp.concatenate(
        [jnp.array([cfg.num_anneal, cfg.gn_iters], jnp.int32),
         budget.reshape(1)]
    ).reshape(1, 3)
    return _solve_call(
        ops.vmasks, ops.fitmask, ops.con_src, ops.con_tgt, ops.grid,
        w, sched, interpret=interpret,
    )
