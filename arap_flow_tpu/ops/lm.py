"""Levenberg-Marquardt (trust-region) solver variant.

Parity feature for the reference's optional "LMGPU" solver
(CombinedSolverBase.h:74-81; solverGPUGaussNewton.t LM paths). Per outer
iteration:

- the damped system (JtJ + CtC) δ = −JtF is PCG-solved, where
  CtC = clamp(diag(JtJ)/radius, min·invS²/radius, max·invS²/radius) is the
  Jacobi-scaled, clamped LM diagonal (PCGComputeCtC o.t:2255-2287 +
  PCGFinalizeDiagonal solverGPUGaussNewton.t:631-664). invS² = 1/SSq with
  SSq = diag(JtJ) captured ONCE per solve at the first outer iteration
  (JacobiScalingType.ONCE_PER_SOLVE, PCGSaveSSq :624-629);
- the PCG preconditioner is 1/(CtC + radius·CtC_unclamped) = 1/(CtC + diag)
  (:652-654), zeroed on inactive unknowns;
- every residual_reset_period (=10) inner iterations the residual is
  recomputed from scratch, r = b − (JtJ+CtC)·δ, instead of the incremental
  update (PCGStep2_1stHalf / computeAdelta / PCGStep2_2ndHalf, :1077-1086) —
  bounding float drift over the 400-deep recurrence;
- the ζ (Q-based) early exit with q_tolerance (:1093-1102);
- CERES step acceptance: ρ = cost_change / model_cost_change with the
  UNDAMPED linearized model cost ½Σ(F+Jδ)² (createmodelcost o.t:2174-2202,
  computeModelCostChange :816-828); accept → radius /= max(1/3, 1−(2ρ−1)³)
  capped at max_radius, decrease factor resets to 2; reject → revert,
  radius /= decrease_factor, decrease_factor *= 2 (:1119-1163). Termination
  on function_tolerance (accepted steps only) or min_trust_region_radius.

Everything is one fused lax.while_loop program, vmap-able.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .energy import (
    ArapOperands,
    anneal_constraints,
    apply_jtj,
    cost,
    init_state,
    jtf_and_diag,
    trig,
)
from .solver import _dot, flow_from_state


class LMConfig(NamedTuple):
    """LM solver parameters; defaults mirror solverGPUGaussNewton.t:26-39."""

    num_anneal: int = 19
    max_outer: int = 8  # nIterations
    pcg_iters: int = 400  # lIterations cap
    residual_reset_period: int = 10
    q_tolerance: float = 1e-4
    function_tolerance: float = 1e-6
    min_relative_decrease: float = 1e-3
    init_radius: float = 1e4
    min_radius: float = 1e-32
    max_radius: float = 1e16
    min_lm_diagonal: float = 1e-6
    max_lm_diagonal: float = 1e32


def _finalize_diagonal(diag, ssq, radius, cfg: LMConfig):
    """PCGFinalizeDiagonal (solverGPUGaussNewton.t:631-664): Jacobi-scaled
    clamp of the LM diagonal + the damped preconditioner.

    Returns (CtC, pre). Inactive unknowns (diag == 0: excluded pixels, or
    components with no residual support) get CtC = 0 and pre = 0, keeping them
    exactly inert through the damped solve."""
    active = diag > 0.0
    unclamped = diag / radius
    inv_ssq = jnp.where(ssq > 0.0, 1.0 / jnp.where(ssq > 0.0, ssq, 1.0), 0.0)
    mult = inv_ssq / radius
    ctc = jnp.clip(
        unclamped, cfg.min_lm_diagonal * mult, cfg.max_lm_diagonal * mult
    )
    denom = ctc + diag  # = CtC + radius * CtC_unclamped
    pre = jnp.where(active, 1.0 / jnp.where(active, denom, 1.0), 0.0)
    return jnp.where(active, ctc, 0.0), pre


def _damped_apply(p, ops, s, c, ctc):
    """(JtJ + CtC)·p — applyJTJ with the LM diagonal (o.t:2080)."""
    return apply_jtj(p, ops, s, c) + ctc * p


def _pcg_damped(ops, s, c, jtf, ctc, pre, cfg: LMConfig, budget=None):
    """PCG on the damped system with the reference's residual-drift reset
    every residual_reset_period inner iterations.

    `budget` (optional, traced f32): iteration budget under the static
    cfg.pcg_iters cap — the same static-cap/traced-budget split as
    solver.gn_step, so lIterations sweeps through the Opt facade do not
    recompile. None keeps the cap as a compile-time constant (identical
    program to before the split)."""
    b = -jtf
    r0 = b
    z0 = pre * r0
    rz0 = _dot(r0, z0)
    period = jnp.float32(cfg.residual_reset_period)
    limit = jnp.float32(cfg.pcg_iters)
    if budget is not None:
        limit = jnp.minimum(limit, jnp.float32(budget))

    def cond(st):
        i, _, _, _, rz, _, conv = st
        return jnp.logical_and(i < limit, jnp.logical_not(conv))

    def body(st):
        i, delta, r, p, rz, q_prev, _ = st
        ap = _damped_apply(p, ops, s, c, ctc)
        pap = _dot(p, ap)
        alpha = jnp.where(pap > 0.0, rz / pap, 0.0)
        delta = delta + alpha * p

        def reset(_):
            # r = b − (JtJ+CtC)·δ from scratch (computeAdelta + 2ndHalf)
            return b - _damped_apply(delta, ops, s, c, ctc)

        def incremental(_):
            return r - alpha * ap

        do_reset = jnp.mod(i + 1.0, period) == 0.0
        r_new = lax.cond(do_reset, reset, incremental, None)
        z = pre * r_new
        rz_new = _dot(z, r_new)
        beta = jnp.where(rz > 0.0, rz_new / rz, 0.0)
        p = z + beta * p
        q = 0.5 * _dot(delta, r_new + b)
        zeta = (i + 1.0) * (q - q_prev) / jnp.where(q == 0.0, 1.0, q)
        conv = jnp.logical_and(cfg.q_tolerance > 0.0, zeta < cfg.q_tolerance)
        return i + 1.0, delta, r_new, p, rz_new, q, conv

    st = (jnp.float32(0.0), jnp.zeros_like(b), r0, z0, rz0, jnp.float32(0.0),
          jnp.array(False))
    st = lax.while_loop(cond, body, st)
    return st[1]


def _lm_step_impl(x, ops, cimg, ssq, radius, dec, prev_cost, cfg: LMConfig,
                  pcg_budget=None):
    """One LM outer (trust-region) iteration at fixed constraints — the
    step() granularity of solverGPUGaussNewton.t:1016-1177. Returns
    (x, radius, dec, cost, done)."""
    s, c = trig(x)
    g, diag = jtf_and_diag(x, ops, cimg)
    ctc, pre = _finalize_diagonal(diag, ssq, radius, cfg)
    delta = _pcg_damped(ops, s, c, g, ctc, pre, cfg, budget=pcg_budget)
    # model cost change vs the UNDAMPED linearized model (o.t:2174-2202):
    # prevCost − ½Σ(F+Jδ)² = −(δ·JtF + ½ δ·JtJδ)
    model_change = -(_dot(delta, g)
                     + 0.5 * _dot(delta, apply_jtj(delta, ops, s, c)))
    x_new = x + delta
    new_cost = cost(x_new, ops, cimg)
    cost_change = prev_cost - new_cost
    rho = cost_change / jnp.where(model_change == 0.0, 1.0, model_change)
    accept = jnp.logical_and(cost_change >= 0.0,
                             rho > cfg.min_relative_decrease)

    # CERES radius update (solverGPUGaussNewton.t:1119-1163)
    tmp = 1.0 - (2.0 * rho - 1.0) ** 3
    radius_acc = jnp.minimum(
        radius / jnp.maximum(1.0 / 3.0, tmp), cfg.max_radius
    )
    radius_rej = radius / dec
    radius_new = jnp.where(accept, radius_acc, radius_rej)
    dec_new = jnp.where(accept, 2.0, 2.0 * dec)

    x_next = jnp.where(accept, x_new, x)
    cost_next = jnp.where(accept, new_cost, prev_cost)
    done = jnp.logical_or(
        jnp.logical_and(
            accept, cost_change <= prev_cost * cfg.function_tolerance
        ),
        radius_new <= cfg.min_radius,
    )
    return x_next, radius_new, dec_new, cost_next, done


@partial(jax.jit, static_argnames=("cfg",))
def lm_step(x, ops, cimg, ssq, radius, dec, prev_cost,
            cfg: LMConfig = LMConfig(), pcg_budget=None):
    """Jitted single LM outer iteration — the Opt_ProblemStep granularity for
    the "LMGPU" solver (OptSolver.h:72-91 steps one nonlinear iteration per
    call; each is one trust-region accept/reject). The caller threads
    (radius, dec, prev_cost) between steps and captures ssq = diag(JtJ) once
    per solve (PCGSaveSSq, solverGPUGaussNewton.t:1043-1045). `pcg_budget`
    (traced) bounds the inner PCG under the static cfg.pcg_iters cap so
    lIterations sweeps share one executable."""
    return _lm_step_impl(x, ops, cimg, ssq, radius, dec, prev_cost, cfg,
                         pcg_budget=pcg_budget)


def _lm_inner(x0, ops, cimg, cfg: LMConfig):
    """max_outer LM iterations at fixed constraints (one Opt LM solve).

    SSq (the Jacobi scale) is captured from the diagonal at the solve's entry
    point, matching PCGSaveSSq at nIter == 0 (solverGPUGaussNewton.t:1043-1045).
    """
    _, ssq = jtf_and_diag(x0, ops, cimg)

    def cond(st):
        it, x, radius, dec, prev_cost, done = st
        return jnp.logical_and(it < cfg.max_outer, jnp.logical_not(done))

    def body(st):
        it, x, radius, dec, prev_cost, _ = st
        x_next, radius_new, dec_new, cost_next, done = _lm_step_impl(
            x, ops, cimg, ssq, radius, dec, prev_cost, cfg
        )
        return it + 1.0, x_next, radius_new, dec_new, cost_next, done

    c0 = cost(x0, ops, cimg)
    st = (jnp.float32(0.0), x0, jnp.float32(cfg.init_radius),
          jnp.float32(2.0), c0, jnp.array(False))
    st = lax.while_loop(cond, body, st)
    return st[1]


@partial(jax.jit, static_argnames=("cfg",))
def lm_solve(ops: ArapOperands, cfg: LMConfig = LMConfig()):
    """Full annealed LM solve; returns (x, flow) like solver.solve."""
    x0 = init_state(ops)

    def outer(i, x):
        alpha = (i + 1.0) / cfg.num_anneal
        cimg = anneal_constraints(ops, alpha)
        return _lm_inner(x, ops, cimg, cfg)

    x = lax.fori_loop(0, cfg.num_anneal, outer, x0)
    return x, flow_from_state(x, ops)


@partial(jax.jit, static_argnames=("cfg",))
def lm_solve_instrumented(ops: ArapOperands, cfg: LMConfig = LMConfig()):
    """lm_solve recording the accepted cost after every LM outer iteration
    (num_anneal*max_outer entries; unexecuted iterations after an early exit
    repeat the final accepted cost). The launchProfiledSolve analogue."""
    x0 = init_state(ops)
    n = cfg.num_anneal * cfg.max_outer

    def outer(i, carry):
        x, costs = carry
        alpha = (i + 1.0) / cfg.num_anneal
        cimg = anneal_constraints(ops, alpha)
        _, ssq = jtf_and_diag(x, ops, cimg)

        def body(j, st):
            x, radius, dec, prev_cost, done, costs = st
            s, c = trig(x)
            g, diag = jtf_and_diag(x, ops, cimg)
            ctc, pre = _finalize_diagonal(diag, ssq, radius, cfg)
            delta = _pcg_damped(ops, s, c, g, ctc, pre, cfg)
            model_change = -(_dot(delta, g)
                             + 0.5 * _dot(delta, apply_jtj(delta, ops, s, c)))
            x_new = x + delta
            new_cost = cost(x_new, ops, cimg)
            cost_change = prev_cost - new_cost
            rho = cost_change / jnp.where(
                model_change == 0.0, 1.0, model_change
            )
            accept = jnp.logical_and(
                jnp.logical_and(cost_change >= 0.0,
                                rho > cfg.min_relative_decrease),
                jnp.logical_not(done),
            )
            tmp = 1.0 - (2.0 * rho - 1.0) ** 3
            radius_acc = jnp.minimum(
                radius / jnp.maximum(1.0 / 3.0, tmp), cfg.max_radius
            )
            radius_new = jnp.where(
                done, radius, jnp.where(accept, radius_acc, radius / dec)
            )
            dec_new = jnp.where(
                done, dec, jnp.where(accept, 2.0, 2.0 * dec)
            )
            x_next = jnp.where(accept, x_new, x)
            cost_next = jnp.where(accept, new_cost, prev_cost)
            done = jnp.logical_or(
                done,
                jnp.logical_or(
                    jnp.logical_and(
                        accept,
                        cost_change <= prev_cost * cfg.function_tolerance,
                    ),
                    radius_new <= cfg.min_radius,
                ),
            )
            costs = costs.at[i * cfg.max_outer + j].set(cost_next)
            return x_next, radius_new, dec_new, cost_next, done, costs

        c0 = cost(x, ops, cimg)
        x, _, _, _, _, costs = lax.fori_loop(
            0, cfg.max_outer, body,
            (x, jnp.float32(cfg.init_radius), jnp.float32(2.0), c0,
             jnp.array(False), costs),
        )
        return x, costs

    x, costs = lax.fori_loop(0, cfg.num_anneal, outer,
                             (x0, jnp.zeros((n,), jnp.float32)))
    return x, flow_from_state(x, ops), costs
