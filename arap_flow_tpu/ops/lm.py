"""Levenberg-Marquardt (trust-region) solver variant.

Parity feature for the reference's optional "LMGPU" solver
(CombinedSolverBase.h:74-81; solverGPUGaussNewton.t LM paths): per outer
iteration the damped system (JtJ + λ·D²) δ = −JtF is PCG-solved with the
CERES-style Jacobi scaling D² = clamp(diag(JtJ)) and λ = 1/trust_region_radius
(:615-664); the step is accepted when the actual/model cost-decrease ratio ρ
exceeds min_relative_decrease, with the CERES radius-update rule
(:1119-1163): accept → radius /= max(1/3, 1 − (2ρ−1)³), reject → revert,
radius /= decrease_factor, decrease_factor *= 2. Termination on
function_tolerance or min_trust_region_radius. The inner PCG uses the
ζ (Q-based) early exit with q_tolerance (:1093-1102).

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
from .solver import guarded_invert, _dot, flow_from_state


class LMConfig(NamedTuple):
    """LM solver parameters; defaults mirror solverGPUGaussNewton.t:26-39."""

    num_anneal: int = 19
    max_outer: int = 8  # nIterations
    pcg_iters: int = 400  # lIterations cap
    q_tolerance: float = 1e-4
    function_tolerance: float = 1e-6
    min_relative_decrease: float = 1e-3
    init_radius: float = 1e4
    min_radius: float = 1e-32
    max_radius: float = 1e16
    min_diag: float = 1e-6
    max_diag: float = 1e32


def _damped_apply(p, ops, s, c, lam, d2):
    return apply_jtj(p, ops, s, c) + lam * d2 * p


def _pcg_damped(ops, s, c, jtf, d2, lam, cfg: LMConfig):
    """PCG on the damped system; preconditioner from the damped diagonal."""
    b = -jtf
    pre = guarded_invert(d2 * (1.0 + lam))
    r0 = b
    z0 = pre * r0
    rz0 = _dot(r0, z0)

    def cond(st):
        i, _, _, _, rz, _, conv = st
        return jnp.logical_and(i < cfg.pcg_iters, jnp.logical_not(conv))

    def body(st):
        i, delta, r, p, rz, q_prev, _ = st
        ap = _damped_apply(p, ops, s, c, lam, d2)
        pap = _dot(p, ap)
        alpha = jnp.where(pap > 0.0, rz / pap, 0.0)
        delta = delta + alpha * p
        r = r - alpha * ap
        z = pre * r
        rz_new = _dot(z, r)
        beta = jnp.where(rz > 0.0, rz_new / rz, 0.0)
        p = z + beta * p
        q = 0.5 * _dot(delta, r + b)
        zeta = (i + 1.0) * (q - q_prev) / jnp.where(q == 0.0, 1.0, q)
        conv = jnp.logical_and(cfg.q_tolerance > 0.0, zeta < cfg.q_tolerance)
        return i + 1.0, delta, r, p, rz_new, q, conv

    st = (jnp.float32(0.0), jnp.zeros_like(b), r0, z0, rz0, jnp.float32(0.0),
          jnp.array(False))
    st = lax.while_loop(cond, body, st)
    return st[1]


def _lm_inner(x0, ops, cimg, cfg: LMConfig):
    """max_outer LM iterations at fixed constraints (one Opt LM solve)."""

    def cond(st):
        it, x, radius, dec, prev_cost, done = st
        return jnp.logical_and(it < cfg.max_outer, jnp.logical_not(done))

    def body(st):
        it, x, radius, dec, prev_cost, _ = st
        s, c = trig(x)
        g, diag = jtf_and_diag(x, ops, cimg)
        d2 = jnp.clip(diag, cfg.min_diag, cfg.max_diag)
        lam = 1.0 / radius
        delta = _pcg_damped(ops, s, c, g, d2, lam, cfg)
        # model cost change: −(δ·JtF + ½ δ·(JtJ+λD²)δ); for a descent step > 0
        jtjd = _damped_apply(delta, ops, s, c, lam, d2)
        model_change = -(_dot(delta, g) + 0.5 * _dot(delta, jtjd))
        x_new = x + delta
        new_cost = cost(x_new, ops, cimg)
        cost_change = prev_cost - new_cost
        rho = cost_change / jnp.where(model_change == 0.0, 1.0, model_change)
        accept = jnp.logical_and(cost_change >= 0.0,
                                 rho > cfg.min_relative_decrease)

        # CERES radius update (solverGPUGaussNewton.t:1119-1163)
        step_q = rho
        tmp = 1.0 - (2.0 * step_q - 1.0) ** 3
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
