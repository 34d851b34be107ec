"""Gauss-Newton + preconditioned-conjugate-gradient ARAP solver, fully fused.

TPU-native replacement for the Opt-generated GN/PCG solver
(solverGPUGaussNewton.t): the reference launches ~19×8×(3+400×3) CUDA kernels
per frame (SURVEY.md §3.2); here the whole annealed schedule — 19 constraint
anneal steps × 8 GN iterations × ≤400 PCG iterations — is ONE jitted XLA
program with `lax.fori_loop`/`lax.while_loop` control flow, zero host
round-trips, and deterministic reductions (the reference's float atomicAdd dot
products are non-deterministic; ours are not).

Algorithm parity map:
- PCGInit1 (solverGPUGaussNewton.t:361-396): r₀ = −JtF, M⁻¹ = CERES guarded
  invert of diag(JtJ) (:323-351), p₀ = M⁻¹ r₀.
- PCGStep1/2/3 (:423-551): α = rz/⟨p, JtJ p⟩ (guarded: 0 if denom ≤ 0),
  δ += αp, r −= α·JtJp, z = M⁻¹r, β = rz_new/rz (guarded), p = z + βp.
- PCGLinearUpdate (:553-558): x += δ.
- Outer annealing: constraints lerp source→target with α=(i+1)/numIter
  (CombinedSolver.h:199-201, 223-242).
- Optional Q-based ζ early exit (the reference enables it only for LM,
  :1093-1102; we expose it for GN too as `q_tolerance > 0` — "fast" mode).

Every function is vmap-able over a leading batch axis for multi-problem solves.
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


class SolverConfig(NamedTuple):
    """Unified solver schedule config (replaces CombinedSolverParameters.h:3-15 +
    the Opt name-keyed solver parameters, solverGPUGaussNewton.t:26-39).

    Defaults are the reference application settings (main.cpp:215-221).
    q_tolerance > 0 enables the ζ early exit inside PCG; 0 reproduces the
    reference GN behaviour (fixed 400 inner iterations).
    """

    num_anneal: int = 19  # outer constraint-annealing iterations (numIter)
    gn_iters: int = 8  # Gauss-Newton iterations per anneal step (nonLinearIter)
    pcg_iters: int = 400  # PCG inner iterations (linearIter)
    q_tolerance: float = 0.0  # ζ tolerance (reference default 1e-4, LM-only)


def guarded_invert(diag: jnp.ndarray) -> jnp.ndarray:
    """CERES-style guarded Jacobi inverse: 1/(1+√d)² (solverGPUGaussNewton.t:323-332).

    Also well-defined on excluded pixels (d = 0 → 1), which carry zero residual.
    """
    return 1.0 / jnp.square(1.0 + jnp.sqrt(diag))


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Whole-state dot product (the PCG scan reductions, util.t:611-649)."""
    return jnp.sum(a * b)


def pcg_solve(
    ops: ArapOperands,
    s: jnp.ndarray,
    c: jnp.ndarray,
    jtf: jnp.ndarray,
    diag: jnp.ndarray,
    iters: int,
    q_tolerance: float = 0.0,
) -> jnp.ndarray:
    """Solve JtJ δ = −JtF with Jacobi-preconditioned CG; returns δ (3, H, W)."""
    b = -jtf
    pre = guarded_invert(diag)
    r0 = b
    z0 = pre * r0
    p0 = z0
    rz0 = _dot(r0, z0)
    delta0 = jnp.zeros_like(jtf)

    def body(state):
        i, delta, r, p, rz, q_prev, _ = state
        ap = apply_jtj(p, ops, s, c)
        pap = _dot(p, ap)
        alpha = jnp.where(pap > 0.0, rz / pap, 0.0)
        delta = delta + alpha * p
        r = r - alpha * ap
        z = pre * r
        rz_new = _dot(z, r)
        beta = jnp.where(rz > 0.0, rz_new / rz, 0.0)
        p = z + beta * p
        # Q-based ζ test (solverGPUGaussNewton.t:479-481, 1093-1102):
        # Q = ½ δ·(r + b) approximates the model-cost decrease.
        q = 0.5 * _dot(delta, r + b)
        zeta = (i + 1.0) * (q - q_prev) / jnp.where(q == 0.0, 1.0, q)
        converged = zeta < q_tolerance  # signed, as in the reference ζ break
        return i + 1.0, delta, r, p, rz_new, q, converged

    if q_tolerance > 0.0:
        def cond(state):
            i, _, _, _, _, _, converged = state
            return jnp.logical_and(i < iters, jnp.logical_not(converged))

        state = (jnp.float32(0.0), delta0, r0, p0, rz0, jnp.float32(0.0),
                 jnp.array(False))
        state = lax.while_loop(cond, body, state)
        return state[1]

    def fori_body(_, state):
        return body(state)

    state = (jnp.float32(0.0), delta0, r0, p0, rz0, jnp.float32(0.0),
             jnp.array(False))
    state = lax.fori_loop(0, iters, fori_body, state)
    return state[1]


def gn_step(x: jnp.ndarray, ops: ArapOperands, cimg: jnp.ndarray,
            cfg: SolverConfig) -> jnp.ndarray:
    """One Gauss-Newton iteration: linearise at x, PCG-solve, update."""
    s, c = trig(x)
    jtf, diag = jtf_and_diag(x, ops, cimg)
    delta = pcg_solve(ops, s, c, jtf, diag, cfg.pcg_iters, cfg.q_tolerance)
    return x + delta


def gn_solve(x: jnp.ndarray, ops: ArapOperands, cimg: jnp.ndarray,
             cfg: SolverConfig) -> jnp.ndarray:
    """cfg.gn_iters Gauss-Newton iterations at fixed constraints (one
    Opt_ProblemSolve call, o.t:2548-2551)."""
    return lax.fori_loop(
        0, cfg.gn_iters, lambda _, xx: gn_step(xx, ops, cimg, cfg), x
    )


def anneal_solve(ops: ArapOperands, cfg: SolverConfig) -> jnp.ndarray:
    """Full solve: constraint annealing outer loop over gn_solve.

    Parity with CombinedSolverBase::singleSolve (CombinedSolverBase.h:99-120)
    driving setConstraintImage(α=(i+1)/numIter) (CombinedSolver.h:199-201).
    Returns the final state x = [warpField_x, warpField_y, angle], (3, H, W).
    """
    x0 = init_state(ops)

    def outer(i, x):
        alpha = (i + 1.0) / cfg.num_anneal
        cimg = anneal_constraints(ops, alpha)
        return gn_solve(x, ops, cimg, cfg)

    return lax.fori_loop(0, cfg.num_anneal, outer, x0)


def flow_from_state(x: jnp.ndarray, ops: ArapOperands) -> jnp.ndarray:
    """Dense flow (2, H, W) = warpField − grid (CombinedSolver.h:352-366)."""
    return x[:2] - ops.grid


@partial(jax.jit, static_argnames=("cfg",))
def solve(ops: ArapOperands, cfg: SolverConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Jitted full solve; returns (state (3,H,W), flow (2,H,W))."""
    x = anneal_solve(ops, cfg)
    return x, flow_from_state(x, ops)


@partial(jax.jit, static_argnames=("cfg",))
def solve_batch(ops: ArapOperands, cfg: SolverConfig):
    """Batched solve over leading axis of every operand (vmap); returns
    (states (B,3,H,W), flows (B,2,H,W)). Replaces the reference's one-CUDA-
    process-per-problem task farm (para_gen.py:560-567) with on-chip batching."""
    return jax.vmap(lambda o: solve_inner(o, cfg))(ops)


def solve_inner(ops: ArapOperands, cfg: SolverConfig):
    x = anneal_solve(ops, cfg)
    return x, flow_from_state(x, ops)


def solve_instrumented(ops: ArapOperands, cfg: SolverConfig):
    """Solve while recording the energy after every GN iteration.

    Returns (x, flow, costs (num_anneal*gn_iters,)). The profiling analogue of
    launchProfiledSolve + SolverIteration (OptUtils.h:47-64, SolverIteration.h).
    """
    x0 = init_state(ops)
    n = cfg.num_anneal * cfg.gn_iters

    def outer(i, carry):
        x, costs = carry
        alpha = (i + 1.0) / cfg.num_anneal
        cimg = anneal_constraints(ops, alpha)

        def inner(j, carry2):
            x2, costs2 = carry2
            x2 = gn_step(x2, ops, cimg, cfg)
            costs2 = costs2.at[i * cfg.gn_iters + j].set(cost(x2, ops, cimg))
            return x2, costs2

        return lax.fori_loop(0, cfg.gn_iters, inner, (x, costs))

    x, costs = lax.fori_loop(0, cfg.num_anneal, outer, (x0, jnp.zeros((n,))))
    return x, flow_from_state(x, ops), costs
