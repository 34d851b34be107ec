"""Generic nonlinear-least-squares Gauss-Newton solver from a plain residual
function — the generality of the Opt DSL, the JAX way.

The reference's Opt layer (ARAP/API/src/o.t, ad.t) accepts ANY least-squares
energy spec and generates cost/JtF/JtJ·p kernels by symbolic differentiation
(o.t:2425-2460). Here the same contract is a plain traced function
``residual_fn(x) -> pytree of residual arrays``; the GN operators come from
jax's AD machinery instead of a kernel generator:

- cost      = ½ Σ r²                       (o.t:2375-2384 convention)
- JtF       = vjp(r)(r)                    (evalJTF analogue)
- JtJ·p     = vjp(r)(jvp(r)(p))            (matrix-free applyJTJ, o.t:2029-2089)
- diag(JtJ) is supplied by the caller (``diag_fn``) or defaults to the identity
  (UsePreconditioner(false) analogue) — the exact per-residual Σ(∂r/∂x)² has no
  general matrix-free form, mirroring the reference's plan-declared choice
  (arap_plan.t:10).

The specialised ARAP path (ops/energy.py) remains the production-fast route;
tests assert this generic solver reproduces it exactly on the ARAP energy.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from .solver import guarded_invert


def _flat_dot(a, b):
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    return sum(jnp.sum(x * y) for x, y in zip(leaves_a, leaves_b))


def cost(residual_fn: Callable, x) -> jnp.ndarray:
    r = residual_fn(x)
    return 0.5 * _flat_dot(r, r)


def jtf(residual_fn: Callable, x):
    """Gradient JtF via one vjp (same pytree structure as x)."""
    r, pullback = jax.vjp(residual_fn, x)
    (g,) = pullback(r)
    return g


def make_jtj_apply(residual_fn: Callable, x):
    """Matrix-free JtJ·p at linearisation point x."""
    _, pullback = jax.vjp(residual_fn, x)

    def apply(p):
        _, jp = jax.jvp(residual_fn, (x,), (p,))
        (out,) = pullback(jp)
        return out

    return apply


def pcg(residual_fn, x, diag, iters: int):
    """Jacobi-PCG for JtJ δ = −JtF with the CERES guarded inverse (the generic
    counterpart of ops/solver.pcg_solve). diag may be None (identity)."""
    g = jtf(residual_fn, x)
    apply_a = make_jtj_apply(residual_fn, x)
    pre = (
        jax.tree.map(lambda d: guarded_invert(d), diag)
        if diag is not None
        else jax.tree.map(jnp.ones_like, g)
    )
    b = jax.tree.map(lambda v: -v, g)
    r0 = b
    z0 = jax.tree.map(lambda p_, r_: p_ * r_, pre, r0)
    delta0 = jax.tree.map(jnp.zeros_like, g)
    rz0 = _flat_dot(r0, z0)

    def body(_, state):
        delta, r, p, rz = state
        ap = apply_a(p)
        pap = _flat_dot(p, ap)
        alpha = jnp.where(pap > 0.0, rz / pap, 0.0)
        delta = jax.tree.map(lambda d, pp: d + alpha * pp, delta, p)
        r = jax.tree.map(lambda rr, aa: rr - alpha * aa, r, ap)
        z = jax.tree.map(lambda p_, r_: p_ * r_, pre, r)
        rz_new = _flat_dot(z, r)
        beta = jnp.where(rz > 0.0, rz_new / rz, 0.0)
        p = jax.tree.map(lambda zz, pp: zz + beta * pp, z, p)
        return delta, r, p, rz_new

    delta, *_ = lax.fori_loop(0, iters, body, (delta0, r0, z0, rz0))
    return delta


def gn_solve(
    residual_fn: Callable,
    x0,
    gn_iters: int = 8,
    pcg_iters: int = 100,
    diag_fn: Callable | None = None,
):
    """Gauss-Newton on an arbitrary residual function; returns the solution
    pytree. One jit-able program (use under jax.jit)."""

    def step(_, x):
        diag = diag_fn(x) if diag_fn is not None else None
        delta = pcg(residual_fn, x, diag, pcg_iters)
        return jax.tree.map(lambda a, d: a + d, x, delta)

    return lax.fori_loop(0, gn_iters, step, x0)
