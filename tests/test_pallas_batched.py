"""Batched multi-problem resident PCG kernel vs the vmapped reference path
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from arap_flow_tpu.io.constraints import add_border_pins
from arap_flow_tpu.ops import energy as E
from arap_flow_tpu.ops import solver as S
from arap_flow_tpu.ops.pallas_pcg import pcg_pallas_batched


def _problem(seed, H=16, W=128):
    rng = np.random.default_rng(seed)
    arap_mask = np.full((H, W), 255, np.uint8)
    arap_mask[2 : H - 2, 8 : W - 8] = 0
    ys, xs = np.mgrid[3 : H - 3 : 4, 10 : W - 10 : 12]
    cons = np.stack(
        [xs.ravel(), ys.ravel(),
         xs.ravel() + rng.integers(-3, 4, xs.size),
         ys.ravel() + rng.integers(-3, 4, xs.size)], 1).astype(np.int32)
    cons = add_border_pins(cons, W, H)
    return E.build_operands(arap_mask, cons)


def test_batched_kernel_matches_per_problem():
    probs = [_problem(s) for s in range(3)]
    batched = jax.tree.map(lambda *ls: jnp.stack(ls), *probs)
    rng = np.random.default_rng(7)

    xs, jtfs, diags, ss, cs = [], [], [], [], []
    for o in probs:
        x = E.init_state(o) + 0.25 * jnp.asarray(
            rng.standard_normal((3, *o.mask.shape)), jnp.float32
        )
        cimg = E.anneal_constraints(o, 1.0)
        s, c = E.trig(x)
        jtf, diag = E.jtf_and_diag(x, o, cimg)
        xs.append(x)
        jtfs.append(jtf)
        diags.append(diag)
        ss.append(s)
        cs.append(c)

    b = -jnp.stack(jtfs)
    pre = S.guarded_invert(jnp.stack(diags))
    out = pcg_pallas_batched(
        b, pre, jnp.stack(ss), jnp.stack(cs), batched.vmasks, batched.fitmask,
        batched.wf2[0], batched.wr2[0], jnp.int32(40), interpret=True,
    )
    for i, o in enumerate(probs):
        ref, _ = S.pcg_solve(o, ss[i], cs[i], jtfs[i], diags[i], 40)
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(ref), rtol=3e-3, atol=3e-3
        )


def test_batched_kernel_honors_nonuniform_schedule():
    """--schedule fast (pcg_iters_early/anneal_split) must reach the batched
    kernel path: its results must match the XLA per-problem path run with the
    SAME non-uniform schedule, and differ from a uniform full-budget run."""
    probs = [_problem(s) for s in range(2)]
    batched = jax.tree.map(lambda *ls: jnp.stack(ls), *probs)
    cfg = S.SolverConfig(
        num_anneal=4, gn_iters=1, max_pcg_iters=30, pcg_iters=30.0,
        pcg_iters_early=8.0, anneal_split=2.0, backend="pallas",
    )
    xs_k, flows_k, n_k = S._solve_batch_kernel_impl(
        batched, cfg.dynamic, cfg.static_key, interpret=True
    )
    # iteration accounting reflects the split: 2*8 + 2*30 per gn iter
    assert float(n_k) == 1 * (2 * 8 + 2 * 30)

    cfg_x = cfg._replace(backend="xla")
    xs_x, flows_x, nx = S._solve_batch_impl(batched, cfg_x.dynamic, cfg_x.static_key)
    assert list(np.asarray(nx)) == [76.0, 76.0]  # XLA path, same accounting
    # truncated-CG transients differ by float ordering (~0.02 max even with a
    # uniform schedule); compare bulk agreement, not elementwise tight
    d = np.abs(np.asarray(flows_k) - np.asarray(flows_x))
    assert d.max() < 0.05 and np.median(d) < 0.005

    cfg_u = cfg._replace(pcg_iters_early=0.0, anneal_split=0.0)
    xs_u, flows_u, n_u = S._solve_batch_kernel_impl(
        batched, cfg_u.dynamic, cfg_u.static_key, interpret=True
    )
    assert float(n_u) == 4 * 30
    assert np.abs(np.asarray(flows_k) - np.asarray(flows_u)).max() > 1e-4


def test_solve_batch_nonuniform_weights_honored():
    """solve_batch with PER-PROBLEM energy weights must honor every entry's
    weights even when the shape fits the resident kernel (which consumes ONE
    weight pair for the whole batch): the uniform_weights gate routes such
    batches to the vmapped XLA path. Pre-fix, entries 1..B-1 silently solved
    with entry 0's energy whenever VMEM routing chose the kernel."""
    from arap_flow_tpu.ops.solver import (SolverConfig, batch_kernel_route,
                                          solve, solve_batch, uniform_weights)

    weights = [E.ArapWeights(w_fit=100.0, w_reg=0.01),
               E.ArapWeights(w_fit=4.0, w_reg=1.0)]
    probs = []
    for s, w in enumerate(weights):
        rng = np.random.default_rng(s)
        H, W = 16, 128
        arap_mask = np.full((H, W), 255, np.uint8)
        arap_mask[2 : H - 2, 8 : W - 8] = 0
        ys, xs = np.mgrid[3 : H - 3 : 4, 10 : W - 10 : 12]
        cons = np.stack(
            [xs.ravel(), ys.ravel(),
             xs.ravel() + rng.integers(-3, 4, xs.size),
             ys.ravel() + rng.integers(-3, 4, xs.size)], 1).astype(np.int32)
        probs.append(E.build_operands(arap_mask,
                                      add_border_pins(cons, W, H), w))
    batched = jax.tree.map(lambda *ls: jnp.stack(ls), *probs)
    cfg = SolverConfig(num_anneal=2, gn_iters=2, max_pcg_iters=30,
                       pcg_iters=30.0, backend="pallas").resolve()
    # the shape DOES fit the kernel, but the weights differ
    assert batch_kernel_route(batched.mask.shape, cfg)
    assert not uniform_weights(batched)
    xs, flows = solve_batch(batched, cfg)
    for i, (o, w) in enumerate(zip(probs, weights)):
        _, ref_flow = solve(o, cfg)
        np.testing.assert_allclose(np.asarray(flows[i]), np.asarray(ref_flow),
                                   rtol=1e-4, atol=1e-4)
    # and a uniform batch still takes the kernel gate
    uni = jax.tree.map(lambda *ls: jnp.stack(ls), *[probs[0], probs[0]])
    assert uniform_weights(uni)


def test_tall_kernels_match_standard():
    """The tall stacked-plane layout kernels (ARAP_TALL_KERNEL probe) are the
    same arithmetic as the standard kernels — 4 stacked rolls replace 12
    per-plane ones, and every wrap row crossing a px/py/pa sub-plane boundary
    is annihilated by the InBounds vmask gating. Only the reduction-tree
    association differs ((3H,W) vs (3,H,W) sums → ~1e-5 at iteration 1), so
    shallow runs compare tight and deep runs compare like the XLA-vs-Pallas
    reference test: solutions agree to solver accuracy."""
    from arap_flow_tpu.ops.pallas_pcg import (pcg_pallas,
                                              pcg_pallas_batched_tall,
                                              pcg_pallas_tall)

    probs = [_problem(s) for s in range(3)]
    batched = jax.tree.map(lambda *ls: jnp.stack(ls), *probs)
    rng = np.random.default_rng(11)

    jtfs, diags, ss, cs = [], [], [], []
    for o in probs:
        x = E.init_state(o) + 0.25 * jnp.asarray(
            rng.standard_normal((3, *o.mask.shape)), jnp.float32
        )
        cimg = E.anneal_constraints(o, 1.0)
        s, c = E.trig(x)
        jtf, diag = E.jtf_and_diag(x, o, cimg)
        jtfs.append(jtf)
        diags.append(diag)
        ss.append(s)
        cs.append(c)

    b = -jnp.stack(jtfs)
    pre = S.guarded_invert(jnp.stack(diags))
    def args_b(it):
        return (jnp.stack(ss), jnp.stack(cs), batched.vmasks,
                batched.fitmask, batched.wf2[0], batched.wr2[0],
                jnp.int32(it))

    # shallow: near-bitwise (only reduction association differs)
    ref1 = pcg_pallas_batched(b, pre, *args_b(1), interpret=True)
    tall1 = pcg_pallas_batched_tall(b, pre, *args_b(1), interpret=True)
    np.testing.assert_allclose(
        np.asarray(tall1), np.asarray(ref1), rtol=1e-4, atol=1e-4
    )

    # deep: equal solution QUALITY (linear-system residual norm) — the
    # truncated-CG trajectories themselves drift apart through float
    # reassociation chaos, as in test_pallas_pcg_matches_reference
    ref = pcg_pallas_batched(b, pre, *args_b(80), interpret=True)
    tall = pcg_pallas_batched_tall(b, pre, *args_b(80), interpret=True)

    def resnorm(delta, i, o):
        sc = (ss[i], cs[i])
        r = -jtfs[i] - E.apply_jtj(jnp.asarray(delta), o, *sc)
        return float(jnp.linalg.norm(r))

    for i, o in enumerate(probs):
        res_ref = resnorm(np.asarray(ref[i]), i, o)
        res_tall = resnorm(np.asarray(tall[i]), i, o)
        assert res_tall < 2.0 * res_ref + 1e-3, (res_tall, res_ref)

    # single-problem variant (the vmapped production canvas path)
    for i, o in enumerate(probs):
        def one(kern, it):
            return kern(
                -jtfs[i], S.guarded_invert(diags[i]), ss[i], cs[i], o.vmasks,
                o.fitmask, o.wf2, o.wr2, jnp.int32(it), interpret=True,
            )

        np.testing.assert_allclose(
            np.asarray(one(pcg_pallas_tall, 1)),
            np.asarray(one(pcg_pallas, 1)), rtol=1e-4, atol=1e-4,
        )
        res_ref = resnorm(np.asarray(one(pcg_pallas, 80)), i, o)
        res_tall = resnorm(np.asarray(one(pcg_pallas_tall, 80)), i, o)
        assert res_tall < 2.0 * res_ref + 1e-3, (res_tall, res_ref)
