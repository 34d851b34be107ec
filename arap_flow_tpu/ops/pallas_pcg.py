"""VMEM-resident PCG: the whole inner linear solve as one Pallas TPU kernel.

Motivation (measured, scripts/sweep_schedule.py): the XLA-fused PCG runs at
~42µs/iteration on 512² — HBM-bandwidth roofline, ~33 plane-reads+writes per
iteration. Reaching the 0.1px EPE parity target needs the reference's full
400-deep PCG (no early exit survives), so the remaining lever is traffic per
iteration. This kernel keeps ALL solver state (δ, r, p and the linearisation
constants) resident in VMEM for the entire inner loop: HBM is touched once per
GN step instead of three times per PCG iteration (~400× traffic reduction),
leaving the loop VPU-bound.

Layout: one program per problem (grid = batch); every plane is an (H, W) f32
VMEM block. Stencil neighbor access is `pltpu.roll` — wrap-around garbage is
annihilated by the vmask gating (v_dir is zero wherever the neighbor would be
out of bounds, mirroring the zero-pad semantics of ops/stencil.py), so no edge
masking is needed.

The math is identical to ops/solver.pcg_solve (PCGInit1/Step1/2/3,
solverGPUGaussNewton.t:361-558) with a fixed iteration count; correctness is
asserted against it in tests/test_pallas_pcg.py (interpret mode on CPU, real
kernel on TPU).

VMEM budget: 17 resident planes ⇒ fits crop buckets up to ~448×512 f32
(16 MB/core); the bucketed crop path (models/arap.py:crop_box) keeps problems
inside that envelope.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import DIRS

# PCG loop unroll factor (trace-time; probe knob — 1 measured best so far)
_UNROLL = 1


def tall_kernel_enabled() -> bool:
    """ARAP_TALL_KERNEL env flag (opt-in stacked-plane kernel variant,
    measured slower — see docs/ROADMAP.md). Single parse shared by the
    per-GN path, the batched solver, and scripts/kernel_bench.py so the
    two kernel routes can never desynchronize within one process."""
    return os.environ.get("ARAP_TALL_KERNEL", "") not in ("", "0", "off")


def _roll2(a: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """b[y, x] = a[(y+dy) mod H, (x+dx) mod W] — wrapped values are always
    gated by vmask zeros downstream. pltpu.roll requires non-negative shifts,
    so negative shifts wrap by the axis size."""
    if dy:
        a = pltpu.roll(a, shift=(-dy) % a.shape[0], axis=0)
    if dx:
        a = pltpu.roll(a, shift=(-dx) % a.shape[1], axis=1)
    return a


def _t_dir(s, c, dy: int, dx: int):
    return (-dx) * s - dy * c, dx * c - dy * s


def _t_signfold(dy: int, dx: int, sv, cv):
    """Sign-folded t_dir for unit directions: tx, ty ∈ {±s, ±c} — Mosaic does
    NOT fold multiplies by constant 0/±1 (measured 1.7× on the resident
    kernel), so fold them at trace time."""
    if (dy, dx) == (0, 1):
        return -sv, cv
    if (dy, dx) == (0, -1):
        return sv, -cv
    if (dy, dx) == (1, 0):
        return -cv, -sv
    return cv, sv  # (-1, 0)


def _apply_jtj_rolls(pox, poy, pa, vm, s, c, fit, wf2, wr2):
    """JtJ·p with roll-based neighbor access (mirrors energy.apply_jtj)."""
    out_x = wf2 * fit * pox
    out_y = wf2 * fit * poy
    acc_x = jnp.zeros_like(pox)
    acc_y = jnp.zeros_like(poy)
    acc_a = jnp.zeros_like(pa)
    for k, (dy, dx) in enumerate(DIRS):
        v = vm[k]
        poxj = _roll2(pox, dy, dx)
        poyj = _roll2(poy, dy, dx)
        paj = _roll2(pa, dy, dx)
        sj = _roll2(s, dy, dx)
        cj = _roll2(c, dy, dx)
        tx, ty = _t_dir(s, c, dy, dx)
        txj, tyj = _t_dir(sj, cj, dy, dx)
        dox = pox - poxj
        doy = poy - poyj
        acc_x = acc_x + v * (2.0 * dox + pa * tx + paj * txj)
        acc_y = acc_y + v * (2.0 * doy + pa * ty + paj * tyj)
        acc_a = acc_a + v * (tx * dox + ty * doy + pa)
    return out_x + wr2 * acc_x, out_y + wr2 * acc_y, wr2 * acc_a


def _precompute_const_planes(s, c, vm_list, fit, wf2, wr2):
    """Loop-constant planes of the factored JtJ apply (see _jtj_factored).

    Returns (gx[4], gy[4], fitw, TxW, TyW, degw):
      gx_k/gy_k = wr2·v_k·t(a_j)     (rolled-trig gather weights)
      fitw = wf2·fit                  (fit-term self coupling)
      TxW  = wr2·Σ_k v_k·tx_k, TyW = wr2·Σ_k v_k·ty_k  (offset↔angle coupling)
      degw = wr2·deg                  (angle self coupling)
    """
    gx, gy = [], []
    for k, (dy, dx) in enumerate(DIRS):
        sj = _roll2(s, dy, dx)
        cj = _roll2(c, dy, dx)
        txj, tyj = _t_signfold(dy, dx, sj, cj)
        gx.append(wr2 * vm_list[k] * txj)
        gy.append(wr2 * vm_list[k] * tyj)
    v0, v1, v2, v3 = vm_list
    deg = (v0 + v1) + (v2 + v3)
    fitw = wf2 * fit
    TxW = wr2 * (s * (v1 - v0) + c * (v3 - v2))
    TyW = wr2 * (c * (v0 - v1) + s * (v3 - v2))
    degw = wr2 * deg
    return gx, gy, fitw, TxW, TyW, degw


def _jtj_factored(px, py, pa, s, c, vm_list, gx, gy, fitw, TxW, TyW, degw,
                  wr2):
    """JtJ·p with the loop-constant couplings hoisted out of the iteration
    (~60 VPU ops/px vs ~100 for the naive per-direction form; same 12 rolls):
      apx = fitw·px + 2wr2·Σ d_k + TxW·pa + Σ gx_k·paj_k,  d_k = v_k(px−pxj_k)
      apa = wr2·(Σ tx_k·d_k + Σ ty_k·e_k) + degw·pa
    with tx_k ∈ {±s, ±c} folded to sign patterns over the shared masked
    differences d_k/e_k. NUMERICS: neighbor differences are computed FIRST
    (px − pxj is exact-ish for nearby values); factoring them as deg·px −
    Σ v·pxj cancels two large products and measurably degrades the truncated
    400-iter trajectory (cat512 EPE 0.064 → 0.095 px — do not regroup)."""
    d = []
    e = []
    for k, (dy, dx) in enumerate(DIRS):
        d.append(vm_list[k] * (px - _roll2(px, dy, dx)))
        e.append(vm_list[k] * (py - _roll2(py, dy, dx)))
    paj = [_roll2(pa, dy, dx) for dy, dx in DIRS]
    return _jtj_factored_core(px, py, pa, d, e, paj, s, c, gx, gy,
                              fitw, TxW, TyW, degw, wr2)


def _jtj_factored_core(px, py, pa, d, e, paj, s, c, gx, gy, fitw, TxW, TyW,
                       degw, wr2):
    """Assembly of the factored JtJ apply from precomputed masked neighbor
    differences d/e and rolled angles paj (see _jtj_factored; the tall-layout
    kernel computes d/e/paj from 4 stacked rolls instead of 12 per-plane
    ones)."""
    Lx = (d[0] + d[1]) + (d[2] + d[3])
    Ly = (e[0] + e[1]) + (e[2] + e[3])
    # Σ tx_k·d_k with tx = (−s, s, −c, c) per DIRS; ty = (c, −c, −s, s)
    Ax = s * (d[1] - d[0]) + c * (d[3] - d[2])
    Ay = c * (e[0] - e[1]) + s * (e[3] - e[2])
    Gx = (gx[0] * paj[0] + gx[1] * paj[1]) + (gx[2] * paj[2] + gx[3] * paj[3])
    Gy = (gy[0] * paj[0] + gy[1] * paj[1]) + (gy[2] * paj[2] + gy[3] * paj[3])
    apx = fitw * px + (2.0 * wr2) * Lx + TxW * pa + Gx
    apy = fitw * py + (2.0 * wr2) * Ly + TyW * pa + Gy
    apa = wr2 * (Ax + Ay) + degw * pa
    return apx, apy, apa


def _pcg_kernel(
    # inputs
    b_ref,      # (3, H, W) rhs = −JtF
    pre_ref,    # (3, H, W) inverted Jacobi preconditioner
    s_ref,      # (H, W) sin(angle)
    c_ref,      # (H, W) cos(angle)
    vm_ref,     # (4, H, W) direction masks
    fit_ref,    # (H, W) fit mask
    w_ref,      # (1, 2) SMEM: [wf2, wr2]
    n_ref,      # (1, 1) SMEM: iteration count
    # outputs
    delta_ref,  # (3, H, W)
    # scratch
    r_ref,      # (3, H, W)
    p_ref,      # (3, H, W)
    gx_ref,     # (4, H, W) wr2·v·txj per direction (loop constant)
    gy_ref,     # (4, H, W) wr2·v·tyj per direction (loop constant)
    k_ref,      # (4, H, W) [fitw, TxW, TyW, degw] factored couplings
):
    wf2 = w_ref[0, 0]
    wr2 = w_ref[0, 1]
    s = s_ref[:]
    c = c_ref[:]
    vm = [vm_ref[0], vm_ref[1], vm_ref[2], vm_ref[3]]
    pre = pre_ref[:]

    gx, gy, fitw, TxW, TyW, degw = _precompute_const_planes(
        s, c, vm, fit_ref[:], wf2, wr2
    )
    for k in range(4):
        gx_ref[k] = gx[k]
        gy_ref[k] = gy[k]
    k_ref[0] = fitw
    k_ref[1] = TxW
    k_ref[2] = TyW
    k_ref[3] = degw

    r0 = b_ref[:]
    z0 = pre * r0
    r_ref[:] = r0
    p_ref[:] = z0
    delta_ref[:] = jnp.zeros_like(r0)
    rz0 = jnp.sum(r0 * z0)

    def body(_, rz):
        px, py, pa = p_ref[0], p_ref[1], p_ref[2]
        apx, apy, apa = _jtj_factored(
            px, py, pa, s, c, vm,
            [gx_ref[0], gx_ref[1], gx_ref[2], gx_ref[3]],
            [gy_ref[0], gy_ref[1], gy_ref[2], gy_ref[3]],
            k_ref[0], k_ref[1], k_ref[2], k_ref[3], wr2,
        )
        pap = jnp.sum(px * apx + py * apy + pa * apa)
        alpha = jnp.where(pap > 0.0, rz / pap, 0.0)
        delta_ref[0] = delta_ref[0] + alpha * px
        delta_ref[1] = delta_ref[1] + alpha * py
        delta_ref[2] = delta_ref[2] + alpha * pa
        rx = r_ref[0] - alpha * apx
        ry = r_ref[1] - alpha * apy
        ra = r_ref[2] - alpha * apa
        r_ref[0] = rx
        r_ref[1] = ry
        r_ref[2] = ra
        zx = pre[0] * rx
        zy = pre[1] * ry
        za = pre[2] * ra
        rz_new = jnp.sum(zx * rx + zy * ry + za * ra)
        beta = jnp.where(rz > 0.0, rz_new / rz, 0.0)
        p_ref[0] = zx + beta * px
        p_ref[1] = zy + beta * py
        p_ref[2] = za + beta * pa
        return rz_new

    jax.lax.fori_loop(0, n_ref[0, 0], body, rz0,
                      unroll=_UNROLL if _UNROLL > 1 else False)


@partial(jax.jit, static_argnames=("interpret",))
def pcg_pallas(
    b: jnp.ndarray,
    pre: jnp.ndarray,
    s: jnp.ndarray,
    c: jnp.ndarray,
    vmasks: jnp.ndarray,
    fitmask: jnp.ndarray,
    wf2,
    wr2,
    iters,
    interpret: bool = False,
) -> jnp.ndarray:
    """Solve JtJ δ = b (b = −JtF) with `iters` PCG iterations, all in VMEM.

    Single problem: b/pre (3,H,W), s/c/fitmask (H,W), vmasks (4,H,W).
    """
    H, W = s.shape
    w = jnp.array([[wf2, wr2]], jnp.float32)
    n = jnp.array([[iters]], jnp.int32)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _pcg_kernel,
        out_shape=jax.ShapeDtypeStruct((3, H, W), jnp.float32),
        in_specs=[
            vspec, vspec, vspec, vspec, vspec, vspec,
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=vspec,
        scratch_shapes=[
            pltpu.VMEM((3, H, W), jnp.float32),
            pltpu.VMEM((3, H, W), jnp.float32),
            pltpu.VMEM((4, H, W), jnp.float32),
            pltpu.VMEM((4, H, W), jnp.float32),
            pltpu.VMEM((4, H, W), jnp.float32),
        ],
        # b is read once at init (r0 = b, stored to r scratch) and delta is
        # written strictly after — aliasing drops 3 resident planes, same
        # argument as the batched kernel below
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(b, pre, s, c, vmasks, fitmask, w, n)


def _pcg_kernel_tall(
    b_ref,      # (3H, W) stacked [bx; by; ba]
    pre_ref,    # (3H, W)
    s_ref,      # (H, W)
    c_ref,      # (H, W)
    vm_ref,     # (4, H, W)
    fit_ref,    # (H, W)
    w_ref,      # (1, 2) SMEM
    n_ref,      # (1, 1) SMEM
    delta_ref,  # (3H, W)
    r_ref, p_ref,               # scratch (3H, W)
    gx_ref, gy_ref, k_ref,      # scratch (4, H, W)
):
    """Tall-layout single-problem kernel (see _pcg_kernel_batched_tall):
    state stacked as one (3H, W) plane, 4 rolls per JtJ apply instead of 12;
    sub-plane boundary wrap rows are inert by InBounds vmask gating."""
    wf2 = w_ref[0, 0]
    wr2 = w_ref[0, 1]
    H = s_ref.shape[0]
    s = s_ref[:]
    c = c_ref[:]
    vm = [vm_ref[0], vm_ref[1], vm_ref[2], vm_ref[3]]
    pre = pre_ref[:]

    gx, gy, fitw, TxW, TyW, degw = _precompute_const_planes(
        s, c, vm, fit_ref[:], wf2, wr2
    )
    for k in range(4):
        gx_ref[k] = gx[k]
        gy_ref[k] = gy[k]
    k_ref[0] = fitw
    k_ref[1] = TxW
    k_ref[2] = TyW
    k_ref[3] = degw

    r0 = b_ref[:]
    z0 = pre * r0
    r_ref[:] = r0
    p_ref[:] = z0
    delta_ref[:] = jnp.zeros_like(r0)
    rz0 = jnp.sum(r0 * z0)

    def body(_, rz):
        P = p_ref[:]
        px, py, pa = P[0:H], P[H : 2 * H], P[2 * H :]
        d, e, paj = [], [], []
        for k, (dy, dx) in enumerate(DIRS):
            R = _roll2(P, dy, dx)
            d.append(vm[k] * (px - R[0:H]))
            e.append(vm[k] * (py - R[H : 2 * H]))
            paj.append(R[2 * H :])
        apx, apy, apa = _jtj_factored_core(
            px, py, pa, d, e, paj, s, c,
            [gx_ref[0], gx_ref[1], gx_ref[2], gx_ref[3]],
            [gy_ref[0], gy_ref[1], gy_ref[2], gy_ref[3]],
            k_ref[0], k_ref[1], k_ref[2], k_ref[3], wr2,
        )
        pap = jnp.sum(px * apx + py * apy + pa * apa)
        alpha = jnp.where(pap > 0.0, rz / pap, 0.0)
        delta_ref[0:H] = delta_ref[0:H] + alpha * px
        delta_ref[H : 2 * H] = delta_ref[H : 2 * H] + alpha * py
        delta_ref[2 * H :] = delta_ref[2 * H :] + alpha * pa
        rx = r_ref[0:H] - alpha * apx
        ry = r_ref[H : 2 * H] - alpha * apy
        ra = r_ref[2 * H :] - alpha * apa
        r_ref[0:H] = rx
        r_ref[H : 2 * H] = ry
        r_ref[2 * H :] = ra
        zx = pre[0:H] * rx
        zy = pre[H : 2 * H] * ry
        za = pre[2 * H :] * ra
        rz_new = jnp.sum(zx * rx + zy * ry + za * ra)
        beta = jnp.where(rz > 0.0, rz_new / rz, 0.0)
        p_ref[0:H] = zx + beta * px
        p_ref[H : 2 * H] = zy + beta * py
        p_ref[2 * H :] = za + beta * pa
        return rz_new

    jax.lax.fori_loop(0, n_ref[0, 0], body, rz0,
                      unroll=_UNROLL if _UNROLL > 1 else False)


@partial(jax.jit, static_argnames=("interpret",))
def pcg_pallas_tall(b, pre, s, c, vmasks, fitmask, wf2, wr2, iters,
                    interpret: bool = False):
    """Tall-layout single-problem resident PCG — same semantics as
    pcg_pallas. Vmaps into a Pallas grid over problems exactly like the
    standard kernel (the production canvas path vmaps anneal_solve)."""
    H, W = s.shape
    w = jnp.array([[wf2, wr2]], jnp.float32)
    n = jnp.array([[iters]], jnp.int32)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _pcg_kernel_tall,
        out_shape=jax.ShapeDtypeStruct((3 * H, W), jnp.float32),
        in_specs=[
            vspec, vspec, vspec, vspec, vspec, vspec,
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=vspec,
        scratch_shapes=[
            pltpu.VMEM((3 * H, W), jnp.float32),
            pltpu.VMEM((3 * H, W), jnp.float32),
            pltpu.VMEM((4, H, W), jnp.float32),
            pltpu.VMEM((4, H, W), jnp.float32),
            pltpu.VMEM((4, H, W), jnp.float32),
        ],
        # delta aliases onto b (read once at init, before the first delta
        # write) — keeps the tall kernel's resident-plane count equal to the
        # standard kernel's, so fits_vmem/_PLANES calibration holds for both
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(b.reshape(3 * H, W), pre.reshape(3 * H, W), s, c, vmasks, fitmask,
      w, n)
    return out.reshape(3, H, W)


# resident plane-equivalents per problem: 13 input + 18 scratch + 3 output
# aliased onto b (= 31 persistent) + ~5 live temporaries of the factored
# body — the same 36/problem calibration as the batched kernel
# (solver._BATCH_KERNEL_PLANES)
_PLANES = 36
# Empirically v5e VMEM accommodates ≫ the 16 MB scoped-vmem compiler default:
# full-frame 480×896 (~50 MB resident) compiles and runs 1.4× faster than the
# XLA path (scripts/pallas_check.py probe). Budget kept below that with margin.
_VMEM_BUDGET = 64 * 1024 * 1024


def fits_vmem(H: int, W: int) -> bool:
    """Whether the VMEM-resident kernel fits this problem size."""
    return _PLANES * H * W * 4 <= _VMEM_BUDGET


def _pcg_kernel_batched(
    b_ref,      # (B, 3, H, W)
    pre_ref,    # (B, 3, H, W)
    s_ref,      # (B, H, W)
    c_ref,      # (B, H, W)
    vm_ref,     # (B, 4, H, W)
    fit_ref,    # (B, H, W)
    w_ref,      # (1, 2) SMEM
    n_ref,      # (1, 1) SMEM
    delta_ref,  # (B, 3, H, W)
    r_ref, p_ref,               # scratch (B, 3, H, W)
    gx_ref, gy_ref,             # scratch (B, 4, H, W) loop-constant weights
    k_ref,                      # scratch (B, 4, H, W) [fitw, TxW, TyW, degw]
):
    """Multi-problem resident PCG: B independent per-problem chains are
    interleaved in ONE kernel iteration (a static Python loop over problems;
    all tensor ops stay 2D — Mosaic's layout pass rejects rolls on >3D refs).
    Same factored JtJ as the single-problem kernel."""
    wf2 = w_ref[0, 0]
    wr2 = w_ref[0, 1]
    B = s_ref.shape[0]

    for bi in range(B):
        vm = [vm_ref[bi, 0], vm_ref[bi, 1], vm_ref[bi, 2], vm_ref[bi, 3]]
        gx, gy, fitw, TxW, TyW, degw = _precompute_const_planes(
            s_ref[bi], c_ref[bi], vm, fit_ref[bi], wf2, wr2
        )
        for k in range(4):
            gx_ref[bi, k] = gx[k]
            gy_ref[bi, k] = gy[k]
        k_ref[bi, 0] = fitw
        k_ref[bi, 1] = TxW
        k_ref[bi, 2] = TyW
        k_ref[bi, 3] = degw
        r0 = b_ref[bi]
        z0 = pre_ref[bi] * r0
        r_ref[bi] = r0
        p_ref[bi] = z0
        delta_ref[bi] = jnp.zeros_like(r0)

    def rz_of(bi):
        r = r_ref[bi]
        return jnp.sum(pre_ref[bi] * r * r).reshape(1)

    rz0 = jnp.concatenate([rz_of(bi) for bi in range(B)])

    def body(_, rz):
        rz_new_parts = []
        for bi in range(B):
            px, py, pa = p_ref[bi, 0], p_ref[bi, 1], p_ref[bi, 2]
            vm = [vm_ref[bi, 0], vm_ref[bi, 1], vm_ref[bi, 2], vm_ref[bi, 3]]
            apx, apy, apa = _jtj_factored(
                px, py, pa, s_ref[bi], c_ref[bi], vm,
                [gx_ref[bi, 0], gx_ref[bi, 1], gx_ref[bi, 2], gx_ref[bi, 3]],
                [gy_ref[bi, 0], gy_ref[bi, 1], gy_ref[bi, 2], gy_ref[bi, 3]],
                k_ref[bi, 0], k_ref[bi, 1], k_ref[bi, 2], k_ref[bi, 3], wr2,
            )
            pap = jnp.sum(px * apx + py * apy + pa * apa)
            rz_b = rz[bi]
            alpha = jnp.where(pap > 0.0, rz_b / pap, 0.0)
            delta_ref[bi, 0] = delta_ref[bi, 0] + alpha * px
            delta_ref[bi, 1] = delta_ref[bi, 1] + alpha * py
            delta_ref[bi, 2] = delta_ref[bi, 2] + alpha * pa
            rx = r_ref[bi, 0] - alpha * apx
            ry = r_ref[bi, 1] - alpha * apy
            ra = r_ref[bi, 2] - alpha * apa
            r_ref[bi, 0] = rx
            r_ref[bi, 1] = ry
            r_ref[bi, 2] = ra
            zx = pre_ref[bi, 0] * rx
            zy = pre_ref[bi, 1] * ry
            za = pre_ref[bi, 2] * ra
            rz_new_b = jnp.sum(zx * rx + zy * ry + za * ra)
            beta = jnp.where(rz_b > 0.0, rz_new_b / rz_b, 0.0)
            p_ref[bi, 0] = zx + beta * px
            p_ref[bi, 1] = zy + beta * py
            p_ref[bi, 2] = za + beta * pa
            rz_new_parts.append(rz_new_b.reshape(1))
        return jnp.concatenate(rz_new_parts)

    jax.lax.fori_loop(0, n_ref[0, 0], body, rz0,
                      unroll=_UNROLL if _UNROLL > 1 else False)


@partial(jax.jit, static_argnames=("interpret",))
def pcg_pallas_batched(b, pre, s, c, vmasks, fitmask, wf2, wr2, iters,
                       interpret: bool = False):
    """Batched VMEM-resident PCG over (B, ...) problems; returns δ (B,3,H,W)."""
    B, H, W = s.shape
    w = jnp.stack(
        [jnp.asarray(wf2).reshape(-1)[0], jnp.asarray(wr2).reshape(-1)[0]]
    ).reshape(1, 2).astype(jnp.float32)
    n = jnp.full((1, 1), iters, jnp.int32)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _pcg_kernel_batched,
        out_shape=jax.ShapeDtypeStruct((B, 3, H, W), jnp.float32),
        in_specs=[
            vspec, vspec, vspec, vspec, vspec, vspec,
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=vspec,
        scratch_shapes=[
            pltpu.VMEM((B, 3, H, W), jnp.float32),
            pltpu.VMEM((B, 3, H, W), jnp.float32),
            pltpu.VMEM((B, 4, H, W), jnp.float32),
            pltpu.VMEM((B, 4, H, W), jnp.float32),
            pltpu.VMEM((B, 4, H, W), jnp.float32),
        ],
        # b is consumed once at init (r0 = b, copied into r scratch) and the
        # delta output is written strictly after — aliasing them drops 3
        # resident planes/problem, buying one more interleaved problem per
        # VMEM budget
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(b, pre, s, c, vmasks, fitmask, w, n)


def _pcg_kernel_batched_tall(
    b_ref,      # (B, 3H, W) stacked [bx; by; ba]
    pre_ref,    # (B, 3H, W)
    s_ref,      # (B, H, W)
    c_ref,      # (B, H, W)
    vm_ref,     # (B, 4, H, W)
    fit_ref,    # (B, H, W)
    w_ref,      # (1, 2) SMEM
    n_ref,      # (1, 1) SMEM
    delta_ref,  # (B, 3H, W)
    r_ref, p_ref,               # scratch (B, 3H, W)
    gx_ref, gy_ref,             # scratch (B, 4, H, W)
    k_ref,                      # scratch (B, 4, H, W)
):
    """Tall-layout variant of _pcg_kernel_batched: solver state lives as ONE
    stacked (3H, W) plane per problem, so each JtJ apply needs 4 stacked
    rolls instead of 12 per-channel ones (d/e/paj fall out of row slices of
    the rolled stack). Rows wrapping across the px/py/pa sub-plane boundaries
    land only on first/last rows of each sub-plane, where the corresponding
    direction mask is zero by InBounds gating — the same inertness lemma that
    makes plain wrap-around rolls exact. Arithmetic is otherwise identical
    (_jtj_factored_core) — tested equal to the standard kernel."""
    wf2 = w_ref[0, 0]
    wr2 = w_ref[0, 1]
    B = s_ref.shape[0]
    H = s_ref.shape[1]

    for bi in range(B):
        vm = [vm_ref[bi, 0], vm_ref[bi, 1], vm_ref[bi, 2], vm_ref[bi, 3]]
        gx, gy, fitw, TxW, TyW, degw = _precompute_const_planes(
            s_ref[bi], c_ref[bi], vm, fit_ref[bi], wf2, wr2
        )
        for k in range(4):
            gx_ref[bi, k] = gx[k]
            gy_ref[bi, k] = gy[k]
        k_ref[bi, 0] = fitw
        k_ref[bi, 1] = TxW
        k_ref[bi, 2] = TyW
        k_ref[bi, 3] = degw
        r0 = b_ref[bi]
        z0 = pre_ref[bi] * r0
        r_ref[bi] = r0
        p_ref[bi] = z0
        delta_ref[bi] = jnp.zeros_like(r0)

    def rz_of(bi):
        r = r_ref[bi]
        return jnp.sum(pre_ref[bi] * r * r).reshape(1)

    rz0 = jnp.concatenate([rz_of(bi) for bi in range(B)])

    def body(_, rz):
        rz_new_parts = []
        for bi in range(B):
            P = p_ref[bi]
            px, py, pa = P[0:H], P[H : 2 * H], P[2 * H :]
            vm = [vm_ref[bi, 0], vm_ref[bi, 1], vm_ref[bi, 2], vm_ref[bi, 3]]
            d, e, paj = [], [], []
            for k, (dy, dx) in enumerate(DIRS):
                R = _roll2(P, dy, dx)
                d.append(vm[k] * (px - R[0:H]))
                e.append(vm[k] * (py - R[H : 2 * H]))
                paj.append(R[2 * H :])
            apx, apy, apa = _jtj_factored_core(
                px, py, pa, d, e, paj, s_ref[bi], c_ref[bi],
                [gx_ref[bi, 0], gx_ref[bi, 1], gx_ref[bi, 2], gx_ref[bi, 3]],
                [gy_ref[bi, 0], gy_ref[bi, 1], gy_ref[bi, 2], gy_ref[bi, 3]],
                k_ref[bi, 0], k_ref[bi, 1], k_ref[bi, 2], k_ref[bi, 3], wr2,
            )
            pap = jnp.sum(px * apx + py * apy + pa * apa)
            rz_b = rz[bi]
            alpha = jnp.where(pap > 0.0, rz_b / pap, 0.0)
            delta_ref[bi, 0:H] = delta_ref[bi, 0:H] + alpha * px
            delta_ref[bi, H : 2 * H] = delta_ref[bi, H : 2 * H] + alpha * py
            delta_ref[bi, 2 * H :] = delta_ref[bi, 2 * H :] + alpha * pa
            rx = r_ref[bi, 0:H] - alpha * apx
            ry = r_ref[bi, H : 2 * H] - alpha * apy
            ra = r_ref[bi, 2 * H :] - alpha * apa
            r_ref[bi, 0:H] = rx
            r_ref[bi, H : 2 * H] = ry
            r_ref[bi, 2 * H :] = ra
            pre = pre_ref[bi]
            zx = pre[0:H] * rx
            zy = pre[H : 2 * H] * ry
            za = pre[2 * H :] * ra
            rz_new_b = jnp.sum(zx * rx + zy * ry + za * ra)
            beta = jnp.where(rz_b > 0.0, rz_new_b / rz_b, 0.0)
            p_ref[bi, 0:H] = zx + beta * px
            p_ref[bi, H : 2 * H] = zy + beta * py
            p_ref[bi, 2 * H :] = za + beta * pa
            rz_new_parts.append(rz_new_b.reshape(1))
        return jnp.concatenate(rz_new_parts)

    jax.lax.fori_loop(0, n_ref[0, 0], body, rz0,
                      unroll=_UNROLL if _UNROLL > 1 else False)


@partial(jax.jit, static_argnames=("interpret",))
def pcg_pallas_batched_tall(b, pre, s, c, vmasks, fitmask, wf2, wr2, iters,
                            interpret: bool = False):
    """Tall-layout batched resident PCG (see _pcg_kernel_batched_tall).
    Same signature/semantics as pcg_pallas_batched."""
    B, H, W = s.shape
    w = jnp.stack(
        [jnp.asarray(wf2).reshape(-1)[0], jnp.asarray(wr2).reshape(-1)[0]]
    ).reshape(1, 2).astype(jnp.float32)
    n = jnp.full((1, 1), iters, jnp.int32)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _pcg_kernel_batched_tall,
        out_shape=jax.ShapeDtypeStruct((B, 3 * H, W), jnp.float32),
        in_specs=[
            vspec, vspec, vspec, vspec, vspec, vspec,
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=vspec,
        scratch_shapes=[
            pltpu.VMEM((B, 3 * H, W), jnp.float32),
            pltpu.VMEM((B, 3 * H, W), jnp.float32),
            pltpu.VMEM((B, 4, H, W), jnp.float32),
            pltpu.VMEM((B, 4, H, W), jnp.float32),
            pltpu.VMEM((B, 4, H, W), jnp.float32),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(b.reshape(B, 3 * H, W), pre.reshape(B, 3 * H, W), s, c, vmasks,
      fitmask, w, n)
    return out.reshape(B, 3, H, W)


def pcg_solve_pallas(ops, s, c, jtf, diag, iters, interpret: bool = False):
    """Drop-in replacement for ops.solver.pcg_solve (fixed iteration count):
    returns (δ, iters). Falls back to the XLA path when the problem exceeds
    the VMEM budget (crop buckets are sized to stay inside it).

    ARAP_TALL_KERNEL=1 (set before first trace in the process) routes through
    the stacked-plane layout kernel — a perf probe; identical math (tested)."""
    from .solver import guarded_invert, pcg_solve

    H, W = s.shape
    if not fits_vmem(H, W):
        return pcg_solve(ops, s, c, jtf, diag, 10 ** 9, iters)
    pre = guarded_invert(diag)
    kern = pcg_pallas_tall if tall_kernel_enabled() else pcg_pallas
    delta = kern(
        -jtf, pre, s, c, ops.vmasks, ops.fitmask, ops.wf2, ops.wr2,
        jnp.int32(iters), interpret=interpret,
    )
    return delta, jnp.float32(iters)
