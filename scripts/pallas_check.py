"""Validate + time the Pallas VMEM-resident PCG against the XLA path on TPU,
on a crop-bucket-sized problem and on cat512.

    python scripts/pallas_check.py
"""

import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from arap_flow_tpu.io import flo
from arap_flow_tpu.io.constraints import add_border_pins, read_constraint_file
from arap_flow_tpu.io.image import load_mask
from arap_flow_tpu.ops import energy as E
from arap_flow_tpu.ops import solver as S


def bucket_problem(H, W, seed=0):
    rng = np.random.default_rng(seed)
    arap_mask = np.full((H, W), 255, np.uint8)
    arap_mask[H // 8 : 7 * H // 8, W // 8 : 7 * W // 8] = 0
    ys, xs = np.mgrid[H // 8 + 2 : 7 * H // 8 - 2 : 8, W // 8 + 2 : 7 * W // 8 - 2 : 8]
    cons = np.stack(
        [xs.ravel(), ys.ravel(),
         xs.ravel() + rng.integers(-10, 11, xs.size),
         ys.ravel() + rng.integers(-8, 9, xs.size)], 1).astype(np.int32)
    cons = add_border_pins(cons, W, H)
    return E.build_operands(arap_mask, cons)


def run(ops, cfg, tag, gu=None, gv=None):
    t0 = time.time()
    x, flow, iters = S.solve_stats(ops, cfg)
    f = np.asarray(flow)
    t_first = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        x, flow, iters = S.solve_stats(ops, cfg)
        f = np.asarray(flow)
        ts.append(time.time() - t0)
    msg = f"{tag:28s} t={min(ts):6.3f}s (first {t_first:6.1f}s) iters={float(iters):7.0f}"
    if gu is not None:
        epe = np.sqrt((f[0] - gu) ** 2 + (f[1] - gv) ** 2)
        msg += f" EPE mean={epe.mean():.4f} p99={np.percentile(epe, 99):.3f}"
    print(msg, flush=True)
    return f


def main():
    import jax

    print("devices:", jax.devices())

    # bucket-sized problem: correctness + speed (bucket sized to the VMEM
    # budget of the resident kernel)
    ops = bucket_problem(256, 448)
    f_x = run(ops, S.SolverConfig(backend="xla"), "bucket 256x448 xla")
    f_p = run(ops, S.SolverConfig(backend="pallas"), "bucket 256x448 pallas")
    d = np.abs(f_x - f_p)
    print(f"xla-vs-pallas max|Δflow| = {d.max():.6f}  mean = {d.mean():.8f}")

    # cat512 golden
    d_ = pathlib.Path("/root/reference/ARAP/deformation")
    w_ = pathlib.Path("/root/reference/ARAP/warping")
    mask = load_mask(d_ / "cat512_iMsk.png")
    cons = read_constraint_file(d_ / "cat512_iCstr.txt")
    H, W = mask.shape
    cons = add_border_pins(cons, W, H)
    ops = E.build_operands(mask, cons)
    gu, gv = flo.flow_read(w_ / "cat512_iFlo.flo")
    run(ops, S.SolverConfig(backend="xla"), "cat512 xla", gu, gv)
    run(ops, S.SolverConfig(backend="pallas"), "cat512 pallas", gu, gv)


if __name__ == "__main__":
    main()
