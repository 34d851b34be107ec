"""Time the resident PCG kernel (sequential + batched) on TPU and check the
cat512 golden EPE with the pallas backend. Focused successor of pallas_check
for kernel iteration work.

    python scripts/kernel_bench.py [B:HxW ...]      # e.g. 8:256x384
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from arap_flow_tpu.io import flo
from arap_flow_tpu.io.constraints import add_border_pins, read_constraint_file
from arap_flow_tpu.io.image import load_mask
from arap_flow_tpu.ops import energy as E
from arap_flow_tpu.ops import solver as S

from pallas_check import bucket_problem, run


def time_batched(H, W, B, cfg):
    import jax
    import jax.numpy as jnp

    from arap_flow_tpu.ops.pallas_pcg import tall_kernel_enabled

    tall = tall_kernel_enabled()
    probs = [bucket_problem(H, W, seed=s) for s in range(B)]
    batched = jax.tree.map(lambda *ls: jnp.stack(ls), *probs)
    t0 = time.time()
    xs, flows, n = S._solve_batch_kernel_impl(
        batched, cfg.dynamic, cfg.static_key, tall=tall)
    f = np.asarray(flows)
    t_first = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        xs, flows, n = S._solve_batch_kernel_impl(
            batched, cfg.dynamic, cfg.static_key, tall=tall)
        f = np.asarray(flows)
        ts.append(time.time() - t0)
    t = min(ts)
    per_iter = t / B / (19 * 8 * 400) * 1e6
    print(f"batched{' TALL' if tall else ''} B={B} {H}x{W}: t={t:.3f}s "
          f"({t/B*1000:.0f} ms/problem, "
          f"{per_iter:.2f} us/iter/problem; first {t_first:.0f}s)", flush=True)


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    cfg = S.SolverConfig(backend="pallas")

    # sequential kernel at the main bucket size
    ops = bucket_problem(256, 384)
    run(ops, cfg, "bucket 256x384 pallas")

    # batched kernel
    shapes = [(8, 256, 384)]
    for arg in sys.argv[1:]:
        b, hw = arg.split(":")
        h, w = hw.split("x")
        shapes.append((int(b), int(h), int(w)))
    for B, H, W in shapes:
        try:
            time_batched(H, W, B, cfg)
        except Exception as e:
            print(f"batched B={B} {H}x{W} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # cat512 golden with the pallas backend
    d_ = pathlib.Path("/root/reference/ARAP/deformation")
    w_ = pathlib.Path("/root/reference/ARAP/warping")
    mask = load_mask(d_ / "cat512_iMsk.png")
    cons = read_constraint_file(d_ / "cat512_iCstr.txt")
    H, W = mask.shape
    cons = add_border_pins(cons, W, H)
    gops = E.build_operands(mask, cons)
    gu, gv = flo.flow_read(w_ / "cat512_iFlo.flo")
    run(gops, cfg, "cat512 pallas", gu, gv)


if __name__ == "__main__":
    main()
