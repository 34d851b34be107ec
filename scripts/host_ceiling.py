"""Host-ceiling measurement for the batched pipeline (multi-chip claim support).

The multi-chip scaling story (--mode sharded, dp over a v5p-8) extrapolates
linearly from one-chip device throughput because the data-parallel layout is
zero-collective (each chip owns whole problems; MULTICHIP artifacts prove
correctness, not speed — no multi-chip hardware here). The honest question
is the SERIAL FRACTION: at 8x device throughput, the host must decode,
filter, bucket, paste, compose and write 8x as many pairs through the same
threads — the reference's farm had one whole host process per GPU
(para_gen.py:560-567); ours has one process per host.

This script measures the ceiling directly: it runs the real batched pipeline
(real dataset on disk, real decode/filter/bucket-prep/paste/compose/PNG+.flo
writes, the production thread structure) with every DEVICE program stubbed
to return instantly with correctly-shaped host arrays. The resulting pairs/s
is the throughput an infinitely fast device (or any number of chips) could
not exceed on this host — the denominator of the v5p-8 scaling claim.

Stub fidelity notes:
  - matcher: dispatch returns the decoded mask as the "handle"; fetch
    synthesizes a stride-8 on-object match grid with a small rigid shift
    (realistic match counts, so filter_matches/make_task do real work).
  - solver+raster: returns i16-zero flow (the production compact dtype),
    the input crop pasted into the canvas as warped RGB (content-realistic
    PNG encode cost), and a full-canvas 255 mask (compose touches every
    canvas pixel — upper-bound compose cost).
  - jnp.stack/asarray uploads still run (CPU backend memcpy) — on the real
    platform these are H2D through the tunnel, also host-side time.

Run on CPU with the clean env:
    env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/host_ceiling.py [n_pairs]
"""

import json
import os
import os.path as osp
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))


def install_stubs():
    import jax.numpy as jnp

    from arap_flow_tpu.models import arap as arap_mod
    from arap_flow_tpu.ops import matching as match_mod
    from arap_flow_tpu.pipeline import batch as batch_mod

    # ---- matcher stubs ----
    def stub_dispatch(g1, g2, radius=100, downscale=1, **kw):
        return ("h", np.asarray(g1).shape)

    def stub_dispatch_multi(pairs, radius=100, downscale=1, **kw):
        return [("h", np.asarray(a).shape) for a, _ in pairs]

    def stub_fetch(handle, fb_threshold=1.5, roi_mask=None, **kw):
        mask = roi_mask
        ys, xs = np.where(mask > 0)
        sel = (ys % 8 == 0) & (xs % 8 == 0)
        sy, sx = ys[sel], xs[sel]
        m = np.stack(
            [sx, sy, sx + 3, sy + 2, np.ones_like(sx)], axis=1
        ).astype(np.float32)
        return m

    match_mod.match_images_dispatch = stub_dispatch
    match_mod.match_images_dispatch_multi = stub_dispatch_multi
    match_mod.match_images_fetch = stub_fetch

    # ---- solver+raster stubs (batched canvas + full-frame fallback) ----
    def stub_solve_and_raster_canvas(batched_ops, rgb_b, offs, cfg,
                                     canvas_hw=None, mesh=None,
                                     transposed=False, compact_flow=True,
                                     **kw):
        rgb = np.asarray(rgb_b)  # (B, 3, bh, bw) u8
        B, _, bh, bw = rgb.shape
        ch, cw = canvas_hw
        off = np.asarray(offs)
        flows = np.zeros((B, 2, bh, bw), np.int16)
        wrgbs = np.zeros((B, 3, ch, cw), np.uint8)
        for i in range(B):
            oy, ox = int(off[i, 0]), int(off[i, 1])
            oy, ox = max(0, oy), max(0, ox)
            wrgbs[i, :, oy : oy + bh, ox : ox + bw] = (
                rgb[i, :, : ch - oy, : cw - ox]
            )
        wmasks = np.full((B, ch, cw), 255, np.uint8)
        return flows, wrgbs, wmasks

    def stub_solve_and_raster(ops, rgb_u8, cfg, **kw):
        rgb = np.asarray(rgb_u8)
        _, H, W = rgb.shape
        return (
            None,
            np.zeros((2, H, W), np.float32),
            rgb,
            np.full((H, W), 255, np.uint8),
        )

    arap_mod.solve_and_raster_canvas = stub_solve_and_raster_canvas
    batch_mod.solve_and_raster_canvas = stub_solve_and_raster_canvas
    arap_mod._solve_and_raster = stub_solve_and_raster
    batch_mod._solve_and_raster = stub_solve_and_raster
    _ = jnp  # imported for parity with production path


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 48

    install_stubs()

    from pipeline_bench import make_dataset

    from arap_flow_tpu.pipeline import para_gen
    from arap_flow_tpu.pipeline.para_gen import PipelineFlags, main_pipeline

    root = "/tmp/arap_host_ceiling"
    shutil.rmtree(root, ignore_errors=True)
    data = osp.join(root, "data")
    make_dataset(data, n_pairs + 1)

    runs = []
    for i in range(2):  # second run: all caches warm, steady host state
        out = osp.join(root, f"out_{i}")
        flags = PipelineFlags(
            input=data, output=out, fd=1, multseg=True, seed=0,
            mode="batched", warmup=False,
        )
        os.environ["ARAP_PROFILE"] = "1"
        t0 = time.time()
        triples = main_pipeline(flags)
        runs.append(time.time() - t0)
        assert len(triples) == n_pairs, (len(triples), n_pairs)

    ceiling = n_pairs / min(runs)
    result = {
        "n_pairs": n_pairs,
        "runs_s": [round(t, 2) for t in runs],
        "host_ceiling_pairs_per_s": round(ceiling, 2),
        "note": "batched pipeline, all device programs stubbed instant; "
        "decode+match-prep+filter+bucket+paste+compose+writes real",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
