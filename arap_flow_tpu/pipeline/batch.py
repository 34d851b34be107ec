"""Bucketed batch execution of (frame, segment) ARAP problems.

The reference keeps each GPU busy with one solve at a time, fed by worker
processes and tmp list files (para_gen.py:560-567, --narap buffering). The TPU
replacement: segments from many frame pairs are cropped to bucket-aligned
boxes (exact — models/arap.py:crop_box), grouped by bucket shape, and each
group runs as ONE batched compiled program (models/arap.py:
solve_and_raster_batch). Segments too large for any bucket fall back to a
single full-frame solve.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..io.constraints import add_border_pins
from ..models.arap import DeformResult, crop_box, solve_and_raster_batch, _solve_and_raster
from ..ops import energy as E
from ..ops.solver import SolverConfig

# bucket shapes (H, W): lane-friendly widths, covering typical DAVIS segments
DEFAULT_BUCKETS = ((128, 256), (192, 384), (256, 384), (256, 512), (384, 640), (512, 896))


def max_chunk_for(bucket: tuple, n_data: int = 1) -> int:
    """Largest batch of this bucket shape fitting the kernel VMEM budget.

    Measured scaling (hardware, 400-iter PCG): 15.9 -> 5.2 ms/problem from
    B=3 to B=8 at 256x384; 2.1 ms/problem at B=24, 128x256; 13.4 at B=3,
    384x640 — the interleaved dependency chains hide each other's latency,
    so fill VMEM. Cap 24: compile time grows with the per-problem unroll.
    `n_data` (sharded runs) multiplies the global batch: the budget is
    per device.
    """
    from ..ops.solver import _BATCH_KERNEL_PLANES, _BATCH_KERNEL_VMEM

    bh, bw = bucket
    per_problem = _BATCH_KERNEL_PLANES * bh * bw * 4
    return n_data * max(1, min(24, _BATCH_KERNEL_VMEM // per_problem))


@dataclass
class SegmentTask:
    """One segment solve request (frame-pair index, segment id, crop)."""

    pair_idx: int
    seg_id: int
    frame_hw: tuple
    y0: int
    x0: int
    bucket: tuple
    ops: E.ArapOperands
    rgb: jnp.ndarray  # (3, h, w) cropped uint8 (device-cast to f32)


def make_task(
    pair_idx: int,
    seg_id: int,
    rgb: np.ndarray,
    arap_mask: np.ndarray,
    cons: np.ndarray,
    weights: E.ArapWeights,
    buckets=DEFAULT_BUCKETS,
    pin_border: bool = True,
) -> SegmentTask | None:
    """Crop a segment problem into the smallest fitting bucket (None -> use a
    full-frame fallback)."""
    H, W = arap_mask.shape
    cons = np.asarray(cons, np.int32).reshape(-1, 4)
    if pin_border:
        cons = add_border_pins(cons, W, H)
    disp = 0
    if len(cons):
        disp = int(np.abs(cons[:, 2:4].astype(np.int64) - cons[:, :2]).max())
    ys, xs = np.where(arap_mask == 0)
    if len(ys) == 0:
        return None
    pad = 8 + disp
    need_h = int(ys.max()) - int(ys.min()) + 1 + 2 * pad
    need_w = int(xs.max()) - int(xs.min()) + 1 + 2 * pad
    bucket = None
    for bh, bw in buckets:
        if need_h <= bh and need_w <= bw and bh <= H and bw <= W:
            bucket = (bh, bw)
            break
    if bucket is None:
        return None
    bh, bw = bucket
    y0, x0, _, _ = crop_box(arap_mask, cons, extra=disp, h_mult=bh, w_mult=bw)
    y0 = min(max(y0, 0), H - bh)
    x0 = min(max(x0, 0), W - bw)
    sub_mask = np.ascontiguousarray(arap_mask[y0 : y0 + bh, x0 : x0 + bw])
    sub_rgb = np.ascontiguousarray(rgb[y0 : y0 + bh, x0 : x0 + bw])
    shifted = cons.copy()
    shifted[:, [0, 2]] -= x0
    shifted[:, [1, 3]] -= y0
    inside = (
        (shifted[:, 0] >= 0) & (shifted[:, 0] < bw)
        & (shifted[:, 1] >= 0) & (shifted[:, 1] < bh)
    )
    # compact operands + u8 RGB: ~8x less H2D per task (the expansion runs
    # on device inside the jitted solve program, models/arap.py:_expand)
    ops = E.build_compact(sub_mask, shifted[inside], weights)
    return SegmentTask(
        pair_idx=pair_idx,
        seg_id=seg_id,
        frame_hw=(H, W),
        y0=y0,
        x0=x0,
        bucket=bucket,
        ops=ops,
        rgb=jnp.asarray(np.ascontiguousarray(sub_rgb.transpose(2, 0, 1))),
    )


def run_tasks(
    tasks: list[SegmentTask],
    fallbacks: list[tuple],
    cfg: SolverConfig,
    timer=None,
    mesh=None,
    weights: E.ArapWeights = E.ArapWeights(),
) -> dict[tuple, DeformResult]:
    """Execute bucketed tasks (batched per bucket) + full-frame fallbacks.

    fallbacks: list of (pair_idx, seg_id, rgb, arap_mask, cons-with-pins);
    `weights` applies to the fallback solves (bucketed tasks already carry
    theirs via make_task).
    `timer` (optional StageTimer) records a per-stage breakdown: upload,
    device dispatch, D2H fetch (which on this platform also absorbs the wait
    for device completion), and host paste.
    `mesh`: optional jax Mesh — bucket batches are sharded over its 'data'
    axis (--mode sharded; the reference's multi-GPU farm, para_gen.py:560-567)
    and chunks are sized/padded to a multiple of the axis size.
    Returns {(pair_idx, seg_id): DeformResult (full-frame canvases)}.
    """
    from ..utils.profiling import StageTimer

    timer = timer if timer is not None else StageTimer()
    n_data = 1 if mesh is None else mesh.shape["data"]
    out: dict[tuple, DeformResult] = {}

    groups: dict[tuple, list[SegmentTask]] = {}
    for t in tasks:
        groups.setdefault(t.bucket, []).append(t)

    chunked = []
    for bucket, group in groups.items():
        step = max_chunk_for(bucket, n_data)
        for i in range(0, len(group), step):
            chunk_tasks = group[i : i + step]
            n_real = len(chunk_tasks)
            # pad partial chunks by repeating the last task: one compiled
            # batch shape per bucket instead of one per remainder size
            # (a wasted duplicate solve costs ~0.1-0.5s; a compile costs
            # 10-300s on this platform). Sharded runs additionally need the
            # batch divisible by the 'data' axis (step is n_data-aligned, so
            # only singleton chunks need the smaller n_data pad).
            target = step if n_real > 1 else n_data
            while len(chunk_tasks) < target:
                chunk_tasks = chunk_tasks + [chunk_tasks[-1]]
            chunked.append((bucket, chunk_tasks, n_real))

    # dispatch ALL chunks first (jax dispatch is async), then fetch: the D2H
    # of chunk k overlaps the device execution of later chunks
    pending = []
    for bucket, group, n_real in chunked:
        with timer.stage("upload+stack"):
            batched_ops = jax.tree.map(
                lambda *ls: jnp.stack(ls), *[t.ops for t in group]
            )
            rgb_b = jnp.stack([t.rgb for t in group])
        with timer.stage("solve+raster dispatch"):
            xs, flows, wrgbs, wmasks = solve_and_raster_batch(
                batched_ops, rgb_b, cfg, mesh=mesh
            )
        pending.append((group, n_real, flows, wrgbs, wmasks))

    for group, n_real, flows, wrgbs, wmasks in pending:
        with timer.stage("D2H fetch"):
            flows = np.asarray(flows)
            wrgbs = np.asarray(wrgbs)
            wmasks = np.asarray(wmasks)
        with timer.stage("host paste"):
            for i, t in enumerate(group[:n_real]):
                H, W = t.frame_hw
                bh, bw = t.bucket
                flow = np.zeros((H, W, 2), np.float32)
                flow[t.y0 : t.y0 + bh, t.x0 : t.x0 + bw] = flows[i].transpose(
                    1, 2, 0
                )
                rgb = np.zeros((H, W, 3), np.uint8)
                rgb[t.y0 : t.y0 + bh, t.x0 : t.x0 + bw] = (
                    wrgbs[i].transpose(1, 2, 0).astype(np.uint8)
                )
                mask = np.zeros((H, W), np.uint8)
                mask[t.y0 : t.y0 + bh, t.x0 : t.x0 + bw] = wmasks[i].astype(
                    np.uint8
                )
                out[(t.pair_idx, t.seg_id)] = DeformResult(
                    flow=flow, warped_rgb=rgb, warped_mask=mask
                )

    for pair_idx, seg_id, rgb, arap_mask, cons in fallbacks:
        ops = E.build_compact(np.asarray(arap_mask), cons, weights)
        rgb_u8 = jnp.asarray(np.ascontiguousarray(rgb.transpose(2, 0, 1)))
        _, flow, wrgb, wmask = _solve_and_raster(ops, rgb_u8, cfg)
        out[(pair_idx, seg_id)] = DeformResult(
            flow=np.asarray(flow).transpose(1, 2, 0),
            warped_rgb=np.asarray(wrgb).transpose(1, 2, 0).astype(np.uint8),
            warped_mask=np.asarray(wmask).astype(np.uint8),
        )
    return out
