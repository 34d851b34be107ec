"""DMO-style dataset assembly: random procedural textures over object masks.

The reference's DMO datasets (D15OM/D15RM: 5 frame distances × 2 texture sets,
README.md:6-31) pair DAVIS-style object masks with randomized textures; the
repo ships only the Blender texture renderer (texture_gen.py) — the assembly
step is reconstructed here:

1. every object id in a sequence gets a procedural texture (ops/textures)
   sampled in object-tracked coordinates (per-frame mask centroid), so the
   texture translates rigidly with the object and the matcher can recover the
   motion; the background gets its own static texture;
2. the textured frames + original masks form an orgRGB/orgMasks tree;
3. para_gen runs on that tree exactly as on real video (per --fd).

    python -m arap_flow_tpu.pipeline.dmo_gen --masks ROOT --output OUT \
        [--fd 1 2 3] [--seed 0] [--multseg] [--schedule parity]

``--masks ROOT`` must contain orgMasks/<seq>/NNNNN.png annotation masks
(0 = background, ids = objects). Textured frames are written to
OUT/textured/orgRGB; each fd runs into OUT/fd{N}/ with shared masks
(the D15 layout).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import zlib

import numpy as np

from ..io.image import save_image
from .para_gen import ORGMASK, ORGCOLOR, PipelineFlags, main_pipeline


def _texture_for(key_seed: int, H: int, W: int):
    import jax

    from ..ops.textures import random_texture

    # oversized canvas so object-tracked sampling stays in bounds
    return np.asarray(random_texture(jax.random.PRNGKey(key_seed), 2 * H, 2 * W))


def texture_sequence(mask_paths: list[str], out_dir: str, seed: int) -> None:
    """Assemble textured RGB frames for one sequence of annotation masks."""
    from PIL import Image

    masks = []
    for p in mask_paths:
        m = np.array(Image.open(p))
        if m.ndim == 3:
            m = m[..., 0]
        masks.append(m)
    H, W = masks[0].shape
    ids = sorted(set(int(i) for m in masks for i in np.unique(m)) - {0})

    textures = {0: _texture_for(seed * 1000, H, W)}
    for k, oid in enumerate(ids):
        textures[oid] = _texture_for(seed * 1000 + 1 + k, H, W)

    # reference centroid per object from the first frame it appears in
    ref_centroid = {}
    for oid in ids:
        for m in masks:
            ys, xs = np.where(m == oid)
            if len(ys):
                ref_centroid[oid] = (float(ys.mean()), float(xs.mean()))
                break

    yy, xx = np.mgrid[0:H, 0:W]
    os.makedirs(out_dir, exist_ok=True)
    for t, (m, p) in enumerate(zip(masks, mask_paths)):
        frame = textures[0][H // 2 : H // 2 + H, W // 2 : W // 2 + W].copy()
        for oid in ids:
            sel = m == oid
            if not sel.any():
                continue
            cy, cx = float(yy[sel].mean()), float(xx[sel].mean())
            r0y, r0x = ref_centroid[oid]
            # sample the object's texture in object-tracked coordinates so it
            # moves rigidly with the mask
            sy = np.clip((yy[sel] - cy + r0y).astype(int) + H // 2, 0, 2 * H - 1)
            sx = np.clip((xx[sel] - cx + r0x).astype(int) + W // 2, 0, 2 * W - 1)
            frame[sel] = textures[oid][sy, sx]
        name = osp.splitext(osp.basename(p))[0]
        save_image(osp.join(out_dir, name + ".jpg"), frame)


def assemble(masks_root: str, output: str, seed: int) -> str:
    """Texture every sequence under masks_root/orgMasks; returns the new
    input root (textured orgRGB + linked orgMasks)."""
    src = osp.join(masks_root, ORGMASK)
    troot = osp.join(output, "textured")
    for dirpath, dirs, files in os.walk(src):
        pngs = sorted(osp.join(dirpath, f) for f in files if f.endswith(".png"))
        if not pngs:
            continue
        rel = osp.relpath(dirpath, src)
        texture_sequence(
            pngs, osp.join(troot, ORGCOLOR, rel),
            seed + zlib.crc32(rel.encode()) % 100000,
        )
        mdir = osp.join(troot, ORGMASK, rel)
        os.makedirs(mdir, exist_ok=True)
        for p in pngs:
            dst = osp.join(mdir, osp.basename(p))
            if not osp.exists(dst):
                os.symlink(osp.abspath(p), dst)
    return troot


def main(argv=None):
    ap = argparse.ArgumentParser(description="DMO-style textured dataset generation")
    ap.add_argument("--masks", required=True, help="root containing orgMasks/")
    ap.add_argument("--output", required=True)
    ap.add_argument("--fd", nargs="*", type=int, default=[1])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--multseg", action="store_true", default=False)
    ap.add_argument("--schedule", choices=["parity", "fast"], default="parity")
    ap.add_argument("--mode", choices=["simple", "batched"], default="simple")
    a = ap.parse_args(argv)

    troot = assemble(a.masks, a.output, a.seed)
    for fd in a.fd:
        print(f"=== fd{fd} ===")
        flags = PipelineFlags(
            input=troot, output=osp.join(a.output, f"fd{fd}"), fd=fd,
            multseg=a.multseg, schedule=a.schedule, seed=a.seed, mode=a.mode,
        )
        main_pipeline(flags)


if __name__ == "__main__":
    main()
