"""Phase-by-phase dataset generator (generate.py equivalent).

The older serial reference pipeline runs distinct phases over the whole dataset
(generate.py: matching :249-275 → mask/constraint conversion :192-216 → ARAP
deformation :145-190 → background compositing :61-132), checkpointing each
phase to the filesystem. This variant preserves that phase structure — useful
for regenerating a single stage — on the same TPU machinery as para_gen.

    python -m arap_flow_tpu.pipeline.generate --input ROOT --output OUT \
        [--phases match convert deform bg] [--fd N] [--multseg] ...
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np
from PIL import Image

from ..io import flo
from ..io.constraints import filter_matches, read_constraint_file, write_constraint_file
from ..io.image import ARAP_BG, save_image
from ..models.arap import ArapDeformer
from .para_gen import (
    BackgroundPool,
    PipelineFlags,
    add_bg,
    has_mask,
    make_solver_config,
    run_matching,
    scan_pairs,
    _ensure_dirs,
)


def phase_match(flags: PipelineFlags, pairs):
    """Matching phase: raw matches -> filtered constraint files
    (generate.py:249-275 + the filter from para_gen.py:466-479)."""
    for p in pairs:
        _ensure_dirs(p)
        im1 = np.array(Image.open(p.rgb1_org).convert("RGB"))
        im2 = np.array(Image.open(p.rgb2_org).convert("RGB"))
        mk1 = np.array(Image.open(p.msk1_org))
        mk2 = np.array(Image.open(p.msk2_org))
        if mk1.ndim == 3:
            mk1 = mk1[..., 0]
        if mk2.ndim == 3:
            mk2 = mk2[..., 0]
        if not has_mask(mk1, mk2):
            continue
        matches = run_matching(flags, p, im1, im2)
        kept, _ = filter_matches(matches, mk1, mk2)
        write_constraint_file(p.cstr_tmp, kept)
        print("Done matching for " + p.cstr_tmp)


def phase_convert(flags: PipelineFlags, pairs):
    """Mask conversion phase: annotation masks -> ARAP masks + inpRGB copies
    (generate.py convert_rgb/convert_mask :192-216)."""
    for p in pairs:
        if not osp.exists(p.cstr_tmp):
            continue
        _ensure_dirs(p)
        mk1 = np.array(Image.open(p.msk1_org))
        if mk1.ndim == 3:
            mk1 = mk1[..., 0]
        arap_mask = np.zeros_like(mk1, dtype=np.uint8)
        arap_mask[mk1 == 0] = ARAP_BG
        save_image(p.msk1_gen, arap_mask)
        if not osp.exists(p.rgb1_gen):
            Image.open(p.rgb1_org).convert("RGB").save(p.rgb1_gen)


def phase_deform(flags: PipelineFlags, pairs, solver_cfg=None):
    """Deformation phase: constraint files + masks -> flow + warped outputs
    (generate.py arap_deform :145-190)."""
    deformer = ArapDeformer(solver_cfg or make_solver_config(flags.schedule))
    for p in pairs:
        if not (osp.exists(p.cstr_tmp) and osp.exists(p.msk1_gen)):
            continue
        cons = read_constraint_file(p.cstr_tmp)
        if len(cons) == 0:
            continue
        rgb = np.array(Image.open(p.rgb1_gen).convert("RGB"))
        arap_mask = np.array(Image.open(p.msk1_gen))
        if arap_mask.ndim == 3:
            arap_mask = arap_mask[..., 0]
        res = deformer.deform(rgb, arap_mask, cons)
        flo.flow_write(p.flow_gen, res.flow.astype(np.float32))
        save_image(p.rgb2_gen, res.warped_rgb)
        save_image(p.msk2_gen, res.warped_mask)
        print("Saved " + p.flow_gen)


def phase_bg(flags: PipelineFlags, pairs):
    """Background phase: composite one random background into frame 1 (over
    ARAP_BG pixels) and the warped frame (over uncovered pixels), emit the
    training list (bg_gen, generate.py:61-132)."""
    rng = np.random.default_rng(flags.seed)
    pool = BackgroundPool(flags.bg_dir, rng)
    lines = []
    for p in pairs:
        needed = [p.rgb1_gen, p.msk1_gen, p.rgb2_gen, p.msk2_gen, p.flow_gen]
        if not all(osp.exists(x) for x in needed):
            continue
        im1 = np.array(Image.open(p.rgb1_gen).convert("RGB"))
        mk1 = np.array(Image.open(p.msk1_gen))
        im2 = np.array(Image.open(p.rgb2_gen).convert("RGB"))
        mk2 = np.array(Image.open(p.msk2_gen))
        if mk1.ndim == 3:
            mk1 = mk1[..., 0]
        if mk2.ndim == 3:
            mk2 = mk2[..., 0]
        bg = pool.draw(im1.shape)
        if bg is not None:
            # frame 1: background where mask == ARAP_BG; frame 2: where uncovered
            save_image(p.rgb1_gen, add_bg(im1, mk1, bg, bgval=ARAP_BG))
            save_image(p.rgb2_gen, add_bg(im2, mk2, bg, bgval=0))
        lines.append("\t".join([p.rgb1_gen, p.rgb2_gen, p.flow_gen]))
    out = osp.join(flags.output, "all_files.list")
    os.makedirs(flags.output, exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(lines))
    return lines


PHASES = {
    "match": phase_match,
    "convert": phase_convert,
    "deform": phase_deform,
    "bg": phase_bg,
}


def main(argv=None):
    p = argparse.ArgumentParser(description="Phase-by-phase ARAP generation")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--bg_dir", default=None)
    p.add_argument("--fd", type=int, default=1)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--matcher", choices=["native", "binary", "file"],
                   default="native")
    p.add_argument("--dm_bin", default=None)
    p.add_argument("--schedule", choices=["parity", "fast"], default="parity")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--phases", nargs="*", default=["match", "convert", "deform", "bg"],
                   choices=list(PHASES))
    a = p.parse_args(argv)
    flags = PipelineFlags(
        input=a.input.rstrip(osp.sep), output=a.output.rstrip(osp.sep),
        bg_dir=a.bg_dir, fd=a.fd, resume=a.resume, matcher=a.matcher,
        dm_bin=a.dm_bin, schedule=a.schedule, seed=a.seed,
    )
    pairs = scan_pairs(flags)
    print(f"{len(pairs)} frame pairs")
    for name in a.phases:
        print(f"=== phase: {name} ===")
        PHASES[name](flags, pairs)


if __name__ == "__main__":
    main()
