"""arap_deform equivalent: ARAP-deform frames and emit flow + warped outputs.

CLI parity with ARAP/deformation/src/main.cpp:162-241:

    # single frame (6 paths)
    python -m arap_flow_tpu.pipeline.deform_tool RGB MASK CSTR FLOW WRGB WMASK
    # list file of 6-path lines
    python -m arap_flow_tpu.pipeline.deform_tool LISTFILE

The reference resolves an Opt plan file via $ARAP_PLAN (main.cpp:206-213); this
framework has no plan file — the energy is compiled in (ops/energy.py). The
solver schedule (numIter=19, nonLinearIter=8, linearIter=400, main.cpp:215-221)
is the default; --schedule fast enables the PCG ζ early exit.

Like the reference's list mode, frames of identical size share one compiled
program (jit shape cache ≙ plan reuse, CombinedSolver.h:149-160).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass

from ..io import flo
from ..io.constraints import read_constraint_file
from ..io.image import load_mask, load_rgb, save_image
from ..models.arap import ArapDeformer
from ..ops.solver import SolverConfig


@dataclass
class FramePaths:
    rgb: str
    mask: str
    cstr: str
    out_flo: str
    out_rgb: str
    out_mask: str


def parse_list_file(path) -> list[FramePaths]:
    frames = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 6:
                frames.append(FramePaths(*parts[:6]))
    return frames


def deform_frames(frames: list[FramePaths], cfg: SolverConfig) -> None:
    deformer = ArapDeformer(cfg)
    for fr in frames:
        rgb = load_rgb(fr.rgb)
        mask = load_mask(fr.mask)
        cons = read_constraint_file(fr.cstr)
        res = deformer.deform(rgb, mask, cons)
        flo.flow_write(fr.out_flo, res.flow)
        save_image(fr.out_rgb, res.warped_rgb)
        save_image(fr.out_mask, res.warped_mask)
        print("Saved")


def make_config(schedule: str) -> SolverConfig:
    if schedule == "parity":
        return SolverConfig()
    return SolverConfig(q_tolerance=1e-4)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="ARAP-deform frames: constraints + mask -> flow + warped outputs."
    )
    p.add_argument("paths", nargs="+",
                   help="either 6 paths (RGB Mask Cstr Flow wRGB wMask) or one list file")
    p.add_argument("--schedule", choices=["parity", "fast"], default="parity")
    a = p.parse_args(argv)

    if len(a.paths) == 6:
        frames = [FramePaths(*a.paths)]
    elif len(a.paths) == 1:
        frames = parse_list_file(a.paths[0])
    else:
        p.error("expected 6 paths or a single list file")
    if not frames:
        p.error("no frames to process")
    deform_frames(frames, make_config(a.schedule))


if __name__ == "__main__":
    main()
