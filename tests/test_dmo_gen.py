"""DMO-style generation: textured frames over moving masks must yield valid
flow via the standard pipeline."""

import os
import os.path as osp

import numpy as np
from PIL import Image

from arap_flow_tpu.io import flo
from arap_flow_tpu.pipeline.dmo_gen import assemble, main as dmo_main
from arap_flow_tpu.pipeline.para_gen import PipelineFlags, main_pipeline

from test_pipeline import CFG

H, W = 64, 80
DX, DY = 3, 2


def _make_masks(root, n_frames=3):
    os.makedirs(osp.join(root, "orgMasks", "seq0"), exist_ok=True)
    for t in range(n_frames):
        m = np.zeros((H, W), np.uint8)
        y0, x0 = 14 + DY * t, 10 + DX * t
        m[y0 : y0 + 28, x0 : x0 + 32] = 1
        Image.fromarray(m).save(osp.join(root, "orgMasks", "seq0", f"{t:05d}.png"))


def test_dmo_assemble_and_flow(tmp_path):
    masks = str(tmp_path / "masks")
    out = str(tmp_path / "out")
    _make_masks(masks)
    troot = assemble(masks, out, seed=3)
    # textured frames exist, masks symlinked
    assert osp.exists(osp.join(troot, "orgRGB", "seq0", "00000.jpg"))
    assert osp.exists(osp.join(troot, "orgMasks", "seq0", "00000.png"))
    # the object texture must move with the mask: run the pipeline and check
    flags = PipelineFlags(input=troot, output=osp.join(out, "fd1"), fd=1, seed=0)
    triples = main_pipeline(flags, solver_cfg=CFG)
    assert len(triples) == 2
    u, v = flo.flow_read(osp.join(out, "fd1", "Flow", "seq0", "00000.flo"))
    m = np.array(Image.open(osp.join(masks, "orgMasks", "seq0", "00000.png")))
    obj = m == 1
    assert abs(np.median(u[obj]) - DX) < 0.6
    assert abs(np.median(v[obj]) - DY) < 0.6
