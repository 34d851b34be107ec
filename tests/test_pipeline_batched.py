"""Batched pipeline mode must produce the same products as simple mode."""

import os.path as osp

import numpy as np
from PIL import Image

from arap_flow_tpu.io import flo
from arap_flow_tpu.pipeline.para_gen import PipelineFlags, main_pipeline

from test_pipeline import _make_dataset, CFG, DX, DY


def test_batched_matches_simple(tmp_path):
    inp = str(tmp_path / "data")
    _make_dataset(inp, two_objects=True)

    out_s = str(tmp_path / "out_simple")
    out_b = str(tmp_path / "out_batched")
    cfg = CFG._replace(backend="xla")  # CPU test: force non-pallas
    main_pipeline(
        PipelineFlags(input=inp, output=out_s, fd=1, multseg=True, seed=0),
        solver_cfg=cfg,
    )
    main_pipeline(
        PipelineFlags(input=inp, output=out_b, fd=1, multseg=True, seed=0,
                      mode="batched"),
        solver_cfg=cfg,
    )
    lst_s = open(osp.join(out_s, "all_files.list")).read().splitlines()
    lst_b = open(osp.join(out_b, "all_files.list")).read().splitlines()
    assert len(lst_s) == len(lst_b) == 2

    us, vs = flo.flow_read(osp.join(out_s, "Flow", "seq0", "00000.flo"))
    ub, vb = flo.flow_read(osp.join(out_b, "Flow", "seq0", "00000.flo"))
    mask = np.array(Image.open(osp.join(inp, "orgMasks", "seq0", "00000.png")))
    # flows agree on the object regions (bucketed crop solves are exact up to
    # reduction-order float noise; CG transients differ at weakly constrained
    # pixels so compare medians + bulk agreement)
    for seg in (1, 2):
        sel = mask == seg
        assert abs(np.median(us[sel]) - np.median(ub[sel])) < 0.05
        assert np.median(np.abs(us[sel] - ub[sel])) < 0.05
    wm_s = np.array(Image.open(osp.join(out_s, "wMasks", "seq0", "00000.png")))
    wm_b = np.array(Image.open(osp.join(out_b, "wMasks", "seq0", "00000.png")))
    assert ((wm_s > 0) == (wm_b > 0)).mean() > 0.98
