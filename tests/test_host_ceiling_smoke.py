"""Smoke-pin for scripts/host_ceiling.py: its device stubs monkeypatch
production functions BY NAME (solve_and_raster_canvas/_solve_and_raster/
match_images_dispatch*/match_images_fetch), so a rename or signature change
in models/arap.py / ops/matching.py / pipeline/batch.py would break the
host-ceiling measurement silently. Runs the single-process mode on 2 pairs
in a subprocess (the stubs patch modules globally — isolating them from
this pytest process) and checks the JSON result."""

import json
import os
import os.path as osp
import subprocess
import sys


def test_host_ceiling_single_process_smoke():
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        [sys.executable, osp.join(repo, "scripts", "host_ceiling.py"), "2"],
        env=env, capture_output=True, text=True, timeout=600, cwd=repo,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    last = [ln for ln in res.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    d = json.loads(last)
    assert d["n_pairs"] == 2
    assert d["host_ceiling_pairs_per_s"] > 0
    assert len(d["runs_s"]) == 2
