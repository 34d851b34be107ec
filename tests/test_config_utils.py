"""Unified config + profiling utility tests."""

import numpy as np

from arap_flow_tpu.utils.config import FrameworkConfig
from arap_flow_tpu.utils.profiling import StageTimer, save_solver_iterations


def test_config_env_overrides(monkeypatch):
    monkeypatch.setenv("ARAP_SCHEDULE", "fast")
    monkeypatch.setenv("ARAP_BACKEND", "xla")
    monkeypatch.setenv("ARAP_RASTER", "host")
    monkeypatch.setenv("ARAP_W_FIT", "50")
    cfg = FrameworkConfig.from_env()
    assert cfg.solver.pcg_iters_early == 150.0
    assert cfg.solver.backend == "xla"
    assert cfg.raster == "host"
    assert cfg.weights.w_fit == 50.0
    assert cfg.weights.w_reg == 0.01  # untouched default


def test_config_defaults():
    cfg = FrameworkConfig.from_env()
    assert cfg.solver.num_anneal == 19
    assert cfg.crop is True


def test_stage_timer_report():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert "a" in rep and "b" in rep
    assert t.counts["a"] == 2


def test_stage_timer_concurrent_accumulation():
    """The batched pipeline times stages from the main thread AND worker
    threads (prep prefetch, collect-side paste) on one shared timer; the
    read-modify-write must not drop samples under preemption."""
    import threading

    t = StageTimer()
    n_threads, n_iters = 8, 400

    def work():
        for _ in range(n_iters):
            with t.stage("shared"):
                pass

    threads = [threading.Thread(target=work) for _ in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert t.counts["shared"] == n_threads * n_iters
    assert t.totals["shared"] >= 0.0


def test_solver_iteration_csv(tmp_path):
    p = tmp_path / "iters.csv"
    save_solver_iterations(p, np.array([3.0, 1.5, 0.2]), [1.1, 2.2, 3.3])
    lines = p.read_text().splitlines()
    assert lines[0].startswith("iter,")
    assert len(lines) == 4
    assert lines[1].startswith("0,3")
