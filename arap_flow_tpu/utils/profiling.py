"""Profiling and solver-quality instrumentation.

Reference counterparts:
- per-kernel cudaEvent timing + name-grouped aggregation (util.t:412-513) →
  StageTimer wall-clock stages + jax.profiler device traces;
- per-iteration cost capture `launchProfiledSolve` (OptUtils.h:47-64) →
  ops.solver.solve_instrumented (device-side, zero extra launches);
- CSV dumps `saveSolverResults` (SolverIteration.h:28-65) →
  save_solver_iterations.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict

import numpy as np


class StageTimer:
    """Accumulating wall-clock stage timer with grouped reporting.

    Thread-safe accumulation: the batched pipeline runs stages concurrently
    from the main thread and worker threads (prep prefetch, collect-side
    paste workers), so the read-modify-write on the shared dicts takes a
    lock — without it a preemption between read and `+=` drops samples.

    NOTE on reading totals: concurrent stages OVERLAP in wall time — e.g.
    'host paste' runs in a collect worker while the main thread sits in
    'D2H fetch' — so stage totals can sum past the run's wall-clock, and a
    blocking stage silently absorbs the time of work overlapped under it.
    Totals are per-stage CPU-occupancy, not a wall-time decomposition."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            with self._lock:
                self.totals[name] += dt
                self.counts[name] += 1

    def report(self) -> str:
        lines = ["stage                      total_s   calls   mean_ms"]
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:25s} {t:8.3f} {c:7d} {1000*t/c:9.2f}")
        return "\n".join(lines)


def save_solver_iterations(path, costs, times_ms=None, name="gaussNewtonGPU"):
    """CSV of per-GN-iteration cost (and optional time), format in the spirit
    of SolverIteration.h:28-65: header then `iter,cost,time_ms` rows."""
    costs = np.asarray(costs)
    with open(path, "w") as f:
        f.write(f"iter,{name}_cost,{name}_time_ms\n")
        for i, c in enumerate(costs):
            t = "" if times_ms is None else f"{times_ms[i]:.4f}"
            f.write(f"{i},{c:.8g},{t}\n")


def profile_solve(ops, cfg):
    """Run an instrumented solve; returns (x, flow, costs, wall_seconds).

    Device-side cost capture per GN iteration — the launchProfiledSolve
    analogue without per-step host round-trips."""
    from ..ops.solver import solve_instrumented

    t0 = time.time()
    x, flow, costs = solve_instrumented(ops, cfg)
    costs = np.asarray(costs)  # forces sync
    return x, flow, costs, time.time() - t0


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (TensorBoard-viewable) — the replacement for
    the Opt per-kernel timing report (collectPerKernelTimingInfo)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
