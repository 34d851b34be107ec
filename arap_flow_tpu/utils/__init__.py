"""Utilities: profiling/observability (the reference's cudaEvent timers and
SolverIteration CSV dumps, SURVEY.md §5) and framework configuration."""

from .profiling import StageTimer, save_solver_iterations, profile_solve, device_trace  # noqa: F401
