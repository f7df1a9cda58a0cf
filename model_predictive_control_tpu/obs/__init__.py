"""Observability: metrics/JSONL logging, wall-clock timing, profiler traces,
checkpoint/resume for long batch sweeps (SURVEY.md §5 — all green-field; the
reference's only telemetry is the ``ControllerLog`` dataclass and matplotlib)."""

from .metrics import MetricsLogger, Timer, summarize_run
from .checkpoint import save_sweep_state, load_sweep_state
from .profiling import profile_trace

__all__ = [
    "MetricsLogger",
    "Timer",
    "summarize_run",
    "save_sweep_state",
    "load_sweep_state",
    "profile_trace",
]
