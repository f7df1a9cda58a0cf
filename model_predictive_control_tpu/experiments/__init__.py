"""Experiment drivers (L7): the reference's ``main()`` / ``exerciseN()`` scripts
(``session_1/FHC.py:134-151``, ``session4_sol.py:326-496``) rebuilt as importable,
jit-friendly functions returning structured results, with plotting and metrics as
optional side effects. Entry point: ``python -m model_predictive_control_tpu.cli``."""

from .session1 import horizon_sweep, cost_to_go_comparison
from .session23 import closed_loop_linear_mpc
from .session4 import (
    integrator_accuracy,
    open_loop_parking,
    mismatch_open_loop,
    closed_loop_parking,
    relative_error,
)

__all__ = [
    "horizon_sweep",
    "cost_to_go_comparison",
    "closed_loop_linear_mpc",
    "integrator_accuracy",
    "open_loop_parking",
    "mismatch_open_loop",
    "closed_loop_parking",
    "relative_error",
]
