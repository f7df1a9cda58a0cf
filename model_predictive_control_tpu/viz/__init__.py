"""Visualization layer (L8): the reference's plot set (``session_4/plotting.py``)
and a headless matplotlib substitute for its pyglet animation
(``session_4/animation.py``). Off the perf path by design."""

from .plots import (
    plot_input_sequence,
    plot_state_trajectory,
    plot_states_separately,
    plot_phase_trajectory,
    plot_cost_to_go_comparison,
    plot_integration_error,
    plot_relative_error,
    plot_cover_circles,
)
from .animation import ParkingAnimator, animate_parking

__all__ = [
    "plot_input_sequence",
    "plot_state_trajectory",
    "plot_states_separately",
    "plot_phase_trajectory",
    "plot_cost_to_go_comparison",
    "plot_integration_error",
    "plot_relative_error",
    "plot_cover_circles",
    "ParkingAnimator",
    "animate_parking",
]
