"""Vehicle parameters for the kinematic-bicycle parking problem.

Pytree re-design of the reference dataclass ``session_4/parameters.py:4-54``.
All physical fields are pytree leaves (float scalars / 0-d arrays) so parameter
perturbations batch with ``vmap`` — the BASELINE pod-scale config sweeps
"parameter perturbations of the session_4 plant", which here is literally a
``VehicleParameters`` whose leaves carry a scenario axis.
"""

from __future__ import annotations

import math

from ..utils.pytree import pytree_dataclass

_TWO_PI = 2.0 * math.pi


@pytree_dataclass
class VehicleParameters:
    """Miniature race-car parameters (values from ``session_4/parameters.py``)."""

    # geometry (meters)
    length: float = 0.17
    axis_front: float = 0.047
    axis_rear: float = 0.05
    front: float = 0.08
    rear: float = 0.08
    width: float = 0.08
    height: float = 0.055
    mass: float = 0.1735
    inertia: float = 18.3e-5

    # input limits
    max_steer: float = 0.384
    max_drive: float = 1.0
    min_drive: float = -1.0

    # state limits
    min_pos_x: float = -3.0
    max_pos_x: float = 3.0
    min_pos_y: float = -2.0
    max_pos_y: float = 2.0
    min_vel: float = -0.5
    max_vel: float = 0.5
    max_heading: float = _TWO_PI
    min_heading: float = -_TWO_PI

    # Pacejka 'Magic Formula' tire parameters (front / rear)
    bf: float = 3.1355
    cf: float = 2.1767
    df: float = 0.4399
    br: float = 2.8919
    cr: float = 2.4431
    dr: float = 0.6236

    # kinematic approximation
    friction: float = 1.0
    acceleration: float = 2.0

    # motor parameters
    cm1: float = 0.3697
    cm2: float = 0.001295
    cr1: float = 0.1629
    cr2: float = 0.02133
