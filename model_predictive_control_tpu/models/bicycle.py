"""Kinematic bicycle model for the parking problem (session 4).

The reference outsources this model to the course-provided (gitignored, unavailable)
``rcracers.simulator.dynamics.KinematicBicycle`` — used symbolically at
``session_4/main.py:250-251`` and numerically at ``session_4/session4_sol.py:191``.
From the reference's usage we know the contract exactly:

- state ``x = (p_x, p_y, ψ, v)`` — pose slice ``x[:3]`` drives the car sprite
  (``session_4/animation.py:48``), plot labels call column 2 "Angle" and column 3
  "Velocity" (``session_4/plotting.py:89-96``);
- input ``u = (a, δ)`` with drive ``a ∈ [min_drive, max_drive]`` and steering
  ``δ ∈ [-max_steer, max_steer]`` (``session_4/main.py:68-69``);
- the "kinematic approximation" parameters ``friction`` and ``acceleration``
  (``session_4/parameters.py:46-48``) shape the longitudinal dynamics — exercise 4
  perturbs ``friction`` to create plant mismatch (``session4_sol.py:410-411``).

We therefore implement the standard rear/front-axle kinematic bicycle with
center-of-gravity side-slip, plus a first-order longitudinal model:

    β  = atan( l_r · tan δ / (l_f + l_r) )
    ṗx = v · cos(ψ + β)
    ṗy = v · sin(ψ + β)
    ψ̇  = v · sin β / l_r
    v̇  = acceleration · a − friction · v

This is a *reconstruction*, not a copy: the golden-trajectory oracle in
``model_predictive_control_tpu.oracle`` uses the same equations in float64 numpy, so
accuracy gates are internally consistent.

The model is a plain pure function of ``(params, x, u)`` so it jits, vmaps over
scenario/parameter batches, and differentiates (``jax.jacfwd`` for SQP sensitivities)
with no special casing.
"""

from __future__ import annotations

import jax.numpy as jnp

from .parameters import VehicleParameters

NX = 4  # (p_x, p_y, psi, v)
NU = 2  # (drive a, steer delta)


def kinematic_bicycle_ode(
    params: VehicleParameters, x: jnp.ndarray, u: jnp.ndarray
) -> jnp.ndarray:
    """Continuous-time dynamics ``f(x, u) -> ẋ`` for the kinematic bicycle.

    Works on unbatched ``(4,)`` states; batch with ``jax.vmap``.
    """
    psi = x[..., 2]
    v = x[..., 3]
    a = u[..., 0]
    delta = u[..., 1]

    lf = params.axis_front
    lr = params.axis_rear
    beta = jnp.arctan(lr * jnp.tan(delta) / (lf + lr))

    px_dot = v * jnp.cos(psi + beta)
    py_dot = v * jnp.sin(psi + beta)
    psi_dot = v * jnp.sin(beta) / lr
    v_dot = params.acceleration * a - params.friction * v

    return jnp.stack([px_dot, py_dot, psi_dot, v_dot], axis=-1)


class KinematicBicycle:
    """Callable ODE ``f(x, u) -> ẋ`` bound to a parameter set.

    Mirrors the construction pattern ``KinematicBicycle(params)`` at
    ``session_4/session4_sol.py:191`` (the reference's ``symbolic=True`` flag is
    unnecessary here — JAX traces numerics and symbolics identically).
    """

    def __init__(self, params: VehicleParameters | None = None):
        self.params = params if params is not None else VehicleParameters()

    def __call__(self, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        return kinematic_bicycle_ode(self.params, x, u)
