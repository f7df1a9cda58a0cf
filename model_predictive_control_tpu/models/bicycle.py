"""Bicycle models for the parking problem (session 4): kinematic + dynamic tiers.

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


import functools as _functools


@_functools.lru_cache(maxsize=16)
def make_kinematic_ode_rows(kb: float, lr: float, acc: float, fric: float):
    """Row-form kinematic-bicycle ODE with STATIC parameters, for the fused
    factory kernels (``kb = l_r/(l_f+l_r)``; β via sinβ = kb·tanδ/√(1+kb²tan²δ)
    — no ``atan`` needed). Same math as :func:`kinematic_bicycle_ode`;
    cached on the parameter tuple so the closure is a stable jit key."""

    def ode_rows(xr, ur):
        _px, _py, psi, v = xr
        a, dl = ur
        t = jnp.tan(dl)
        den = jnp.sqrt(1.0 + (kb * kb) * t * t)
        sinb = kb * t / den
        cosb = 1.0 / den
        sp, cp = jnp.sin(psi), jnp.cos(psi)
        return (
            v * (cp * cosb - sp * sinb),
            v * (sp * cosb + cp * sinb),
            v * sinb / lr,
            acc * a - fric * v,
        )

    return ode_rows


NX_DYNAMIC = 6  # (p_x, p_y, psi, v_x, v_y, omega)


def dynamic_bicycle_ode(
    params: VehicleParameters, x: jnp.ndarray, u: jnp.ndarray
) -> jnp.ndarray:
    """Dynamic single-track (Pacejka) bicycle ``f(x, u) -> ẋ``.

    The reference's parameter set carries full Magic-Formula tire coefficients
    (``bf/cf/df``, ``br/cr/dr``) and motor constants (``cm1/cm2/cr1/cr2``) at
    ``session_4/parameters.py:24-43`` even though its exercises only drive the
    kinematic approximation — the course simulator's dynamic tier. This model
    completes that parameter surface with the standard miniature-race-car dynamic
    bicycle (Pacejka lateral forces, duty-cycle motor longitudinal force):

        α_f = δ − atan((ω l_f + v_y) / v_x)      (front slip angle)
        α_r =     atan((ω l_r − v_y) / v_x)      (rear slip angle)
        F_f = d_f sin(c_f atan(b_f α_f)),  F_r = d_r sin(c_r atan(b_r α_r))
        F_x = (cm1 − cm2 v_x) a − cr2 v_x |v_x| − cr1 tanh(v_x / 0.01)

        ṗx = v_x cos ψ − v_y sin ψ,   ṗy = v_x sin ψ + v_y cos ψ,   ψ̇ = ω
        v̇x = (F_x − F_f sin δ) / m + v_y ω
        v̇y = (F_r + F_f cos δ) / m − v_x ω
        ω̇  = (F_f l_f cos δ − F_r l_r) / I_z

    The slip angles use a plain ``atan`` of the velocity ratio (NOT ``atan2``):
    ``atan2`` jumps by π the moment ``v_x`` goes negative and conjures enormous
    phantom tire forces (measured ω̇ ≈ 77 rad/s² in straight-line reverse), while
    the ratio form stays continuous and zeroes the lateral forces when the lateral
    velocities are zero. Drag is ``v_x |v_x|`` so it opposes motion in either
    direction. The Pacejka single-track model is still a *forward-driving* model:
    its validity degrades below walking pace and in sustained reverse — use
    :func:`kinematic_bicycle_ode` for parking-speed and reverse maneuvers.
    ``v_x`` is clamped away from 0 (±0.01, forward-biased at exactly 0) to keep
    the ratio finite. State ``(p_x, p_y, ψ, v_x, v_y, ω)``, input ``(a, δ)`` with
    the same limits as the kinematic tier.
    """
    psi = x[..., 2]
    vx = x[..., 3]
    vy = x[..., 4]
    omega = x[..., 5]
    a = u[..., 0]
    delta = u[..., 1]

    lf = params.axis_front
    lr = params.axis_rear
    m = params.mass
    iz = params.inertia

    eps = 1e-2
    vx_safe = jnp.where(vx >= 0, jnp.maximum(vx, eps), jnp.minimum(vx, -eps))
    alpha_f = delta - jnp.arctan((omega * lf + vy) / vx_safe)
    alpha_r = jnp.arctan((omega * lr - vy) / vx_safe)
    F_f = params.df * jnp.sin(params.cf * jnp.arctan(params.bf * alpha_f))
    F_r = params.dr * jnp.sin(params.cr * jnp.arctan(params.br * alpha_r))
    F_x = (
        (params.cm1 - params.cm2 * vx) * a
        - params.cr2 * vx * jnp.abs(vx)
        - params.cr1 * jnp.tanh(vx / 0.01)
    )

    px_dot = vx * jnp.cos(psi) - vy * jnp.sin(psi)
    py_dot = vx * jnp.sin(psi) + vy * jnp.cos(psi)
    vx_dot = (F_x - F_f * jnp.sin(delta)) / m + vy * omega
    vy_dot = (F_r + F_f * jnp.cos(delta)) / m - vx * omega
    omega_dot = (F_f * lf * jnp.cos(delta) - F_r * lr) / iz

    return jnp.stack(
        [px_dot, py_dot, omega, vx_dot, vy_dot, omega_dot], axis=-1
    )


class DynamicBicycle:
    """Callable Pacejka single-track ODE bound to a parameter set."""

    def __init__(self, params: VehicleParameters | None = None):
        self.params = params if params is not None else VehicleParameters()

    def __call__(self, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        return dynamic_bicycle_ode(self.params, x, u)


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
