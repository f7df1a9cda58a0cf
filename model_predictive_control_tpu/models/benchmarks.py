"""Benchmark model families for the model-parametric fused tracker.

The reference's model surface is the rcracers vehicle pair (kinematic +
dynamic single-track, ``session_4/parameters.py``); those live in
``models/bicycle.py``. This module adds two classic control benchmarks in
the factory's row form (``ops/pallas/ilqr_factory.py`` — elementwise jnp
ops on component rows) to *prove the factory is model-parametric in
practice*: the same fused kernel body compiles and solves for systems with
different state/input dimensions, including ``nu = 1``:

- **cart-pole** (nx = 4, nu = 1): force-actuated cart, pole hanging down
  (θ measured from the downward vertical — the θ = 0 equilibrium is
  stable), the standard underactuated-robotics model.
- **planar quadrotor** (nx = 6, nu = 2): two-thrust planar birotor — the
  same (nx, nu) shape as the Pacejka tier but entirely different dynamics,
  with naturally *asymmetric* input bounds (thrusts ≥ 0).

Each builder is cached on its static parameter tuple so the returned
closure's identity is stable (one jit/pallas cache entry per parameter
set), mirroring ``ilqr_dyn_kernel.py::make_pacejka_ode_rows``. Vector-form
twins come from ``rowform_to_vector`` for the XLA solver path and the
integrators.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

NX_CARTPOLE, NU_CARTPOLE = 4, 1
NX_QUADROTOR, NU_QUADROTOR = 6, 2

# (mass_cart, mass_pole, pole_length, gravity)
CARTPOLE_PARAMS = (1.0, 0.1, 0.5, 9.81)
# (mass, inertia, arm_length, gravity)
QUADROTOR_PARAMS = (0.5, 0.01, 0.17, 9.81)


@functools.lru_cache(maxsize=16)
def make_cartpole_ode_rows(params: tuple = CARTPOLE_PARAMS):
    """Row-form cart-pole ODE: state (p, θ, ṗ, θ̇), input (force,).

    θ from the downward vertical:
        (mc + mp sin²θ) p̈ = u + mp sinθ (l θ̇² + g cosθ)
        l (mc + mp sin²θ) θ̈ = −u cosθ − mp l θ̇² cosθ sinθ − (mc+mp) g sinθ
    """
    mc, mp, l, g = params

    def ode_rows(xr, ur):
        _p, th, pd, thd = xr
        (u,) = ur
        s, c = jnp.sin(th), jnp.cos(th)
        den = mc + mp * s * s
        pdd = (u + mp * s * (l * thd * thd + g * c)) / den
        thdd = (-u * c - mp * l * thd * thd * c * s - (mc + mp) * g * s) / (
            l * den
        )
        return (pd, thd, pdd, thdd)

    return ode_rows


@functools.lru_cache(maxsize=16)
def make_planar_quadrotor_ode_rows(params: tuple = QUADROTOR_PARAMS):
    """Row-form planar-quadrotor ODE: state (p_x, p_z, θ, v_x, v_z, ω),
    inputs (u₁, u₂) — the two rotor thrusts (≥ 0; hover at u = m g / 2).

        v̇_x = −(u₁+u₂) sinθ / m,   v̇_z = (u₁+u₂) cosθ / m − g,
        ω̇  = (u₁−u₂) · arm / I.
    """
    m, inertia, arm, g = params

    def ode_rows(xr, ur):
        _px, _pz, th, vx, vz, om = xr
        u1, u2 = ur
        s, c = jnp.sin(th), jnp.cos(th)
        thrust = u1 + u2
        return (
            vx,
            vz,
            om,
            -thrust * s / m,
            thrust * c / m - g,
            (u1 - u2) * arm / inertia,
        )

    return ode_rows
