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

Round 5 adds two wide-input families certifying the unrolled-Cholesky Quu
path (the reference's CasADi layer imposes no input-width limit,
``session_4/main.py:41-113``):

- **omnidirectional base** (nx = 6, **nu = 3**): body-frame thrusters on a
  planar holonomic robot — heading rotates the force map, so B is dense in
  θ and the 3×3 Quu picks up cross terms through Vxx.
- **thrust cluster** (nx = 6, **nu = 4**): a 3-D point mass driven by four
  fixed-direction thrusters in a pyramid + quadratic drag — REDUNDANT
  actuation, so the 4×4 Quu is dense and only positive definite through
  the R regularization; exactly the structure the closed-form nu ≤ 2
  inverses cannot express.

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
NX_OMNIBASE, NU_OMNIBASE = 6, 3
NX_THRUSTER, NU_THRUSTER = 6, 4

# (mass_cart, mass_pole, pole_length, gravity)
CARTPOLE_PARAMS = (1.0, 0.1, 0.5, 9.81)
# (mass, inertia, arm_length, gravity)
QUADROTOR_PARAMS = (0.5, 0.01, 0.17, 9.81)
# (mass, inertia, linear_drag, angular_drag)
OMNIBASE_PARAMS = (8.0, 0.4, 0.6, 0.15)
# (mass, gravity, linear_drag, quadratic_drag, cone_half_angle)
THRUSTER_PARAMS = (1.2, 9.81, 0.05, 0.08, 0.35)


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


@functools.lru_cache(maxsize=16)
def make_omnibase_ode_rows(params: tuple = OMNIBASE_PARAMS):
    """Row-form omnidirectional-base ODE (nu = 3): state
    (p_x, p_y, θ, v_x, v_y, ω), inputs (f_fwd, f_lat, τ) — BODY-frame drive
    forces plus a yaw torque, with linear drag:

        v̇_x = (f_fwd cosθ − f_lat sinθ)/m − c_v v_x
        v̇_y = (f_fwd sinθ + f_lat cosθ)/m − c_v v_y
        ω̇  = τ/I − c_ω ω

    The heading-rotated force map makes B dense in θ, so the 3×3 Quu is
    dense through the Vxx feedback term — the certification target for the
    factory's unrolled-Cholesky Quu solve at nu = 3.
    """
    m, inertia, c_v, c_w = params

    def ode_rows(xr, ur):
        _px, _py, th, vx, vy, om = xr
        ff, fl, tq = ur
        s, c = jnp.sin(th), jnp.cos(th)
        return (
            vx,
            vy,
            om,
            (ff * c - fl * s) / m - c_v * vx,
            (ff * s + fl * c) / m - c_v * vy,
            tq / inertia - c_w * om,
        )

    return ode_rows


@functools.lru_cache(maxsize=16)
def make_omnibase_param_ode_rows(params: tuple = OMNIBASE_PARAMS):
    """Omnibase ODE in the factory's PER-SCENARIO-parameter form: the mass
    arrives as ``pr = (m,)`` — one (1, T) row per scenario lane — instead of
    a compile-time constant (``fused_tracker_solve(..., params=...,
    n_params=1)``). Exercises the reference's model-mismatch axis
    (``session4_sol.py:410-411`` perturbs the plant per experiment) inside
    ONE kernel executable."""
    _, inertia, c_v, c_w = params

    def ode_rows(xr, ur, pr):
        _px, _py, th, vx, vy, om = xr
        ff, fl, tq = ur
        (m,) = pr
        s, c = jnp.sin(th), jnp.cos(th)
        return (
            vx,
            vy,
            om,
            (ff * c - fl * s) / m - c_v * vx,
            (ff * s + fl * c) / m - c_v * vy,
            tq / inertia - c_w * om,
        )

    return ode_rows


@functools.lru_cache(maxsize=16)
def make_thruster_ode_rows(params: tuple = THRUSTER_PARAMS):
    """Row-form thrust-cluster ODE (nu = 4): a 3-D point mass with four
    fixed thrusters in a pyramid around +z (half-angle ``cone``), each
    u_i ≥ 0, plus linear + quadratic drag. State (p_x, p_y, p_z, v_x, v_y,
    v_z):

        v̇ = Σᵢ uᵢ dᵢ / m − g e_z − c₁ v − c₂ ‖v‖ v

    The four thrust directions span R³ REDUNDANTLY (rank 3 < nu = 4), so
    B ᵀ Vxx B is rank-deficient and the 4×4 Quu is positive definite only
    through the R term — the stress case for the nu > 2 Cholesky path.
    """
    m, g, c1, c2, cone = params
    import math

    sa, ca = math.sin(cone), math.cos(cone)
    # pyramid: tilt by `cone` toward +x, +y, -x, -y
    dirs = (
        (sa, 0.0, ca),
        (0.0, sa, ca),
        (-sa, 0.0, ca),
        (0.0, -sa, ca),
    )

    def ode_rows(xr, ur):
        _px, _py, _pz, vx, vy, vz = xr
        sp = jnp.sqrt(vx * vx + vy * vy + vz * vz + 1e-9)
        fx = sum(ur[i] * dirs[i][0] for i in range(4)) / m
        fy = sum(ur[i] * dirs[i][1] for i in range(4)) / m
        fz = sum(ur[i] * dirs[i][2] for i in range(4)) / m
        return (
            vx,
            vy,
            vz,
            fx - c1 * vx - c2 * sp * vx,
            fy - c1 * vy - c2 * sp * vy,
            fz - g - c1 * vz - c2 * sp * vz,
        )

    return ode_rows
