"""Integrator order checks — the formalized version of the reference's
``compare_open_loop`` error sweep (``session4_sol.py:65-104``, SURVEY.md §4)."""

import pytest

pytestmark = pytest.mark.smoke  # fast representative tier
import jax.numpy as jnp
import numpy as np

from model_predictive_control_tpu import (
    KinematicBicycle,
    VehicleParameters,
    euler,
    heun,
    rk4,
    rk4_fine,
    rollout,
)


def make_controls(steps, ts):
    """Test policy from session4_sol.py:59-63: constant drive, sinusoid steer."""
    t = np.arange(steps)
    return jnp.stack(
        [jnp.ones(steps), 0.1 * jnp.sin(jnp.asarray(t, dtype=jnp.float64))], axis=1
    )


def final_state(integrator_factory, ts, steps, substeps=None):
    ode = KinematicBicycle(VehicleParameters())
    if substeps is None:
        dyn = integrator_factory(ode, ts)
    else:
        dyn = integrator_factory(ode, ts, substeps)
    controls = make_controls(steps, ts)
    x0 = jnp.zeros(4, dtype=jnp.float64)
    return np.asarray(rollout(x0, dyn, controls)[-1])


def test_convergence_orders():
    """Halving ts should cut Euler error ~2x and RK4 error ~16x (global orders)."""
    T = 1.0  # total time fixed
    ref = final_state(rk4_fine, 0.05, 20, substeps=64)

    errs = {}
    for name, factory in (("euler", euler), ("heun", heun), ("rk4", rk4)):
        e = []
        for ts, steps in ((0.1, 10), (0.05, 20)):
            # Controls differ per-step; use constant steer to isolate integration.
            ode = KinematicBicycle(VehicleParameters())
            dyn = factory(ode, ts)
            u = jnp.tile(jnp.array([1.0, 0.2], dtype=jnp.float64), (steps, 1))
            uref = jnp.tile(jnp.array([1.0, 0.2], dtype=jnp.float64), (1, 1))
            fine = rk4_fine(ode, T, substeps=4096)
            x_ref = rollout(jnp.zeros(4, dtype=jnp.float64), fine, uref)[-1]
            x = rollout(jnp.zeros(4, dtype=jnp.float64), dyn, u)[-1]
            e.append(float(jnp.linalg.norm(x - x_ref)))
        errs[name] = e

    assert errs["euler"][1] < errs["euler"][0]
    ratio_euler = errs["euler"][0] / errs["euler"][1]
    ratio_rk4 = errs["rk4"][0] / errs["rk4"][1]
    assert 1.5 < ratio_euler < 3.0  # order 1
    assert ratio_rk4 > 10.0  # order 4
    # accuracy ladder at fixed ts
    assert errs["rk4"][0] < errs["heun"][0] < errs["euler"][0]


def test_rk4_fine_is_odeint_grade():
    """rk4_fine(16) vs rk4_fine(128): discrepancy far below the 1e-4 gate."""
    a = final_state(rk4_fine, 0.08, 50, substeps=16)
    b = final_state(rk4_fine, 0.08, 50, substeps=128)
    assert np.max(np.abs(a - b)) < 1e-10


def test_bicycle_dynamics_sanity():
    """Straight driving: heading stays 0, velocity saturates at accel/friction."""
    p = VehicleParameters()
    ode = KinematicBicycle(p)
    dyn = rk4_fine(ode, 0.1, substeps=8)
    u = jnp.tile(jnp.array([1.0, 0.0], dtype=jnp.float64), (100, 1))
    xs = rollout(jnp.zeros(4, dtype=jnp.float64), dyn, u)
    assert abs(float(xs[-1, 1])) < 1e-12  # no lateral drift
    assert abs(float(xs[-1, 2])) < 1e-12  # no heading change
    v_ss = p.acceleration * 1.0 / p.friction
    assert abs(float(xs[-1, 3]) - v_ss) < 1e-3  # terminal velocity
