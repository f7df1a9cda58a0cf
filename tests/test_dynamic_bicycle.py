"""Dynamic (Pacejka) bicycle model — completes the reference's parameter surface.

The reference carries Magic-Formula / motor constants in ``session_4/parameters.py``
without using them; this tier makes them live. Oracle-free physics sanity checks.
"""

import pytest

pytestmark = pytest.mark.smoke  # fast representative tier
import jax
import jax.numpy as jnp
import numpy as np

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.models.bicycle import (
    NX_DYNAMIC,
    DynamicBicycle,
    dynamic_bicycle_ode,
)


def _params():
    return mpc.VehicleParameters()


class TestDynamicBicycle:
    def test_shapes_and_jit(self):
        f = jax.jit(lambda x, u: dynamic_bicycle_ode(_params(), x, u))
        x = jnp.asarray([0.0, 0.0, 0.1, 0.3, 0.0, 0.0])
        u = jnp.asarray([0.5, 0.05])
        dx = f(x, u)
        assert dx.shape == (NX_DYNAMIC,)
        assert bool(jnp.all(jnp.isfinite(dx)))

    def test_straight_line_accelerates_and_coasts_down(self):
        p = _params()
        x = jnp.asarray([0.0, 0.0, 0.0, 0.2, 0.0, 0.0])
        dx_drive = dynamic_bicycle_ode(p, x, jnp.asarray([1.0, 0.0]))
        dx_coast = dynamic_bicycle_ode(p, x, jnp.asarray([0.0, 0.0]))
        assert float(dx_drive[3]) > 0.0  # motor force beats drag at low speed
        assert float(dx_coast[3]) < 0.0  # rolling resistance decelerates
        # no lateral/yaw response when driving straight
        np.testing.assert_allclose(dx_drive[4:], 0.0, atol=1e-12)

    def test_steer_sign_yields_yaw(self):
        p = _params()
        x = jnp.asarray([0.0, 0.0, 0.0, 0.4, 0.0, 0.0])
        dx = dynamic_bicycle_ode(p, x, jnp.asarray([0.2, 0.3]))
        assert float(dx[5]) > 0.0  # left steer → positive yaw acceleration
        dx_r = dynamic_bicycle_ode(p, x, jnp.asarray([0.2, -0.3]))
        assert float(dx_r[5]) < 0.0

    def test_reverse_rolling_resistance_sign(self):
        p = _params()
        x_rev = jnp.asarray([0.0, 0.0, 0.0, -0.2, 0.0, 0.0])
        dx = dynamic_bicycle_ode(p, x_rev, jnp.asarray([0.0, 0.0]))
        assert float(dx[3]) > 0.0  # drag opposes motion in reverse too
        # straight-line reverse must not conjure phantom lateral/yaw forces
        # (an atan2-based slip angle jumps by pi at vx < 0; regression guard)
        np.testing.assert_allclose(dx[4:], 0.0, atol=1e-12)

    def test_closed_loop_rollout_finite(self):
        p = _params()
        F = mpc.rk4(DynamicBicycle(p), 0.02)
        # stay in the model's valid regime: enough drive to beat rolling
        # resistance (cr1 ≈ 0.163 N ≈ full motor force at a ≈ 0.45), moderate
        # steer — below walking pace the slip-angle model is singular by design.
        res = mpc.simulate(
            jnp.asarray([0.0, 0.0, 0.0, 0.3, 0.0, 0.0]),
            F,
            steps=200,
            policy=mpc.policy_from_law(
                lambda x, t: jnp.asarray([1.0, 0.1 * jnp.sin(0.05 * t)])
            ),
        )
        assert bool(jnp.all(jnp.isfinite(res.states)))
        assert not bool(res.unstable)
        # the car actually went somewhere
        assert float(jnp.linalg.norm(res.states[-1, :2])) > 0.1

    def test_vmap_over_parameter_perturbations(self):
        from model_predictive_control_tpu.utils.pytree import replace

        base = _params()
        key = jax.random.PRNGKey(0)
        params = jax.vmap(lambda s: replace(base, dr=base.dr * s))(
            1.0 + 0.05 * jax.random.normal(key, (8,))
        )
        x = jnp.asarray([0.0, 0.0, 0.0, 0.4, 0.02, 0.1])
        u = jnp.asarray([0.3, 0.1])
        dxs = jax.vmap(lambda pp: dynamic_bicycle_ode(pp, x, u))(params)
        assert dxs.shape == (8, NX_DYNAMIC)
        # rear tire peak force scales the yaw moment → distinct outputs
        assert float(jnp.std(dxs[:, 5])) > 0.0
