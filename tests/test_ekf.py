"""Extended Kalman filter tier.

Gates:
- on a LINEAR system the EKF is algebraically the time-varying KF (jacfwd of a
  linear map is exact), so `ekf_trajectory` must match
  `kalman_filter_trajectory` to float64 tolerance — this pins the whole EKF
  recursion at once;
- on the kinematic bicycle with position+heading measurements, the EKF
  estimate beats the raw measurements (velocity is reconstructed, not
  measured) and the error covariance stays bounded;
- nonlinear output feedback: the parking controller driven by EKF estimates
  from noisy partial measurements still parks the car.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu import estimation as est


def _noisy_double_integrator(dtype=jnp.float64):
    system = mpc.double_integrator_discrete(0.3)
    system = mpc.LinearSystem(
        A=jnp.asarray(system.A, dtype),
        B=jnp.asarray(system.B, dtype),
        C=jnp.asarray([[1.0, 0.0]], dtype),
    )
    Qw = jnp.asarray([[2e-3, 0.0], [0.0, 5e-3]], dtype)
    Rv = jnp.asarray([[4e-2]], dtype)
    return system, Qw, Rv


@pytest.mark.smoke
def test_ekf_on_linear_system_is_the_kalman_filter():
    system, Qw, Rv = _noisy_double_integrator()
    T = 25
    key = jax.random.PRNGKey(0)
    us = 0.5 * jax.random.normal(key, (T, 1), jnp.float64)
    ys = jax.random.normal(jax.random.PRNGKey(1), (T, 1), jnp.float64)
    xhat0 = jnp.asarray([0.3, -0.2], jnp.float64)
    P0 = jnp.eye(2, dtype=jnp.float64)

    ekf = est.ExtendedKalmanFilter(
        step_fn=lambda x, u: system.A @ x + system.B @ u,
        obs_fn=lambda x: system.C @ x,
        Qw=Qw,
        Rv=Rv,
    )
    xs_e, Ps_e = est.ekf_trajectory(ekf, xhat0, P0, us, ys)
    xs_k, Ps_k = est.kalman_filter_trajectory(system, Qw, Rv, xhat0, P0, us, ys)
    np.testing.assert_allclose(np.asarray(xs_e), np.asarray(xs_k), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Ps_e), np.asarray(Ps_k), atol=1e-12)


class TestBicycleEKF:
    """Kinematic bicycle, measurements = (p_x, p_y, ψ) — velocity unobserved."""

    TS = 0.08
    SIGMA = 0.02

    def _setup(self, dtype=jnp.float64):
        params = mpc.VehicleParameters()
        step = mpc.rk4(lambda x, u: mpc.kinematic_bicycle_ode(params, x, u),
                       self.TS)
        obs = lambda x: x[:3]
        Qw = 1e-5 * jnp.eye(4, dtype=dtype)
        Rv = self.SIGMA**2 * jnp.eye(3, dtype=dtype)
        return step, obs, est.ExtendedKalmanFilter(step, obs, Qw, Rv)

    def _drive(self, step, key, T, x0, dtype=jnp.float64):
        ts = jnp.arange(T, dtype=dtype)
        us = jnp.stack(
            [0.6 * jnp.ones(T, dtype), 0.3 * jnp.sin(0.5 * ts)], axis=1
        )
        xs = [x0]
        for k in range(T):
            xs.append(step(xs[-1], us[k]))
        xs = jnp.stack(xs)
        vs = self.SIGMA * jax.random.normal(key, (T, 3), dtype)
        ys = xs[1:, :3] + vs
        return us, xs, ys

    def test_reconstructs_unmeasured_velocity(self):
        step, obs, ekf = self._setup()
        x0 = jnp.asarray([0.1, -0.1, 0.2, 0.25], jnp.float64)
        us, xs, ys = self._drive(step, jax.random.PRNGKey(2), 60, x0)
        # filter starts with a wrong velocity guess
        xhat0 = x0.at[3].set(0.0)
        P0 = jnp.diag(jnp.asarray([1e-4, 1e-4, 1e-4, 0.25], jnp.float64))
        xh, Ph = est.ekf_trajectory(ekf, xhat0, P0, us, ys)
        v_err = np.abs(np.asarray(xh[:, 3] - xs[1:, 3]))
        assert v_err[-10:].max() < 0.02  # unobserved state recovered
        # position estimate beats the raw measurement noise floor
        p_err = np.linalg.norm(np.asarray(xh[-20:, :2] - xs[1:][-20:, :2]), axis=1)
        assert p_err.mean() < self.SIGMA
        # covariance bounded and PSD
        eigs = np.linalg.eigvalsh(np.asarray(Ph[-1]))
        assert eigs.min() > 0 and np.trace(np.asarray(Ph[-1])) < 0.1


@pytest.mark.slow
def test_ekf_output_feedback_parking():
    params = mpc.VehicleParameters()
    N, ts = 12, 0.08
    prob, cons, nc = mpc.make_parking_ilqr(params, N, ts, dtype=jnp.float64)
    from model_predictive_control_tpu.solvers.parking import ILQRMPC

    ctrl = ILQRMPC(prob, cons, nc, outer_iters=6, inner_iters=15)
    step = mpc.euler(lambda x, u: mpc.kinematic_bicycle_ode(params, x, u), ts)
    sigma = 0.01
    ekf = est.ExtendedKalmanFilter(
        step_fn=step,
        obs_fn=lambda x: x[:3],
        Qw=1e-6 * jnp.eye(4, dtype=jnp.float64),
        Rv=sigma**2 * jnp.eye(3, dtype=jnp.float64),
    )
    policy = est.ekf_output_feedback_policy(ctrl, ekf)

    x0 = jnp.asarray([0.6, -0.25, 0.0, 0.0], jnp.float64)  # session4_sol.py:447
    T = 40
    key = jax.random.PRNGKey(0)
    vs = sigma * jax.random.normal(key, (T + 1, 3), jnp.float64)

    # measurement-driven closed loop: the "plant state" fed to the policy is
    # the noisy partial measurement, so run the loop manually
    carry = est.initial_ekf_carry(
        ctrl, x0, jnp.diag(jnp.asarray([1e-4] * 3 + [1e-2], jnp.float64)),
        dtype=jnp.float64,
    )

    def loop(sim_carry, t):
        x, carry = sim_carry
        y = x[:3] + vs[t]
        u, carry, aux = policy(y, t, carry)
        xn = step(x, u)
        return (xn, carry), (xn, aux["state_estimate"])

    (xT, _), (xs, xhats) = jax.lax.scan(loop, (x0, carry), jnp.arange(T))
    # parked: near origin despite never seeing the true state or velocity
    assert float(jnp.linalg.norm(xT[:2])) < 0.08
    # estimate tracked the true state (xhats[t] estimates x_t; xs[t] is x_{t+1})
    truth = jnp.concatenate([x0[None], xs[:-1]], axis=0)
    est_err = np.linalg.norm(np.asarray(truth - xhats), axis=1)
    assert est_err.max() < 0.05
