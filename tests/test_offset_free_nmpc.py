"""Offset-free NONLINEAR MPC (round-3): the loop the reference's exercise 5
opens — same controller, mismatched plant (``session4_sol.py:443-488``) — is
closed: a disturbance-augmented EKF + nonlinear target shift over AL-iLQR
parks the mismatched plant at matched-model accuracy where the nominal NMPC
provably offsets.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.models.bicycle import kinematic_bicycle_ode
from model_predictive_control_tpu.models.parameters import VehicleParameters
from model_predictive_control_tpu.ops.integrators import euler, rk4_fine
from model_predictive_control_tpu.solvers.offset_free_nmpc import OffsetFreeNMPC
from model_predictive_control_tpu.solvers.parking import (
    ILQRMPC,
    Q_SOL,
    QN_SCALE_SOL,
    make_parking_ilqr,
)

N, TS = 12, 0.05
X0 = jnp.asarray([0.6, -0.25, 0.0, 0.0], jnp.float64)  # session4_sol.py:350
SLOPE = 0.35  # persistent downhill acceleration on the v̇ row


def _params():
    return VehicleParameters()


def _controller(params, dtype=jnp.float64, **kw):
    Q = jnp.asarray(Q_SOL, dtype)
    kw.setdefault("r", [0.0, 0.0])
    return OffsetFreeNMPC(
        euler(lambda x, u: kinematic_bicycle_ode(params, x, u), TS),
        nx=4, nu=2, N=N, Q=Q, R=jnp.asarray([1.0, 0.01], dtype),
        QN=QN_SCALE_SOL * Q,
        u_lb=[params.min_drive, -params.max_steer],
        u_ub=[params.max_drive, params.max_steer],
        dtype=dtype, **kw,
    )


def _slope_plant(params, dtype=jnp.float64, friction_scale=0.8, slope=SLOPE):
    p_true = dataclasses.replace(
        params, friction=params.friction * friction_scale
    )
    drift = jnp.asarray([0.0, 0.0, 0.0, -slope], dtype)
    return rk4_fine(
        lambda x, u: kinematic_bicycle_ode(p_true, x, u) + drift,
        TS, substeps=16,
    )


@pytest.mark.smoke
def test_target_solve_finds_exact_equilibrium():
    """The damped-Newton target solve lands on a true fixed point of the
    disturbance-corrected model holding the tracked outputs at r."""
    params = _params()
    ctrl = _controller(params)
    d_hat = jnp.asarray([0.0, 0.0, 0.0, -SLOPE * TS], jnp.float64)
    x_s, u_s, res = ctrl.solve_target(d_hat)
    assert float(res) < 1e-10
    # fixed point + tracked outputs on the reference, independently checked
    step = euler(lambda x, u: kinematic_bicycle_ode(params, x, u), TS)
    np.testing.assert_allclose(
        np.asarray(step(x_s, u_s) + ctrl.Bd @ d_hat), np.asarray(x_s),
        atol=1e-10,
    )
    np.testing.assert_allclose(np.asarray(x_s[:2]), 0.0, atol=1e-10)
    # holding against the slope takes positive drive at rest
    assert float(u_s[0]) > 0.05


@pytest.mark.smoke
def test_square_target_system_required():
    params = _params()
    with pytest.raises(ValueError, match="square"):
        _controller(params, H=jnp.eye(4)[:3], r=[0.0, 0.0, 0.0])


def test_slope_parking_nominal_offsets_offset_free_does_not():
    """THE gate: on the slope + friction×0.8 plant the nominal NMPC parks
    ~0.3 m off; the offset-free NMPC parks at matched-model accuracy
    (the matched-model nominal baseline itself parks at ~0.03 m)."""
    params = _params()
    plant = _slope_plant(params)
    STEPS = 320

    prob, cons, nc = make_parking_ilqr(
        params, N=N, ts=TS, x_obs=None, Q=Q_SOL, qn_scale=QN_SCALE_SOL,
        dtype=jnp.float64,
    )
    nominal = ILQRMPC(prob, cons, nc, outer_iters=6, inner_iters=15)
    res_nom = mpc.simulate(
        X0, plant, steps=STEPS, policy=nominal.policy(),
        policy_carry=nominal.initial_carry(jnp.float64),
    )
    dist_nom = float(jnp.linalg.norm(res_nom.states[-1, :2]))

    ctrl = _controller(params)
    res_of = mpc.simulate(
        X0, plant, steps=STEPS, policy=ctrl.policy(),
        policy_carry=ctrl.initial_carry(X0),
    )
    dist_of = float(jnp.linalg.norm(res_of.states[-1, :2]))

    assert dist_nom > 0.15, f"nominal unexpectedly parks: {dist_nom}"
    assert dist_of < 0.04, f"offset-free still offsets: {dist_of}"
    assert bool(res_of.logs["solver_success"].all())
    # the EKF found the true persistent disturbance on the v̇ row
    d_hat = float(res_of.logs["disturbance_estimate"][-1, 3])
    np.testing.assert_allclose(d_hat, -SLOPE * TS, atol=2e-4)
    # ... and the other rows stay near zero (no spurious attribution)
    np.testing.assert_allclose(
        np.asarray(res_of.logs["disturbance_estimate"][-1, :3]), 0.0,
        atol=2e-3,
    )


def test_e5_friction_mismatch_parks_at_reference_accuracy():
    """The reference's pure exercise-5 scenario (friction×0.8, exact plant,
    no slope): the offset-free controller parks the mismatched plant at the
    matched-model accuracy level — no regression from the augmentation."""
    params = _params()
    plant = _slope_plant(params, slope=0.0)  # friction×0.8 only
    ctrl = _controller(params)
    res = mpc.simulate(
        X0, plant, steps=300, policy=ctrl.policy(),
        policy_carry=ctrl.initial_carry(X0),
    )
    assert bool(res.logs["solver_success"].all())
    assert float(jnp.linalg.norm(res.states[-1, :2])) < 0.05
    assert float(jnp.abs(res.states[-1, 3])) < 0.05  # essentially at rest


def test_f32_demo_path():
    """The demo/TPU path (f32) reproduces the comparison (robust_demo §4)."""
    from model_predictive_control_tpu.experiments.robust_demo import (
        nonlinear_offset_free_demo,
    )

    out = nonlinear_offset_free_demo(steps=320, dtype=jnp.float32)
    assert out["nominal_final_dist"] > 0.15
    assert out["offset_free_final_dist"] < 0.04
    assert out["offset_free_success"] == 1.0
    np.testing.assert_allclose(
        out["d_hat_v_row"], out["d_true_v_row"], atol=2e-4
    )


class TestDisturbanceCompensatedTracking:
    """Offset-free RACING (round 3): a persistent crosswind gives the nominal
    lap tracker a steady offset; the disturbance-augmented-EKF tracker with
    disturbance-consistent reference re-projection removes it — steady
    tracking error returns to (or below) the wind-free baseline."""

    N, TS, STEPS, SPEED = 15, 0.05, 120, 0.35
    WIND = 0.004  # per-step lateral drift (0.08 m/s crosswind)

    def _setup(self):
        from model_predictive_control_tpu.experiments.racing import (
            Q_KINEMATIC,
            QN_SCALE,
            R_KINEMATIC,
            ellipse_reference,
        )
        from model_predictive_control_tpu.ops.integrators import rk4

        params = _params()
        dt = jnp.float32
        ref = ellipse_reference(
            self.STEPS + self.N + 1, speed=self.SPEED, ts=self.TS,
            dynamic=False, dtype=dt,
        )
        step_fn = euler(
            lambda x, u: kinematic_bicycle_ode(params, x, u), self.TS
        )
        plant_base = rk4(
            lambda x, u: kinematic_bicycle_ode(params, x, u), self.TS
        )
        wind = jnp.asarray([0.0, -self.WIND, 0.0, 0.0], dt)
        plant = lambda x, u: plant_base(x, u) + wind
        Q = jnp.asarray(Q_KINEMATIC, dt)
        R = jnp.asarray(R_KINEMATIC, dt)
        ulim = (
            jnp.asarray([params.min_drive, -params.max_steer], dt),
            jnp.asarray([params.max_drive, params.max_steer], dt),
        )
        return params, ref, step_fn, plant, Q, R, QN_SCALE, ulim, dt

    def test_crosswind_offset_removed(self):
        from model_predictive_control_tpu.solvers.nmpc_tracking import (
            TrackingNMPC,
        )
        from model_predictive_control_tpu.solvers.offset_free_nmpc import (
            DisturbanceCompensatedTracking,
        )

        params, ref, step_fn, plant, Q, R, qn, ulim, dt = self._setup()
        nom = TrackingNMPC(
            step_fn, nx=4, nu=2, N=self.N, Q=Q, R=R, QN=qn * Q,
            u_lb=ulim[0], u_ub=ulim[1], ref_traj=ref,
        )
        res_n = mpc.simulate(
            ref[0], plant, steps=self.STEPS, policy=nom.policy(),
            policy_carry=nom.initial_carry(dt),
        )
        comp = DisturbanceCompensatedTracking(
            step_fn, nx=4, nu=2, N=self.N, Q=Q, R=R, QN=qn * Q,
            u_lb=ulim[0], u_ub=ulim[1], ref_traj=ref, ts=self.TS, dtype=dt,
        )
        res_c = mpc.simulate(
            ref[0], plant, steps=self.STEPS, policy=comp.policy(),
            policy_carry=comp.initial_carry(ref[0]),
        )
        en = np.asarray(res_n.logs["tracking_error"])[-40:].mean()
        ec = np.asarray(res_c.logs["tracking_error"])[-40:].mean()
        assert en > 0.05, f"nominal unexpectedly tracks under wind: {en}"
        assert ec < 0.01, f"compensated tracker still offsets: {ec}"
        assert bool(res_c.logs["solver_success"].all())
        # the EKF found the wind on the p_y row, other rows stay clean
        d_hat = np.asarray(res_c.logs["disturbance_estimate"][-1])
        np.testing.assert_allclose(d_hat[1], -self.WIND, atol=5e-4)
        np.testing.assert_allclose(d_hat[[0, 2]], 0.0, atol=2e-3)

    def test_without_reprojection_residual_remains(self):
        """The ablation that explains the design: correcting the MODEL alone
        leaves a structural residual (the wind-inconsistent reference couples
        position error to the heading cost); the re-projection removes it."""
        from model_predictive_control_tpu.solvers.offset_free_nmpc import (
            DisturbanceCompensatedTracking,
        )

        params, ref, step_fn, plant, Q, R, qn, ulim, dt = self._setup()

        def run(reproject):
            comp = DisturbanceCompensatedTracking(
                step_fn, nx=4, nu=2, N=self.N, Q=Q, R=R, QN=qn * Q,
                u_lb=ulim[0], u_ub=ulim[1], ref_traj=ref, ts=self.TS,
                reproject=reproject, dtype=dt,
            )
            res = mpc.simulate(
                ref[0], plant, steps=self.STEPS, policy=comp.policy(),
                policy_carry=comp.initial_carry(ref[0]),
            )
            return np.asarray(res.logs["tracking_error"])[-40:].mean()

        err_no = run(False)
        err_yes = run(True)
        assert err_no > 3 * err_yes, (err_no, err_yes)
