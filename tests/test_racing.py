"""Racing layer: ellipse reference generation + nonlinear tracking MPC.

Gates the dynamic-tier (Pacejka) flagship workload: the constant-speed
reference must be geometrically consistent, and the closed-loop lap must track
at centimeter grade with every AL-iLQR solve converged — including under the
prediction/plant integrator mismatch (RK4/4 substeps vs RK4/16 substeps).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.experiments import racing


class TestEllipseReference:
    @pytest.mark.smoke
    def test_constant_ground_speed_and_tangent_heading(self):
        ref = np.asarray(
            racing.ellipse_reference(400, speed=1.2, ts=0.05, dynamic=True,
                                     dtype=jnp.float64)
        )
        assert ref.shape == (400, 6)
        dp = np.diff(ref[:, :2], axis=0)
        speeds = np.linalg.norm(dp, axis=1) / 0.05
        np.testing.assert_allclose(speeds, 1.2, rtol=2e-3)
        # heading = path tangent (compare at segment midpoints)
        psi_seg = np.arctan2(dp[:, 1], dp[:, 0])
        psi_mid = 0.5 * (ref[:-1, 2] + ref[1:, 2])
        err = np.abs(np.mod(psi_mid - psi_seg + np.pi, 2 * np.pi) - np.pi)
        assert err.max() < 5e-3
        # on the ellipse
        assert np.allclose(
            (ref[:, 0] / racing.ELLIPSE_A) ** 2
            + (ref[:, 1] / racing.ELLIPSE_B) ** 2,
            1.0,
            atol=1e-9,
        )
        # body velocities: vx = speed, vy = 0; yaw rate integrates heading
        assert np.allclose(ref[:, 3], 1.2) and np.allclose(ref[:, 4], 0.0)
        psi_int = ref[0, 2] + np.cumsum(ref[:-1, 5]) * 0.05
        assert np.max(np.abs(psi_int - ref[1:, 2])) < 0.05

    def test_kinematic_reference_has_four_states(self):
        ref = np.asarray(racing.ellipse_reference(50, dynamic=False))
        assert ref.shape == (50, 4)
        assert np.allclose(ref[:, 3], racing.SPEED)

    def test_multi_lap_reference_unwraps_heading(self):
        # ~2 laps: heading must keep increasing, not wrap at 2π
        ref = np.asarray(
            racing.ellipse_reference(280, speed=1.2, ts=0.05, dynamic=True)
        )
        assert ref[-1, 2] > 2.0 * np.pi  # second lap reached
        assert np.all(np.diff(ref[:, 2]) > -1e-6)


class TestClosedLoopLap:
    def test_dynamic_tier_tracks_at_centimeter_grade(self):
        res, s = racing.run(steps=60, dtype=jnp.float32)
        assert s["success_rate"] == 1.0
        assert not s["unstable"]
        assert s["max_tracking_error_m"] < 0.03
        assert s["mean_tracking_error_m"] < 0.015
        # tube corridor respected by construction
        assert s["max_tracking_error_m"] < 0.25

    @pytest.mark.slow
    def test_kinematic_tier_tracks_within_its_speed_envelope(self):
        res, s = racing.run(
            steps=60, dynamic=False, speed=0.4, dtype=jnp.float32
        )
        assert s["success_rate"] == 1.0
        assert s["max_tracking_error_m"] < 0.03

    @pytest.mark.slow
    def test_full_lap_closes_on_reference(self):
        # one full lap (~6.6 s / ~132 steps at 1.2 m/s): after the lap the car
        # is still ON the (re-entered) reference, not drifted
        steps = 135
        res, s = racing.run(steps=steps, dtype=jnp.float32)
        assert s["success_rate"] == 1.0
        end = np.asarray(res.states)[-1, :2]
        ref_end = np.asarray(racing.ellipse_reference(steps + 1))[steps, :2]
        assert np.linalg.norm(end - ref_end) < 0.03
        # and the lap really wrapped around (heading advanced by ~2π)
        assert float(np.asarray(res.states)[-1, 2]) > 5.5

    @pytest.mark.slow
    def test_cli_race_subcommand(self, tmp_path, capsys):
        from model_predictive_control_tpu.cli import main

        main([
            "race", "--steps", "40", "--kinematic", "--speed", "0.4",
            "--outdir", str(tmp_path),
        ])
        out = capsys.readouterr().out
        assert "mean_tracking_error_m" in out
        assert (tmp_path / "racing_track.png").exists()


@pytest.mark.slow
def test_ekf_output_feedback_racing():
    """Measurement-driven lap: the dynamic car tracks the ellipse from noisy
    (p_x, p_y, ψ) measurements only — body velocities (v_x, v_y, ω) are
    reconstructed by the EKF, never measured."""
    import jax
    from model_predictive_control_tpu import estimation as est
    from model_predictive_control_tpu.models.bicycle import dynamic_bicycle_ode

    steps = 30
    params = mpc.VehicleParameters()
    ctrl, ref = racing.make_racing_mpc(params, steps=steps, dtype=jnp.float32)
    ode = lambda x, u: dynamic_bicycle_ode(params, x, u)
    plant = mpc.rk4_fine(ode, racing.TS, substeps=16)
    sigma = 0.005
    ekf = est.ExtendedKalmanFilter(
        step_fn=mpc.rk4_fine(ode, racing.TS, substeps=4),
        obs_fn=lambda x: x[:3],
        Qw=1e-5 * jnp.eye(6, dtype=jnp.float32),
        Rv=sigma**2 * jnp.eye(3, dtype=jnp.float32),
    )
    policy = est.ekf_output_feedback_policy(ctrl, ekf)
    x0 = ref[0]
    vs = sigma * jax.random.normal(jax.random.PRNGKey(0), (steps, 3), jnp.float32)
    carry0 = est.initial_ekf_carry(
        ctrl, x0, 1e-4 * jnp.eye(6, dtype=jnp.float32), dtype=jnp.float32
    )

    def loop(sim_carry, t):
        x, carry = sim_carry
        y = x[:3] + vs[t]
        u, carry, aux = policy(y, t, carry)
        xn = plant(x, u)
        return (xn, carry), (xn, aux["state_estimate"], aux["tracking_error"])

    (_, _), (xs, xhats, errs) = jax.lax.scan(loop, (x0, carry0), jnp.arange(steps))
    # centimeter-grade tracking from noisy partial measurements
    assert float(errs.max()) < 0.05
    # the EKF reconstructed the unmeasured body velocities
    # (xhats[t] estimates x_t = xs[t-1]; align before comparing)
    truth = np.asarray(jnp.concatenate([x0[None], xs[:-1]], axis=0))
    v_err = np.abs(np.asarray(xhats)[-10:, 3] - truth[-10:, 3])
    assert v_err.max() < 0.05
