"""Nonlinear MHE (round 3): Gauss-Newton window estimator for the bicycle
tiers, linear-limit-gated against the round-2 linear MHE / Kalman filter.

Gates (VERDICT r2 item 5):
- one Gauss-Newton step on linear closures IS the linear MHE (exact);
- the filtering arrival-cost recursion (``propagate_arrival=True``) makes the
  receding-horizon estimator equal the time-varying Kalman filter EXACTLY in
  the linear-Gaussian unconstrained limit — where the round-2 frozen-arrival
  approximation is visibly off;
- on the bicycle with a known physical bound (v ≥ 0) the EKF produces
  infeasible estimates the bounded MHE cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import model_predictive_control_tpu.estimation as est
from model_predictive_control_tpu.estimation_nl import NonlinearMHE
from model_predictive_control_tpu.models.bicycle import kinematic_bicycle_ode
from model_predictive_control_tpu.models.parameters import VehicleParameters
from model_predictive_control_tpu.models.linear import LinearSystem


def _linear_setup():
    A = jnp.asarray([[1.0, 0.3], [0.0, 1.0]], jnp.float64)
    B = jnp.asarray([[0.0], [0.3]], jnp.float64)
    C = jnp.asarray([[1.0, 0.0]], jnp.float64)
    system = LinearSystem(A=A, B=B, C=C)
    Qw = jnp.asarray([[1e-4, 0.0], [0.0, 4e-3]], jnp.float64)
    Rv = jnp.asarray([[0.04]], jnp.float64)
    step_fn = lambda x, u: A @ x + B @ u
    obs_fn = lambda x: C @ x
    return system, Qw, Rv, step_fn, obs_fn


def _simulate_linear(system, Qw, Rv, x0, us, key):
    A, B, C = system.A, system.B, system.C
    x = x0
    xs, ys = [], []
    for k in range(us.shape[0]):
        kw, kv, key = jax.random.split(key, 3)
        x = A @ x + B @ us[k] + jax.random.multivariate_normal(
            kw, jnp.zeros(2, jnp.float64), Qw
        )
        xs.append(x)
        ys.append(C @ x + jax.random.normal(kv, (1,), jnp.float64)
                  * jnp.sqrt(Rv[0, 0]))
    return jnp.stack(xs), jnp.stack(ys)


@pytest.mark.smoke
def test_linear_limit_single_window_equals_linear_mhe():
    """One GN step on linear closures reproduces the linear condensed MHE
    (gates every term of the nonlinear transcription at once)."""
    system, Qw, Rv, step_fn, obs_fn = _linear_setup()
    M = 8
    x0 = jnp.asarray([1.0, -0.5], jnp.float64)
    us = 0.2 * jnp.cos(0.3 * jnp.arange(M, dtype=jnp.float64))[:, None]
    _, ys = _simulate_linear(system, Qw, Rv, x0, us, jax.random.PRNGKey(4))
    y0 = system.C @ x0
    ys_all = jnp.concatenate([y0[None], ys], axis=0)
    xbar = jnp.asarray([0.8, -0.3], jnp.float64)
    P0 = jnp.asarray([[0.5, 0.1], [0.1, 0.3]], jnp.float64)

    lin = est.make_mhe(system, Qw, Rv, P0, M)
    xM_lin, X_lin, _ = lin.solve_unconstrained(xbar, us, ys_all)

    nl = NonlinearMHE(step_fn, obs_fn, Qw, Rv, P0, M, nx=2, gn_iters=1)
    xM_nl, X_nl, _ = nl.solve(xbar, us, ys_all)
    np.testing.assert_allclose(np.asarray(xM_nl), np.asarray(xM_lin),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(X_nl), np.asarray(X_lin),
                               atol=1e-10)

    # bounded path with inactive bounds lands on the same optimum (gates the
    # per-GN-step box-QP wiring)
    nl_b = NonlinearMHE(
        step_fn, obs_fn, Qw, Rv, P0, M, nx=2, gn_iters=2,
        x_min=[-10.0, -10.0], x_max=[10.0, 10.0],
    )
    xM_b, _, _ = nl_b.solve(xbar, us, ys_all)
    np.testing.assert_allclose(np.asarray(xM_b), np.asarray(xM_lin),
                               atol=1e-8)


def test_propagated_arrival_is_exactly_the_kalman_filter():
    """Filtering arrival-cost recursion: the receding-horizon nonlinear MHE
    on linear closures equals the time-varying KF EXACTLY; the round-2
    frozen-arrival approximation does not."""
    system, Qw, Rv, step_fn, obs_fn = _linear_setup()
    M, T = 8, 40
    x0 = jnp.asarray([1.5, -0.5], jnp.float64)
    us = 0.1 * jnp.sin(0.2 * jnp.arange(T, dtype=jnp.float64))[:, None]
    _, ys = _simulate_linear(system, Qw, Rv, x0, us, jax.random.PRNGKey(7))
    y0 = system.C @ x0 + jax.random.normal(
        jax.random.PRNGKey(9), (1,), jnp.float64
    ) * jnp.sqrt(Rv[0, 0])
    ys_all = jnp.concatenate([y0[None], ys], axis=0)
    P0 = jnp.asarray([[0.5, 0.1], [0.1, 0.3]], jnp.float64)
    xbar0 = jnp.asarray([1.2, -0.3], jnp.float64)

    # KF reference: ingest y0 (measurement of x_0) first, then filter
    C = system.C
    S0 = C @ P0 @ C.T + Rv
    K0 = P0 @ C.T @ jnp.linalg.inv(S0)
    xhat0 = xbar0 + K0 @ (y0 - C @ xbar0)
    I = jnp.eye(2, dtype=jnp.float64)
    P0p = (I - K0 @ C) @ P0 @ (I - K0 @ C).T + K0 @ Rv @ K0.T
    xh_ref, _ = est.kalman_filter_trajectory(
        system, Qw, Rv, xhat0, P0p, us, ys
    )

    mhe_p = NonlinearMHE(step_fn, obs_fn, Qw, Rv, P0, M, nx=2, gn_iters=1,
                         propagate_arrival=True)
    x_ends = mhe_p.trajectory(xbar0, us, ys_all)
    np.testing.assert_allclose(
        np.asarray(x_ends), np.asarray(xh_ref[M - 1:]), atol=1e-9
    )

    mhe_f = NonlinearMHE(step_fn, obs_fn, Qw, Rv, P0, M, nx=2, gn_iters=1,
                         propagate_arrival=False)
    x_ends_f = mhe_f.trajectory(xbar0, us, ys_all)
    err_f = float(jnp.max(jnp.abs(x_ends_f - xh_ref[M - 1:])))
    assert err_f > 1e-3  # the frozen approximation is visibly not the KF


def test_bicycle_bound_ekf_infeasible_mhe_feasible():
    """Known physical bound the EKF cannot encode: a car coasting to rest
    (v hugs 0 from above, position-only measurements). The EKF estimates
    negative velocities; the bounded MHE never does, and its velocity RMSE
    is no worse."""
    from model_predictive_control_tpu.ops.integrators import rk4

    params = VehicleParameters()
    ts = 0.05
    step_fn = rk4(lambda x, u: kinematic_bicycle_ode(params, x, u), ts)
    obs_fn = lambda x: x[:2]
    dt = jnp.float64
    T = 50
    us = jnp.concatenate(
        [
            jnp.tile(jnp.asarray([[0.2, 0.05]], dt), (8, 1)),
            jnp.tile(jnp.asarray([[0.0, 0.0]], dt), (T - 8, 1)),
        ]
    )
    Qw = jnp.diag(jnp.asarray([1e-6, 1e-6, 1e-5, 1e-3], dt))
    Rv = jnp.asarray(0.1**2, dt) * jnp.eye(2, dtype=dt)
    key = jax.random.PRNGKey(1)
    x = jnp.zeros(4, dt)
    xs, ys = [x], [obs_fn(x)]
    for k in range(T):
        kw, kv, key = jax.random.split(key, 3)
        w = jax.random.multivariate_normal(kw, jnp.zeros(4, dt), Qw)
        x = step_fn(x, us[k]) + w
        # physics the estimators must recover: wheels do not reverse on
        # their own (one-sided truncation at the v >= 0 bound)
        x = x.at[3].set(jnp.maximum(x[3], 0.0))
        xs.append(x)
        ys.append(obs_fn(x) + jax.random.normal(kv, (2,), dt) * 0.1)
    xs = jnp.stack(xs)
    ys_all = jnp.stack(ys)

    P0 = jnp.diag(jnp.asarray([1e-4, 1e-4, 1e-3, 1e-2], dt))
    M = 10
    ekf = est.ExtendedKalmanFilter(step_fn, obs_fn, Qw, Rv)
    xh_ekf, _ = est.ekf_trajectory(ekf, xs[0], P0, us, ys_all[1:])
    mhe = NonlinearMHE(
        step_fn, obs_fn, Qw, Rv, P0, M, nx=4,
        x_min=[-3.0, -2.0, -7.0, 0.0], x_max=[3.0, 2.0, 7.0, 1.0],
        gn_iters=3, propagate_arrival=True,
    )
    x_ends = mhe.trajectory(xs[0], us, ys_all)

    true_v = np.asarray(xs[M:, 3])
    ekf_v = np.asarray(xh_ekf[M - 1:, 3])
    mhe_v = np.asarray(x_ends[:, 3])
    assert ekf_v.min() < -0.005  # the EKF goes physically infeasible
    assert mhe_v.min() > -1e-6  # the MHE respects the bound
    rmse_ekf = float(np.sqrt(np.mean((ekf_v - true_v) ** 2)))
    rmse_mhe = float(np.sqrt(np.mean((mhe_v - true_v) ** 2)))
    assert rmse_mhe < rmse_ekf  # ... and is (slightly) more accurate for it


def test_linear_mhe_batched_solve_matches_scalar():
    """The linear MHE's fused-kernel batch path (round 3: the docstring claim
    made real): solve_batch == per-window scalar solves, both backends."""
    system, Qw, Rv, _, _ = _linear_setup()
    M, B = 6, 5
    P0 = jnp.asarray([[0.5, 0.1], [0.1, 0.3]], jnp.float64)
    mhe = est.make_mhe(
        system, Qw, Rv, P0, M,
        x_min=jnp.asarray([-5.0, -3.0]), x_max=jnp.asarray([5.0, 3.0]),
    )
    key = jax.random.PRNGKey(11)
    xbars = jax.random.uniform(key, (B, 2), jnp.float64, -1.0, 1.0)
    us = 0.2 * jax.random.normal(
        jax.random.fold_in(key, 1), (B, M, 1), jnp.float64
    )
    ys = jax.random.normal(
        jax.random.fold_in(key, 2), (B, M + 1, 1), jnp.float64
    )

    for backend in ("xla", "pallas"):
        xM_b, X_b, w_b, sol = mhe.solve_batch(xbars, us, ys, backend=backend)
        atol = 1e-8 if backend == "xla" else 5e-4
        for i in range(B):
            xM_s, X_s, w_s, _ = mhe.solve(xbars[i], us[i], ys[i])
            np.testing.assert_allclose(
                np.asarray(xM_b[i]), np.asarray(xM_s), atol=atol,
                err_msg=backend,
            )
            np.testing.assert_allclose(
                np.asarray(X_b[i]), np.asarray(X_s), atol=atol,
                err_msg=backend,
            )


def test_mhe_in_the_loop_output_feedback():
    """MHE-in-the-loop output feedback (round 3): drive session-2 MPC from
    noisy position-only measurements with the NonlinearMHE as the estimator.
    After the M-step warm-up the loop must agree with the KF-based
    output-feedback loop (linear-Gaussian: MHE == KF) and regulate."""
    import model_predictive_control_tpu as mpc
    from model_predictive_control_tpu.estimation_nl import (
        initial_mhe_feedback_carry,
        mhe_output_feedback_policy,
    )

    system, Qw, Rv, step_fn, obs_fn = _linear_setup()
    problem = mpc.Problem(Ts=0.3, N=8)
    ctrl = mpc.make_linear_mpc(problem, iters=300, dtype=jnp.float64,
                               terminal="dare")
    M, T = 6, 40
    mhe = NonlinearMHE(step_fn, obs_fn, Qw, Rv,
                       P0=0.1 * jnp.eye(2, dtype=jnp.float64), M=M, nx=2,
                       gn_iters=1, propagate_arrival=True)
    x0 = jnp.asarray([-30.0, 4.0], jnp.float64)
    key = jax.random.PRNGKey(3)
    ws = 0.01 * jax.random.normal(key, (T, 2), jnp.float64)
    vs = 0.2 * jax.random.normal(jax.random.fold_in(key, 1), (T, 1),
                                 jnp.float64)

    policy = mhe_output_feedback_policy(ctrl, mhe)
    carry = initial_mhe_feedback_carry(ctrl, mhe, x0, nu=1,
                                       dtype=jnp.float64)
    A, B, C = system.A, system.B, system.C

    def episode(policy, carry):
        def step(state, inp):
            x, c = state
            w, v = inp
            y = C @ x + v
            u, c, aux = policy(y, 0, c)
            return (A @ x + B @ u + w, c), (x, u, aux["state_estimate"])

        (_, _), out = jax.lax.scan(step, (x0, carry), (ws, vs))
        return out

    xs, us, xh = episode(policy, carry)
    # regulation: the noisy-measurement loop still brings the state in
    assert float(jnp.linalg.norm(xs[-1])) < 2.0
    # post-warm-up estimates track the true state at the noise level
    err = jnp.linalg.norm(xh[M + 2 :] - xs[M + 2 :], axis=1)
    assert float(err.mean()) < 0.5

    # agreement with the KF output-feedback loop after warm-up (MHE == KF in
    # the linear-Gaussian limit; the replicated-y0 warm-up washes out)
    import model_predictive_control_tpu.estimation as est

    kf = est.kalman_gain(system, Qw, Rv)
    kf_policy = est.output_feedback_policy(ctrl, kf)
    kf_carry = est.initial_output_feedback_carry(ctrl, x0, jnp.float64)
    xs_kf, us_kf, _ = episode(kf_policy, kf_carry)
    # the replicated-y0 warm-up transient decays over ~2M steps; past it the
    # two loops agree to solver/noise tolerance (measured tail ~1e-3)
    du = jnp.abs(us[-15:] - us_kf[-15:])
    assert float(du.max()) < 0.1
    assert float(jnp.abs(xs[-1] - xs_kf[-1]).max()) < 0.05


def test_admm_inner_solver_matches_pdip():
    """qp_solver="admm" (the solve_batch throughput path — PDIP's batched
    KKT LUs serialize on TPU, measured 940 vs 16k windows/s) produces the
    same bounded estimates as the default PDIP step."""
    from model_predictive_control_tpu.ops.integrators import rk4

    params = VehicleParameters()
    ts, M = 0.05, 8
    dt = jnp.float64
    step_fn = rk4(lambda x, u: kinematic_bicycle_ode(params, x, u), ts)
    obs_fn = lambda x: x[:2]
    Qw = jnp.diag(jnp.asarray([1e-6, 1e-6, 1e-5, 1e-3], dt))
    Rv = (0.1**2) * jnp.eye(2, dtype=dt)
    P0 = jnp.diag(jnp.asarray([1e-4, 1e-4, 1e-3, 1e-2], dt))
    kw = dict(x_min=[-3.0, -2.0, -7.0, 0.0], x_max=[3.0, 2.0, 7.0, 1.0],
              gn_iters=3)
    mhe_p = NonlinearMHE(step_fn, obs_fn, Qw, Rv, P0, M, nx=4, qp_iters=25,
                         **kw)
    mhe_a = NonlinearMHE(step_fn, obs_fn, Qw, Rv, P0, M, nx=4, qp_iters=80,
                         qp_solver="admm", **kw)

    key = jax.random.PRNGKey(2)
    x0 = jnp.asarray([0.1, -0.2, 0.3, 0.05], dt)
    us = jnp.tile(jnp.asarray([[0.2, 0.05]], dt), (M, 1))

    def roll(x, us):
        xs = [x]
        for u in us:
            x = step_fn(x, u)
            xs.append(x)
        return jnp.stack(xs)

    Xs = roll(x0, us)
    ys = jax.vmap(obs_fn)(Xs) + 0.1 * jax.random.normal(key, (M + 1, 2), dt)
    xM_p, X_p, _ = mhe_p.solve(x0, us, ys)
    xM_a, X_a, _ = mhe_a.solve(x0, us, ys)
    np.testing.assert_allclose(np.asarray(X_a), np.asarray(X_p), atol=1e-5)
    assert float(X_a[..., 3].min()) > -1e-8  # bound still respected

    # solve_batch wraps the same solve
    xb = jnp.stack([x0, x0 + 0.01])
    ub = jnp.stack([us, us])
    yb = jnp.stack([ys, ys + 0.01])
    xM_b, X_b, _ = mhe_a.solve_batch(xb, ub, yb)
    np.testing.assert_allclose(np.asarray(xM_b[0]), np.asarray(xM_a),
                               atol=1e-9)


def test_dynamic_tier_mhe_window():
    """The Gauss-Newton MHE is model-agnostic: one bounded window solve on the
    6-state dynamic (Pacejka) tier reconstructs the state from position+heading
    measurements at the noise level."""
    from model_predictive_control_tpu.models.bicycle import (
        NX_DYNAMIC,
        dynamic_bicycle_ode,
    )
    from model_predictive_control_tpu.ops.integrators import rk4_fine

    params = VehicleParameters()
    ts, M = 0.05, 8
    dt = jnp.float64
    step_fn = rk4_fine(
        lambda x, u: dynamic_bicycle_ode(params, x, u), ts, substeps=4
    )
    obs_fn = lambda x: x[:3]  # position + heading
    Qw = jnp.diag(jnp.asarray([1e-6, 1e-6, 1e-6, 1e-4, 1e-4, 1e-4], dt))
    Rv = 1e-4 * jnp.eye(3, dtype=dt)
    x = jnp.asarray([1.5, 0.0, jnp.pi / 2, 1.0, 0.0, 0.5], dt)
    us = jnp.tile(jnp.asarray([[0.4, 0.05]], dt), (M, 1))
    key = jax.random.PRNGKey(2)
    xs, ys = [x], [obs_fn(x)]
    for k in range(M):
        kw, kv, key = jax.random.split(key, 3)
        x = step_fn(x, us[k]) + jax.random.multivariate_normal(
            kw, jnp.zeros(NX_DYNAMIC, dt), Qw
        )
        xs.append(x)
        ys.append(obs_fn(x) + 0.01 * jax.random.normal(kv, (3,), dt))
    xs = jnp.stack(xs)
    ys_all = jnp.stack(ys)

    mhe = NonlinearMHE(
        step_fn, obs_fn, Qw, Rv, P0=0.01 * jnp.eye(NX_DYNAMIC, dtype=dt),
        M=M, nx=NX_DYNAMIC, gn_iters=3,
        x_min=[-3.0, -2.0, -7.0, -2.0, -1.0, -5.0],
        x_max=[3.0, 2.0, 7.0, 2.0, 1.0, 5.0],
    )
    xbar = xs[0] + 0.05
    x_M, X, w = mhe.solve(xbar, us, ys_all)
    # full-state reconstruction error at the measurement-noise level,
    # including the UNMEASURED body velocities and yaw rate
    err = jnp.abs(x_M - xs[-1])
    assert float(err[:3].max()) < 0.02  # measured components
    assert float(err[3:].max()) < 0.15  # inferred velocity states
