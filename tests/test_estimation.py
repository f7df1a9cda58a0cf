"""Estimation layer: Kalman filter, MHE, output-feedback MPC.

Sharp gates:
- steady-state gain vs scipy's solve_discrete_are on the dual system
- unconstrained MHE with the exact arrival covariance IS the Kalman filter
  (algebraic equivalence, float64) — this pins every term of the QP
  transcription at once
- constrained MHE respects known state bounds and beats the KF when the noise
  violates the Gaussian assumption (truncated noise)
- output-feedback MPC regulates the plant from noisy measurements
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu import estimation as est


def _noisy_double_integrator(dtype=jnp.float64):
    system = mpc.double_integrator_discrete(0.3)
    system = system.with_output(jnp.asarray([[1.0, 0.0]], dtype))
    A = jnp.asarray(system.A, dtype)
    B = jnp.asarray(system.B, dtype)
    system = mpc.LinearSystem(A=A, B=B, C=jnp.asarray([[1.0, 0.0]], dtype))
    Qw = jnp.asarray([[2e-3, 0.0], [0.0, 5e-3]], dtype)
    Rv = jnp.asarray([[4e-2]], dtype)
    return system, Qw, Rv


def _simulate_noisy(system, Qw, Rv, x0, us, key, noise="gauss"):
    """Roll the plant with process+measurement noise; returns xs (T+1), ys (T)."""
    T = us.shape[0]
    kw, kv = jax.random.split(key)
    Lw = jnp.linalg.cholesky(Qw)
    Lv = jnp.linalg.cholesky(Rv)
    ws = (jax.random.normal(kw, (T, x0.shape[0]), x0.dtype) @ Lw.T)
    if noise == "truncated":
        ws = jnp.abs(ws)  # one-sided process noise: breaks the Gaussian prior
    vs = jax.random.normal(kv, (T, Rv.shape[0]), x0.dtype) @ Lv.T

    def step(x, inp):
        u, w, v = inp
        xn = system.A @ x + system.B @ u + w
        y = system.C @ xn + v
        return xn, (xn, y)

    _, (xs, ys) = jax.lax.scan(step, x0, (us, ws, vs))
    return jnp.concatenate([x0[None], xs], axis=0), ys


def test_steady_state_gain_matches_scipy():
    system, Qw, Rv = _noisy_double_integrator()
    kf = est.kalman_gain(system, Qw, Rv)
    A = np.asarray(system.A, np.float64)
    C = np.asarray(system.C, np.float64)
    P_ref = scipy.linalg.solve_discrete_are(
        A.T, C.T, np.asarray(Qw, np.float64), np.asarray(Rv, np.float64)
    )
    np.testing.assert_allclose(np.asarray(kf.P), P_ref, rtol=1e-9)
    L_ref = P_ref @ C.T @ np.linalg.inv(C @ P_ref @ C.T + np.asarray(Rv))
    np.testing.assert_allclose(np.asarray(kf.L), L_ref, rtol=1e-9)


def test_filter_beats_dead_reckoning():
    system, Qw, Rv = _noisy_double_integrator()
    T = 120
    x0 = jnp.asarray([3.0, -1.0], jnp.float64)
    us = 0.3 * jnp.sin(jnp.arange(T, dtype=jnp.float64))[:, None]
    xs, ys = _simulate_noisy(system, Qw, Rv, x0, us, jax.random.PRNGKey(0))

    xhat0 = jnp.zeros(2, jnp.float64)  # wrong prior: must still converge
    P0 = 10.0 * jnp.eye(2, dtype=jnp.float64)
    xh, Ps = est.kalman_filter_trajectory(system, Qw, Rv, xhat0, P0, us, ys)

    def dead_reckon(x, u):
        return system.A @ x + system.B @ u[0] * jnp.ones(1)

    xdr = [xhat0]
    for k in range(T):
        xdr.append(system.A @ xdr[-1] + system.B @ us[k])
    xdr = jnp.stack(xdr[1:])

    err_kf = jnp.mean(jnp.sum((xh[T // 2 :] - xs[1:][T // 2 :]) ** 2, axis=1))
    err_dr = jnp.mean(jnp.sum((xdr[T // 2 :] - xs[1:][T // 2 :]) ** 2, axis=1))
    assert float(err_kf) < 0.2 * float(err_dr)
    # covariance scan converged to the steady-state DARE solution's posterior
    kf = est.kalman_gain(system, Qw, Rv)
    P_post = kf.P - kf.L @ system.C @ kf.P
    np.testing.assert_allclose(np.asarray(Ps[-1]), np.asarray(P_post), atol=1e-8)


def test_unconstrained_mhe_is_kalman_filter():
    """MAP == least-squares == Kalman for linear-Gaussian: the MHE window
    estimate with arrival prior (x̂₀, P₀) must equal the KF posterior at the
    window end, for a time-varying (non-steady-state) P₀."""
    system, Qw, Rv = _noisy_double_integrator()
    M = 8
    x0 = jnp.asarray([1.0, -0.5], jnp.float64)
    us = 0.2 * jnp.cos(0.3 * jnp.arange(M, dtype=jnp.float64))[:, None]
    _, ys = _simulate_noisy(system, Qw, Rv, x0, us, jax.random.PRNGKey(4))

    xbar = jnp.asarray([0.8, -0.3], jnp.float64)  # arrival mean (prior on x0)
    P0 = jnp.asarray([[0.5, 0.1], [0.1, 0.3]], jnp.float64)

    # KF over the window: posterior at time 0 is (xbar, P0) — but the MHE
    # window has NO measurement of x0 in this setup, so feed ys directly.
    xh, _ = est.kalman_filter_trajectory(system, Qw, Rv, xbar, P0, us, ys)

    # MHE sees the same: prior on x0, measurements of x1..xM. ys_mhe stacks
    # y0..yM with y0's row weight zero (no measurement of x0): emulate by a
    # huge Rv for the first row — instead, build the MHE with the y0 slot
    # filled by the prior-consistent prediction and verify it doesn't move the
    # optimum when its weight is tiny. Cleaner: give MHE a y0 measurement of
    # C xbar with near-zero weight via Rv scaling is intrusive — so instead
    # exercise the documented (M+1)-measurement form: generate a y0 for x0 and
    # give the SAME y0 to a KF run that starts from the pre-y0 prior.
    kv0 = jax.random.PRNGKey(9)
    y0 = system.C @ x0 + jax.random.normal(kv0, (1,), jnp.float64) * jnp.sqrt(Rv[0, 0])
    ys_mhe = jnp.concatenate([y0[None], ys], axis=0)

    # KF ingesting y0 first: correct the prior with y0 (measurement of x0),
    # then filter through the window.
    S0 = system.C @ P0 @ system.C.T + Rv
    K0 = P0 @ system.C.T @ jnp.linalg.inv(S0)
    xhat0 = xbar + K0 @ (y0 - system.C @ xbar)
    I = jnp.eye(2, dtype=jnp.float64)
    P0_post = (I - K0 @ system.C) @ P0 @ (I - K0 @ system.C).T + K0 @ Rv @ K0.T
    xh_ref, _ = est.kalman_filter_trajectory(system, Qw, Rv, xhat0, P0_post, us, ys)

    mhe = est.make_mhe(system, Qw, Rv, P0, M)
    x_M, X, w = mhe.solve_unconstrained(xbar, us, ys_mhe)
    np.testing.assert_allclose(np.asarray(x_M), np.asarray(xh_ref[-1]), atol=1e-9)


def test_constrained_mhe_respects_bounds_and_beats_kf():
    """Truncated (one-sided) process noise with a known nonnegativity bound:
    the constrained MHE must keep estimates in-bounds and reduce RMSE vs the
    Kalman filter, which cannot encode the bound."""
    system, Qw, Rv = _noisy_double_integrator()
    M = 10
    # physical knowledge: both states stay nonnegative. Start AT the bound so
    # it binds: with one-sided w >= 0 the truth rides just above zero, the KF
    # (zero-mean noise assumption) dips below, the bounded MHE cannot.
    x0 = jnp.zeros(2, jnp.float64)
    T = M
    us = jnp.zeros((T, 1), jnp.float64)
    xs, ys = _simulate_noisy(
        system, Qw, Rv, x0, us, jax.random.PRNGKey(11), noise="truncated"
    )
    assert float(xs.min()) >= 0.0

    xbar = jnp.zeros(2, jnp.float64)
    P0 = 0.25 * jnp.eye(2, dtype=jnp.float64)
    y0 = system.C @ x0  # clean anchor for simplicity
    ys_mhe = jnp.concatenate([y0[None], ys], axis=0)

    mhe = est.make_mhe(
        system, Qw, Rv, P0, M,
        x_min=jnp.zeros(2, jnp.float64),
        x_max=jnp.asarray([jnp.inf, jnp.inf], jnp.float64),
        iters=400,
    )
    x_M, X, w, sol = mhe.solve(xbar, us, ys_mhe)
    assert bool(sol.converged)
    assert float(X.min()) >= -1e-6  # bounds hold on the whole window

    xh, _ = est.kalman_filter_trajectory(system, Qw, Rv, xbar, P0, us, ys)
    err_mhe = float(jnp.sum((X[1:] - xs[1:]) ** 2))
    err_kf = float(jnp.sum((xh - xs[1:]) ** 2))
    assert err_mhe < err_kf


def test_output_feedback_mpc_regulates():
    """Noisy-output closed loop: KF + linear MPC drives the plant near the
    origin with every solve succeeding."""
    dtype = jnp.float64
    problem = mpc.session2_problem(N=10)
    system = problem.system(dtype)
    C = jnp.asarray([[1.0, 0.0]], dtype)
    msys = mpc.LinearSystem(A=system.A, B=system.B, C=C)
    Qw = 1e-4 * jnp.eye(2, dtype=dtype)
    Rv = jnp.asarray([[1e-2]], dtype)
    kf = est.kalman_gain(msys, Qw, Rv)
    ctrl = mpc.make_linear_mpc(problem, solver="admm", iters=300, dtype=dtype)
    policy = est.output_feedback_policy(ctrl, kf)

    steps = 50
    key = jax.random.PRNGKey(2)
    kw, kv = jax.random.split(key)
    Lw = jnp.linalg.cholesky(Qw)
    ws = jax.random.normal(kw, (steps, 2), dtype) @ Lw.T
    vs = jax.random.normal(kv, (steps, 1), dtype) * jnp.sqrt(Rv[0, 0])

    x0 = jnp.asarray([-40.0, 5.0], dtype)
    carry = est.initial_output_feedback_carry(ctrl, x0, dtype)  # exact prior

    def step(state, inp):
        x, carry = state
        w, v = inp
        y = C @ x + v
        u, carry, aux = policy(y, 0, carry)
        xn = system.A @ x + system.B @ u + w
        return (xn, carry), (xn, aux["solver_success"], aux["state_estimate"])

    (_, _), (xs, succ, xhats) = jax.lax.scan(step, (x0, carry), (ws, vs))
    assert bool(jnp.all(succ))
    assert float(jnp.linalg.norm(xs[-1])) < 1.0
    # estimator tracked the true state through the loop. Alignment:
    # xhats[k] estimates the PRE-step state of step k (i.e. xs[k-1]).
    est_err = jnp.mean(jnp.sum((xhats[1:] - xs[:-1]) ** 2, axis=1))
    assert float(est_err) < 0.05


def test_receding_mhe_tracks_like_kf():
    """Sliding-window MHE over a long record stays close to the time-varying
    KF (fixed-arrival approximation) and both track the truth."""
    system, Qw, Rv = _noisy_double_integrator()
    M, T = 8, 60
    x0 = jnp.asarray([1.5, -0.5], jnp.float64)
    us = 0.1 * jnp.sin(0.2 * jnp.arange(T, dtype=jnp.float64))[:, None]
    xs, ys = _simulate_noisy(system, Qw, Rv, x0, us, jax.random.PRNGKey(7))
    y0 = system.C @ x0
    ys_all = jnp.concatenate([y0[None], ys], axis=0)  # (T+1, ny): x_0..x_T

    kf = est.kalman_gain(system, Qw, Rv)
    mhe = est.make_mhe(system, Qw, Rv, kf.P, M)
    x_ends = est.mhe_trajectory(mhe, x0, us, ys_all, unconstrained=True)
    assert x_ends.shape == (T - M + 1, 2)

    xh, _ = est.kalman_filter_trajectory(
        system, Qw, Rv, x0, kf.P, us, ys
    )  # xh[k] estimates x_{k+1}
    # window k ends at x_{k+M} -> compare with xh[k+M-1]
    kf_aligned = xh[M - 1 :]
    err = jnp.max(jnp.abs(x_ends - kf_aligned))
    assert float(err) < 0.05  # fixed-arrival approximation, not exact
    true_aligned = xs[M:]
    rmse = float(jnp.sqrt(jnp.mean((x_ends - true_aligned) ** 2)))
    assert rmse < 0.25  # sigma_v = 0.2 position-only: velocity carries ~0.1-0.2



@pytest.mark.slow
def test_batched_mhe_rides_the_pallas_kernel():
    """The docstring's claim, executed: a batch of MHE windows solves through
    the fused Pallas ADMM kernel (interpret mode on CPU) and matches the
    per-window XLA solves."""
    from model_predictive_control_tpu.ops.pallas.admm_kernel import admm_solve_pallas
    from model_predictive_control_tpu.solvers.qp import admm_solve

    system, Qw, Rv = _noisy_double_integrator()
    M, B = 6, 5
    P0 = 0.25 * jnp.eye(2, dtype=jnp.float64)
    mhe = est.make_mhe(
        system, Qw, Rv, P0, M,
        x_min=jnp.asarray([-5.0, -5.0], jnp.float64),
        x_max=jnp.asarray([5.0, 5.0], jnp.float64),
        iters=300,
    )

    keys = jax.random.split(jax.random.PRNGKey(21), B)
    x0s = jax.random.normal(jax.random.PRNGKey(22), (B, 2), jnp.float64)
    us_all, ys_all, xbars = [], [], []
    for i in range(B):
        us = 0.2 * jax.random.normal(keys[i], (M, 1), jnp.float64)
        _, ys = _simulate_noisy(system, Qw, Rv, x0s[i], us, keys[i])
        y0 = system.C @ x0s[i]
        us_all.append(us)
        ys_all.append(jnp.concatenate([y0[None], ys], axis=0))
        xbars.append(x0s[i] + 0.1)
    us_b = jnp.stack(us_all)
    ys_b = jnp.stack(ys_all)
    xb = jnp.stack(xbars)

    qs = jax.vmap(mhe._linear_term)(xb, us_b, ys_b)
    nx = mhe.nx
    shifts = jax.vmap(lambda u: mhe.Gamma_u @ u.reshape(-1))(us_b)
    ls = jnp.concatenate(
        [jnp.tile(mhe.x_lb[:nx], (B, 1)), mhe.x_lb[None, :] - shifts], axis=1
    )
    ub = jnp.concatenate(
        [jnp.tile(mhe.x_ub[:nx], (B, 1)), mhe.x_ub[None, :] - shifts], axis=1
    )
    sol_k = admm_solve_pallas(
        mhe.op, qs.astype(jnp.float32), ls.astype(jnp.float32),
        ub.astype(jnp.float32), iters=300, tile=4,
    )
    assert bool(jnp.all(sol_k.converged))
    for i in range(B):
        sol_x = admm_solve(mhe.op, qs[i], ls[i], ub[i], iters=300)
        np.testing.assert_allclose(
            np.asarray(sol_k.x[i]), np.asarray(sol_x.x), atol=5e-4
        )


def test_grad_through_mhe_tunes_noise_covariance():
    """jax.grad flows through make_mhe (inverses, kron, prediction matrices)
    and the window solve: tuning log-diag Qw by gradient descent reduces the
    estimation error when the assumed process noise is badly wrong."""
    system, Qw_true, Rv = _noisy_double_integrator()
    M = 8
    x0 = jnp.asarray([1.0, 0.5], jnp.float64)
    us = 0.15 * jnp.cos(0.25 * jnp.arange(M, dtype=jnp.float64))[:, None]

    # several independent windows for a stable objective
    keys = jax.random.split(jax.random.PRNGKey(33), 6)
    data = []
    for k in keys:
        xs, ys = _simulate_noisy(system, Qw_true, Rv, x0, us, k)
        y0 = system.C @ x0
        data.append((jnp.concatenate([y0[None], ys]), xs[-1]))
    ys_b = jnp.stack([d[0] for d in data])
    xT_b = jnp.stack([d[1] for d in data])
    P0 = 0.25 * jnp.eye(2, dtype=jnp.float64)

    def loss(theta):
        Qw = jnp.diag(jnp.exp(theta))
        mhe = est.make_mhe(system, Qw, Rv, P0, M)
        def one(ys):
            x_M, _, _ = mhe.solve_unconstrained(x0, us, ys)
            return x_M
        xhat = jax.vmap(one)(ys_b)
        return jnp.mean(jnp.sum((xhat - xT_b) ** 2, axis=1))

    theta0 = jnp.log(jnp.asarray([1.0, 1.0], jnp.float64))  # ~500x too big
    g = jax.grad(loss)(theta0)
    eps = 1e-6
    for i in range(2):
        d = jnp.zeros_like(theta0).at[i].set(eps)
        fd = (float(loss(theta0 + d)) - float(loss(theta0 - d))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-5, atol=1e-10)

    # plain gradient descent closes most of the gap to the true covariance
    theta = theta0
    l0 = float(loss(theta))
    for _ in range(25):
        theta = theta - 0.4 * jax.grad(loss)(theta)
    l1 = float(loss(theta))
    l_true = float(loss(jnp.log(jnp.diag(Qw_true))))
    assert l1 < l0
    assert l1 < l_true * 3.0  # within reach of the true-covariance optimum
