"""Implicit differentiation through the QP solvers (VERDICT r1 item 6).

Gradients via the KKT implicit function theorem must match central finite
differences of the (re-solved) optimum. All in float64 on CPU so FD noise is
well below the comparison tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import model_predictive_control_tpu as mpc


def _random_box_qp(key, n=6, m=9, dtype=jnp.float64):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    L = jax.random.normal(k1, (n, n), dtype)
    P = L @ L.T + 0.5 * jnp.eye(n, dtype=dtype)
    A = jax.random.normal(k2, (m, n), dtype)
    q = jax.random.normal(k3, (n,), dtype)
    width = 0.3 + jax.random.uniform(k4, (m,), dtype)
    l = -width
    u = width * 0.7  # asymmetric so some upper bounds activate
    return P, A, q, l, u


def _fd_grad(f, theta, eps=1e-6):
    theta = np.asarray(theta, dtype=np.float64)
    g = np.zeros_like(theta)
    for i in range(theta.size):
        dp = theta.copy()
        dm = theta.copy()
        dp.flat[i] += eps
        dm.flat[i] -= eps
        g.flat[i] = (float(f(jnp.asarray(dp))) - float(f(jnp.asarray(dm)))) / (
            2 * eps
        )
    return g


@pytest.mark.parametrize("solver", ["admm", "pdip"])
def test_grad_wrt_qlu_matches_fd(solver):
    """d loss / d(q, l, u) through the solve vs central differences."""
    P, A, q0, l0, u0 = _random_box_qp(jax.random.PRNGKey(0))
    op = mpc.qp_setup(P, A)
    solve = mpc.make_implicit_qp_solver(solver, iters=300)
    c = jnp.linspace(1.0, 2.0, q0.shape[0])
    w = jnp.linspace(-1.0, 1.0, l0.shape[0])

    def loss(theta):
        q = q0 + theta[0] * c
        l = l0 - jnp.abs(theta[1]) * jnp.abs(w)
        u = u0 + jnp.abs(theta[2]) * jnp.abs(w)
        sol = solve(op, q, l, u)
        return jnp.sum(c * sol.x) + 0.1 * jnp.sum(w * sol.y)

    theta = jnp.asarray([0.3, 0.2, 0.15], dtype=jnp.float64)
    sol = solve(op, q0 + theta[0] * c, l0, u0)
    assert bool(sol.converged)
    g = jax.grad(loss)(theta)
    g_fd = _fd_grad(loss, theta)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=2e-5, atol=2e-7)


def test_grad_wrt_P_through_qp_setup():
    """Weight-tuning path: theta scales the Hessian; grads flow through
    qp_setup into op.P via the KKT cotangent."""
    P0, A, q, l, u = _random_box_qp(jax.random.PRNGKey(1))
    solve = mpc.make_implicit_qp_solver("admm", iters=300)
    c = jnp.linspace(-1.0, 1.0, q.shape[0])

    def loss(theta):
        P = P0 + theta * jnp.eye(P0.shape[0], dtype=P0.dtype)
        op = mpc.qp_setup(P, A)
        sol = solve(op, q, l, u)
        return jnp.sum(c * sol.x)

    theta = jnp.asarray(0.4, dtype=jnp.float64)
    g = float(jax.grad(loss)(theta))
    g_fd = _fd_grad(loss, jnp.asarray([theta]))[0]
    np.testing.assert_allclose(g, g_fd, rtol=2e-5, atol=2e-8)


def test_grad_wrt_A_matches_fd():
    P, A0, q, l, u = _random_box_qp(jax.random.PRNGKey(2))
    solve = mpc.make_implicit_qp_solver("admm", iters=300)
    c = jnp.linspace(0.5, 1.5, q.shape[0])
    V = jax.random.normal(jax.random.PRNGKey(3), A0.shape, A0.dtype)

    def loss(theta):
        op = mpc.qp_setup(A0[0, 0] * 0 + P, A0 + theta * V)
        sol = solve(op, q, l, u)
        return jnp.sum(c * sol.x)

    theta = jnp.asarray(0.05, dtype=jnp.float64)
    g = float(jax.grad(loss)(theta))
    g_fd = _fd_grad(loss, jnp.asarray([theta]))[0]
    np.testing.assert_allclose(g, g_fd, rtol=5e-5, atol=2e-8)


def test_vmap_grad_batches():
    """The implicit VJP is fixed-shape: vmap(grad(loss)) over scenarios."""
    P, A, q0, l, u = _random_box_qp(jax.random.PRNGKey(4))
    op = mpc.qp_setup(P, A)
    solve = mpc.make_implicit_qp_solver("admm", iters=200)
    c = jnp.ones_like(q0)

    def loss(qshift):
        sol = solve(op, q0 + qshift, l, u)
        return jnp.sum(c * sol.x)

    shifts = 0.1 * jax.random.normal(
        jax.random.PRNGKey(5), (4, q0.shape[0]), q0.dtype
    )
    gs = jax.vmap(jax.grad(loss))(shifts)
    assert gs.shape == shifts.shape
    g0 = jax.grad(loss)(shifts[0])
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(g0), rtol=1e-12)


@pytest.mark.slow
def test_session2_closed_loop_grad_vs_fd():
    """The VERDICT done-criterion: gradient of a session-2 closed-loop MPC
    loss wrt the initial state matches finite differences."""
    problem = mpc.session2_problem(N=8)
    ctrl = mpc.make_linear_mpc(
        problem, solver="admm", iters=400, dtype=jnp.float64
    )
    system = problem.system(jnp.float64)
    steps = 12

    def loss(x0):
        res = mpc.simulate(
            x0,
            system,
            steps=steps,
            policy=ctrl.policy(differentiable=True),
            policy_carry=ctrl.initial_carry(jnp.float64),
        )
        # quadratic trajectory cost (the session-2 objective shape)
        xs = res.states
        us = res.inputs
        return jnp.sum(xs[:, 0] ** 2 * 10.0 + xs[:, 1] ** 2) + 0.01 * jnp.sum(
            us**2
        )

    x0 = jnp.asarray([-90.0, 15.0], dtype=jnp.float64)
    # sanity: the loop itself must be healthy at this x0
    res = mpc.simulate(
        x0, system, steps=steps, policy=ctrl.policy(),
        policy_carry=ctrl.initial_carry(jnp.float64),
    )
    assert bool(np.all(np.asarray(res.logs["solver_success"])))

    g = np.asarray(jax.grad(loss)(x0))
    g_fd = _fd_grad(loss, x0, eps=1e-5)
    np.testing.assert_allclose(g, g_fd, rtol=1e-4, atol=1e-6)


def test_stagewise_implicit_grad_vs_fd():
    """Stagewise (Riccati-IP) implicit diff: gradients wrt x0, cost weights,
    dynamics, and bounds match finite differences (session-2 data)."""
    Ts = 0.3
    A = jnp.array([[1.0, Ts], [0.0, 1.0]], dtype=jnp.float64)
    B = jnp.array([[0.0], [Ts]], dtype=jnp.float64)
    Q = jnp.diag(jnp.asarray([10.0, 1.0], dtype=jnp.float64))
    R = jnp.diag(jnp.asarray([0.01], dtype=jnp.float64))
    x_lb = jnp.asarray([-150.0, -20.0], dtype=jnp.float64)
    x_ub = jnp.asarray([1.0, 25.0], dtype=jnp.float64)
    u_lb = jnp.asarray([-20.0], dtype=jnp.float64)
    u_ub = jnp.asarray([10.0], dtype=jnp.float64)
    N = 8

    def loss(theta):
        # theta perturbs x0, a dynamics entry, the R weight, and the u bound —
        # one scalar per parameter class
        x0 = jnp.asarray([-30.0, 23.0], dtype=jnp.float64) + theta[0] * jnp.ones(2)
        A_t = A.at[0, 1].add(theta[1])
        R_t = R * (1.0 + theta[2])
        u_ub_t = u_ub + theta[3]
        res = mpc.stagewise_ip_solve_implicit(
            A_t, B, Q, R_t, Q, x_lb, x_ub, u_lb, u_ub_t, x0, N=N, iters=40
        )
        return jnp.sum(res.us**2) + jnp.sum(res.xs[-1] ** 2)

    theta = jnp.zeros(4, dtype=jnp.float64)
    from model_predictive_control_tpu.solvers.riccati_ip import stagewise_ip_solve

    res = stagewise_ip_solve(
        A, B, Q, R, Q, x_lb, x_ub, u_lb, u_ub,
        jnp.asarray([-30.0, 23.0], dtype=jnp.float64), N=N, iters=40,
    )
    assert bool(res.success)
    # this scenario activates BOTH input and state bounds (v rides v_max=25)
    assert float(jnp.max(jnp.abs(res.lam_x))) > 1.0
    g = np.asarray(jax.grad(loss)(theta))
    g_fd = _fd_grad(loss, theta, eps=1e-6)
    np.testing.assert_allclose(g, g_fd, rtol=1e-4, atol=1e-6)


def test_stagewise_implicit_forward_matches_solver():
    Ts = 0.3
    A = jnp.array([[1.0, Ts], [0.0, 1.0]], dtype=jnp.float64)
    B = jnp.array([[0.0], [Ts]], dtype=jnp.float64)
    Q = jnp.diag(jnp.asarray([10.0, 1.0], dtype=jnp.float64))
    R = jnp.diag(jnp.asarray([0.01], dtype=jnp.float64))
    x0 = jnp.asarray([-10.0, 8.0], dtype=jnp.float64)
    args = (
        A, B, Q, R, Q,
        jnp.asarray([-150.0, -20.0], dtype=jnp.float64),
        jnp.asarray([1.0, 25.0], dtype=jnp.float64),
        jnp.asarray([-20.0], dtype=jnp.float64),
        jnp.asarray([10.0], dtype=jnp.float64),
        x0,
    )
    from model_predictive_control_tpu.solvers.riccati_ip import stagewise_ip_solve

    r1 = mpc.stagewise_ip_solve_implicit(*args, N=8, iters=30)
    r2 = stagewise_ip_solve(*args, N=8, iters=30)
    np.testing.assert_allclose(np.asarray(r1.us), np.asarray(r2.us), atol=1e-12)


@pytest.mark.slow
def test_al_ilqr_implicit_grad_vs_fd():
    """Nonlinear (parking) implicit diff: d(loss)/d(x0) through al_ilqr_solve
    matches finite differences, with active input-box constraints."""
    from model_predictive_control_tpu.models.parameters import VehicleParameters
    from model_predictive_control_tpu.solvers.parking import make_parking_ilqr

    params = VehicleParameters()
    prob, cons, nc = make_parking_ilqr(
        params, N=10, ts=0.1, x_obs=None, dtype=jnp.float64
    )
    solve = mpc.make_implicit_al_ilqr_solver(
        prob, cons, nc, outer_iters=12, inner_iters=40, viol_tol=1e-9
    )

    x0 = jnp.asarray([0.55, -0.22, 0.0, 0.0], dtype=jnp.float64)
    sol = solve(x0)
    assert bool(sol.converged)
    assert float(jnp.max(sol.lams)) > 1e-3  # some constraint is active

    def loss(x0):
        sol = solve(x0)
        return jnp.sum(sol.us**2) + 10.0 * jnp.sum(sol.xs[-1][:2] ** 2)

    g = np.asarray(jax.grad(loss)(x0))
    # eps must sit below the AL solver's re-solve noise floor: at 1e-6 the FD
    # quotient samples iteration-count discontinuities (verified: 1e-5 and
    # 1e-7 agree with the implicit gradient, 1e-6 is the outlier)
    g_fd = _fd_grad(loss, x0, eps=1e-7)
    np.testing.assert_allclose(g, g_fd, rtol=2e-3, atol=1e-5)


@pytest.mark.slow
def test_al_ilqr_implicit_cost_gradient():
    """sol.cost cotangent path: d(optimal cost)/d(x0) = lagrangian gradient."""
    from model_predictive_control_tpu.models.parameters import VehicleParameters
    from model_predictive_control_tpu.solvers.parking import make_parking_ilqr

    params = VehicleParameters()
    prob, cons, nc = make_parking_ilqr(
        params, N=8, ts=0.1, x_obs=None, dtype=jnp.float64
    )
    solve = mpc.make_implicit_al_ilqr_solver(
        prob, cons, nc, outer_iters=12, inner_iters=40, viol_tol=1e-9
    )
    x0 = jnp.asarray([0.5, -0.2, 0.0, 0.0], dtype=jnp.float64)

    def loss(x0):
        return solve(x0).cost

    g = np.asarray(jax.grad(loss)(x0))
    g_fd = _fd_grad(loss, x0, eps=1e-6)
    np.testing.assert_allclose(g, g_fd, rtol=2e-3, atol=1e-6)
