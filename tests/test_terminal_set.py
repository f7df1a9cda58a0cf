"""LQR terminal set (invariant DARE ellipsoid + certified inner box).

BASELINE config 3 names "tracking MPC with terminal cost/set"; the reference
implements neither (sessions 2/3 committed only problem data). These tests
certify the set-theoretic claims directly in float64 and the closed-loop
property the construction exists for: recursive feasibility — an MPC that is
feasible at step 0 stays feasible at every later step.
"""

import jax
import jax.numpy as jnp
import numpy as np

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.solvers.lqr import lqr_terminal_set


def _session2_boxes(dtype=jnp.float64):
    problem = mpc.session2_problem(N=20)
    sys_ = problem.system(dtype)
    Q = jnp.diag(jnp.asarray(problem.Q, dtype))
    R = jnp.diag(jnp.asarray(problem.R, dtype))
    x_lb = jnp.asarray([problem.p_min, problem.v_min], dtype)
    x_ub = jnp.asarray([problem.p_max, problem.v_max], dtype)
    u_lb = jnp.asarray([problem.u_min], dtype)
    u_ub = jnp.asarray([problem.u_max], dtype)
    return problem, sys_, Q, R, x_lb, x_ub, u_lb, u_ub


def test_ellipsoid_certificates():
    """On the boundary of E(α): all boxes hold, u = Kx is admissible, and the
    closed-loop successor stays inside E(α) (positive invariance)."""
    _, sys_, Q, R, x_lb, x_ub, u_lb, u_ub = _session2_boxes()
    P, K, alpha, d = lqr_terminal_set(
        sys_.A, sys_.B, Q, R, x_lb, x_ub, u_lb, u_ub
    )
    assert float(alpha) > 0.0

    # boundary samples: x = sqrt(alpha) * P^{-1/2} v, |v| = 1
    w, V = np.linalg.eigh(np.asarray(P))
    P_inv_half = V @ np.diag(w ** -0.5) @ V.T
    thetas = np.linspace(0.0, 2.0 * np.pi, 97)
    dirs = np.stack([np.cos(thetas), np.sin(thetas)], axis=1)
    xs = (np.sqrt(float(alpha)) * dirs) @ P_inv_half.T  # (97, 2)

    tol = 1e-9
    us = xs @ np.asarray(K).T
    assert np.all(xs >= np.asarray(x_lb) - tol) and np.all(
        xs <= np.asarray(x_ub) + tol
    )
    assert np.all(us >= np.asarray(u_lb) - tol) and np.all(
        us <= np.asarray(u_ub) + tol
    )
    x_next = xs @ (np.asarray(sys_.A) + np.asarray(sys_.B) @ np.asarray(K)).T
    lvl = np.einsum("ri,ij,rj->r", x_next, np.asarray(P), x_next)
    assert np.all(lvl <= float(alpha) * (1.0 + 1e-9))

    # the inner box's corners lie inside the ellipsoid
    corners = np.asarray(d) * np.array(
        [[1, 1], [1, -1], [-1, 1], [-1, -1]], dtype=np.float64
    )
    lvl_c = np.einsum("ri,ij,rj->r", corners, np.asarray(P), corners)
    assert np.all(lvl_c <= float(alpha) * (1.0 + 1e-9))


def test_alpha_is_tight_to_some_constraint():
    """α is the exact level at which the first box row touches the ellipsoid:
    some constraint attains equality on E(α) (maximality, not just soundness)."""
    _, sys_, Q, R, x_lb, x_ub, u_lb, u_ub = _session2_boxes()
    P, K, alpha, _ = lqr_terminal_set(
        sys_.A, sys_.B, Q, R, x_lb, x_ub, u_lb, u_ub
    )
    P_inv = np.linalg.inv(np.asarray(P))
    rows, bounds = [], []
    for i in range(2):
        rows.append(np.eye(2)[i])
        bounds.append(min(float(x_ub[i]), -float(x_lb[i])))
    rows.append(np.asarray(K)[0])
    bounds.append(min(float(u_ub[0]), -float(u_lb[0])))
    supports = [
        np.sqrt(float(alpha) * r @ P_inv @ r) / b for r, b in zip(rows, bounds)
    ]
    assert np.isclose(max(supports), 1.0, rtol=1e-9)


def test_closed_loop_recursive_feasibility():
    """Terminal-set MPC: feasible at step 0 ⇒ solver succeeds at EVERY step and
    the state converges to the origin (the property the set construction buys)."""
    problem = mpc.session2_problem(N=20)
    ctrl = mpc.make_linear_mpc(
        problem, solver="pdip", iters=40, dtype=jnp.float64, terminal_set=True
    )
    # terminal rows actually tightened
    nx = 2
    assert float(ctrl.qp.x_ub[-nx]) < float(ctrl.qp.x_ub[-2 * nx])

    system = problem.system(jnp.float64)
    x0 = jnp.asarray([-15.0, 8.0], jnp.float64)
    res = mpc.simulate(
        x0, system, steps=40,
        policy=ctrl.policy(), policy_carry=ctrl.initial_carry(jnp.float64),
    )
    assert bool(jnp.all(res.logs["solver_success"]))
    assert float(jnp.linalg.norm(res.states[-1])) < 1e-3


def test_stagewise_terminal_set_closed_loop():
    """The long-horizon stagewise controller takes per-stage bounds natively:
    terminal_set=True tightens only the last stage and preserves recursive
    feasibility in closed loop; the Pallas backend rejects stagewise bounds
    with a clear error."""
    problem = mpc.session2_problem(N=20)
    ctrl = mpc.make_stagewise_mpc(
        problem, iters=25, dtype=jnp.float64, terminal_set=True
    )
    assert ctrl.x_ub.shape == (20, 2)
    assert float(ctrl.x_ub[-1, 1]) < float(ctrl.x_ub[0, 1])

    system = problem.system(jnp.float64)
    res = mpc.simulate(
        jnp.asarray([-15.0, 8.0], jnp.float64), system, steps=40,
        policy=ctrl.policy(), policy_carry=ctrl.initial_carry(jnp.float64),
    )
    assert bool(jnp.all(res.logs["solver_success"]))
    assert float(jnp.linalg.norm(res.states[-1])) < 1e-3

    try:
        ctrl.batched_policy(backend="pallas")
    except NotImplementedError:
        pass
    else:
        raise AssertionError("pallas backend must reject per-stage bounds")


def test_terminal_set_rejects_x_ref():
    problem = mpc.session2_problem(N=20)
    try:
        mpc.make_linear_mpc(
            problem, terminal_set=True, x_ref=jnp.asarray([0.5, 0.0])
        )
    except ValueError:
        return
    raise AssertionError("terminal_set + x_ref should raise")
