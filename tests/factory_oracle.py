"""Shared XLA-oracle helpers for the fused-tracker-factory certification
tests (test_ilqr_factory*.py, test_parking_factory.py).

Builds ``vmap(al_ilqr_solve)`` on EXACTLY the OCP a factory kernel solves —
same prediction model (rk4_fine or Euler via ``rowform_to_vector``), same
diagonal tracking/regulation cost, same AL constraint rows in the kernel's
order: [u-box (2nu)] (+ [x-box (2nx)]) (+ n_extra user rows) — so kernel
solutions can be certified by the warm-started-stationarity + cost-dominance
pattern established in test_pallas_ilqr_dyn.py.

Not a test module (no ``test_`` prefix): imported by the factory test files
through pytest's rootdir sys.path insertion.
"""

import jax
import jax.numpy as jnp
import numpy as np

from model_predictive_control_tpu.ops.integrators import euler_fine, rk4_fine
from model_predictive_control_tpu.ops.pallas.ilqr_factory import (
    rowform_to_vector,
)
from model_predictive_control_tpu.solvers.ilqr import ILQRProblem, al_ilqr_solve


def _pred(ode, ts, substeps, integrator):
    if integrator == "euler":
        return euler_fine(ode, ts, substeps=substeps)
    return rk4_fine(ode, ts, substeps=substeps)


def _cons_fn(nx, nu, limits, state_limits, extra_constraints, extra_has_params):
    lb_u = jnp.asarray(limits[0], jnp.float32)
    ub_u = jnp.asarray(limits[1], jnp.float32)
    if state_limits is not None:
        lb_x = jnp.asarray(state_limits[0], jnp.float32)
        ub_x = jnp.asarray(state_limits[1], jnp.float32)

    def cons(xx, uu, pp):
        rows = [uu - ub_u, lb_u - uu]
        if state_limits is not None:
            rows += [xx - ub_x, lb_x - xx]
        if extra_constraints is not None:
            xr = tuple(xx[i] for i in range(nx))
            ur = tuple(uu[j] for j in range(nu))
            if extra_has_params:
                pr = tuple(pp[k] for k in range(pp.shape[0]))
                erows = extra_constraints(xr, ur, pr)
            else:
                erows = extra_constraints(xr, ur)
            rows += [jnp.stack([jnp.asarray(r).reshape(()) for r in erows])]
        return jnp.concatenate(rows)

    n_extra_probe = 0
    return cons, n_extra_probe


def xla_solve_batch(
    ode_rows, nx, nu, x0s, refs, limits, state_limits, weights,
    N, ts, substeps, outer_iters, inner_iters,
    u_init=None, integrator="rk4", extra_constraints=None, n_extra=0,
    params=None, n_params=0,
):
    """vmap(al_ilqr_solve) on the factory kernel's OCP. ``refs=None`` =
    regulation to the origin. ``params`` (B, n_params) feeds per-scenario
    ODE (and extra-constraint) parameters."""
    has_p = n_params > 0

    def make_ode(pvec):
        if has_p:
            pr = tuple(pvec[k] for k in range(n_params))
            return rowform_to_vector(
                lambda xr, ur: ode_rows(xr, ur, pr), nx, nu
            )
        return rowform_to_vector(ode_rows, nx, nu)

    Qd = jnp.asarray(weights[0], jnp.float32)
    Rd = jnp.asarray(weights[1], jnp.float32)
    QNd = weights[2] * Qd
    cons, _ = _cons_fn(
        nx, nu, limits, state_limits, extra_constraints, extra_has_params=has_p
    )
    nc = 2 * nu + (2 * nx if state_limits is not None else 0) + n_extra

    def one(x0, window, ui, pvec):
        pred = _pred(make_ode(pvec), ts, substeps, integrator)

        def stage_cost(xx, uu, t):
            e = xx if window is None else xx - window[t]
            return e @ (Qd * e) + uu @ (Rd * uu)

        def terminal_cost(xx):
            e = xx if window is None else xx - window[N]
            return e @ (QNd * e)

        prob = ILQRProblem(
            dynamics=lambda xx, uu, t: pred(xx, uu),
            stage_cost=stage_cost,
            terminal_cost=terminal_cost,
            N=N, nx=nx, nu=nu,
        )
        return al_ilqr_solve(
            prob, lambda xx, uu, t: cons(xx, uu, pvec), nc, x0, u_init=ui,
            outer_iters=outer_iters, inner_iters=inner_iters, viol_tol=1e-4,
        )

    B = x0s.shape[0]
    if u_init is None:
        u_init = jnp.zeros((B, N, nu), jnp.float32)
    if params is None:
        params = jnp.zeros((B, 0), jnp.float32)
    in_axes = (0, None if refs is None else 0, 0, 0)
    return jax.jit(jax.vmap(one, in_axes=in_axes))(x0s, refs, u_init, params)


def ocp_cost(
    ode_rows, nx, nu, us, window, x0, weights, N, ts, substeps,
    integrator="rk4", pvec=None, n_params=0,
):
    """f64 cost of a control sequence under the shared OCP (no AL terms)."""
    if n_params > 0:
        pr = tuple(jnp.float64(pvec[k]) for k in range(n_params))
        ode = rowform_to_vector(lambda xr, ur: ode_rows(xr, ur, pr), nx, nu)
    else:
        ode = rowform_to_vector(ode_rows, nx, nu)
    pred = _pred(ode, ts, substeps, integrator)
    Qd = np.asarray(weights[0], np.float64)
    Rd = np.asarray(weights[1], np.float64)
    QNd = weights[2] * Qd
    x = jnp.asarray(x0, jnp.float64)
    c = 0.0
    for t in range(N):
        e = np.asarray(x) - (
            0.0 if window is None else np.asarray(window[t], np.float64)
        )
        u = np.asarray(us[t], np.float64)
        c += e @ (Qd * e) + u @ (Rd * u)
        x = pred(x, jnp.asarray(us[t], jnp.float64))
    e = np.asarray(x) - (
        0.0 if window is None else np.asarray(window[N], np.float64)
    )
    return c + e @ (QNd * e)


def certify_against_oracle(
    ode_rows, nx, nu, x0s, refs, limits, state_limits, weights, sol_k,
    N, ts, substeps, outer_iters, inner_iters,
    atol, integrator="rk4", extra_constraints=None, n_extra=0,
    params=None, n_params=0, rel_cost_gap=5e-4,
):
    """The two-sided certificate from test_ilqr_factory.py:

    1. stationarity — the x64 XLA oracle warm-started AT the kernel's
       solution stays there (u-atol) and lands at an equivalent cost;
    2. cost dominance — the kernel's point is never worse than the cold
       XLA solve.
    """
    kw = dict(
        N=N, ts=ts, substeps=substeps, outer_iters=outer_iters,
        inner_iters=inner_iters, integrator=integrator,
        extra_constraints=extra_constraints, n_extra=n_extra,
        params=params, n_params=n_params,
    )
    sol_w = xla_solve_batch(
        ode_rows, nx, nu, x0s, refs, limits, state_limits, weights,
        u_init=sol_k.us, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(sol_w.us), np.asarray(sol_k.us), atol=atol
    )
    sol_x = xla_solve_batch(
        ode_rows, nx, nu, x0s, refs, limits, state_limits, weights, **kw
    )
    for i in range(x0s.shape[0]):
        cost_kw = dict(
            N=N, ts=ts, substeps=substeps, integrator=integrator,
            pvec=None if params is None else np.asarray(params[i]),
            n_params=n_params,
        )
        win = None if refs is None else refs[i]
        ck = ocp_cost(
            ode_rows, nx, nu, np.asarray(sol_k.us[i]), win, x0s[i],
            weights, **cost_kw,
        )
        cw = ocp_cost(
            ode_rows, nx, nu, np.asarray(sol_w.us[i]), win, x0s[i],
            weights, **cost_kw,
        )
        cx = ocp_cost(
            ode_rows, nx, nu, np.asarray(sol_x.us[i]), win, x0s[i],
            weights, **cost_kw,
        )
        assert abs(cw - ck) <= rel_cost_gap * (1.0 + abs(ck)), (i, ck, cw)
        assert ck <= cx + rel_cost_gap * (1.0 + abs(cx)), (i, ck, cx)
    return sol_w, sol_x
