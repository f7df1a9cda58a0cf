"""iLQR / AL-iLQR: trajectory optimization by Riccati sweeps (DDP family).

A second nonlinear solver family alongside the condensed SQP (``solvers/sqp.py``),
covering the same session-4 capability (single OCP solve → receding-horizon MPC,
``session_4/main.py:29-129``) with a different algorithmic shape that fits TPUs
even better at long horizons:

- the backward pass is a time-varying Riccati recursion — one ``lax.scan`` of
  small-matrix algebra (nx=4), no condensed (N·nu)² Hessian ever materializes, so
  cost per iteration is O(N) instead of O(N²)–O(N³);
- the forward pass is a rollout under the affine policy ``u = û + α k + K (x−x̂)``,
  line-searched over a fixed α grid evaluated branch-free with ``vmap``;
- constraints (input boxes, state boxes, covering-circle clearances) enter by
  **augmented Lagrangian**: an outer loop adds ``μ/2 ‖c⁺‖² + λᵀc`` penalty terms
  to the stage cost and updates multipliers — the AL-iLQR/ALTRO pattern — so the
  inner problem stays an *unconstrained* iLQR that jits and vmaps cleanly.

Everything is fixed-shape with status masks; the inner and outer loops are
bounded ``lax.while_loop``s with NaN-safe convergence exits (warm-started
receding-horizon steps exit after one or two rounds instead of the full budget),
so the solver nests inside closed-loop scans and shards over scenario batches
like every other solver in the engine. The while_loops make the solver
forward-mode-only: ``jax.grad`` through a solve is not supported (use the
fixed-length history of a closed-loop scan, or implicit differentiation at the
KKT point, if solver gradients are ever needed).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import solver_precision
from ..utils.pytree import pytree_dataclass


class ILQRProblem(NamedTuple):
    """Unconstrained trajectory-optimization problem for the inner iLQR.

    dynamics(x, u, t) -> x_next          (discrete step)
    stage_cost(x, u, t) -> scalar        (k = 0..N-1)
    terminal_cost(x) -> scalar
    """

    dynamics: Callable
    stage_cost: Callable
    terminal_cost: Callable
    N: int
    nx: int
    nu: int


@pytree_dataclass
class ILQRSolution:
    us: jnp.ndarray  # (N, nu) optimal controls
    xs: jnp.ndarray  # (N + 1, nx) optimal trajectory
    cost: jnp.ndarray  # ()
    grad_norm: jnp.ndarray  # () ∞-norm of the control-space gradient
    converged: jnp.ndarray  # () bool


def _rollout(prob: ILQRProblem, x0, us):
    def f(x, uk):
        u, t = uk
        xn = prob.dynamics(x, u, t)
        return xn, xn

    ts = jnp.arange(prob.N)
    _, xs = jax.lax.scan(f, x0, (us, ts))
    return jnp.concatenate([x0[None], xs], axis=0)


def _total_cost(prob: ILQRProblem, xs, us):
    ts = jnp.arange(prob.N)
    stage = jax.vmap(prob.stage_cost)(xs[:-1], us, ts)
    return jnp.sum(stage) + prob.terminal_cost(xs[-1])


@solver_precision
def ilqr_solve(
    prob: ILQRProblem,
    x0: jnp.ndarray,
    u_init: jnp.ndarray | None = None,
    iters: int = 50,
    reg_init: float = 1.0,
    reg_min: float = 1e-8,
    reg_max: float = 1e8,
    tol: float = 1e-6,
) -> ILQRSolution:
    """Fixed-iteration iLQR with Levenberg-regularized backward passes.

    Regularization adapts like a trust region: successful line searches shrink it,
    rejected sweeps grow it (branch-free ``where`` updates). Derivatives of the
    dynamics/cost come from ``jax.jacfwd``/``jax.hessian`` per stage under
    ``vmap`` — the reference needs CasADi for exactly this (``main.py:41-113``).
    """
    N, nx, nu = prob.N, prob.nx, prob.nu
    dtype = x0.dtype
    if u_init is None:
        u_init = jnp.zeros((N, nu), dtype=dtype)

    ts = jnp.arange(N)
    alphas = jnp.asarray(
        [1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.01, 0.0], dtype=dtype
    )

    fx_fn = jax.vmap(jax.jacfwd(prob.dynamics, argnums=0))
    fu_fn = jax.vmap(jax.jacfwd(prob.dynamics, argnums=1))
    lx_fn = jax.vmap(jax.grad(prob.stage_cost, argnums=0))
    lu_fn = jax.vmap(jax.grad(prob.stage_cost, argnums=1))
    lxx_fn = jax.vmap(jax.hessian(prob.stage_cost, argnums=0))
    luu_fn = jax.vmap(jax.hessian(prob.stage_cost, argnums=1))
    lux_fn = jax.vmap(jax.jacfwd(jax.grad(prob.stage_cost, argnums=1), argnums=0))

    def backward(xs, us, reg):
        A = fx_fn(xs[:-1], us, ts)  # (N, nx, nx)
        B = fu_fn(xs[:-1], us, ts)  # (N, nx, nu)
        lx = lx_fn(xs[:-1], us, ts)
        lu = lu_fn(xs[:-1], us, ts)
        lxx = lxx_fn(xs[:-1], us, ts)
        luu = luu_fn(xs[:-1], us, ts)
        lux = lux_fn(xs[:-1], us, ts)
        Vx = jax.grad(prob.terminal_cost)(xs[-1])
        Vxx = jax.hessian(prob.terminal_cost)(xs[-1])

        I_u = jnp.eye(nu, dtype=dtype)

        def bstep(carry, inp):
            Vx, Vxx, dV, ok = carry
            Ak, Bk, lxk, luk, lxxk, luuk, luxk = inp
            Qx = lxk + Ak.T @ Vx
            Qu = luk + Bk.T @ Vx
            Qxx = lxxk + Ak.T @ Vxx @ Ak
            Quu = luuk + Bk.T @ Vxx @ Bk
            Qux = luxk + Bk.T @ Vxx @ Ak
            Quu_r = Quu + reg * I_u
            # solve via eigen-safe symmetric solve; flag failure if not PD
            Quu_r = 0.5 * (Quu_r + Quu_r.T)
            L, low = jax.scipy.linalg.cho_factor(Quu_r)
            diag_ok = jnp.all(jnp.isfinite(L)) & jnp.all(
                jnp.diag(L) > 0.0
            )
            k_g = -jax.scipy.linalg.cho_solve((L, low), Qu)
            K_g = -jax.scipy.linalg.cho_solve((L, low), Qux)
            Vx_n = Qx + K_g.T @ Quu @ k_g + K_g.T @ Qu + Qux.T @ k_g
            Vxx_n = Qxx + K_g.T @ Quu @ K_g + K_g.T @ Qux + Qux.T @ K_g
            Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
            dV_n = dV + k_g @ Qu + 0.5 * k_g @ Quu @ k_g
            return (Vx_n, Vxx_n, dV_n, ok & diag_ok), (k_g, K_g, Qu)

        (_, _, dV, ok), (ks, Ks, Qus) = jax.lax.scan(
            bstep,
            (Vx, Vxx, jnp.zeros((), dtype), jnp.asarray(True)),
            (A, B, lx, lu, lxx, luu, lux),
            reverse=True,
        )
        grad_norm = jnp.max(jnp.abs(Qus))
        return ks, Ks, dV, ok, grad_norm

    def forward(xs, us, ks, Ks, alpha):
        def f(x, inp):
            xh, uh, k_g, K_g, t = inp
            u = uh + alpha * k_g + K_g @ (x - xh)
            xn = prob.dynamics(x, u, t)
            return xn, (xn, u)

        _, (xs_n, us_n) = jax.lax.scan(
            f, xs[0], (xs[:-1], us, ks, Ks, ts)
        )
        xs_n = jnp.concatenate([xs[:1], xs_n], axis=0)
        return xs_n, us_n

    def body(carry):
        i, xs, us, cost, reg, _grad = carry
        ks, Ks, dV, ok, grad_norm = backward(xs, us, reg)

        def try_alpha(a):
            xs_a, us_a = forward(xs, us, ks, Ks, a)
            return _total_cost(prob, xs_a, us_a), xs_a, us_a

        costs, xs_all, us_all = jax.vmap(try_alpha)(alphas)
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
        best = jnp.argmin(costs)
        improved = ok & (costs[best] < cost - 1e-12)
        xs_n = jnp.where(improved, xs_all[best], xs)
        us_n = jnp.where(improved, us_all[best], us)
        cost_n = jnp.where(improved, costs[best], cost)
        # Levenberg adaptation: shrink on success, grow on rejection
        reg_n = jnp.where(
            improved,
            jnp.maximum(reg * 0.5, reg_min),
            jnp.minimum(reg * 10.0, reg_max),
        )
        return i + 1, xs_n, us_n, cost_n, reg_n, grad_norm

    def not_done(carry):
        i, _xs, _us, _cost, _reg, grad = carry
        # Run the full budget unless the gradient is already far below tol
        # (100x margin): exiting right AT tol measurably under-converges the
        # augmented-Lagrangian outer loop, while the 100x-converged case
        # genuinely has nothing left to do. NaN-safe: a NaN grad (non-PD Quu
        # at high AL penalty before regularization catches up) must KEEP
        # iterating — `nan >= x` is False and would exit the loop with a
        # frozen iterate (measured: the obs12 AL stalls at viol 5e-4).
        return jnp.logical_and(i < iters, jnp.logical_not(grad < 0.01 * tol))

    xs0 = _rollout(prob, x0, u_init)
    cost0 = _total_cost(prob, xs0, u_init)
    _, xs, us, cost, _, grad_norm = jax.lax.while_loop(
        not_done,
        body,
        (
            jnp.int32(0), xs0, u_init, cost0,
            jnp.asarray(reg_init, dtype), jnp.asarray(jnp.inf, dtype),
        ),
    )
    return ILQRSolution(
        us=us,
        xs=xs,
        cost=cost,
        grad_norm=grad_norm,
        converged=grad_norm < tol,
    )


@pytree_dataclass
class ALILQRSolution:
    us: jnp.ndarray  # (N, nu)
    xs: jnp.ndarray  # (N + 1, nx)
    cost: jnp.ndarray  # () true (unpenalized) cost
    viol: jnp.ndarray  # () max constraint violation
    converged: jnp.ndarray  # () bool
    lams: jnp.ndarray  # (N, nc) converged AL multipliers (≥ 0, for c ≤ 0)


def al_ilqr_solve(
    prob: ILQRProblem,
    constraints: Callable,  # (x, u, t) -> c with c ≤ 0 feasible, shape (nc,)
    n_constraints: int,
    x0: jnp.ndarray,
    u_init: jnp.ndarray | None = None,
    outer_iters: int = 10,
    inner_iters: int = 25,
    mu_init: float = 10.0,
    mu_scale: float = 10.0,
    mu_max: float = 1e8,
    viol_tol: float = 1e-6,
) -> ALILQRSolution:
    """Augmented-Lagrangian iLQR for inequality-constrained OCPs (ALTRO pattern).

    Stage constraints ``c(x, u, t) ≤ 0`` are absorbed into the stage cost as
    ``Σ_i  λ_i c_i + μ/2 max(0, c_i + λ_i/μ)²``-style penalties; after each inner
    iLQR solve the multipliers update ``λ ← max(0, λ + μ c)`` and μ escalates
    while the violation exceeds tolerance. Everything stays fixed-shape: the
    outer loop is a ``lax.scan`` carrying (λ, μ).
    """
    N = prob.N
    dtype = x0.dtype
    if u_init is None:
        u_init = jnp.zeros((N, prob.nu), dtype=dtype)

    def penalized(lams, mu):
        def stage(x, u, t):
            c = constraints(x, u, t)
            lam = lams[t]
            # PHR augmented Lagrangian for c ≤ 0:
            #   φ = 1/(2μ) (max(0, λ + μ c)² − λ²)
            act = jnp.maximum(0.0, lam + mu * c)
            phi = jnp.sum(act * act - lam * lam) / (2.0 * mu)
            return prob.stage_cost(x, u, t) + phi

        return ILQRProblem(
            dynamics=prob.dynamics,
            stage_cost=stage,
            terminal_cost=prob.terminal_cost,
            N=N,
            nx=prob.nx,
            nu=prob.nu,
        )

    ts = jnp.arange(N)

    def outer(carry):
        oi, us, lams, mu, _viol, _lam_step = carry
        sol = ilqr_solve(penalized(lams, mu), x0, u_init=us, iters=inner_iters)
        cs = jax.vmap(constraints)(sol.xs[:-1], sol.us, ts)  # (N, nc)
        viol = jnp.max(jnp.maximum(cs, 0.0))
        lams_n = jnp.maximum(0.0, lams + mu * cs)
        # multiplier movement, relative: small only when the dual estimate has
        # settled (primal feasibility alone exits before complementarity is
        # tight — measured 1e-5-grade cost error vs the oracle)
        lam_step = jnp.max(jnp.abs(lams_n - lams)) / (
            1.0 + jnp.max(jnp.abs(lams_n))
        )
        mu_n = jnp.where(viol > viol_tol, jnp.minimum(mu * mu_scale, mu_max), mu)
        return oi + 1, sol.us, lams_n, mu_n, viol, lam_step

    def not_done(carry):
        oi, _us, _lams, _mu, viol, lam_step = carry
        # AL termination = primal feasibility AND settled multipliers. Warm-
        # started receding-horizon steps (feasible us, near-stationary) exit
        # after a couple of outer rounds instead of the full schedule;
        # cold/infeasible scenarios still escalate mu through the budget.
        # NaN-safe: a NaN viol/lam_step must KEEP iterating (nan < x is False).
        solved = jnp.logical_and(viol < viol_tol, lam_step < 1e-3)
        return jnp.logical_and(oi < outer_iters, jnp.logical_not(solved))

    lams0 = jnp.zeros((N, n_constraints), dtype=dtype)
    _, us, lams, _, viol, _ = jax.lax.while_loop(
        not_done,
        outer,
        (
            jnp.int32(0), u_init, lams0, jnp.asarray(mu_init, dtype),
            jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
        ),
    )
    xs = _rollout(prob, x0, us)
    cost = _total_cost(prob, xs, us)
    return ALILQRSolution(
        us=us, xs=xs, cost=cost, viol=viol, converged=viol < viol_tol,
        lams=lams,
    )
