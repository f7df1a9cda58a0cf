"""Stagewise Riccati interior-point QP solver (the sparse / O(N) formulation).

The condensed path (``ops/condensed.py`` + ``solvers/qp.py``) eliminates the states
and hands a dense (N·nu)-variable box-QP to ADMM/PDIP — ideal at the headline N=20
where the batch axis dominates. Its cost, however, grows as O(N²) memory / O(N³)
factorization in the horizon. This module is the complementary *stagewise* solver:
the box-constrained LQ optimal-control problem

    min  Σ_{k=1}^{N-1} ½xₖᵀQxₖ + qₖᵀxₖ  +  ½x_NᵀP_f x_N + q_Nᵀx_N
         + Σ_{k=0}^{N-1} ½uₖᵀRuₖ + rₖᵀuₖ
    s.t. x_{k+1} = A xₖ + B uₖ,   x₀ fixed,
         x_lb ≤ xₖ ≤ x_ub (k=1..N),   u_lb ≤ uₖ ≤ u_ub (k=0..N-1)

is solved by a Mehrotra predictor-corrector primal-dual interior-point method whose
Newton systems keep the block-banded KKT structure: each IP iteration factors the
horizon with ONE backward Riccati sweep (a ``lax.scan``) and recovers the step with
affine backward/forward sweeps — O(N) work and memory per iteration, the classic
Rao–Wright–Rawlings / HPIPM structure re-expressed as fixed-shape JAX scans. The
factorization (gains ``K``, ``Quu⁻¹``, ``Qux``) is computed once per iteration and
shared by the predictor and corrector solves, which only re-propagate linear terms.

This replaces the role IPOPT plays for the reference (``session_4/main.py:39,116``)
for the long-horizon regime (N ≫ 20, e.g. the session-4 sol workload at N=50 and
beyond — BASELINE.md lists N=50/100-var problems), and doubles as an exact equality-
constrained LQ solver for SQP/iLQR inner loops. Everything is branch-free: fixed
iteration count, fraction-to-boundary steps as masked min-reductions, convergence
reported as data (``success`` mask), so it vmaps over scenario batches and shards
over meshes like every other solver in the engine.

Infinite bounds are allowed entry-wise in (x_lb, x_ub, u_lb, u_ub); their slack /
dual / barrier contributions are masked out rather than branched on.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import solver_precision
from ..utils.pytree import pytree_dataclass, static_field

_BIG = 1e20


def bound_scale(lb, ub, xp=jnp):
    """Per-entry variable scaling from box widths (shared equilibration rule).

    Two-sided bounds → half-width; one-sided → magnitude of the finite bound;
    unbounded → 1; floored at 1e-8. ``xp`` lets the Pallas kernel wrapper
    (``experimental/riccati_ip_kernel.py``) evaluate the SAME rule in float64
    numpy at trace time — one definition, no silent drift between the paths.
    """
    both = xp.isfinite(lb) & xp.isfinite(ub)
    one = xp.isfinite(lb) | xp.isfinite(ub)
    width = xp.where(both, 0.5 * (ub - lb), 0.0)
    single = xp.maximum(
        xp.abs(xp.where(xp.isfinite(lb), lb, 0.0)),
        xp.abs(xp.where(xp.isfinite(ub), ub, 0.0)),
    )
    return xp.maximum(xp.where(both, width, xp.where(one, single, 1.0)), 1e-8)


def cost_normalizer(Qs, Rs, Pf, xp=jnp):
    """Scalar cost scaling 1/max(|Q|, |R|, |Pf|, 1e-8) (shared with the kernel)."""
    return 1.0 / xp.maximum(
        xp.maximum(xp.max(xp.abs(Qs)), xp.max(xp.abs(Rs))),
        xp.maximum(xp.max(xp.abs(Pf)), 1e-8),
    )


class _Bounds(NamedTuple):
    """Per-bound-group interior-point state for one variable block ``z``.

    ``s_l/s_u`` are *independent* slack variables (not forced to ``z - lb``), so the
    iterate never needs to be primal-feasible — only strictly positive in (s, λ).
    Masked (infinite-bound) entries carry s=1, λ=0 and contribute nothing.
    """

    s_l: jnp.ndarray
    s_u: jnp.ndarray
    lam_l: jnp.ndarray
    lam_u: jnp.ndarray


def _bounds_init(z: jnp.ndarray, lb: jnp.ndarray, ub: jnp.ndarray) -> _Bounds:
    """Slacks from (clipped) bound distances, duals λ = 1/s.

    Balanced complementarity products (s·λ = 1 entry-wise, so μ₀ = 1) matter more
    to Mehrotra's σ heuristic than primal consistency: wildly unequal products make
    the affine step misjudge the achievable centering and stall the early phase.
    """
    mask_l = jnp.isfinite(lb)
    mask_u = jnp.isfinite(ub)
    dist_l = jnp.clip(z - lb, 1.0, _BIG)
    dist_u = jnp.clip(ub - z, 1.0, _BIG)
    one = jnp.ones_like(z)
    s_l = jnp.where(mask_l, dist_l, one)
    s_u = jnp.where(mask_u, dist_u, one)
    return _Bounds(
        s_l=s_l,
        s_u=s_u,
        lam_l=jnp.where(mask_l, 1.0 / s_l, 0.0),
        lam_u=jnp.where(mask_u, 1.0 / s_u, 0.0),
    )


def _masks(lb: jnp.ndarray, ub: jnp.ndarray):
    return jnp.isfinite(lb), jnp.isfinite(ub)


def _sigma_diag(b: _Bounds, lb, ub) -> jnp.ndarray:
    """Barrier Hessian diagonal Σ = λ_l/s_l + λ_u/s_u (masked)."""
    mask_l, mask_u = _masks(lb, ub)
    return jnp.where(mask_l, b.lam_l / b.s_l, 0.0) + jnp.where(
        mask_u, b.lam_u / b.s_u, 0.0
    )


def _primal_resid(z, b: _Bounds, lb, ub):
    """r_pl = z - s_l - lb, r_pu = z + s_u - ub (masked to 0 where no bound)."""
    mask_l, mask_u = _masks(lb, ub)
    r_pl = jnp.where(mask_l, z - b.s_l - lb, 0.0)
    r_pu = jnp.where(mask_u, z + b.s_u - ub, 0.0)
    return r_pl, r_pu


def _barrier_grad(z, b: _Bounds, lb, ub, sig_mu, corr_l, corr_u):
    """The bound groups' contribution to the Newton-system gradient g̃.

    Derived by eliminating (δs, δλ) from the perturbed KKT system:
        g̃ = ∇cost(z) - (σμ - corr_l)/s_l + (λ_l/s_l) r_pl
                      + (σμ - corr_u)/s_u + (λ_u/s_u) r_pu
    (``corr_*`` = Mehrotra second-order correction δλ_aff∘δs_aff; 0 in the
    predictor). This function returns everything except ∇cost(z).
    """
    mask_l, mask_u = _masks(lb, ub)
    r_pl, r_pu = _primal_resid(z, b, lb, ub)
    g_l = -(sig_mu - corr_l) / b.s_l + (b.lam_l / b.s_l) * r_pl
    g_u = (sig_mu - corr_u) / b.s_u + (b.lam_u / b.s_u) * r_pu
    return jnp.where(mask_l, g_l, 0.0) + jnp.where(mask_u, g_u, 0.0)


def _bound_step(z, b: _Bounds, lb, ub, dz, sig_mu, corr_l, corr_u):
    """Newton updates (δs_l, δs_u, δλ_l, δλ_u) given the primal direction δz."""
    mask_l, mask_u = _masks(lb, ub)
    r_pl, r_pu = _primal_resid(z, b, lb, ub)
    ds_l = jnp.where(mask_l, dz + r_pl, 0.0)
    ds_u = jnp.where(mask_u, -dz - r_pu, 0.0)
    dlam_l = jnp.where(
        mask_l, (sig_mu - corr_l - b.lam_l * b.s_l - b.lam_l * ds_l) / b.s_l, 0.0
    )
    dlam_u = jnp.where(
        mask_u, (sig_mu - corr_u - b.lam_u * b.s_u - b.lam_u * ds_u) / b.s_u, 0.0
    )
    return _Bounds(ds_l, ds_u, dlam_l, dlam_u)


def _alpha_max(b: _Bounds, db: _Bounds, lb, ub) -> jnp.ndarray:
    """Largest α ∈ (0, 1] keeping (s, λ) ≥ 0 along the direction (masked min)."""
    mask_l, mask_u = _masks(lb, ub)

    def ratio(v, dv, mask):
        r = jnp.where((dv < 0) & mask, -v / jnp.minimum(dv, -1e-30), _BIG)
        return jnp.min(r)

    return jnp.minimum(
        1.0,
        jnp.minimum(
            jnp.minimum(ratio(b.s_l, db.s_l, mask_l), ratio(b.s_u, db.s_u, mask_u)),
            jnp.minimum(
                ratio(b.lam_l, db.lam_l, mask_l), ratio(b.lam_u, db.lam_u, mask_u)
            ),
        ),
    )


def _bound_axpy(b: _Bounds, db: _Bounds, alpha) -> _Bounds:
    return _Bounds(
        b.s_l + alpha * db.s_l,
        b.s_u + alpha * db.s_u,
        b.lam_l + alpha * db.lam_l,
        b.lam_u + alpha * db.lam_u,
    )


def _gap_terms(b: _Bounds, lb, ub):
    """(Σ s·λ over finite bounds, finite-bound count) for the duality measure μ."""
    mask_l, mask_u = _masks(lb, ub)
    total = jnp.sum(jnp.where(mask_l, b.s_l * b.lam_l, 0.0)) + jnp.sum(
        jnp.where(mask_u, b.s_u * b.lam_u, 0.0)
    )
    count = jnp.sum(mask_l) + jnp.sum(mask_u)
    return total, count


# ---------------------------------------------------------------------------
# Riccati factorization + affine solves (the O(N) KKT solver)
# ---------------------------------------------------------------------------


class _LQFactors(NamedTuple):
    """Backward-sweep factorization of the block-banded Newton KKT system.

    Shared between the predictor and corrector solves of one IP iteration: only
    linear terms differ, so re-solving costs two cheap affine scans, not a second
    factorization.
    """

    K: jnp.ndarray  # (N, nu, nx) feedback gains
    Quu_inv: jnp.ndarray  # (N, nu, nu)
    Qux: jnp.ndarray  # (N, nu, nx)


@solver_precision
def lq_factor(As, Bs, Qts, Rts) -> _LQFactors:
    """Backward Riccati factorization for stagewise costs ``Qts`` (N+1) / ``Rts`` (N).

    ``As``/``Bs`` are stacked per-stage (LTV-capable); index k maps x_k → x_{k+1}.
    Same recursion as :func:`..ops.riccati.riccati_recursion` (reference
    ``session_1/session1_sol.py:44-65``) extended with the barrier-modified costs.
    """

    def step(P, inputs):
        A, B, Qt, Rt = inputs
        PB = P @ B
        Quu = Rt + B.T @ PB
        Quu = 0.5 * (Quu + Quu.T)
        Quu_inv = jnp.linalg.inv(Quu)
        Qux = PB.T @ A
        K = -Quu_inv @ Qux
        P_prev = Qt + A.T @ P @ A + Qux.T @ K
        P_prev = 0.5 * (P_prev + P_prev.T)
        return P_prev, (K, Quu_inv, Qux)

    # scan backward over stages N-1 .. 0
    _, (K, Quu_inv, Qux) = jax.lax.scan(
        step, Qts[-1], (As, Bs, Qts[:-1], Rts), reverse=True
    )
    return _LQFactors(K=K, Quu_inv=Quu_inv, Qux=Qux)


@solver_precision
def lq_affine_solve(factors: _LQFactors, As, Bs, qts, rts, x_init=None):
    """Solve for the Newton direction given linear terms (qts: N+1, rts: N).

    Backward pass propagates the affine value-function term p and feedforward
    kff = -Quu⁻¹(r̃ + Bᵀp'); forward pass rolls out δx₀ = ``x_init`` (default 0)
    under δu = Kδx + kff. Returns (δx: (N+1, nx), δu: (N, nu)). Passing the
    measured state as ``x_init`` with the raw cost linear terms solves the
    *absolute* unconstrained LQ problem (used for interior-point initialization).
    """

    def backward(p, inputs):
        A, B, q, r, K, Quu_inv, Qux = inputs
        qu = r + B.T @ p
        kff = -Quu_inv @ qu
        p_prev = q + A.T @ p + Qux.T @ kff
        return p_prev, kff

    _, kffs = jax.lax.scan(
        backward,
        qts[-1],
        (As, Bs, qts[:-1], rts, factors.K, factors.Quu_inv, factors.Qux),
        reverse=True,
    )

    def forward(dx, inputs):
        A, B, K, kff = inputs
        du = K @ dx + kff
        dx_next = A @ dx + B @ du
        return dx_next, (dx_next, du)

    nx = As.shape[-1]
    dx0 = jnp.zeros((nx,), qts.dtype) if x_init is None else x_init.astype(qts.dtype)
    _, (dxs, dus) = jax.lax.scan(forward, dx0, (As, Bs, factors.K, kffs))
    dxs = jnp.concatenate([dx0[None], dxs], axis=0)
    return dxs, dus


# ---------------------------------------------------------------------------
# The interior-point loop
# ---------------------------------------------------------------------------


@pytree_dataclass
class StagewiseIPResult:
    us: jnp.ndarray  # (N, nu)
    xs: jnp.ndarray  # (N+1, nx) — dynamics-consistent with us from x0
    mu: jnp.ndarray  # () final duality measure
    prim_res: jnp.ndarray  # () ∞-norm of slack primal residuals
    success: jnp.ndarray  # () bool
    lam_x: jnp.ndarray  # (N, nx) net state-bound multipliers (λ_u - λ_l)
    lam_u: jnp.ndarray  # (N, nu) net input-bound multipliers


@solver_precision
def stagewise_ip_solve(
    A: jnp.ndarray,
    B: jnp.ndarray,
    Q: jnp.ndarray,
    R: jnp.ndarray,
    Pf: jnp.ndarray,
    x_lb: jnp.ndarray,
    x_ub: jnp.ndarray,
    u_lb: jnp.ndarray,
    u_ub: jnp.ndarray,
    x0: jnp.ndarray,
    u_init: jnp.ndarray | None = None,
    q_lin: jnp.ndarray | None = None,
    r_lin: jnp.ndarray | None = None,
    *,
    N: int | None = None,
    iters: int = 20,
    tol: float = 1e-8,
    tau: float = 0.995,
    parallel: bool = False,
) -> StagewiseIPResult:
    """Solve the box-constrained LQ-OCP by Mehrotra predictor-corrector IP.

    ``A``/``B`` may be single matrices (LTI) or stacked ``(N, ...)`` (LTV); ``Q``/
    ``R`` likewise (``Q`` applies to x_1..x_{N-1}, ``Pf`` to x_N). Bounds broadcast
    entry-wise and admit ±inf. ``q_lin``/``r_lin`` are optional linear cost terms
    (shape (N+1, nx) / (N, nu)) for tracking / SQP-subproblem use.

    Fixed ``iters`` Newton-KKT iterations, each = one Riccati factorization + two
    affine sweeps. Branch-free; vmap over ``x0`` (and bounds/costs) for batching.

    ``parallel=True`` replaces every sequential Riccati sweep with the O(log N)-
    depth associative-scan LQT solver (:func:`..ops.parallel_horizon.
    lqt_solve_parallel`). The predictor and corrector then each pay a full
    parallel solve instead of sharing one factorization — a win only when the
    horizon is long enough (N in the hundreds) that the length-N scan's critical
    path dominates a solve; at the headline N=20 keep the default.
    """
    if N is None:
        if u_init is not None:
            N = int(u_init.shape[0])
        elif jnp.ndim(A) == 3:
            N = int(A.shape[0])
        else:
            raise ValueError("pass N= (or stacked A/B, or u_init) to size the horizon")

    x0 = jnp.asarray(x0)
    dt = x0.dtype
    nx = x0.shape[-1]
    nu = jnp.shape(B)[-1]

    As = jnp.broadcast_to(A, (N, nx, nx)).astype(dt)
    Bs = jnp.broadcast_to(B, (N, nx, nu)).astype(dt)
    Qs = jnp.broadcast_to(Q, (N, nx, nx)).astype(dt)  # used for stages 1..N-1
    Rs = jnp.broadcast_to(R, (N, nu, nu)).astype(dt)
    Pf = jnp.asarray(Pf, dt)

    x_lb = jnp.broadcast_to(jnp.asarray(x_lb, dt), (N, nx))
    x_ub = jnp.broadcast_to(jnp.asarray(x_ub, dt), (N, nx))
    u_lb = jnp.broadcast_to(jnp.asarray(u_lb, dt), (N, nu))
    u_ub = jnp.broadcast_to(jnp.asarray(u_ub, dt), (N, nu))
    q_lin = (
        jnp.zeros((N + 1, nx), dt) if q_lin is None else jnp.asarray(q_lin, dt)
    )
    r_lin = jnp.zeros((N, nu), dt) if r_lin is None else jnp.asarray(r_lin, dt)

    # ---- equilibration ----
    # Interior-point step lengths collapse when variables live on wildly different
    # scales (session 2: positions span 150, inputs 30, multipliers reach 1e4 —
    # cold-started λ = O(1) then needs dozens of iterations just to grow).
    # Diagonal variable scalings from the box widths plus one scalar cost scaling
    # make every variable, slack, and multiplier O(1); the IP converges in ~1/3
    # the iterations. Same role as Ruiz equilibration in ``qp_setup``
    # (solvers/qp.py), but computed structurally instead of iteratively.
    # (``bound_scale``/``cost_normalizer`` are module-level so the Pallas
    # kernel wrapper applies the identical rule.)
    w_x = jnp.max(bound_scale(x_lb, x_ub), axis=0)  # (nx,)
    w_u = jnp.max(bound_scale(u_lb, u_ub), axis=0)  # (nu,)

    As = As * (w_x[None, None, :] / w_x[None, :, None])
    Bs = Bs * (w_u[None, None, :] / w_x[None, :, None])
    Qs_sc = Qs * (w_x[None, :, None] * w_x[None, None, :])
    Rs_sc = Rs * (w_u[None, :, None] * w_u[None, None, :])
    Pf_sc = Pf * (w_x[:, None] * w_x[None, :])
    c_cost = cost_normalizer(Qs_sc, Rs_sc, Pf_sc)
    Qs = c_cost * Qs_sc
    Rs = c_cost * Rs_sc
    Pf = c_cost * Pf_sc
    q_lin = c_cost * q_lin * w_x[None, :]
    r_lin = c_cost * r_lin * w_u[None, :]
    x_lb_orig, x_ub_orig, u_lb_orig, u_ub_orig = x_lb, x_ub, u_lb, u_ub
    x_lb, x_ub = x_lb / w_x, x_ub / w_x
    u_lb, u_ub = u_lb / w_u, u_ub / w_u
    x0 = x0 / w_x
    if u_init is not None:
        u_init = jnp.asarray(u_init, dt) / w_u

    # stage-cost quadratic blocks with terminal Pf; Q̃ index 0 is never used
    # (δx₀ = 0) but must exist for the scan shapes.
    Q_full = jnp.concatenate([jnp.zeros((1, nx, nx), dt), Qs], axis=0)
    Q_full = Q_full.at[N].set(Pf)

    # KKT-solver switch: sequential Riccati (factor once, affine-solve cheaply)
    # vs O(log N)-depth parallel LQT (no shareable factorization — each solve is
    # a full associative scan). Same inputs, same solutions to rounding.
    if parallel:
        from ..ops.parallel_horizon import lqt_solve_parallel

        def kkt_factor(Qts, Rts):
            return (Qts, Rts)

        def kkt_solve(factors, qts, rts, x_init=None):
            Qts, Rts = factors
            xi = jnp.zeros((nx,), dt) if x_init is None else x_init
            return lqt_solve_parallel(As, Bs, Qts, Rts, qts, rts, xi)

    else:

        def kkt_factor(Qts, Rts):
            return lq_factor(As, Bs, Qts, Rts)

        def kkt_solve(factors, qts, rts, x_init=None):
            return lq_affine_solve(factors, As, Bs, qts, rts, x_init=x_init)

    def rollout(us):
        def rollout_step(x, inputs):
            Ak, Bk, u = inputs
            x_next = Ak @ x + Bk @ u
            return x_next, x_next

        _, xs_tail = jax.lax.scan(rollout_step, x0, (As, Bs, us))
        return jnp.concatenate([x0[None], xs_tail], axis=0)

    if u_init is None:
        # Warm point: the *unconstrained* LQ optimum (one Riccati factorization +
        # affine sweep in absolute variables from x0), with the controls clipped
        # strictly into their box and re-rolled. Input bounds then start feasible
        # and state-bound violations stay at closed-loop magnitudes — far better
        # conditioned than either a zero trajectory or the raw (possibly wildly
        # infeasible) unconstrained optimum.
        factors0 = kkt_factor(Q_full, Rs)
        _, us_free = kkt_solve(factors0, q_lin, r_lin, x_init=x0)
        margin = 1e-3 * jnp.minimum(jnp.abs(u_lb) + 1.0, jnp.abs(u_ub) + 1.0)
        lo = jnp.where(jnp.isfinite(u_lb), u_lb + margin, -_BIG)
        hi = jnp.where(jnp.isfinite(u_ub), u_ub - margin, _BIG)
        us0 = jnp.clip(us_free, lo, hi)
    else:
        us0 = jnp.asarray(u_init, dt)
    xs0 = rollout(us0)

    bx0 = _bounds_init(xs0[1:], x_lb, x_ub)
    bu0 = _bounds_init(us0, u_lb, u_ub)

    def cost_grad_x(xs):
        """∇ over x_1..x_N: stage Q for 1..N-1, Pf at N, plus linear terms."""
        g = jnp.einsum("kij,kj->ki", Q_full[1:], xs[1:]) + q_lin[1:]
        return g

    def cost_grad_u(us):
        return jnp.einsum("kij,kj->ki", Rs, us) + r_lin

    def mu_of(bx, bu):
        gx, cx = _gap_terms(bx, x_lb, x_ub)
        gu, cu = _gap_terms(bu, u_lb, u_ub)
        count = jnp.maximum(cx + cu, 1)
        return (gx + gu) / count

    def solve_direction(factors, xs, us, bx, bu, sig_mu, corr):
        corr_xl, corr_xu, corr_ul, corr_uu = corr
        g_x = cost_grad_x(xs) + _barrier_grad(
            xs[1:], bx, x_lb, x_ub, sig_mu, corr_xl, corr_xu
        )
        g_u = cost_grad_u(us) + _barrier_grad(
            us, bu, u_lb, u_ub, sig_mu, corr_ul, corr_uu
        )
        qts = jnp.concatenate([jnp.zeros((1, nx), dt), g_x], axis=0)
        dxs, dus = kkt_solve(factors, qts, g_u)
        dbx = _bound_step(xs[1:], bx, x_lb, x_ub, dxs[1:], sig_mu, corr_xl, corr_xu)
        dbu = _bound_step(us, bu, u_lb, u_ub, dus, sig_mu, corr_ul, corr_uu)
        return dxs, dus, dbx, dbu

    def iteration(_, state):
        xs, us, bx, bu = state
        mu = mu_of(bx, bu)

        # barrier-modified stage costs → one Riccati factorization per iteration
        sig_x = _sigma_diag(bx, x_lb, x_ub)  # (N, nx)
        sig_u = _sigma_diag(bu, u_lb, u_ub)  # (N, nu)
        Qts = Q_full.at[1:].add(jax.vmap(jnp.diag)(sig_x))
        Rts = Rs + jax.vmap(jnp.diag)(sig_u)
        factors = kkt_factor(Qts, Rts)

        zeros_corr = (
            jnp.zeros_like(sig_x),
            jnp.zeros_like(sig_x),
            jnp.zeros_like(sig_u),
            jnp.zeros_like(sig_u),
        )
        # predictor: pure Newton (σ = 0) to probe the achievable step
        dxs_a, dus_a, dbx_a, dbu_a = solve_direction(
            factors, xs, us, bx, bu, jnp.zeros((), dt), zeros_corr
        )
        alpha_aff = jnp.minimum(
            _alpha_max(bx, dbx_a, x_lb, x_ub), _alpha_max(bu, dbu_a, u_lb, u_ub)
        )
        bx_aff = _bound_axpy(bx, dbx_a, alpha_aff)
        bu_aff = _bound_axpy(bu, dbu_a, alpha_aff)
        mu_aff = mu_of(bx_aff, bu_aff)
        mu_safe = jnp.maximum(mu, 1e-30)
        sigma = jnp.clip((mu_aff / mu_safe) ** 3, 1e-8, 1.0)

        # corrector: recenter + Mehrotra second-order terms, same factorization
        corr = (
            dbx_a.lam_l * dbx_a.s_l,
            dbx_a.lam_u * dbx_a.s_u,
            dbu_a.lam_l * dbu_a.s_l,
            dbu_a.lam_u * dbu_a.s_u,
        )
        dxs, dus, dbx, dbu = solve_direction(
            factors, xs, us, bx, bu, sigma * mu, corr
        )
        alpha = tau * jnp.minimum(
            _alpha_max(bx, dbx, x_lb, x_ub), _alpha_max(bu, dbu, u_lb, u_ub)
        )
        xs_n = xs + alpha * dxs
        us_n = us + alpha * dus
        bx_n = _bound_axpy(bx, dbx, alpha)
        bu_n = _bound_axpy(bu, dbu, alpha)

        # Freeze once converged (active slacks underflow → Newton breakdown) and
        # reject non-finite candidates (infeasible problems diverge; the frozen
        # iterate then reports success=False instead of poisoning the batch).
        eps = jnp.finfo(dt).eps
        frozen = mu < 50.0 * eps
        finite = (
            jnp.all(jnp.isfinite(xs_n))
            & jnp.all(jnp.isfinite(us_n))
            & jnp.all(jnp.isfinite(bx_n.s_l))
            & jnp.all(jnp.isfinite(bx_n.lam_l))
            & jnp.all(jnp.isfinite(bu_n.s_l))
            & jnp.all(jnp.isfinite(bu_n.lam_l))
        )
        ok = jnp.logical_and(jnp.logical_not(frozen), finite)
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), new, old
        )
        return keep(xs_n, xs), keep(us_n, us), keep(bx_n, bx), keep(bu_n, bu)

    xs, us, bx, bu = jax.lax.fori_loop(0, iters, iteration, (xs0, us0, bx0, bu0))
    mu = mu_of(bx, bu)

    # ---- active-set polish (augmented-Lagrangian, Riccati-structured) ----
    # Interior-point accuracy on these ill-scaled problems plateaus around
    # √machine-eps; the condensed PDIP fixes this with a dense active-set polish
    # (solvers/qp.py::_polish). The stagewise analog: read the active set off the
    # slack/multiplier ratio, then re-solve the LQ problem with active bounds
    # enforced by an augmented-Lagrangian term (signed multiplier estimate λ̂ from
    # the IP iterate + quadratic penalty ρ), iterated twice with multiplier
    # updates. Each pass is one Riccati factorization + affine sweep, keeps the
    # O(N) structure, and snaps the iterate to a near-exact KKT point when the
    # active set is identified correctly.
    rho = jnp.asarray(1e8 if dt == jnp.float64 else 1e4, dt)

    def active_and_target(b: _Bounds, lb, ub):
        mask_l, mask_u = _masks(lb, ub)
        act_l = mask_l & (b.lam_l > b.s_l)
        act_u = mask_u & (b.lam_u > b.s_u)
        act = act_l | act_u
        target = jnp.where(act_u, ub, jnp.where(mask_l, lb, 0.0))
        lam_hat = jnp.where(act_u, b.lam_u, -b.lam_l) * act
        return act, target, lam_hat

    act_x, tgt_x, lhat_x = active_and_target(bx, x_lb, x_ub)
    act_u_, tgt_u, lhat_u = active_and_target(bu, u_lb, u_ub)

    rho_x = rho * act_x
    rho_u = rho * act_u_
    Qts_p = Q_full.at[1:].add(jax.vmap(jnp.diag)(rho_x))
    Rts_p = Rs + jax.vmap(jnp.diag)(rho_u)
    factors_p = kkt_factor(Qts_p, Rts_p)

    def al_pass(carry, _):
        lh_x, lh_u = carry
        qts_p = q_lin.at[1:].add(act_x * (lh_x - rho_x * tgt_x))
        rts_p = r_lin + act_u_ * (lh_u - rho_u * tgt_u)
        xs_p, us_p = kkt_solve(factors_p, qts_p, rts_p, x_init=x0)
        lh_x = lh_x + rho_x * (xs_p[1:] - tgt_x) * act_x
        lh_u = lh_u + rho_u * (us_p - tgt_u) * act_u_
        return (lh_x, lh_u), (xs_p, us_p)

    (lhat_x, lhat_u), (xs_pass, us_pass) = jax.lax.scan(
        al_pass, (lhat_x, lhat_u), None, length=2
    )
    xs_p, us_p = xs_pass[-1], us_pass[-1]

    # Accept the polished trajectory only if it is finite and (approximately)
    # bound-feasible — a mis-identified active set on a non-converged iterate
    # would otherwise replace a decent IP solution with garbage.
    def viol(z, lb, ub):
        mask_l, mask_u = _masks(lb, ub)
        v = jnp.maximum(jnp.where(mask_l, lb - z, 0.0), jnp.where(mask_u, z - ub, 0.0))
        return jnp.max(v)

    scale = 1.0 + jnp.maximum(jnp.max(jnp.abs(us)), jnp.max(jnp.abs(xs)))
    feas_tol = jnp.asarray(max(tol, 1e-7) if dt == jnp.float64 else 1e-4, dt) * scale
    polish_viol = jnp.maximum(viol(xs_p[1:], x_lb, x_ub), viol(us_p, u_lb, u_ub))
    # Polished multipliers must sit on the correct side of zero. A violation
    # means the active set was MISidentified (e.g. the f32 iterate freezes at
    # μ ≈ 50·eps with a weakly-active bound the exact optimum leaves inactive
    # — observed on near-degenerate terminal-set boxes), so the polish is
    # REJECTED outright: forcing the wrong boundary would replace a decent IP
    # iterate with a suboptimal trajectory. The unpolished iterate is then
    # judged by the plain (μ, feasibility) criterion.
    dual_ok = jnp.all(
        jnp.where(act_x, jnp.sign(lhat_x) * jnp.where(tgt_x == x_ub, 1.0, -1.0) > -1e-6, True)
    ) & jnp.all(
        jnp.where(act_u_, jnp.sign(lhat_u) * jnp.where(tgt_u == u_ub, 1.0, -1.0) > -1e-6, True)
    )
    polish_ok = (
        jnp.all(jnp.isfinite(us_p))
        & jnp.all(jnp.isfinite(xs_p))
        & (polish_viol < feas_tol)
        & (mu < 1e-2 * scale)
        & dual_ok
    )
    xs = jnp.where(polish_ok, xs_p, xs)
    us = jnp.where(polish_ok, us_p, us)

    prim_res = jnp.maximum(viol(xs[1:], x_lb, x_ub), viol(us, u_lb, u_ub))
    # Success needs the duality measure small enough that the active-set read is
    # trustworthy (a feasible polish off a half-converged iterate can be feasible
    # yet suboptimal), plus primal feasibility.
    mu_trust = jnp.asarray(1e-4, dt) * scale
    success = jnp.where(
        polish_ok,
        (prim_res < feas_tol) & (mu < mu_trust),
        (mu < feas_tol) & (prim_res < feas_tol),
    )
    # map back out of the equilibrated space (multipliers divide by the cost and
    # variable scalings; μ and prim_res are reported in the scaled space, where
    # they are dimensionless and comparable across problems)
    return StagewiseIPResult(
        us=us * w_u[None, :],
        xs=xs * w_x[None, :],
        mu=mu,
        prim_res=prim_res,
        success=success,
        lam_x=jnp.where(polish_ok, lhat_x, bx.lam_u - bx.lam_l)
        / (c_cost * w_x[None, :]),
        lam_u=jnp.where(polish_ok, lhat_u, bu.lam_u - bu.lam_l)
        / (c_cost * w_u[None, :]),
    )


# ---------------------------------------------------------------------------
# Receding-horizon controller over the stagewise solver
# ---------------------------------------------------------------------------


@pytree_dataclass
class StagewiseMPC:
    """Receding-horizon linear MPC over the stagewise Riccati IP solver.

    The long-horizon twin of :class:`..linear_mpc.LinearMPC`: no condensed
    matrices are ever formed, so memory and per-solve work stay O(N·(nx+nu)²)
    instead of O(N²·nu·nx). Carry = warm-start input trajectory, shifted one
    stage per step (the same warm-start policy as the condensed controller and
    the reference's IPOPT warm start via repeated solves). Aux reproduces the
    ``ControllerLog`` schema (``session_2/log.py:8-12``).
    """

    A: jnp.ndarray
    B: jnp.ndarray
    Q: jnp.ndarray
    R: jnp.ndarray
    Pf: jnp.ndarray
    x_lb: jnp.ndarray
    x_ub: jnp.ndarray
    u_lb: jnp.ndarray
    u_ub: jnp.ndarray
    N: int = static_field(default=20)
    iters: int = static_field(default=20)
    parallel: bool = static_field(default=False)

    def solve(self, x0: jnp.ndarray, u_warm: jnp.ndarray | None = None):
        return stagewise_ip_solve(
            self.A, self.B, self.Q, self.R, self.Pf,
            self.x_lb, self.x_ub, self.u_lb, self.u_ub,
            x0, u_init=u_warm, N=self.N, iters=self.iters,
            parallel=self.parallel,
        )

    def policy(self):
        """Policy for :func:`...control.simulate.simulate` (carry = warm ū)."""

        def policy_fn(x, t, carry):
            warm = carry if isinstance(carry, jnp.ndarray) else None
            res = self.solve(x, u_warm=warm)
            u_warm = jnp.concatenate([res.us[1:], res.us[-1:]], axis=0)
            aux = {
                "solver_success": res.success,
                "state_prediction": res.xs[1:],
                "input_prediction": res.us,
                "mu": res.mu,
                "prim_res": res.prim_res,
            }
            return res.us[0], u_warm, aux

        return policy_fn

    def initial_carry(self, dtype=jnp.float32):
        nu = jnp.shape(self.B)[-1]
        return jnp.zeros((self.N, nu), dtype=dtype)

    def batched_policy(self, backend: str = "xla", tile: int = 512):
        """Batch-level receding-horizon policy for
        :func:`~..control.batch_loop.simulate_batch`.

        ``backend="xla"`` (default, and the measured throughput winner — ~81k
        solves/s at N=100 × batch 4096 on v5e) vmaps the scalar solver;
        ``backend="pallas"`` routes the solve through the fused VMEM-resident
        stagewise interior-point kernel (correctness-verified alternative;
        see ``experimental/riccati_ip_kernel.py`` for why it measures *slower*
        here, unlike the ADMM/AL-iLQR kernels). Carry = warm-start input
        trajectories ``(B, N, nu)``, shifted one stage per step.

        The Pallas kernel bakes the (LTI) problem data in as compile-time
        constants, so this method must be called with concrete — not traced —
        ``A/B/Q/R/Pf``/bounds; the returned policy itself jits/scans freely.
        """
        import numpy as np

        if backend == "pallas":
            from ..experimental.riccati_ip_kernel import stagewise_ip_solve_pallas

            if any(
                np.ndim(v) > 1
                for v in (self.x_lb, self.x_ub, self.u_lb, self.u_ub)
            ):
                raise NotImplementedError(
                    "the fused stagewise-IP kernel bakes TIME-INVARIANT "
                    "bounds; per-stage (N, n) bounds (terminal_set=True) "
                    "need backend='xla'"
                )
            static = tuple(
                np.asarray(v)
                for v in (
                    self.A, self.B, self.Q, self.R, self.Pf,
                    self.x_lb, self.x_ub, self.u_lb, self.u_ub,
                )
            )

            def policy_fn(x_batch, t, carry):
                sol = stagewise_ip_solve_pallas(
                    *static, x_batch, u_init=carry,
                    N=self.N, iters=self.iters, tile=tile,
                )
                u_warm = jnp.concatenate(
                    [sol.us[:, 1:], sol.us[:, -1:]], axis=1
                )
                aux = {
                    "solver_success": sol.success,
                    "state_prediction": sol.xs[:, 1:],
                    "input_prediction": sol.us,
                    "mu": sol.mu,
                    "prim_res": sol.prim_res,
                }
                return sol.us[:, 0], u_warm, aux

            return policy_fn

        if backend == "xla":
            scalar = self.policy()

            def policy_fn(x_batch, t, carry):
                return jax.vmap(lambda x, c: scalar(x, t, c))(x_batch, carry)

            return policy_fn

        raise ValueError(f"unknown backend {backend!r}")

    def initial_batch_carry(self, batch: int, dtype=jnp.float32):
        nu = jnp.shape(self.B)[-1]
        return jnp.zeros((batch, self.N, nu), dtype=dtype)


def make_stagewise_mpc(
    problem,
    iters: int = 20,
    dtype=jnp.float32,
    N: int | None = None,
    terminal: str = "Q",
    parallel: bool = False,
    terminal_set: bool = False,
) -> StagewiseMPC:
    """Build a :class:`StagewiseMPC` from session-2/3 ``Problem`` data.

    ``terminal="dare"`` uses the infinite-horizon Riccati solution as terminal
    weight (same option as ``make_linear_mpc``).

    ``terminal_set=True`` (implies the DARE terminal cost) tightens the LAST
    stage's state box to the certified inner box of the invariant DARE
    ellipsoid (:func:`.lqr.lqr_terminal_set`) — the solver takes per-stage
    ``(N, nx)`` bounds natively, so this costs nothing. Note the fused Pallas
    backend (``batched_policy(backend="pallas")``) bakes time-invariant bounds
    and rejects the resulting stagewise bounds; use the default XLA backend.
    """
    from .linear_mpc import as_box_problem

    box = as_box_problem(problem)
    sys = box.system(dtype)
    Q = jnp.asarray(box.Q, dtype=dtype)
    R = jnp.asarray(box.R, dtype=dtype)
    if terminal == "dare" or terminal_set:
        from ..ops.riccati import dare_sda

        Pf = dare_sda(sys.A, sys.B, Q, R)
    else:
        Pf = Q
    N_eff = N if N is not None else box.N
    x_lb = jnp.asarray(box.x_min, dtype=dtype)
    x_ub = jnp.asarray(box.x_max, dtype=dtype)
    u_lb = jnp.asarray(box.u_min, dtype=dtype)
    u_ub = jnp.asarray(box.u_max, dtype=dtype)
    if terminal_set:
        from .lqr import lqr_terminal_set

        _P, _K, _alpha, d = lqr_terminal_set(
            sys.A, sys.B, Q, R, x_lb, x_ub, u_lb, u_ub
        )
        nx = x_lb.shape[0]
        x_lb = jnp.broadcast_to(x_lb, (N_eff, nx)).at[-1].set(
            jnp.maximum(x_lb, -d)
        )
        x_ub = jnp.broadcast_to(x_ub, (N_eff, nx)).at[-1].set(
            jnp.minimum(x_ub, d)
        )
    return StagewiseMPC(
        A=sys.A,
        B=sys.B,
        Q=Q,
        R=R,
        Pf=Pf,
        x_lb=x_lb,
        x_ub=x_ub,
        u_lb=u_lb,
        u_ub=u_ub,
        N=N_eff,
        iters=iters,
        parallel=parallel,
    )
