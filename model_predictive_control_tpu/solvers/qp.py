"""Batched box-constrained QP solvers (the engine's core, SURVEY.md §7 phase 4).

Replaces the reference's external native solver tier (CasADi → IPOPT at
``session_4/main.py:39,116``; the implied-but-missing session-2/3 QP scripts) with
two from-scratch, fixed-shape, fixed-iteration solvers designed for TPU batching:

- :func:`admm_solve` — OSQP-style ADMM (splitting on ``z = A_c x``), with Ruiz
  equilibration and a precomputed dense reduced-KKT inverse shared across the whole
  scenario batch. Per iteration: two small GEMMs + clips — pure MXU work that
  batches to thousands of scenarios (cf. PAPERS.md: ReLU-QP). Finished by an
  active-set *polish* (one dense solve) that jumps from ADMM's 1e-4-ish iterate to
  near-machine-precision KKT points.
- :func:`pdip_solve` — a Mehrotra predictor-corrector primal-dual interior-point
  method; ~3x the per-iteration cost, far fewer iterations, tight accuracy. Used
  where the 1e-4 single-scenario parity gate matters and as the SQP inner solver.

Problem form (OSQP convention):  min ½ xᵀPx + qᵀx  s.t.  l ≤ A_c x ≤ u,
with ±inf entries allowed in (l, u). Everything is branch-free: convergence is a
reported *mask*, not control flow (the reference logs ``solver_success`` the same
way, ``session_2/log.py:10``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.precision import solver_precision
from ..utils.pytree import pytree_dataclass, static_field

_BIG = 1e20


@pytree_dataclass
class QPOperator:
    """Scenario-independent precomputation for a QP family ``(P, A_c)``.

    Shared across the whole batch: only ``(q, l, u)`` vary per scenario. Ruiz
    equilibration scalings (D, E, c) are baked in, along with ADMM reduced-KKT
    inverses for a geometric ladder of ρ values — per-scenario ρ adaptation then
    becomes a branch-free gather instead of a refactorization (the trick ReLU-QP
    uses to keep adaptive ADMM on the GPU/TPU fast path; PAPERS.md).
    """

    P: jnp.ndarray  # (n, n) original
    A_c: jnp.ndarray  # (m, n) original
    P_s: jnp.ndarray  # scaled: c * D P D
    A_s: jnp.ndarray  # scaled: E A D
    D: jnp.ndarray  # (n,) variable scaling
    E: jnp.ndarray  # (m,) constraint scaling
    c: jnp.ndarray  # () cost scaling
    rho_levels: jnp.ndarray  # (R,) ρ ladder (scaled space)
    rho_init_idx: jnp.ndarray  # () int32 starting level
    sigma: jnp.ndarray  # () ADMM regularization
    Minv_stack: jnp.ndarray  # (R, n, n) inv(P_s + σI + ρ_r A_sᵀA_s) per level
    Pinv_s: jnp.ndarray  # (n, n) inv(P_s) — scaled-space polish
    S: jnp.ndarray  # (m, m) A_s inv(P_s) A_sᵀ — Schur operator for CG polish


@pytree_dataclass
class QPSolution:
    x: jnp.ndarray  # (n,) primal
    z: jnp.ndarray  # (m,) constraint values A_c x (projected copy)
    y: jnp.ndarray  # (m,) duals
    prim_res: jnp.ndarray  # () ‖A_c x − z‖∞ (unscaled)
    dual_res: jnp.ndarray  # () ‖Px + q + A_cᵀy‖∞ (unscaled)
    converged: jnp.ndarray  # () bool — the ``solver_success`` analog


@solver_precision
def ruiz_equilibrate(
    P: jnp.ndarray, A_c: jnp.ndarray, iters: int = 10
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Modified Ruiz equilibration on the stacked KKT matrix (OSQP §5.1 style).

    Returns (D, E, c). Scenario vectors (q, l, u) are intentionally not used so the
    scaling can be precomputed once and shared across a batch.
    """
    n = P.shape[0]
    m = A_c.shape[0]

    def body(_, state):
        D, E, P_s, A_s = state
        # column inf-norms of [[P, Aᵀ],[A, 0]]
        col_x = jnp.maximum(
            jnp.max(jnp.abs(P_s), axis=0), jnp.max(jnp.abs(A_s), axis=0)
        )
        col_z = jnp.max(jnp.abs(A_s), axis=1)
        # identically-zero rows/cols (e.g. a state unreachable within one step,
        # like position vs u_0 when B = [0, Ts]ᵀ) get scale 1 — repeatedly
        # dividing by sqrt(tiny) compounds to overflow in f32 otherwise.
        # Double-where keeps 1/sqrt off the untaken branch: its d/dx at a zero
        # column is inf, and where() would mix that into NaN under jax.grad
        # (the tuning path differentiates through this setup).
        safe_x = jnp.where(col_x > 1e-10, col_x, 1.0)
        safe_z = jnp.where(col_z > 1e-10, col_z, 1.0)
        dx = jnp.where(col_x > 1e-10, 1.0 / jnp.sqrt(safe_x), 1.0)
        dz = jnp.where(col_z > 1e-10, 1.0 / jnp.sqrt(safe_z), 1.0)
        P_s = dx[:, None] * P_s * dx[None, :]
        A_s = dz[:, None] * A_s * dx[None, :]
        return D * dx, E * dz, P_s, A_s

    D0 = jnp.ones(n, dtype=P.dtype)
    E0 = jnp.ones(m, dtype=P.dtype)
    D, E, P_s, _ = jax.lax.fori_loop(0, iters, body, (D0, E0, P, A_c))
    # cost normalization
    mean_col = jnp.mean(jnp.max(jnp.abs(P_s), axis=0))
    c = 1.0 / jnp.maximum(mean_col, 1e-8)
    return D, E, c


@solver_precision
def qp_setup(
    P: jnp.ndarray,
    A_c: jnp.ndarray,
    rho: float = 0.1,
    sigma: float = 1e-6,
    n_rho_levels: int = 7,
    rho_ladder_step: float = 10.0,
    equilibrate: bool = True,
    setup_admm: bool = True,
) -> QPOperator:
    """Precompute scalings and the per-ρ-level ADMM reduced-KKT inverses.

    The ρ ladder is geometric around ``rho`` (e.g. 7 levels spanning 1e-3 .. 1e3 ×
    rho); one dense inverse per level is computed here, once per QP family.
    """
    dtype = P.dtype
    if equilibrate:
        D, E, c = ruiz_equilibrate(P, A_c)
    else:
        D = jnp.ones(P.shape[0], dtype=dtype)
        E = jnp.ones(A_c.shape[0], dtype=dtype)
        c = jnp.asarray(1.0, dtype=dtype)
    P_s = c * (D[:, None] * P * D[None, :])
    A_s = E[:, None] * A_c * D[None, :]

    half = (n_rho_levels - 1) // 2
    exps = jnp.arange(-half, n_rho_levels - half, dtype=dtype)
    rho_levels = rho * rho_ladder_step**exps
    sigma_ = jnp.asarray(sigma, dtype=dtype)
    I = jnp.eye(P.shape[0], dtype=dtype)
    AtA = A_s.T @ A_s

    def inv_for(r):
        return jnp.linalg.inv(P_s + sigma_ * I + r * AtA)

    if setup_admm:
        Minv_stack = jax.vmap(inv_for)(rho_levels)
        Pinv_s = jnp.linalg.inv(P_s + 1e-9 * I)
        S = A_s @ Pinv_s @ A_s.T
    else:
        # PDIP-only operator: skip the ladder inverses; shape (0, n, n) makes any
        # accidental ADMM use fail loudly instead of silently computing garbage.
        Minv_stack = jnp.zeros((0,) + P.shape, dtype=dtype)
        Pinv_s = jnp.zeros_like(P)
        S = jnp.zeros((A_c.shape[0], A_c.shape[0]), dtype=dtype)
    return QPOperator(
        P=P,
        A_c=A_c,
        P_s=P_s,
        A_s=A_s,
        D=D,
        E=E,
        c=c,
        rho_levels=rho_levels,
        rho_init_idx=jnp.asarray(half, dtype=jnp.int32),
        sigma=sigma_,
        Minv_stack=Minv_stack,
        Pinv_s=Pinv_s,
        S=S,
    )


def _unscaled_residuals(op: QPOperator, x, y, z, q):
    rp = jnp.max(jnp.abs(op.A_c @ x - z))
    rd = jnp.max(jnp.abs(op.P @ x + q + op.A_c.T @ y))
    return rp, rd


@solver_precision
def admm_solve(
    op: QPOperator,
    q: jnp.ndarray,
    l: jnp.ndarray,
    u: jnp.ndarray,
    iters: int = 100,
    alpha: float = 1.6,
    eps_abs: float | None = None,
    polish: bool = True,
    polish_reg: float = 1e-9,
    warm: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    adapt_chunks: int = 5,
) -> QPSolution:
    """OSQP-style ADMM: fixed total iteration count split into ``adapt_chunks``
    scan chunks, with per-scenario ρ-ladder adaptation between chunks and an
    optional active-set polish at the end.

    ``warm`` is an unscaled ``(x, y)`` pair (e.g. the previous MPC step's shifted
    solution); scaled internally.
    """
    dtype = op.P.dtype
    n = op.P.shape[0]
    alpha = jnp.asarray(alpha, dtype=dtype)
    if eps_abs is None:
        # demand what the dtype can deliver (scale-relative check below)
        eps_abs = 1e-6 if dtype == jnp.float64 else 1e-4

    # scale into equilibrated space
    q_s = op.c * op.D * q
    l_s = op.E * l
    u_s = op.E * u

    if warm is None:
        x0 = jnp.zeros(n, dtype=dtype)
        y0 = jnp.zeros(op.A_c.shape[0], dtype=dtype)
    else:
        x0 = warm[0] / op.D
        y0 = op.c * warm[1] / op.E
    z0 = jnp.clip(op.A_s @ x0, l_s, u_s)

    sigma = op.sigma

    def make_iteration(Minv, rho):
        def iteration(state, _):
            x, z, y = state
            w = sigma * x - q_s + op.A_s.T @ (rho * z - y)
            x_t = Minv @ w
            z_t = op.A_s @ x_t
            x_n = alpha * x_t + (1.0 - alpha) * x
            z_pre = alpha * z_t + (1.0 - alpha) * z + y / rho
            z_n = jnp.clip(z_pre, l_s, u_s)
            y_n = y + rho * (alpha * z_t + (1.0 - alpha) * z - z_n)
            return (x_n, z_n, y_n), None

        return iteration

    def rho_update(idx, x, z, y):
        """OSQP §5.2 adaptive ρ: scale by sqrt of normalized residual ratio,
        snapped to the precomputed ladder (branch-free nearest-level index).

        Hysteresis (OSQP ``adaptive_rho_tolerance``): only move when the target
        differs from the current level by >5x, and never once the iterate has
        effectively converged — re-adapting ρ on a warm-started, already-converged
        iterate kicks it off the fixed point (measured: closed-loop success drops
        from ~1.0 to ~0.44 without this guard)."""
        Ax = op.A_s @ x
        Px = op.P_s @ x
        Aty = op.A_s.T @ y
        rp = jnp.max(jnp.abs(Ax - z))
        rd = jnp.max(jnp.abs(Px + q_s + Aty))
        rp_rel = rp / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z))), 1e-10
        )
        rd_rel = rd / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))),
            jnp.maximum(jnp.max(jnp.abs(q_s)), 1e-10),
        )
        rho_now = op.rho_levels[idx]
        target = rho_now * jnp.sqrt(rp_rel / jnp.maximum(rd_rel, 1e-16))
        cand = jnp.argmin(
            jnp.abs(jnp.log(op.rho_levels) - jnp.log(jnp.maximum(target, 1e-12)))
        ).astype(jnp.int32)
        scale_s = 1.0 + jnp.max(jnp.abs(q_s))
        conv = jnp.logical_and(rp < eps_abs * scale_s, rd < eps_abs * scale_s)
        move = jnp.logical_or(target > 5.0 * rho_now, 5.0 * target < rho_now)
        return jnp.where(jnp.logical_and(move, jnp.logical_not(conv)), cand, idx)

    chunk = max(1, iters // max(1, adapt_chunks))
    state = (x0, z0, y0)
    idx = op.rho_init_idx
    for _ in range(max(1, adapt_chunks)):
        Minv = op.Minv_stack[idx]
        rho = op.rho_levels[idx]
        state, _ = jax.lax.scan(
            make_iteration(Minv, rho), state, None, length=chunk
        )
        idx = rho_update(idx, *state)
    x_s, z_s, y_s = state

    # unscale
    x = op.D * x_s
    y = y_s * op.E / op.c
    z = z_s / op.E

    if polish:
        x, y, z = _polish(op, q, l, u, x, y, z, reg=polish_reg)

    rp, rd = _unscaled_residuals(op, x, y, z, q)
    scale = 1.0 + jnp.max(jnp.abs(q))
    converged = jnp.logical_and(rp < eps_abs * scale, rd < eps_abs * scale)
    return QPSolution(x=x, z=z, y=y, prim_res=rp, dual_res=rd, converged=converged)


def _polish(
    op: QPOperator,
    q,
    l,
    u,
    x,
    y,
    z,
    reg: float = 1e-9,
    lower_active=None,
    upper_active=None,
):
    """Active-set polish (OSQP §5.2): detect active bounds from the duals, solve the
    equality-constrained KKT system at fixed shape, keep the result only where it
    improves the residuals (branch-free accept/reject)."""
    dtype = op.P.dtype
    n = op.P.shape[0]
    m = op.A_c.shape[0]

    if lower_active is None:
        lower_active = y < -jnp.asarray(1e-12, dtype)
    if upper_active is None:
        upper_active = y > jnp.asarray(1e-12, dtype)
    active = jnp.logical_or(lower_active, upper_active)
    b = jnp.where(lower_active, l, u)
    b = jnp.where(jnp.isfinite(b), b, jnp.zeros_like(b))
    d = active.astype(dtype)

    # K = [[P, A_cᵀ·diag(d)], [diag(d)·A_c, -(I - diag(d)) - reg·diag(d)]]
    K = jnp.concatenate(
        [
            jnp.concatenate([op.P, op.A_c.T * d[None, :]], axis=1),
            jnp.concatenate(
                [
                    d[:, None] * op.A_c,
                    -jnp.diag(1.0 - d) - reg * jnp.diag(d),
                ],
                axis=1,
            ),
        ],
        axis=0,
    )
    rhs = jnp.concatenate([-q, d * b])
    sol = jnp.linalg.solve(K, rhs)
    x_p = sol[:n]
    y_p = sol[n:] * d

    # one step of iterative refinement on the same system
    r = rhs - K @ sol
    sol = sol + jnp.linalg.solve(K, r)
    x_p = sol[:n]
    y_p = sol[n:] * d
    z_p = jnp.clip(op.A_c @ x_p, l, u)

    # accept only if it improves max residual, is finite, AND keeps valid dual
    # signs (lower-active ⇒ y ≤ 0, upper-active ⇒ y ≥ 0). Without the sign check
    # the polish can certify a suboptimal point whose stationarity happens to be
    # satisfiable by wrong-signed multipliers.
    sign_tol = jnp.asarray(1e-10, dtype)
    sign_ok = jnp.all(
        jnp.where(lower_active, y_p <= sign_tol, True)
        & jnp.where(upper_active, y_p >= -sign_tol, True)
    )
    rp0, rd0 = _unscaled_residuals(op, x, y, z, q)
    rp1, rd1 = _unscaled_residuals(op, x_p, y_p, z_p, q)
    finite = jnp.all(jnp.isfinite(sol))
    better = finite & sign_ok & (jnp.maximum(rp1, rd1) < jnp.maximum(rp0, rd0))
    pick = lambda a, b_: jnp.where(better, a, b_)
    return pick(x_p, x), pick(y_p, y), pick(z_p, z)


@solver_precision
def pdip_solve(
    op: QPOperator,
    q: jnp.ndarray,
    l: jnp.ndarray,
    u: jnp.ndarray,
    iters: int = 25,
    eps_abs: float | None = None,
    polish: bool = True,
) -> QPSolution:
    """Mehrotra predictor-corrector primal-dual interior point on
    ``min ½xᵀPx + qᵀx s.t. Gx ≤ h`` with ``G = [A_c; −A_c]``, ``h = [u; −l]``.

    ±inf bounds are masked out (their rows contribute nothing to the Newton system).
    Fixed iteration count; the iterate freezes once converged (masked updates), so
    batching never branches.

    ``polish=False`` skips the final active-set polish (an (n+m)² KKT solve
    whose batched LU exceeds the TPU's 16 MB scoped-VMEM budget at n+m ≈ 88
    under ``vmap`` — XLA's ``InvertDiagBlocksUpperTriangular`` allocates a
    fixed ~19 MB regardless of batch). Callers that consume only the primal
    (e.g. the bounded Gauss-Newton step in :class:`...estimation_nl.
    NonlinearMHE`) lose nothing.
    """
    dtype = op.P.dtype
    P, A_c = op.P, op.A_c
    n = P.shape[0]
    if eps_abs is None:
        # demand what the dtype can deliver (scale-relative check below)
        eps_abs = 1e-8 if dtype == jnp.float64 else 1e-4

    G = jnp.concatenate([A_c, -A_c], axis=0)
    h = jnp.concatenate([u, -l])
    finite = jnp.isfinite(h)
    h_safe = jnp.where(finite, h, _BIG)
    mask = finite.astype(dtype)
    mm = G.shape[0]

    # init: regularized unconstrained minimizer; slacks clipped positive
    x = jnp.linalg.solve(P + 1e-8 * jnp.eye(n, dtype=dtype), -q)
    s = jnp.clip(h_safe - G @ x, 1.0, _BIG)
    lam = mask * (1.0 / s) + (1.0 - mask) * 1e-12

    def newton_dx(W_masked, r_d, r_g, r_s, s, lam):
        # (P + Gᵀ W G) Δx = −r_d − Gᵀ((λ∘r_g − r_s)/s) with masked rows zeroed
        KKT = P + (G.T * W_masked[None, :]) @ G
        rhs = -r_d - G.T @ (mask * (lam * r_g - r_s) / s)
        return jnp.linalg.solve(KKT, rhs)

    def step_len(v, dv):
        # max α in (0, 1] with v + α dv ≥ (1-τ) ... standard fraction-to-boundary
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), _BIG)
        ratio = jnp.where(mask > 0, ratio, _BIG)
        return jnp.minimum(1.0, 0.99 * jnp.min(ratio))

    eps_machine = jnp.finfo(dtype).eps
    scale = 1.0 + jnp.max(jnp.abs(q))
    mu_freeze = 50.0 * eps_machine * scale
    rd_freeze = 1e3 * eps_machine * scale

    def body(_, state):
        x, s, lam = state
        r_d = P @ x + q + G.T @ (mask * lam)
        r_g = mask * (G @ x + s - h_safe)
        mu = jnp.sum(mask * s * lam) / jnp.maximum(jnp.sum(mask), 1.0)

        # Freeze once converged: as μ → 0 active slacks underflow and the Newton
        # system breaks down (NaNs). Branch-free gate keeps batching safe.
        frozen = jnp.logical_and(mu < mu_freeze, jnp.max(jnp.abs(r_d)) < rd_freeze)

        W = mask * lam / s

        # predictor (affine)
        r_s_aff = s * lam
        dx_aff = newton_dx(W, r_d, r_g, r_s_aff, s, lam)
        ds_aff = -r_g - G @ dx_aff * mask
        dlam_aff = mask * (-(r_s_aff) - lam * ds_aff) / s

        a_p = step_len(s, ds_aff)
        a_d = step_len(lam, dlam_aff)
        a_aff = jnp.minimum(a_p, a_d)
        mu_aff = jnp.sum(
            mask * (s + a_aff * ds_aff) * (lam + a_aff * dlam_aff)
        ) / jnp.maximum(jnp.sum(mask), 1.0)
        sig = (mu_aff / jnp.maximum(mu, 1e-30)) ** 3

        # corrector
        r_s = s * lam + ds_aff * dlam_aff - sig * mu
        dx = newton_dx(W, r_d, r_g, r_s, s, lam)
        ds = -r_g - G @ dx * mask
        dlam = mask * (-(r_s) - lam * ds) / s

        a = jnp.minimum(step_len(s, ds), step_len(lam, dlam))
        x_n = x + a * dx
        s_n = jnp.where(mask > 0, s + a * ds, s)
        lam_n = jnp.where(mask > 0, lam + a * dlam, lam)
        # reject non-finite candidates and frozen states in one branch-free gate
        ok = jnp.logical_and(
            jnp.logical_not(frozen),
            jnp.all(jnp.isfinite(x_n))
            & jnp.all(jnp.isfinite(s_n))
            & jnp.all(jnp.isfinite(lam_n)),
        )
        keep = lambda new, old: jnp.where(ok, new, old)
        return keep(x_n, x), keep(s_n, s), keep(lam_n, lam)

    x, s, lam = jax.lax.fori_loop(0, iters, body, (x, s, lam))

    # recover two-sided duals: y = λ_upper − λ_lower
    lam_m = mask * lam
    m_r = A_c.shape[0]
    y = lam_m[:m_r] - lam_m[m_r:]
    z = jnp.clip(A_c @ x, l, u)

    # Interior-point duals converge slower than the primal; polish with the
    # active set read off the slack/multiplier ratio (active ⇔ λ dominates s).
    if polish:
        upper_active = (mask[:m_r] > 0) & (lam[:m_r] > s[:m_r])
        lower_active = (mask[m_r:] > 0) & (lam[m_r:] > s[m_r:])
        x, y, z = _polish(
            op, q, l, u, x, y, z,
            lower_active=lower_active, upper_active=upper_active,
        )
    rp, rd = _unscaled_residuals(op, x, y, z, q)
    scale = 1.0 + jnp.max(jnp.abs(q))
    converged = jnp.logical_and(rp < eps_abs * scale, rd < eps_abs * scale)
    return QPSolution(x=x, z=z, y=y, prim_res=rp, dual_res=rd, converged=converged)
