"""Finite- and infinite-horizon LQR controllers (session-1 capability).

Reference semantics: ``AutoCruising`` receding-horizon LQR — apply ``gains[0]`` each
step (``session_1/FHC.py:20-29``), predictions use the time-varying ``gains[t]``
(``FHC.py:28-29``); cost-to-go comparison ``x0ᵀ P_N x0`` vs DARE value
(``FHC.py:117-131``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.linear import LinearSystem
from ..ops.riccati import dare_sda, lqr_gain, riccati_recursion
from ..utils.pytree import pytree_dataclass
from ..control.simulate import Policy


@pytree_dataclass
class LQRSolution:
    P: jnp.ndarray  # (N + 1, nx, nx) cost-to-go Hessians, stage order
    K: jnp.ndarray  # (N, nu, nx) feedback gains, stage order


def solve_finite_horizon(
    sys: LinearSystem,
    Q: jnp.ndarray,
    R: jnp.ndarray,
    Pf: jnp.ndarray,
    N: int,
    parallel: bool = False,
) -> LQRSolution:
    """Backward Riccati solve. ``parallel=True`` routes through the O(log N)
    associative-scan recursion (``ops/parallel_horizon.py``) — same result to
    rounding, shorter critical path when N is large."""
    if parallel:
        from ..ops.parallel_horizon import riccati_recursion_parallel

        P, K = riccati_recursion_parallel(sys.A, sys.B, Q, R, Pf, N)
    else:
        P, K = riccati_recursion(sys.A, sys.B, Q, R, Pf, N)
    return LQRSolution(P=P, K=K)


def solve_infinite_horizon(
    sys: LinearSystem, Q: jnp.ndarray, R: jnp.ndarray, iters: int = 30
) -> LQRSolution:
    """DARE solution; ``K∞`` broadcast to a 1-stage gain stack."""
    P_inf = dare_sda(sys.A, sys.B, Q, R, iters=iters)
    K_inf = lqr_gain(sys.A, sys.B, R, P_inf)
    return LQRSolution(P=P_inf[None], K=K_inf[None])


def lqr_terminal_set(
    A: jnp.ndarray,
    B: jnp.ndarray,
    Q: jnp.ndarray,
    R: jnp.ndarray,
    x_lb: jnp.ndarray,
    x_ub: jnp.ndarray,
    u_lb: jnp.ndarray,
    u_ub: jnp.ndarray,
):
    """Invariant LQR terminal set: ellipsoid level α and a certified inner box.

    Computes the largest sublevel set ``E(α) = {x : xᵀP∞x ≤ α}`` of the DARE
    value function on which the infinite-horizon law ``u = K∞x`` respects the
    state and input boxes, plus an axis-aligned inner box of ``E(α)`` usable
    directly as a terminal box constraint on ``x_N`` (the "terminal cost/set"
    of classic MPC stability theory; no reference counterpart — the reference
    has neither, BASELINE config 3 names it).

    Soundness:
    - *Invariance*: with ``P`` the DARE fixed point, the closed loop satisfies
      ``xᵀ(A+BK)ᵀP(A+BK)x = xᵀPx − xᵀ(Q + KᵀRK)x ≤ xᵀPx``, so every sublevel
      set is positively invariant; constraints hold along the whole tail.
    - *α*: for a row constraint ``aᵀx ≤ b`` (``b > 0``; the origin must be
      strictly inside both boxes), ``max_{x∈E(α)} aᵀx = √(α·aᵀP⁻¹a)``, so
      ``α ≤ b²/(aᵀP⁻¹a)``. Rows are ``±e_i`` (state box, binding bound
      ``min(x_ub_i, −x_lb_i)``) and ``±K_j`` (input box). Infinite bounds are
      skipped (masked to +∞ candidates).
    - *Inner box*: with ``P = LLᵀ``, ``xᵀPx = ‖Lᵀx‖² ≤ (Σ_i |x_i|·√(P_ii))²``
      (Cauchy–Schwarz column-wise), so half-widths ``d`` with
      ``Σ_i d_i √(P_ii) ≤ √α`` give ``box(d) ⊆ E(α)``; we take the balanced
      choice ``d_i = √α / (nx·√(P_ii))``.

    Returns ``(P, K, alpha, d)`` with ``d`` the terminal box half-widths.
    """
    P = dare_sda(A, B, Q, R)
    K = lqr_gain(A, B, R, P)
    P_inv = jnp.linalg.inv(P)
    big = jnp.asarray(jnp.inf, P.dtype)

    def alpha_rows(rows, lb, ub):
        # binding symmetric bound per row; +inf (skipped) when unbounded
        b = jnp.minimum(
            jnp.where(jnp.isfinite(ub), ub, big),
            jnp.where(jnp.isfinite(lb), -lb, big),
        )
        quad = jnp.einsum("ri,ij,rj->r", rows, P_inv, rows)
        return jnp.where(jnp.isfinite(b), b * b / quad, big)

    nx = A.shape[0]
    eye = jnp.eye(nx, dtype=P.dtype)
    alpha = jnp.minimum(
        jnp.min(alpha_rows(eye, x_lb, x_ub)),
        jnp.min(alpha_rows(K, u_lb, u_ub)),
    )
    d = jnp.sqrt(alpha) / (nx * jnp.sqrt(jnp.diag(P)))
    return P, K, alpha, d


def receding_horizon_policy(sol: LQRSolution) -> Policy:
    """``u = K_0 x`` each step (``FHC.py:25-26``)."""
    K0 = sol.K[0]

    def policy(x, t, carry):
        return K0 @ x, carry, ()

    return policy


def prediction_policy(sol: LQRSolution) -> Policy:
    """``u = K_t x`` along the prediction horizon (``FHC.py:28-29``)."""
    K = sol.K

    def policy(x, t, carry):
        return K[t] @ x, carry, ()

    return policy


def cost_to_go(sol: LQRSolution, x0: jnp.ndarray) -> jnp.ndarray:
    """Finite-horizon value ``x0ᵀ P_0 x0`` (``FHC.py:124``)."""
    return x0 @ sol.P[0] @ x0
