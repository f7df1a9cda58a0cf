"""Chance-constrained stochastic linear MPC (variance-propagation tightening).

The probabilistic sibling of :mod:`.tube`: where the tube controller certifies
*hard* constraint satisfaction for *bounded* disturbances, this controller
handles **Gaussian** process noise ``x⁺ = A x + B u + w, w ~ N(0, Σ_w)`` and
enforces each state/input bound as an individual chance constraint

    Pr( x_k[j] ≤ x_max[j] ) ≥ 1 − ε     (per stage k, per row j)

via the standard feedback-parameterized reformulation (Mesbah's stochastic-MPC
survey pattern): ``u_k = v_k + K e_k`` with an ancillary LQR gain, so the
error ``e_{k+1} = (A+BK) e_k + w_k`` is Gaussian with covariance

    Σ_0 = 0,    Σ_{k+1} = A_K Σ_k A_Kᵀ + Σ_w,

and the chance constraints become *deterministic per-stage tightenings* of the
nominal problem: stage-k state boxes shrink by ``β·sqrt(diag Σ_k)`` and input
boxes by ``β·sqrt(diag K Σ_k Kᵀ)`` with ``β = Φ⁻¹(1−ε)``. Stage 0 is measured
exactly (Σ_0 = 0), so ``v_0`` keeps the FULL input authority — the tightening
ramps in over the horizon and saturates at the stationary covariance.

TPU-native notes: the tightenings are a host-side float64 precompute; the
per-stage bounds drop into the condensed QP's already-stacked ``(N·nx,)`` /
``(N·nu,)`` bound vectors (no new QP structure), so the per-step solve — and
the batched Pallas path — is byte-for-byte the nominal controller's. The
reference has no stochastic layer at all; its closest analog is the exercise-5
mismatch experiment (``session_4/session4_sol.py:443-488``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, replace, static_field
from ..control.simulate import Policy
from .linear_mpc import (
    BoxProblem,
    LinearMPC,
    Problem,
    as_box_problem,
    make_box_mpc,
)
from .tube import _np_dare


def gaussian_stage_margins(
    A: np.ndarray,
    B: np.ndarray,
    K: np.ndarray,
    Sigma_w: np.ndarray,
    N: int,
    eps: float,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Per-stage tightening margins ``(state (N, nx), input (N, nu), β)``.

    Row k of the state margins applies to ``x_{k+1}`` (the condensed QP's
    stage ordering — its state blocks are x_1..x_N); row k of the input
    margins applies to ``u_k`` (u_0..u_{N-1}, so row 0 is exactly zero).
    """
    if not (0.0 < eps < 0.5):
        raise ValueError(f"eps must be in (0, 0.5), got {eps}")
    # Φ⁻¹(1−ε) = √2 · erfinv(1 − 2ε), evaluated in float64 via scipy.special
    # (scipy is a declared dependency; this runs host-side at build time only)
    from math import sqrt

    from scipy.special import erfinv

    beta = float(sqrt(2.0) * erfinv(1.0 - 2.0 * eps))

    A_K = A + B @ K
    nx, nu = B.shape
    Sigma = np.zeros((nx, nx))
    state_m = np.zeros((N, nx))
    input_m = np.zeros((N, nu))
    for k in range(N):
        input_m[k] = beta * np.sqrt(np.maximum(np.diag(K @ Sigma @ K.T), 0.0))
        Sigma = A_K @ Sigma @ A_K.T + Sigma_w
        state_m[k] = beta * np.sqrt(np.maximum(np.diag(Sigma), 0.0))
    return state_m, input_m, beta


@pytree_dataclass
class StochasticMPC:
    """Chance-constrained MPC in the *conditional* (re-anchoring) form.

    Each step re-plans from the measured state (the standard practical
    stochastic-MPC choice — Hewing/Mesbah): the plan's stage-k constraints are
    tightened by the k-step feedback-parameterized error covariance Σ_k, so
    conditionally on the current state the next-state violation probability is
    exactly ``Pr(w > β·sqrt(diag Σ_w)) = ε`` per row while a bound rides. The
    applied input is the plan's first input (Σ_0 = 0: no runtime feedback
    correction needed, unlike the bounded-disturbance tube controller whose
    guarantee REQUIRES the nominal carry). The policy is therefore byte-for-
    byte the nominal MPC policy on the tightened QP — same warm-start shift,
    same batched/Pallas paths.
    """

    inner: LinearMPC  # nominal MPC whose QP carries the per-stage tightenings
    A: jnp.ndarray
    B: jnp.ndarray
    K: jnp.ndarray  # prediction-error feedback used for the Σ_k propagation
    state_margin: jnp.ndarray  # (N, nx)
    input_margin: jnp.ndarray  # (N, nu)
    eps: float = static_field(default=0.05)
    beta: float = static_field(default=0.0)

    def initial_carry(self, dtype=jnp.float32):
        return self.inner.initial_carry(dtype)

    def policy(self) -> Policy:
        return self.inner.policy()

    def batched_policy(self, **kw):
        """Tightened-QP batch path (fused Pallas kernel capable)."""
        return self.inner.batched_policy(**kw)


def make_stochastic_mpc(
    problem: Problem | BoxProblem,
    Sigma_w,
    eps: float = 0.05,
    solver: str = "admm",
    iters: int = 200,
    dtype=jnp.float32,
    terminal: str = "dare",
    rho: float = 0.1,
) -> StochasticMPC:
    """Build a chance-constrained MPC from session-2/3 :class:`Problem` data
    or any general :class:`BoxProblem` (the Σ-propagation is dimension-generic).

    ``Sigma_w``: process-noise covariance (nx × nx, or a length-nx diagonal).
    ``eps``: per-constraint violation probability (e.g. 0.05 → 95% bounds).
    Raises ``ValueError`` when the stationary tightening empties a box.
    """
    box = as_box_problem(problem)
    A, B = box.A, box.B
    Q, R = box.Q, box.R
    P = _np_dare(A, B, Q, R)
    BtP = B.T @ P
    K = -np.linalg.solve(R + BtP @ B, BtP @ A)

    Sigma_w = np.asarray(Sigma_w, dtype=np.float64)
    if Sigma_w.ndim == 1:
        Sigma_w = np.diag(Sigma_w)
    state_m, input_m, beta = gaussian_stage_margins(
        A, B, K, Sigma_w, box.N, eps
    )

    if np.any(box.x_min + state_m.max(0) >= box.x_max - state_m.max(0)) or np.any(
        box.u_min + input_m.max(0) >= box.u_max - input_m.max(0)
    ):
        raise ValueError(
            f"chance tightening empties a constraint box: state margins up to "
            f"{state_m.max(0)}, input up to {input_m.max(0)} at eps={eps}"
        )

    inner = make_box_mpc(
        box, solver=solver, iters=iters, dtype=dtype, terminal=terminal,
        rho=rho,
    )
    # drop the per-stage tightenings into the stacked bound vectors (the QP
    # structure — P, A_c, Ruiz scaling, ADMM factorization — is unchanged)
    qp = inner.qp
    x_lb = qp.x_lb + jnp.asarray(state_m.reshape(-1), dtype=dtype)
    x_ub = qp.x_ub - jnp.asarray(state_m.reshape(-1), dtype=dtype)
    u_lb = qp.u_lb + jnp.asarray(input_m.reshape(-1), dtype=dtype)
    u_ub = qp.u_ub - jnp.asarray(input_m.reshape(-1), dtype=dtype)
    inner = replace(
        inner,
        qp=replace(qp, x_lb=x_lb, x_ub=x_ub, u_lb=u_lb, u_ub=u_ub),
    )

    return StochasticMPC(
        inner=inner,
        A=jnp.asarray(A, dtype=dtype),
        B=jnp.asarray(B, dtype=dtype),
        K=jnp.asarray(K, dtype=dtype),
        state_margin=jnp.asarray(state_m, dtype=dtype),
        input_margin=jnp.asarray(input_m, dtype=dtype),
        eps=eps,
        beta=beta,
    )
