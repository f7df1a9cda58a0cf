"""Condensed-QP construction for linear MPC (sessions 2/3 capability).

The reference never committed its session-2/3 solver scripts — only the problem data
(``session_2/problem.py:4-33``) and the log schema (``session_2/log.py:8-12``), which
imply a condensed receding-horizon QP (SURVEY.md §2 "Missing counterpart"). This
module supplies that layer, TPU-first.

Single-shooting condensation: with ``x̄ = [x_1; …; x_N]`` and ``ū = [u_0; …; u_{N-1}]``,

    x̄ = Φ x0 + Γ ū,   Φ block-row k = A^{k+1},   Γ[k, j] = A^{k-j} B  (j ≤ k)

    J(ū; x0) = ½ ūᵀ P ū + q(x0)ᵀ ū + const,
    P = 2 (Γᵀ Q̄ Γ + R̄),   q = 2 Γᵀ Q̄ (Φ x0 − x̄_ref)

with ``Q̄ = blkdiag(Q ×(N-1), QN)`` over ``x_1..x_N`` and ``R̄ = blkdiag(R ×N)``
(the x0 stage cost is constant and dropped). Constraints stack input boxes and state
boxes into the OSQP-style two-sided form ``l(x0) ≤ A_c ū ≤ u(x0)`` with
``A_c = [I; Γ]``.

All of it is built with ``lax.scan`` over matrix powers + one dense einsum — shapes
are static in (N, nx, nu), and the builder jits/vmaps over (A, B, Q, R) so parameter
scenarios give batched QPs for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.precision import solver_precision
from ..utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class CondensedQP:
    """Condensed MPC-QP data, fixed for a given (system, horizon, weights).

    Per-solve quantities (q, constraint bounds) are affine in ``x0`` and computed by
    :meth:`qp_vectors`; everything here is precomputable and shared across a scenario
    batch when the system is shared.
    """

    P: jnp.ndarray  # (n, n) quadratic term, n = N*nu
    A_c: jnp.ndarray  # (m, n) constraint matrix [I; Γ], m = N*nu + N*nx
    Phi: jnp.ndarray  # (N*nx, nx)
    Gamma: jnp.ndarray  # (N*nx, n)
    QG: jnp.ndarray  # (N*nx, n) Q̄Γ — tracking linear terms are −2·QGᵀx̄ref
    q_x0: jnp.ndarray  # (n, nx): q(x0) = q_x0 @ x0 + q_const
    q_const: jnp.ndarray  # (n,)
    u_lb: jnp.ndarray  # (n,) input lower bounds
    u_ub: jnp.ndarray  # (n,)
    x_lb: jnp.ndarray  # (N*nx,) state lower bounds (pre-shift)
    x_ub: jnp.ndarray  # (N*nx,)
    N: int = static_field()
    nx: int = static_field()
    nu: int = static_field()

    @property
    def n(self) -> int:
        return self.N * self.nu

    @property
    def m(self) -> int:
        return self.N * self.nu + self.N * self.nx

    @solver_precision
    def qp_vectors(
        self, x0: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Per-scenario linear term and constraint bounds: (q, l, u).

        Solver precision matters here on TPU: at default (single-pass bf16) matmul
        precision the QP data itself carries ~3e-3 relative error, which caps the
        achievable solve accuracy regardless of solver quality.
        """
        shift = self.Phi @ x0
        q = self.q_x0 @ x0 + self.q_const
        l = jnp.concatenate([self.u_lb, self.x_lb - shift])
        u = jnp.concatenate([self.u_ub, self.x_ub - shift])
        return q, l, u

    @solver_precision
    def predict_states(self, x0: jnp.ndarray, u_flat: jnp.ndarray) -> jnp.ndarray:
        """x̄ = Φ x0 + Γ ū, reshaped to (N, nx)."""
        return (self.Phi @ x0 + self.Gamma @ u_flat).reshape(self.N, self.nx)

    @solver_precision
    def ref_linear_term(self, x_ref: jnp.ndarray) -> jnp.ndarray:
        """Tracking linear term ``−2·ΓᵀQ̄·x̄ref`` for a reference window.

        ``x_ref``: (N, nx) — the per-MPC-step quantity behind *preview*
        tracking (the receding reference window sliced from a full reference
        trajectory each closed-loop step). Equals the build-time ``q_const``
        when the window is the baked constant reference.
        """
        return -2.0 * self.QG.T @ x_ref.reshape(self.N * self.nx)


@pytree_dataclass
class SoftCondensedQP:
    """Slack-softened condensed MPC QP: state boxes become soft constraints.

    Session 3 exists because session 2's problem data goes *infeasible* in closed
    loop (brake too late and no input satisfies the position bound) — the reference
    hand-relaxes the bounds (``session_3/problem.py:15,17``). This is the principled
    version: decision variables ``z = [ū; s]`` with one slack ``s_k ≥ 0`` per state
    component per stage and cost ``+ w‖s‖² + γ·1ᵀs``,

        l_u ≤ ū ≤ u_u,   Γū − s ≤ x_ub − Φx0,   Γū + s ≥ x_lb − Φx0,   s ≥ 0

    so the QP is feasible for every measured state and the controller degrades
    gracefully instead of failing. With ``γ`` larger than the hard problem's
    constraint multipliers the ℓ1 term is an exact penalty: slacks are exactly zero
    whenever the hard problem is feasible, and the soft solution coincides with it.

    Duck-types the :class:`CondensedQP` per-solve interface (``n``/``m``/
    ``qp_vectors``/``predict_states``) so solvers and the fused Pallas kernel work
    unchanged on the extended variables.
    """

    P: jnp.ndarray  # (n2, n2) blkdiag(P_hard, 2w I)
    A_c: jnp.ndarray  # (m2, n2)
    base: CondensedQP
    slack_linear: jnp.ndarray  # () γ

    @property
    def N(self) -> int:
        return self.base.N

    @property
    def nx(self) -> int:
        return self.base.nx

    @property
    def nu(self) -> int:
        return self.base.nu

    @property
    def n_inputs(self) -> int:
        return self.base.n

    @property
    def n_slack(self) -> int:
        return self.base.N * self.base.nx

    @property
    def n(self) -> int:
        return self.n_inputs + self.n_slack

    @property
    def m(self) -> int:
        return self.n_inputs + 3 * self.n_slack

    @solver_precision
    def qp_vectors(
        self, x0: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        b = self.base
        shift = b.Phi @ x0
        q_u = b.q_x0 @ x0 + b.q_const
        dtype = q_u.dtype
        ns = self.n_slack
        inf = jnp.full(ns, jnp.inf, dtype=dtype)
        q = jnp.concatenate([q_u, jnp.full(ns, self.slack_linear, dtype=dtype)])
        l = jnp.concatenate([b.u_lb, -inf, b.x_lb - shift, jnp.zeros(ns, dtype)])
        u = jnp.concatenate([b.u_ub, b.x_ub - shift, inf, inf])
        return q, l, u

    @solver_precision
    def predict_states(self, x0: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        return self.base.predict_states(x0, z[: self.n_inputs])


def soften_condensed_qp(
    cqp: CondensedQP,
    slack_weight: float = 100.0,
    slack_linear: float = 1.0,
) -> SoftCondensedQP:
    """Extend a hard condensed QP with per-stage state-constraint slacks."""
    dtype = cqp.P.dtype
    n, ns = cqp.n, cqp.N * cqp.nx
    Z = jnp.zeros((n, ns), dtype=dtype)
    P = jnp.block(
        [[cqp.P, Z], [Z.T, 2.0 * slack_weight * jnp.eye(ns, dtype=dtype)]]
    )
    I_n = jnp.eye(n, dtype=dtype)
    I_s = jnp.eye(ns, dtype=dtype)
    Zm = jnp.zeros((ns, n), dtype=dtype)
    A_c = jnp.block(
        [
            [I_n, Z],           # input box
            [cqp.Gamma, -I_s],  # Γū − s ≤ x_ub − Φx0
            [cqp.Gamma, I_s],   # Γū + s ≥ x_lb − Φx0
            [Zm, I_s],          # s ≥ 0
        ]
    )
    return SoftCondensedQP(
        P=P,
        A_c=A_c,
        base=cqp,
        slack_linear=jnp.asarray(slack_linear, dtype=dtype),
    )


def prediction_matrices(
    A: jnp.ndarray, B: jnp.ndarray, N: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense prediction matrices (Φ, Γ) via a matrix-power scan.

    Returns ``Phi`` of shape ``(N*nx, nx)`` and ``Gamma`` of shape ``(N*nx, N*nu)``.
    The lower-block-Toeplitz Γ is gathered from the power stack
    ``[B, AB, …, A^{N-1}B]`` with a static index/mask grid — no Python-level
    dependence on traced values, so the builder itself jits and vmaps.
    """
    nx, nu = B.shape

    def power_step(Ak, _):
        return A @ Ak, Ak

    _, powers = jax.lax.scan(
        power_step, jnp.eye(nx, dtype=A.dtype), None, length=N
    )  # powers[i] = A^i, i = 0..N-1

    # Phi rows: A^{k+1} for k = 0..N-1
    phi_blocks = jnp.einsum("ij,njk->nik", A, powers)  # A^{k+1}
    Phi = phi_blocks.reshape(N * nx, nx)

    AB = jnp.einsum("nij,jk->nik", powers, B)  # AB[i] = A^i B

    # Gamma block (k, j) = A^{k-j} B for j <= k else 0
    k_idx = jnp.arange(N)[:, None]
    j_idx = jnp.arange(N)[None, :]
    diff = k_idx - j_idx  # (N, N)
    gather = jnp.clip(diff, 0, N - 1)
    blocks = AB[gather]  # (N, N, nx, nu)
    mask = (diff >= 0)[:, :, None, None]
    blocks = jnp.where(mask, blocks, jnp.zeros_like(blocks))
    Gamma = blocks.transpose(0, 2, 1, 3).reshape(N * nx, N * nu)
    return Phi, Gamma


@solver_precision
def build_condensed_qp(
    A: jnp.ndarray,
    B: jnp.ndarray,
    Q: jnp.ndarray,
    R: jnp.ndarray,
    QN: jnp.ndarray,
    N: int,
    u_min: jnp.ndarray,
    u_max: jnp.ndarray,
    x_min: jnp.ndarray,
    x_max: jnp.ndarray,
    x_ref: jnp.ndarray | None = None,
    x_term_min: jnp.ndarray | None = None,
    x_term_max: jnp.ndarray | None = None,
) -> CondensedQP:
    """Assemble the condensed QP from problem data.

    ``x_ref`` (shape ``(nx,)`` or ``(N, nx)``) enables the session-3 tracking
    variant: the stage cost becomes ``(x_k − x_ref_k)ᵀ Q (x_k − x_ref_k)``.

    ``x_term_min/x_term_max`` tighten the LAST state block's box (terminal-set
    constraint on ``x_N``, intersected with the stage box — e.g. the certified
    inner box of the DARE invariant ellipsoid from
    :func:`...solvers.lqr.lqr_terminal_set`).
    """
    nx, nu = B.shape
    dtype = B.dtype
    Phi, Gamma = prediction_matrices(A, B, N)

    # Q̄ as a (N*nx, N*nx) block diagonal: Q for stages 1..N-1, QN for stage N.
    Qbar_blocks = jnp.concatenate(
        [jnp.tile(Q[None], (N - 1, 1, 1)), QN[None]], axis=0
    )
    QbarGamma = (
        jnp.einsum(
            "nij,njk->nik",
            Qbar_blocks,
            Gamma.reshape(N, nx, N * nu),
        ).reshape(N * nx, N * nu)
    )
    H = Gamma.T @ QbarGamma
    Rbar = jnp.kron(jnp.eye(N, dtype=dtype), R)
    P = 2.0 * (H + Rbar)
    P = 0.5 * (P + P.T)

    q_x0 = 2.0 * QbarGamma.T @ Phi

    if x_ref is None:
        q_const = jnp.zeros(N * nu, dtype=dtype)
    else:
        x_ref = jnp.asarray(x_ref, dtype=dtype)
        if x_ref.ndim == 1:
            x_ref = jnp.tile(x_ref[None], (N, 1))
        q_const = -2.0 * QbarGamma.T @ x_ref.reshape(N * nx)

    A_c = jnp.concatenate([jnp.eye(N * nu, dtype=dtype), Gamma], axis=0)

    tile = lambda v: jnp.tile(jnp.asarray(v, dtype=dtype), N)
    x_lb_full = tile(x_min)
    x_ub_full = tile(x_max)
    if x_term_min is not None:
        x_lb_full = x_lb_full.at[-nx:].set(
            jnp.maximum(x_lb_full[-nx:], jnp.asarray(x_term_min, dtype=dtype))
        )
    if x_term_max is not None:
        x_ub_full = x_ub_full.at[-nx:].set(
            jnp.minimum(x_ub_full[-nx:], jnp.asarray(x_term_max, dtype=dtype))
        )
    return CondensedQP(
        P=P,
        A_c=A_c,
        Phi=Phi,
        Gamma=Gamma,
        QG=QbarGamma,
        q_x0=q_x0,
        q_const=q_const,
        u_lb=tile(u_min),
        u_ub=tile(u_max),
        x_lb=x_lb_full,
        x_ub=x_ub_full,
        N=N,
        nx=nx,
        nu=nu,
    )
