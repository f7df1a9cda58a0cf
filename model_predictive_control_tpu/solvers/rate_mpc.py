"""Rate-limited linear MPC: input slew constraints and Δu smoothing.

Production actuators slew at finite rates; the reference's problems bound only
input magnitude (``session_2/problem.py:12-13``). This module extends the
condensed box-QP with the first-difference channel, staying on the engine's
hot path:

    Δu_k = u_k − u_{k−1},  u_{−1} = u_prev  (the input applied last step)

- **hard rate bounds** ``du_min ≤ Δu_k ≤ du_max`` append ``N·nu`` rows
  ``D ū ∈ [l_Δ + E u_prev, u_Δ + E u_prev]`` to the OSQP-style two-sided
  constraint stack (``D`` = block first-difference, ``E`` selects the first
  block), and
- **quadratic smoothing** ``Σ Δu_kᵀ λ Δu_k`` folds into the Hessian
  (``P += 2 DᵀΛ̄D``) with the ``u_prev`` cross term in the linear part.

Everything stays affine in the per-step data ``(x0, u_prev)``, so the QP
family is still one ``qp_setup`` (Ruiz + KKT inverses precomputed once) and
batched scenarios still ride ``vmap``/the fused Pallas ADMM kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.condensed import CondensedQP, build_condensed_qp
from ..utils.precision import solver_precision
from ..utils.pytree import pytree_dataclass, static_field
from .qp import QPOperator, admm_solve, qp_setup


@pytree_dataclass
class RateCondensedQP:
    """Condensed QP with the rate channel. Per-solve data: ``(x0, u_prev)``."""

    base: CondensedQP
    D: jnp.ndarray  # (N nu, N nu) first-difference map
    q_uprev: jnp.ndarray  # (n, nu): q += q_uprev @ u_prev (smoothing cross term)
    du_lb: jnp.ndarray  # (N nu,) rate bounds (pre-shift)
    du_ub: jnp.ndarray
    P: jnp.ndarray  # (n, n) Hessian incl. smoothing
    A_c: jnp.ndarray  # (m + N nu, n) constraint stack [I; Γ; D]

    @property
    def N(self) -> int:
        return self.base.N

    @property
    def nu(self) -> int:
        return self.base.nu

    @property
    def nx(self) -> int:
        return self.base.nx

    def qp_vectors(self, x0: jnp.ndarray, u_prev: jnp.ndarray):
        """(q, l, u) for the stacked constraints [inputs; states; rates]."""
        q, l, u = self.base.qp_vectors(x0)
        q = q + self.q_uprev @ u_prev
        nu = self.nu
        # Δu_0 = u_0 − u_prev: shift only the first block's bounds
        dl = self.du_lb.at[:nu].add(u_prev)
        du = self.du_ub.at[:nu].add(u_prev)
        return q, jnp.concatenate([l, dl]), jnp.concatenate([u, du])


@solver_precision
def build_rate_condensed_qp(
    A, B, Q, R, QN, N,
    u_min, u_max, x_min, x_max,
    du_min=None, du_max=None, du_weight=None,
    x_ref=None,
) -> RateCondensedQP:
    """Extend :func:`..ops.condensed.build_condensed_qp` with the rate channel.

    ``du_min``/``du_max``: per-step slew bounds, shape ``(nu,)`` (omit one side
    with ±inf). ``du_weight``: (nu, nu) smoothing weight λ (None → zero).
    """
    base = build_condensed_qp(
        A, B, Q, R, QN, N, u_min, u_max, x_min, x_max, x_ref=x_ref
    )
    nu = B.shape[1]
    dtype = B.dtype
    n = N * nu
    I = jnp.eye(n, dtype=dtype)
    # D: identity minus one-block subdiagonal
    sub = jnp.eye(n, k=-nu, dtype=dtype)
    D = I - sub
    E = jnp.zeros((n, nu), dtype=dtype).at[:nu, :].set(jnp.eye(nu, dtype=dtype))

    P = base.P
    q_uprev = jnp.zeros((n, nu), dtype=dtype)
    if du_weight is not None:
        lam = jnp.asarray(du_weight, dtype=dtype)
        Lbar = jnp.kron(jnp.eye(N, dtype=dtype), lam)
        P = P + 2.0 * D.T @ Lbar @ D
        P = 0.5 * (P + P.T)
        q_uprev = -2.0 * D.T @ (Lbar @ E)

    du_lb = jnp.tile(
        jnp.full((nu,), -jnp.inf, dtype) if du_min is None else jnp.asarray(du_min, dtype), N
    )
    du_ub = jnp.tile(
        jnp.full((nu,), jnp.inf, dtype) if du_max is None else jnp.asarray(du_max, dtype), N
    )
    A_c = jnp.concatenate([base.A_c, D], axis=0)
    return RateCondensedQP(
        base=base, D=D, q_uprev=q_uprev, du_lb=du_lb, du_ub=du_ub, P=P, A_c=A_c
    )


@pytree_dataclass
class RateLimitedMPC:
    """Receding-horizon MPC over the rate-extended condensed QP.

    Carry = ``(x_warm, y_warm, u_prev)``: the standard shifted warm start plus
    the input applied last step (feeds both the Δu_0 bound and the smoothing
    cross term).
    """

    qp: RateCondensedQP
    op: QPOperator
    iters: int = static_field(default=200)

    @property
    def N(self) -> int:
        return self.qp.N

    def solve(self, x0, u_prev, warm=None):
        q, l, u = self.qp.qp_vectors(x0, u_prev)
        sol = admm_solve(self.op, q, l, u, iters=self.iters, warm=warm)
        return sol.x.reshape(self.N, self.qp.nu), sol

    def _shift_warm(self, x, y, axis: int = 0):
        """Shift the warm start one stage, PER CONSTRAINT BLOCK: the dual
        stacks [inputs (N·nu) | states (N·nx) | rates (N·nu)] and a flat roll
        would smear duals across block boundaries."""
        nu, nx, N = self.qp.nu, self.qp.nx, self.qp.N

        def roll(v, d, repeat):
            head = jax.lax.slice_in_dim(v, d, v.shape[axis], axis=axis)
            tail = (
                jax.lax.slice_in_dim(v, v.shape[axis] - d, v.shape[axis], axis=axis)
                if repeat
                else jnp.zeros_like(jax.lax.slice_in_dim(v, 0, d, axis=axis))
            )
            return jnp.concatenate([head, tail], axis=axis)

        x_w = roll(x, nu, repeat=True)
        blocks = []
        for start, size, d in (
            (0, N * nu, nu), (N * nu, N * nx, nx), (N * nu + N * nx, N * nu, nu)
        ):
            blk = jax.lax.slice_in_dim(y, start, start + size, axis=axis)
            blocks.append(roll(blk, d, repeat=False))
        return x_w, jnp.concatenate(blocks, axis=axis)

    def policy(self):
        nu, N = self.qp.nu, self.qp.N

        def policy_fn(x, t, carry):
            x_warm, y_warm, u_prev = carry
            u_traj, sol = self.solve(x, u_prev, warm=(x_warm, y_warm))
            x_w, y_w = self._shift_warm(sol.x, sol.y)
            u0 = u_traj[0]
            aux = {
                "solver_success": sol.converged,
                "input_prediction": u_traj,
                "du": u0 - u_prev,
            }
            return u0, (x_w, y_w, u0), aux

        return policy_fn

    def initial_carry(self, u_prev=None, dtype=jnp.float32):
        n = self.qp.P.shape[0]
        m = self.qp.A_c.shape[0]
        if u_prev is None:
            u_prev = jnp.zeros((self.qp.nu,), dtype)
        return (
            jnp.zeros((n,), dtype),
            jnp.zeros((m,), dtype),
            jnp.asarray(u_prev, dtype),
        )

    def batched_policy(self, backend: str = "pallas", tile: int = 256,
                       max_rho_moves: int | None = None):
        """Batch-level policy for :func:`..control.batch_loop.simulate_batch`;
        same carry contract as :meth:`policy` with a leading batch axis."""
        nu = self.qp.nu

        def policy_fn(x, t, carry):
            x_warm, y_warm, u_prev = carry
            q, l, u = jax.vmap(self.qp.qp_vectors)(x, u_prev)
            if backend == "pallas":
                from ..ops.pallas.admm_kernel import admm_solve_pallas

                sol = admm_solve_pallas(
                    self.op, q, l, u, x_warm, y_warm, iters=self.iters,
                    tile=tile, max_rho_moves=max_rho_moves,
                )
            elif backend == "xla":
                sol = jax.vmap(
                    lambda qq, ll, uu, wx, wy: admm_solve(
                        self.op, qq, ll, uu, iters=self.iters, warm=(wx, wy)
                    )
                )(q, l, u, x_warm, y_warm)
            else:
                raise ValueError(f"unknown backend {backend!r}")
            u0 = sol.x[:, :nu]
            x_w, y_w = self._shift_warm(sol.x, sol.y, axis=1)
            aux = {
                "solver_success": sol.converged,
                "du": u0 - u_prev,
            }
            return u0, (x_w, y_w, u0), aux

        return policy_fn

    def initial_batch_carry(self, batch: int, u_prev=None, dtype=jnp.float32):
        n = self.qp.P.shape[0]
        m = self.qp.A_c.shape[0]
        if u_prev is None:
            u_prev = jnp.zeros((batch, self.qp.nu), dtype)
        return (
            jnp.zeros((batch, n), dtype),
            jnp.zeros((batch, m), dtype),
            jnp.asarray(u_prev, dtype),
        )


def make_rate_limited_mpc(
    problem,
    du_max: float,
    du_weight: float | None = None,
    iters: int = 300,
    dtype=jnp.float32,
    rho: float = 0.1,
) -> RateLimitedMPC:
    """Session-2/3 :class:`~.linear_mpc.Problem` data or any general
    :class:`~.linear_mpc.BoxProblem`, plus a symmetric slew bound
    ``|Δu| ≤ du_max`` per step (physical units per Ts) and optional scalar
    smoothing weight."""
    from .linear_mpc import as_box_problem

    box = as_box_problem(problem)
    system = box.system(dtype)
    A, B = system.A, system.B
    nx, nu = B.shape
    Q = jnp.asarray(box.Q, dtype)
    R = jnp.asarray(box.R, dtype)
    qp = build_rate_condensed_qp(
        A, B, Q, R, Q, box.N,
        u_min=jnp.asarray(box.u_min, dtype),
        u_max=jnp.asarray(box.u_max, dtype),
        x_min=jnp.asarray(box.x_min, dtype),
        x_max=jnp.asarray(box.x_max, dtype),
        du_min=jnp.full((nu,), -du_max, dtype),
        du_max=jnp.full((nu,), du_max, dtype),
        du_weight=None if du_weight is None else du_weight * jnp.eye(nu, dtype=dtype),
    )
    op = qp_setup(qp.P, qp.A_c, rho=rho)
    return RateLimitedMPC(qp=qp, op=op, iters=iters)
