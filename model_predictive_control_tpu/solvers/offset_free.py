"""Offset-free linear MPC: disturbance observer + target calculation.

The reference's exercises 4/5 demonstrate the *problem* — plant/model mismatch
makes the closed loop settle away from the goal (``session_4/session4_sol.py:
389-488``) — but offer no mechanism to remove it. This module supplies the
classic production-MPC answer (the Muske–Badgwell / Maeder–Borrelli–Morari
pattern): augment the model with a constant fictitious disturbance,

    x⁺ = A x + B u + B_d d,    d⁺ = d,    y = C x + C_d d,

estimate ``(x̂, d̂)`` with a steady-state Kalman observer on the augmented
system (reusing :func:`..estimation.kalman_gain` — the filter DARE via
control-DARE duality, no new machinery), compute the *target* ``(x_s, u_s)``
that holds the tracked outputs ``H y`` at the reference despite ``d̂``,

    [A − I  B] [x_s]   [−B_d d̂]
    [H C    0] [u_s] = [ r − H C_d d̂ ],

and run the standard condensed MPC in deviation variables ``(x − x_s,
u − u_s)``. Integral action falls out: any persistent model error shows up in
``d̂`` and shifts the target until the measured output sits exactly on ``r``.

TPU-native notes: the target map is linear in ``(d̂, r)`` — its pseudo-inverse
is a host-side precompute, so the per-step work is two small matvecs plus the
usual fixed-iteration deviation-QP solve with shifted bounds; everything stays
inside one jitted closed-loop scan and vmaps over scenario/disturbance axes.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..utils.precision import solver_precision
from ..utils.pytree import pytree_dataclass
from ..control.simulate import Policy
from ..models.linear import LinearSystem
from .linear_mpc import (
    BoxProblem,
    LinearMPC,
    Problem,
    as_box_problem,
    make_box_mpc,
)
from .qp import admm_solve, pdip_solve


def _x64_enabled() -> bool:
    import jax

    return bool(jax.config.read("jax_enable_x64"))


@pytree_dataclass
class OffsetFreeMPC:
    """Observer-augmented MPC with zero steady-state output offset.

    ``policy`` consumes MEASUREMENTS ``y`` (not states): carry is
    ``(x̂, d̂, warm)``; each step corrects the augmented estimate with the
    innovation, recomputes the target, solves the deviation QP, applies
    ``u = ũ_0 + u_s``, and predicts the estimate through the applied input.
    """

    inner: LinearMPC
    system: LinearSystem  # model (A, B, C)
    Bd: jnp.ndarray  # (nx, nd) disturbance-to-state map
    Cd: jnp.ndarray  # (ny, nd) disturbance-to-output map
    L: jnp.ndarray  # (nx + nd, ny) augmented steady-state observer gain
    T_d: jnp.ndarray  # (nx + nu, nd) target map: [x_s; u_s] = T_d d̂ + T_r r
    T_r: jnp.ndarray  # (nx + nu, nr)
    r: jnp.ndarray  # (nr,) tracked-output reference

    def _targets(self, d_hat):
        t = self.T_d @ d_hat + self.T_r @ self.r
        nx = self.system.A.shape[0]
        return t[:nx], t[nx:]

    def _deviation_vectors(self, dx0, x_s, u_s):
        qp = self.inner.qp
        q, l, u = qp.qp_vectors(dx0)
        shift = jnp.concatenate(
            [jnp.tile(u_s, qp.N), jnp.tile(x_s, qp.N)]
        )
        return q, l - shift, u - shift

    def solve_deviation(self, dx0, x_s, u_s, warm=None):
        """Deviation-variable QP: same operator, bounds shifted by the target.

        Dispatches on ``self.inner.solver`` (``"admm"`` / ``"pdip"``), matching
        :meth:`.linear_mpc.LinearMPC.solve`.
        """
        qp, op = self.inner.qp, self.inner.op
        q, l, u = self._deviation_vectors(dx0, x_s, u_s)
        if self.inner.solver == "admm":
            sol = admm_solve(op, q, l, u, iters=self.inner.iters, warm=warm)
        elif self.inner.solver == "pdip":
            sol = pdip_solve(op, q, l, u, iters=self.inner.iters)
        else:
            raise ValueError(f"unknown solver {self.inner.solver!r}")
        N, nu = qp.N, qp.nu
        return sol.x[: N * nu].reshape(N, nu), sol

    def policy(self) -> Policy:
        A, B, C = self.system.A, self.system.B, self.system.C
        Bd, Cd, L = self.Bd, self.Cd, self.L
        nx = A.shape[0]

        # HIGHEST matmul precision: observer/target matvecs at TPU-default
        # bf16 bias the disturbance estimate at session-2 magnitudes
        @solver_precision
        def policy_fn(y, t, carry):
            x_hat, d_hat, warm = carry
            # innovation correction of the augmented estimate
            innov = y - (C @ x_hat + Cd @ d_hat)
            corr = L @ innov
            x_hat = x_hat + corr[:nx]
            d_hat = d_hat + corr[nx:]

            x_s, u_s = self._targets(d_hat)
            du_traj, sol = self.solve_deviation(x_hat - x_s, x_s, u_s, warm)
            u = du_traj[0] + u_s
            x_warm, y_warm = self.inner._shift_warm(sol.x, sol.y)

            # predict through the applied input (disturbance model: d⁺ = d)
            x_next = A @ x_hat + B @ u + Bd @ d_hat
            aux = {
                "solver_success": sol.converged,
                "state_prediction": self.inner.qp.predict_states(
                    x_hat - x_s, sol.x
                ) + x_s,
                "input_prediction": du_traj + u_s,
                "state_estimate": x_hat,
                "disturbance_estimate": d_hat,
                "target_state": x_s,
                "target_input": u_s,
            }
            return u, (x_next, d_hat, (x_warm, y_warm)), aux

        return policy_fn

    def initial_carry(self, xhat0, dtype=jnp.float32):
        nd = self.Bd.shape[1]
        return (
            jnp.asarray(xhat0, dtype),
            jnp.zeros(nd, dtype),
            self.inner.initial_carry(dtype),
        )

    def batched_policy(
        self, backend: str = "pallas", tile: int = 256, chunks: int = 2,
        max_rho_moves: int | None = None, schedule: str = "uniform",
        alpha: float = 1.6,
    ):
        """Batch-level offset-free policy for
        :func:`~..control.batch_loop.simulate_batch`: the observer/target
        updates are batched matvecs, the deviation QP rides the fused Pallas
        ADMM kernel (``backend="pallas"``) or the vmapped scalar solver
        (``backend="xla"``). Consumes MEASUREMENT batches ``y (B, ny)``; carry
        from :meth:`initial_batch_carry`.
        """
        import jax

        A, B, C = self.system.A, self.system.B, self.system.C
        Bd, Cd, L = self.Bd, self.Cd, self.L
        nx = A.shape[0]
        qp, op = self.inner.qp, self.inner.op
        N, nu = qp.N, qp.nu

        @solver_precision
        def policy_fn(y_batch, t, carry):
            x_hat, d_hat, (warm_x, warm_y) = carry
            innov = y_batch - (x_hat @ C.T + d_hat @ Cd.T)
            corr = innov @ L.T
            x_hat = x_hat + corr[:, :nx]
            d_hat = d_hat + corr[:, nx:]

            targets = d_hat @ self.T_d.T + self.r @ self.T_r.T
            x_s, u_s = targets[:, :nx], targets[:, nx:]
            q, l, u = jax.vmap(self._deviation_vectors)(x_hat - x_s, x_s, u_s)
            if backend == "pallas":
                from ..ops.pallas.admm_kernel import admm_solve_pallas

                sol = admm_solve_pallas(
                    op, q, l, u, warm_x, warm_y, iters=self.inner.iters,
                    chunks=chunks, max_rho_moves=max_rho_moves,
                    schedule=schedule, tile=tile, alpha=alpha,
                )
            elif backend == "xla":
                sol = jax.vmap(
                    lambda qq, ll, uu, wx, wy: admm_solve(
                        op, qq, ll, uu, iters=self.inner.iters, warm=(wx, wy)
                    )
                )(q, l, u, warm_x, warm_y)
            else:
                raise ValueError(f"unknown backend {backend!r}")
            u_apply = sol.x[:, :nu] + u_s
            x_warm, y_warm = self.inner._shift_warm(sol.x, sol.y, axis=1)
            x_next = x_hat @ A.T + u_apply @ B.T + d_hat @ Bd.T
            aux = {
                "solver_success": sol.converged,
                "prim_res": sol.prim_res,
                "dual_res": sol.dual_res,
                "disturbance_estimate": d_hat,
                "target_state": x_s,
                "target_input": u_s,
            }
            return u_apply, (x_next, d_hat, (x_warm, y_warm)), aux

        return policy_fn

    def initial_batch_carry(self, xhat0_batch, dtype=jnp.float32):
        xhat0_batch = jnp.asarray(xhat0_batch, dtype)
        B = xhat0_batch.shape[0]
        nd = self.Bd.shape[1]
        return (
            xhat0_batch,
            jnp.zeros((B, nd), dtype),
            self.inner.initial_batch_carry(B, dtype=dtype),
        )


def make_offset_free_mpc(
    problem: Problem | BoxProblem,
    r,
    H=None,
    C=None,
    Bd=None,
    Cd=None,
    Qw_scale: float = 1e-3,
    Qd_scale: float = 1.0,
    Rv_scale: float = 1e-4,
    solver: str = "admm",
    iters: int = 200,
    dtype=jnp.float32,
    rho: float = 0.1,
) -> OffsetFreeMPC:
    """Build an offset-free MPC from session-2/3 :class:`Problem` data or any
    general :class:`BoxProblem` (the observer/target machinery is
    dimension-generic).

    ``r``: reference for the tracked outputs ``H C x`` (default ``H``: the
    first ``nd`` measured outputs — position for the session plant).
    ``C``: measurement matrix (default: identity — full-state measurement
    still needs the observer, because ``d`` is never measured).
    ``Bd``/``Cd``: disturbance model (default: input disturbance ``Bd = B``,
    ``Cd = 0`` — the standard choice for actuator/model bias).
    ``Qd_scale`` sets how aggressively the observer attributes innovation to
    the disturbance (the integral-action bandwidth).
    """
    box = as_box_problem(problem)
    A, B = box.A, box.B
    nx, nu = B.shape
    C = np.eye(nx) if C is None else np.asarray(C, dtype=np.float64)
    ny = C.shape[0]
    Bd = B.copy() if Bd is None else np.asarray(Bd, dtype=np.float64)
    nd = Bd.shape[1]
    Cd = np.zeros((ny, nd)) if Cd is None else np.asarray(Cd, np.float64)
    H = np.eye(ny)[:nd] if H is None else np.asarray(H, np.float64)
    nr = H.shape[0]
    if nr != nd:
        raise ValueError(
            f"need as many tracked outputs as disturbances ({nr} vs {nd}) "
            "for a square target system"
        )

    # augmented observability check (Maeder et al. condition): the target
    # system below must be invertible, else offsets cannot be removed
    T = np.block([[A - np.eye(nx), B], [H @ C, np.zeros((nr, nu))]])
    if np.linalg.matrix_rank(T) < nx + nu:
        raise ValueError("target system singular: (A, B, HC) cannot hold r")
    rhs_d = np.concatenate([-Bd, -H @ Cd], axis=0)  # (nx+nr, nd)
    rhs_r = np.concatenate([np.zeros((nx, nr)), np.eye(nr)], axis=0)
    T_inv = np.linalg.pinv(T)
    T_d = T_inv @ rhs_d
    T_r = T_inv @ rhs_r
    # achievability: with nr > nu the pinv returns least-squares targets whose
    # steady-state output quietly misses r — refuse instead of drifting
    res = max(
        float(np.abs(T @ T_d - rhs_d).max()),
        float(np.abs(T @ T_r - rhs_r).max()),
    )
    if res > 1e-8:
        raise ValueError(
            f"target system overdetermined (residual {res:.2e}): with "
            f"{nr} tracked outputs and {nu} inputs the references are not "
            "achievable — offset-free tracking needs nr <= nu in general"
        )

    # augmented steady-state Kalman observer via the estimation layer
    from ..estimation import kalman_gain

    A_aug = np.block([[A, Bd], [np.zeros((nd, nx)), np.eye(nd)]])
    B_aug = np.concatenate([B, np.zeros((nd, nu))], axis=0)
    C_aug = np.concatenate([C, Cd], axis=1)
    # float64 where available (tests/CPU); on TPU x64 is unsupported and f32
    # is ample for this 3×3 observer DARE (verified on chip: d̂ exact).
    f = jnp.float64 if _x64_enabled() else jnp.float32
    aug = LinearSystem(
        A=jnp.asarray(A_aug, dtype=f),
        B=jnp.asarray(B_aug, dtype=f),
        C=jnp.asarray(C_aug, dtype=f),
    )
    Qw = np.block(
        [
            [Qw_scale * np.eye(nx), np.zeros((nx, nd))],
            [np.zeros((nd, nx)), Qd_scale * np.eye(nd)],
        ]
    )
    kf = kalman_gain(
        aug, jnp.asarray(Qw, f), jnp.asarray(Rv_scale * np.eye(ny), f)
    )

    inner = make_box_mpc(
        box, solver=solver, iters=iters, dtype=dtype, terminal="dare",
        rho=rho,
    )
    return OffsetFreeMPC(
        inner=inner,
        system=LinearSystem(
            A=jnp.asarray(A, dtype), B=jnp.asarray(B, dtype),
            C=jnp.asarray(C, dtype),
        ),
        Bd=jnp.asarray(Bd, dtype),
        Cd=jnp.asarray(Cd, dtype),
        L=jnp.asarray(np.asarray(kf.L, np.float64), dtype),
        T_d=jnp.asarray(T_d, dtype),
        T_r=jnp.asarray(T_r, dtype),
        r=jnp.asarray(np.atleast_1d(r), dtype),
    )
