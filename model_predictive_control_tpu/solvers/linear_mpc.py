"""Constrained linear MPC (sessions 2/3 capability).

The reference committed only the problem data (``session_2/problem.py:4-33``,
``session_3/problem.py:8-36``) and the telemetry schema (``session_2/log.py:8-12``);
the receding-horizon QP loop itself was never committed (SURVEY.md §3.5). This module
supplies it: condensed-QP build from the ``Problem`` data, a warm-started batched
box-QP solve per step, and a policy whose per-step aux reproduces the
``ControllerLog`` fields (``solver_success`` / ``state_prediction`` /
``input_prediction``) as stacked arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.linear import LinearSystem
from ..ops.condensed import (
    CondensedQP,
    SoftCondensedQP,
    build_condensed_qp,
    soften_condensed_qp,
)
from ..utils.pytree import pytree_dataclass, static_field
from ..control.simulate import Policy
from .qp import QPOperator, admm_solve, pdip_solve, qp_setup


@pytree_dataclass
class Problem:
    """Session-2/3 problem data (mirrors ``session_2/problem.py`` semantics).

    ``x = (p, v)``: position must stay below ``p_max`` (the braking wall), inputs are
    accelerations. Defaults are session 2's; :func:`session3_problem` relaxes the
    lower bounds the way ``session_3/problem.py:15,17`` does.
    """

    Ts: float = 0.3
    Q: tuple = (10.0, 1.0)  # state weight diagonal (session_2/problem.py:9)
    R: tuple = (0.01,)  # input weight diagonal
    p_min: float = -150.0
    p_max: float = 1.0
    v_min: float = -20.0
    v_max: float = 25.0
    u_min: float = -20.0
    u_max: float = 10.0
    N: int = static_field(default=5)

    def system(self, dtype=jnp.float32) -> LinearSystem:
        """A = [[1, Ts], [0, 1]], B = [[0], [Ts]] (problem.py:22-24)."""
        A = jnp.array([[1.0, self.Ts], [0.0, 1.0]], dtype=dtype)
        B = jnp.array([[0.0], [self.Ts]], dtype=dtype)
        return LinearSystem(A=A, B=B)

    @property
    def n_state(self) -> int:
        return 2

    @property
    def n_input(self) -> int:
        return 1


def session2_problem(N: int = 5) -> Problem:
    return Problem(N=N)


def session3_problem(N: int = 5) -> Problem:
    """Relaxed bounds variant (session_3/problem.py:15,17)."""
    return Problem(p_min=-120.0, v_min=-50.0, N=N)


import dataclasses as _dataclasses

import numpy as _np


@_dataclasses.dataclass(frozen=True)
class BoxProblem:
    """General box-constrained linear-MPC problem data: arbitrary ``(A, B)``,
    full weight matrices, and elementwise state/input boxes.

    The engine-grade generalization of the session-2 :class:`Problem` (which
    hard-codes the course's double integrator, ``session_2/problem.py:22-24``):
    every controller constructor in this package — nominal
    (:func:`make_box_mpc`), tube, stochastic, offset-free — accepts either.
    Host-side build-time data (float64 numpy), not a traced pytree; the
    builders convert to device arrays at the requested dtype.
    """

    A: _np.ndarray  # (nx, nx)
    B: _np.ndarray  # (nx, nu)
    Q: _np.ndarray  # (nx, nx) stage state weight (full matrix)
    R: _np.ndarray  # (nu, nu) input weight
    x_min: _np.ndarray  # (nx,)
    x_max: _np.ndarray
    u_min: _np.ndarray  # (nu,)
    u_max: _np.ndarray
    N: int = 5

    def __post_init__(self):
        def arr(v):
            return _np.asarray(v, dtype=_np.float64)

        A, B = arr(self.A), arr(self.B)
        Q, R = arr(self.Q), arr(self.R)
        if Q.ndim == 1:
            Q = _np.diag(Q)
        if R.ndim == 1:
            R = _np.diag(R)
        nx, nu = B.shape
        object.__setattr__(self, "A", A)
        object.__setattr__(self, "B", B)
        object.__setattr__(self, "Q", Q)
        object.__setattr__(self, "R", R)
        object.__setattr__(self, "x_min", _np.broadcast_to(arr(self.x_min), (nx,)).copy())
        object.__setattr__(self, "x_max", _np.broadcast_to(arr(self.x_max), (nx,)).copy())
        object.__setattr__(self, "u_min", _np.broadcast_to(arr(self.u_min), (nu,)).copy())
        object.__setattr__(self, "u_max", _np.broadcast_to(arr(self.u_max), (nu,)).copy())
        if A.shape != (nx, nx) or Q.shape != (nx, nx) or R.shape != (nu, nu):
            raise ValueError(
                f"inconsistent shapes: A {A.shape}, B {B.shape}, Q {Q.shape}, "
                f"R {R.shape}"
            )

    def system(self, dtype=jnp.float32) -> LinearSystem:
        return LinearSystem(
            A=jnp.asarray(self.A, dtype=dtype), B=jnp.asarray(self.B, dtype=dtype)
        )

    @property
    def n_state(self) -> int:
        return self.B.shape[0]

    @property
    def n_input(self) -> int:
        return self.B.shape[1]


def as_box_problem(problem) -> BoxProblem:
    """Normalize a session :class:`Problem` (or pass through a
    :class:`BoxProblem`) to the general box form."""
    if isinstance(problem, BoxProblem):
        return problem
    Ts = problem.Ts
    return BoxProblem(
        A=_np.array([[1.0, Ts], [0.0, 1.0]]),
        B=_np.array([[0.0], [Ts]]),
        Q=_np.diag(_np.asarray(problem.Q, dtype=_np.float64)),
        R=_np.diag(_np.asarray(problem.R, dtype=_np.float64)),
        x_min=_np.array([problem.p_min, problem.v_min]),
        x_max=_np.array([problem.p_max, problem.v_max]),
        u_min=_np.array([problem.u_min]),
        u_max=_np.array([problem.u_max]),
        N=problem.N,
    )


@pytree_dataclass
class LinearMPC:
    """Receding-horizon linear MPC controller over a condensed box-QP.

    Precomputes the QP family once (prediction matrices, Ruiz scaling, ADMM KKT
    inverse); per-step work is the scenario-dependent ``(q, l, u)`` plus a fixed-
    iteration solve — the TPU inversion of the reference's build-once/IPOPT-per-step
    pattern (``session_4/main.py:35-39,115-116``).
    """

    qp: CondensedQP | SoftCondensedQP
    op: QPOperator
    terminal_P: jnp.ndarray | None  # optional DARE-based terminal weight record
    solver: str = static_field(default="admm")
    iters: int = static_field(default=200)
    soft: bool = static_field(default=False)

    @property
    def N(self) -> int:
        return self.qp.N

    def _shift_warm(self, x, y, axis: int = 0):
        """Shift a QP warm start one stage (repeat last primal block, zero-pad
        the freed dual rows). Handles both the hard layout ``[ū | (in, st)]``
        and the soft layout ``[ū, s | (in, up, lo, sl)]``."""
        nu, nx, N = self.qp.nu, self.qp.nx, self.qp.N

        def roll(v, d, repeat):
            head = jax.lax.slice_in_dim(v, d, v.shape[axis], axis=axis)
            tailsrc = (
                jax.lax.slice_in_dim(v, v.shape[axis] - d, v.shape[axis], axis=axis)
                if repeat
                else jnp.zeros_like(
                    jax.lax.slice_in_dim(v, 0, d, axis=axis)
                )
            )
            return jnp.concatenate([head, tailsrc], axis=axis)

        def split(v, sizes):
            out, start = [], 0
            for s in sizes:
                out.append(jax.lax.slice_in_dim(v, start, start + s, axis=axis))
                start += s
            return out

        if not self.soft:
            x_warm = roll(x, nu, repeat=True)
            y_in, y_st = split(y, (N * nu, N * nx))
            y_warm = jnp.concatenate(
                [roll(y_in, nu, False), roll(y_st, nx, False)], axis=axis
            )
        else:
            ns = N * nx
            z_u, z_s = split(x, (N * nu, ns))
            x_warm = jnp.concatenate(
                [roll(z_u, nu, True), roll(z_s, nx, True)], axis=axis
            )
            y_in, y_up, y_lo, y_sl = split(y, (N * nu, ns, ns, ns))
            y_warm = jnp.concatenate(
                [
                    roll(y_in, nu, False),
                    roll(y_up, nx, False),
                    roll(y_lo, nx, False),
                    roll(y_sl, nx, False),
                ],
                axis=axis,
            )
        return x_warm, y_warm

    def solve(
        self,
        x0: jnp.ndarray,
        warm: tuple | None = None,
        q_extra: jnp.ndarray | None = None,
        implicit: bool = False,
    ):
        """Solve the MPC QP at measured state ``x0``.

        ``q_extra`` adds to the leading entries of the linear term (the ū
        block) — the preview-tracking hook (``CondensedQP.ref_linear_term``);
        on the slack-softened QP it leaves the slack entries untouched.

        ``implicit=True`` routes through the KKT-implicit-differentiable
        wrapper (:mod:`.implicit`): same forward solve, but ``jax.grad`` flows
        through the solution via one KKT solve instead of failing on the
        solver's ``while_loop`` internals.

        Returns ``(u_traj (N, nu), sol)`` where ``sol`` carries duals/residuals/
        convergence (the ``solver_success`` analog).
        """
        q, l, u = self.qp.qp_vectors(x0)
        if q_extra is not None:
            q = q.at[: q_extra.shape[0]].add(q_extra)
        if implicit:
            from .implicit import implicit_qp_solver

            sol = implicit_qp_solver(self.solver, iters=self.iters)(
                self.op, q, l, u, warm
            )
        elif self.solver == "admm":
            sol = admm_solve(self.op, q, l, u, iters=self.iters, warm=warm)
        elif self.solver == "pdip":
            sol = pdip_solve(self.op, q, l, u, iters=self.iters)
        else:
            raise ValueError(f"unknown solver {self.solver!r}")
        u_traj = sol.x[: self.qp.N * self.qp.nu].reshape(self.qp.N, self.qp.nu)
        return u_traj, sol

    def policy(self, differentiable: bool = False) -> Policy:
        """Receding-horizon policy for :func:`~...control.simulate.simulate`.

        Carry = warm start ``(x, y)`` shifted one stage per step. Aux pytree matches
        ``ControllerLog``: ``solver_success``, ``state_prediction`` (N, nx),
        ``input_prediction`` (N, nu).

        ``differentiable=True`` makes the per-step solve implicit-diff-capable,
        so ``jax.grad`` flows through a whole closed-loop ``simulate`` (e.g.
        d(trajectory cost)/d(x0) for tuning workloads).
        """
        nu, nx, N = self.qp.nu, self.qp.nx, self.qp.N

        def policy_fn(x, t, carry):
            # carry is (x_warm, y_warm); an empty tuple (simulate's default
            # policy_carry) means cold start.
            warm = carry if (isinstance(carry, tuple) and len(carry) == 2) else None
            u_traj, sol = self.solve(x, warm=warm, implicit=differentiable)
            x_pred = self.qp.predict_states(x, sol.x)
            # shift warm start by one stage (repeat last input block / dual blocks)
            x_warm, y_warm = self._shift_warm(sol.x, sol.y)
            aux = {
                "solver_success": sol.converged,
                "state_prediction": x_pred,
                "input_prediction": u_traj,
                "prim_res": sol.prim_res,
                "dual_res": sol.dual_res,
            }
            if self.soft:
                aux["max_slack"] = jnp.max(sol.x[N * nu :])
            return u_traj[0], (x_warm, y_warm), aux

        return policy_fn

    def initial_carry(self, dtype=jnp.float32):
        n = self.qp.n
        m = self.qp.m
        return (jnp.zeros(n, dtype=dtype), jnp.zeros(m, dtype=dtype))

    def tracking_policy(self, ref_traj: jnp.ndarray) -> Policy:
        """Preview-tracking receding-horizon policy.

        ``ref_traj``: (steps + N, nx) reference states — at closed-loop step t
        the MPC tracks the window ``ref_traj[t+1 : t+1+N]`` (stage costs weight
        x_1..x_N), so the controller *anticipates* reference motion instead of
        chasing a fixed setpoint. The trajectory must be padded N rows past the
        simulation length (repeat the final reference). Build the controller
        WITHOUT a baked ``x_ref`` (the window term replaces ``q_const``'s role).

        Same carry/aux contract as :meth:`policy`; aux additionally reports
        ``ref`` (the stage-1 reference tracked this step).
        """
        base = self.qp.base if self.soft else self.qp
        N, nx = base.N, base.nx
        ref_traj = jnp.asarray(ref_traj)

        def policy_fn(x, t, carry):
            warm = carry if (isinstance(carry, tuple) and len(carry) == 2) else None
            window = jax.lax.dynamic_slice_in_dim(ref_traj, t + 1, N, axis=0)
            q_extra = base.ref_linear_term(window)
            u_traj, sol = self.solve(x, warm=warm, q_extra=q_extra)
            x_pred = self.qp.predict_states(x, sol.x)
            x_warm, y_warm = self._shift_warm(sol.x, sol.y)
            aux = {
                "solver_success": sol.converged,
                "state_prediction": x_pred,
                "input_prediction": u_traj,
                "prim_res": sol.prim_res,
                "dual_res": sol.dual_res,
                "ref": window[0],
            }
            if self.soft:
                aux["max_slack"] = jnp.max(sol.x[N * base.nu :])
            return u_traj[0], (x_warm, y_warm), aux

        return policy_fn

    def batched_policy(
        self, backend: str = "pallas", tile: int = 256, chunks: int = 2,
        max_rho_moves: int | None = None, schedule: str = "uniform",
        alpha: float = 1.6, polish: bool = True,
        probe_iters: int | None = None, mesh=None,
    ):
        """Batch-level receding-horizon policy for
        :func:`~..control.batch_loop.simulate_batch`.

        ``backend="pallas"`` routes the solve through the fused VMEM-resident ADMM
        kernel (the throughput path); ``backend="xla"`` uses ``vmap`` over the
        scalar solver (reference path, supports per-scenario ρ adaptation).
        ``chunks`` sets the kernel's convergence-check/ρ-adaptation granularity:
        with per-tile early exit, a deeper ``self.iters`` cap plus more chunks
        recovers slow-converging scenarios while converged tiles still exit at
        the first check they pass.

        ``polish=False`` (round 3, the headline closed-loop config) skips the
        in-kernel CG active-set polish: on WARM-STARTED receding-horizon
        solves it is redundant — measured on v5e at the headline config,
        disabling it is +46% throughput (5.8M → 8.5M solves/s) at equal
        success (0.99960 → 0.99969) with bitwise-level final states (2e-9);
        the only differences are transient active-set tie-breaks in ~0.3% of
        scenarios (two equally-valid bang-bang switch orders). Keep the
        default ``True`` for cold/single solves where the polish buys the
        1e-4 oracle-grade active-set accuracy.

        ``mesh`` (round 4): optional device mesh — the fused-kernel solve is
        ``shard_map``-ped over the data axis so each device runs the kernel
        on its local scenario shard (per-scenario solves are embarrassingly
        parallel; the only cross-device traffic is whatever the CALLER
        reduces). The weak-scaling harness
        (:mod:`..parallel.podscale`) rides this path.
        """
        import jax

        nu, nx, N = self.qp.nu, self.qp.nx, self.qp.N

        solve_sharded = None
        if backend == "pallas" and mesh is not None and mesh.size > 1:
            from jax.sharding import PartitionSpec as P

            from ..ops.pallas.admm_kernel import admm_solve_pallas
            from ..parallel.mesh import DATA_AXIS

            kw = {} if probe_iters is None else {"probe_iters": probe_iters}

            def _solve_local(q, l, u, wx, wy):
                return admm_solve_pallas(
                    self.op, q, l, u, wx, wy, iters=self.iters,
                    chunks=chunks, max_rho_moves=max_rho_moves,
                    schedule=schedule, tile=tile, alpha=alpha, polish=polish,
                    **kw,
                )

            spec = P(DATA_AXIS)
            solve_sharded = jax.shard_map(
                _solve_local, mesh=mesh,
                in_specs=(spec,) * 5, out_specs=spec, check_vma=False,
            )

        def policy_fn(x_batch, t, carry):
            warm_x, warm_y = carry
            q, l, u = jax.vmap(self.qp.qp_vectors)(x_batch)
            if backend == "pallas":
                from ..ops.pallas.admm_kernel import admm_solve_pallas

                kw = {} if probe_iters is None else {"probe_iters": probe_iters}
                if solve_sharded is not None:
                    sol = solve_sharded(q, l, u, warm_x, warm_y)
                else:
                    sol = admm_solve_pallas(
                        self.op, q, l, u, warm_x, warm_y, iters=self.iters,
                        chunks=chunks, max_rho_moves=max_rho_moves,
                        schedule=schedule, tile=tile, alpha=alpha,
                        polish=polish, **kw,
                    )
            elif backend == "xla":
                sol = jax.vmap(
                    lambda qq, ll, uu, wx, wy: admm_solve(
                        self.op, qq, ll, uu, iters=self.iters, warm=(wx, wy)
                    )
                )(q, l, u, warm_x, warm_y)
            else:
                raise ValueError(f"unknown backend {backend!r}")
            u0 = sol.x[:, :nu]
            x_warm, y_warm = self._shift_warm(sol.x, sol.y, axis=1)
            aux = {
                "solver_success": sol.converged,
                "prim_res": sol.prim_res,
                "dual_res": sol.dual_res,
            }
            if self.soft:
                aux["max_slack"] = jnp.max(sol.x[:, N * nu :], axis=1)
            return u0, (x_warm, y_warm), aux

        return policy_fn

    def initial_batch_carry(self, batch: int, dtype=jnp.float32):
        return (
            jnp.zeros((batch, self.qp.n), dtype=dtype),
            jnp.zeros((batch, self.qp.m), dtype=dtype),
        )

    def presolve_batch_carry(
        self, x_batch, iters_mult: int = 4, backend: str = "pallas", tile: int = 256
    ):
        """Warm-start carry from a deeper solve at the initial states.

        Step 0 is the only cold solve in a closed loop — at the fixed per-step
        iteration budget it converges noticeably less often than warm-started steps
        (measured 0.72 vs ~1.0 at 100 iterations on session-2). One presolve at
        ``iters_mult`` times the budget amortizes to nothing over a rollout and
        lifts step 0 to the warm-started success rate.
        """
        import jax

        q, l, u = jax.vmap(self.qp.qp_vectors)(x_batch)
        B = x_batch.shape[0]
        warm_x, warm_y = self.initial_batch_carry(B, dtype=q.dtype)
        if backend == "pallas":
            from ..ops.pallas.admm_kernel import admm_solve_pallas

            # deep cold solve: more, finer chunks (the hot path's 2-chunk
            # schedule would give this 4x-budget solve a very coarse early
            # exit) and no probe chunk (nothing is warm-started here)
            sol = admm_solve_pallas(
                self.op, q, l, u, warm_x, warm_y,
                iters=self.iters * iters_mult, chunks=2 * iters_mult,
                probe_iters=0, tile=tile,
            )
        else:
            sol = jax.vmap(
                lambda qq, ll, uu: admm_solve(
                    self.op, qq, ll, uu, iters=self.iters * iters_mult
                )
            )(q, l, u)
        return (sol.x, sol.y)


def make_box_mpc(
    box: BoxProblem,
    solver: str = "admm",
    iters: int = 200,
    dtype=jnp.float32,
    terminal: str = "Q",
    x_ref=None,
    rho: float = 0.1,
    soft_state: bool = False,
    slack_weight: float = 100.0,
    slack_linear: float = 1.0,
    terminal_set: bool = False,
) -> LinearMPC:
    """Build a :class:`LinearMPC` from general :class:`BoxProblem` data.

    ``terminal``: "Q" uses QN = Q (plain), "dare" uses the infinite-horizon Riccati
    solution as terminal cost (the session-3 "terminal cost/set" upgrade, giving
    stability margins at short horizons).

    ``terminal_set=True`` (implies the DARE terminal cost) additionally
    constrains ``x_N`` to the certified inner box of the largest invariant
    DARE-ellipsoid on which the unconstrained LQR law respects all boxes
    (:func:`.lqr.lqr_terminal_set`) — the classic terminal cost + terminal set
    pair that makes receding-horizon MPC recursively feasible and stabilizing.
    Incompatible with ``x_ref`` tracking (the set certifies the origin).

    ``soft_state=True`` softens the state boxes with per-stage slacks (quadratic
    weight ``slack_weight`` + ℓ1 weight ``slack_linear``): the QP stays feasible at
    every measured state, so the controller degrades gracefully where the hard
    problem has no solution — the principled form of session 3's hand-relaxed
    bounds (``session_3/problem.py:15,17``).
    """
    box = as_box_problem(box)
    sys = box.system(dtype)
    Q = jnp.asarray(box.Q, dtype=dtype)
    R = jnp.asarray(box.R, dtype=dtype)

    u_min = jnp.asarray(box.u_min, dtype=dtype)
    u_max = jnp.asarray(box.u_max, dtype=dtype)
    x_min = jnp.asarray(box.x_min, dtype=dtype)
    x_max = jnp.asarray(box.x_max, dtype=dtype)

    terminal_P = None
    x_term_min = x_term_max = None
    if terminal_set:
        if x_ref is not None:
            raise ValueError("terminal_set certifies the origin; drop x_ref")
        from .lqr import lqr_terminal_set

        terminal_P, _K, _alpha, d = lqr_terminal_set(
            sys.A, sys.B, Q, R, x_min, x_max, u_min, u_max
        )
        QN = terminal_P
        x_term_min, x_term_max = -d, d
    elif terminal == "dare":
        from ..ops.riccati import dare_sda

        terminal_P = dare_sda(sys.A, sys.B, Q, R)
        QN = terminal_P
    else:
        QN = Q

    qp = build_condensed_qp(
        sys.A,
        sys.B,
        Q,
        R,
        QN,
        box.N,
        u_min=u_min,
        u_max=u_max,
        x_min=x_min,
        x_max=x_max,
        x_ref=x_ref,
        x_term_min=x_term_min,
        x_term_max=x_term_max,
    )
    if soft_state:
        qp = soften_condensed_qp(
            qp, slack_weight=slack_weight, slack_linear=slack_linear
        )
    op = qp_setup(qp.P, qp.A_c, rho=rho)
    return LinearMPC(
        qp=qp,
        op=op,
        terminal_P=terminal_P,
        solver=solver,
        iters=iters,
        soft=soft_state,
    )


def make_linear_mpc(problem, **kwargs) -> LinearMPC:
    """Build a :class:`LinearMPC` from session-2/3 :class:`Problem` data or a
    general :class:`BoxProblem`. See :func:`make_box_mpc` for the options."""
    return make_box_mpc(as_box_problem(problem), **kwargs)
