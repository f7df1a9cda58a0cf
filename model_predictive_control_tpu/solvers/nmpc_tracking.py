"""Nonlinear trajectory-tracking MPC (receding reference windows over AL-iLQR).

The reference's nonlinear controller regulates to the origin only (parking —
``session_4/main.py:72-74`` costs ``xᵀQx``); its course context, however, is a
miniature *race-car* class ("rcracers"), whose flagship workload is driving a
dynamic single-track car along a track. This module supplies that capability as
a general engine component: a nonlinear MPC that tracks a time-varying state
reference with a DDP-family solver, the nonlinear twin of
:meth:`..solvers.linear_mpc.LinearMPC.tracking_policy`.

TPU-native design: the closed loop stays one ``lax.scan``; per step the policy
slices an ``(N+1, nx)``-row reference window out of the full trajectory with
``lax.dynamic_slice`` (fixed shape, no host round-trip) and re-builds the
stagewise AL-iLQR problem as closures over that traced window — the window is
just data flowing through jit, not a retrace. Constraints stay fixed-shape
rows: input box always, plus an optional moving *tube* constraint
``‖p − p_ref‖² ≤ r²`` that keeps the car within a corridor around the
reference path (the racing analog of the parking obstacle rows,
``session_4/main.py:95-104``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..control.simulate import Policy
from .ilqr import ILQRProblem, al_ilqr_solve


class TrackingNMPC:
    """Receding-horizon nonlinear tracking MPC over AL-iLQR.

    Parameters
    ----------
    step_fn : discrete dynamics ``F(x, u) -> x⁺`` (an integrator-wrapped ODE).
    Q, R, QN : diagonal weight tuples/arrays (state error, input, terminal error).
    u_lb, u_ub : input box.
    ref_traj : ``(steps + N + 1, nx)`` reference states; at closed-loop step t
        stage k weights ``x_k − ref_traj[t + k]`` (k = 0..N, terminal included).
        Pad at least N+1 rows past the simulation length.
    tube_radius : optional corridor half-width around the reference positions
        (first two state components); adds one constraint row per stage.

    A plain container (not a pytree): closures capture arrays as jit constants,
    matching :class:`..solvers.parking.ILQRMPC`.
    """

    def __init__(
        self,
        step_fn: Callable,
        nx: int,
        nu: int,
        N: int,
        Q,
        R,
        QN,
        u_lb,
        u_ub,
        ref_traj,
        tube_radius: float | None = None,
        outer_iters: int = 6,
        inner_iters: int = 15,
    ):
        self.step_fn = step_fn
        self.nx, self.nu, self.N = nx, nu, N
        self.Q = jnp.asarray(Q)
        self.R = jnp.asarray(R)
        self.QN = jnp.asarray(QN)
        self.u_lb = jnp.asarray(u_lb)
        self.u_ub = jnp.asarray(u_ub)
        self.ref_traj = jnp.asarray(ref_traj)
        if self.ref_traj.shape[-1] != nx:
            raise ValueError(
                f"ref_traj last dim {self.ref_traj.shape[-1]} != nx {nx}"
            )
        self.tube_radius = tube_radius
        self.outer_iters = outer_iters
        self.inner_iters = inner_iters
        self.n_constraints = 2 * nu + (1 if tube_radius is not None else 0)

    def _window_problem(self, window: jnp.ndarray):
        """Stagewise problem tracking a traced ``(N+1, nx)`` reference window."""
        Q, R, QN = self.Q, self.R, self.QN

        def stage_cost(x, u, t):
            e = x - window[t]
            return e @ (Q * e) + u @ (R * u)

        def terminal_cost(x):
            e = x - window[self.N]
            return e @ (QN * e)

        prob = ILQRProblem(
            dynamics=lambda x, u, t: self.step_fn(x, u),
            stage_cost=stage_cost,
            terminal_cost=terminal_cost,
            N=self.N,
            nx=self.nx,
            nu=self.nu,
        )

        def constraints(x, u, t):
            rows = [u - self.u_ub, self.u_lb - u]
            if self.tube_radius is not None:
                d2 = jnp.sum((x[:2] - window[t][:2]) ** 2)
                rows.append((d2 - self.tube_radius**2)[None])
            return jnp.concatenate(rows)

        return prob, constraints

    def solve(self, x0: jnp.ndarray, t, u_init=None):
        """One tracking solve at measured state ``x0`` and closed-loop time t."""
        window = jax.lax.dynamic_slice_in_dim(
            self.ref_traj, t, self.N + 1, axis=0
        )
        prob, constraints = self._window_problem(window)
        return al_ilqr_solve(
            prob,
            constraints,
            self.n_constraints,
            x0,
            u_init=u_init,
            outer_iters=self.outer_iters,
            inner_iters=self.inner_iters,
        )

    def policy(self) -> Policy:
        """Receding-horizon policy; aux carries the ``ControllerLog`` fields plus
        ``ref`` (the stage-0 reference) and ``tracking_error`` (‖p − p_ref‖)."""

        def policy_fn(x, t, carry):
            u_init = carry if not isinstance(carry, tuple) else None
            sol = self.solve(x, t, u_init=u_init)
            u_warm = jnp.concatenate([sol.us[1:], sol.us[-1:]], axis=0)
            ref0 = self.ref_traj[t]
            aux = {
                "solver_success": sol.converged,
                "state_prediction": sol.xs[1:],
                "input_prediction": sol.us,
                "viol": sol.viol,
                "ref": ref0,
                "tracking_error": jnp.linalg.norm(x[:2] - ref0[:2]),
            }
            return sol.us[0], u_warm, aux

        return policy_fn

    def initial_carry(self, dtype=jnp.float32):
        return jnp.zeros((self.N, self.nu), dtype=dtype)
