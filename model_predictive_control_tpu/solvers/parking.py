"""Session-4 parking OCP: nonlinear MPC for the kinematic bicycle with optional
covering-circle obstacle avoidance.

Reference semantics (``session_4/main.py:41-113`` obstacle variant;
``session4_sol.py:132-217`` plain variant):

- prediction model: forward-Euler bicycle, ``f = fwd_euler(model, ts)`` (main.py:76)
- cost: ``Σ_{i=0}^{N-1} (x_iᵀQx_i + u_iᵀRu_i) + x_NᵀQ_N x_N`` with x_0 the
  parameter — main variant ``Q = diag(1, 6, 0.2, 0.05)``, ``Q_N = 100 Q``,
  ``R = diag(1, 0.01)`` (main.py:72-74); sol variant ``Q = diag(1, 3, 0.1, 0.01)``,
  ``QT = 10 Q`` (session4_sol.py:166-169)
- constraints per stage 1..N: state box from ``VehicleParameters`` (main.py:58-61,
  91-93) and, in the obstacle variant, 9 pairwise covering-circle clearances with
  lower bound ``(r + r_p)²`` (main.py:49-65, 95-104)
- input box: drive ∈ [min_drive, max_drive], steer ∈ ±max_steer (main.py:68-69)

Decision variables are the stacked controls only (single shooting, main.py:108).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.bicycle import NU, NX, kinematic_bicycle_ode
from ..models.parameters import VehicleParameters
from ..ops.integrators import euler, rk4
from ..utils.geometry import (
    cover_circle_offsets,
    pairwise_sq_distances,
    transform_circles,
)
from ..control.simulate import Policy
from .sqp import ShootingOCP, SQPSolution, sqp_solve

# main.py:72-74
Q_MAIN = (1.0, 6.0, 0.2, 0.05)
R_MAIN = (1.0, 0.01)
QN_SCALE_MAIN = 100.0
# session4_sol.py:166-169
Q_SOL = (1.0, 3.0, 0.1, 0.01)
QN_SCALE_SOL = 10.0
# template.py:136 (the RK4-prediction template variant)
QN_SCALE_TEMPLATE = 5.0


def _prediction_step(params, ts, integrator: str):
    ode = lambda x, u: kinematic_bicycle_ode(params, x, u)
    if integrator == "euler":
        return euler(ode, ts)
    if integrator == "rk4":
        return rk4(ode, ts)
    raise ValueError(f"unknown integrator {integrator!r} (euler|rk4)")


def make_parking_ocp(
    params: VehicleParameters,
    N: int,
    ts: float,
    x_obs: jnp.ndarray | None = None,
    Q: tuple = Q_MAIN,
    R: tuple = R_MAIN,
    qn_scale: float = QN_SCALE_MAIN,
    n_circles: int = 3,
    dtype=jnp.float32,
    integrator: str = "euler",
) -> ShootingOCP:
    """Build the single-shooting parking OCP as residual/constraint closures.

    ``integrator``: prediction model discretization — ``"euler"`` (the
    main/sol variants, ``main.py:76``, ``session4_sol.py:191-192``) or
    ``"rk4"`` (the template variant, ``template.py:141``; its state-order
    bounds bug, ``template.py:132-133``, is deliberately not reproduced).
    """
    Qd = jnp.asarray(Q, dtype=dtype)
    Rd = jnp.asarray(R, dtype=dtype)
    QNd = qn_scale * Qd
    sqQ = jnp.sqrt(Qd)
    sqQN = jnp.sqrt(QNd)
    sqR = jnp.sqrt(Rd)

    step = _prediction_step(params, ts, integrator)

    def rollout_states(u_flat, x0):
        u_seq = u_flat.reshape(N, NU)

        def f(x, u):
            x_next = step(x, u)
            return x_next, x_next

        _, xs = jax.lax.scan(f, x0, u_seq)
        return xs  # (N, NX): x_1 .. x_N

    def residual(u_flat, x0):
        """cost = ‖r‖²: stage √Q x_k (k=0..N-1), terminal √Q_N x_N, √R u_k."""
        u_seq = u_flat.reshape(N, NU)
        xs = rollout_states(u_flat, x0)
        stage_x = jnp.concatenate([x0[None], xs[:-1]], axis=0)  # x_0..x_{N-1}
        r_x = (stage_x * sqQ[None, :]).reshape(-1)
        r_T = xs[-1] * sqQN
        r_u = (u_seq * sqR[None, :]).reshape(-1)
        return jnp.concatenate([r_x, r_T, r_u])

    # state box (main.py:58-61)
    lb_states = jnp.asarray(
        [params.min_pos_x, params.min_pos_y, params.min_heading, params.min_vel],
        dtype=dtype,
    )
    ub_states = jnp.asarray(
        [params.max_pos_x, params.max_pos_y, params.max_heading, params.max_vel],
        dtype=dtype,
    )

    if x_obs is not None:
        offsets, r_circ = cover_circle_offsets(
            params.length, params.width, n_circles
        )
        offsets = offsets.astype(dtype)
        r2 = jnp.asarray((r_circ + r_circ) ** 2, dtype=dtype)  # (r + r_p)² main.py:52
        obs_circles = transform_circles(jnp.asarray(x_obs, dtype=dtype), offsets)

        def stage_con(x):
            veh = transform_circles(x, offsets)
            return pairwise_sq_distances(veh, obs_circles)  # (n_c²,)

        n_colli = n_circles * n_circles
    else:
        stage_con = None
        n_colli = 0

    def constraints(u_flat, x0):
        xs = rollout_states(u_flat, x0)
        parts = [xs.reshape(-1)]
        if stage_con is not None:
            parts.append(jax.vmap(stage_con)(xs).reshape(-1))
        return jnp.concatenate(parts)

    l_c = jnp.tile(lb_states, N)
    u_c = jnp.tile(ub_states, N)
    if n_colli:
        l_c = jnp.concatenate([l_c, jnp.full(N * n_colli, r2, dtype=dtype)])
        u_c = jnp.concatenate([u_c, jnp.full(N * n_colli, jnp.inf, dtype=dtype)])

    lb_inputs = jnp.asarray([params.min_drive, -params.max_steer], dtype=dtype)
    ub_inputs = jnp.asarray([params.max_drive, params.max_steer], dtype=dtype)

    return ShootingOCP(
        residual=residual,
        constraints=constraints,
        l_c=l_c,
        u_c=u_c,
        l_u=jnp.tile(lb_inputs, N),
        u_u=jnp.tile(ub_inputs, N),
        n_controls=N * NU,
        horizon=N,
        nu=NU,
    )


def make_parking_ilqr(
    params: VehicleParameters,
    N: int,
    ts: float,
    x_obs: jnp.ndarray | None = None,
    Q: tuple = Q_MAIN,
    R: tuple = R_MAIN,
    qn_scale: float = QN_SCALE_MAIN,
    n_circles: int = 3,
    dtype=jnp.float32,
    integrator: str = "euler",
):
    """Session-4 parking OCP in iLQR form: ``(ILQRProblem, constraints, nc)``.

    Same model/cost/constraint semantics as :func:`make_parking_ocp` (see its
    docstring for the reference citations, including the ``integrator``
    option), expressed stagewise for the DDP-family solver
    (:mod:`..solvers.ilqr`): constraints are ``c(x, u, t) ≤ 0`` rows —
    state box (8), input box (4), and ``(r+r_p)² − ‖c_v − c_o‖²`` clearances
    (``n_circles²``) when an obstacle is present.
    """
    from .ilqr import ILQRProblem

    Qd = jnp.asarray(Q, dtype=dtype)
    Rd = jnp.asarray(R, dtype=dtype)
    QNd = qn_scale * Qd
    step = _prediction_step(params, ts, integrator)

    lb_x = jnp.asarray(
        [params.min_pos_x, params.min_pos_y, params.min_heading, params.min_vel],
        dtype=dtype,
    )
    ub_x = jnp.asarray(
        [params.max_pos_x, params.max_pos_y, params.max_heading, params.max_vel],
        dtype=dtype,
    )
    lb_u = jnp.asarray([params.min_drive, -params.max_steer], dtype=dtype)
    ub_u = jnp.asarray([params.max_drive, params.max_steer], dtype=dtype)

    if x_obs is not None:
        offsets, r_circ = cover_circle_offsets(params.length, params.width, n_circles)
        offsets = offsets.astype(dtype)
        r2 = jnp.asarray((r_circ + r_circ) ** 2, dtype=dtype)
        obs_circles = transform_circles(jnp.asarray(x_obs, dtype=dtype), offsets)
        n_colli = n_circles * n_circles
    else:
        n_colli = 0

    def constraints(x, u, t):
        rows = [x - ub_x, lb_x - x, u - ub_u, lb_u - u]
        if n_colli:
            veh = transform_circles(x, offsets)
            rows.append(r2 - pairwise_sq_distances(veh, obs_circles))
        return jnp.concatenate(rows)

    prob = ILQRProblem(
        dynamics=lambda x, u, t: step(x, u),
        stage_cost=lambda x, u, t: x @ (Qd * x) + u @ (Rd * u),
        terminal_cost=lambda x: x @ (QNd * x),
        N=N,
        nx=NX,
        nu=NU,
    )
    return prob, constraints, 2 * NX + 2 * NU + n_colli


class NonlinearMPC:
    """Receding-horizon nonlinear MPC over the parking OCP (the reference's
    ``MPCController.__call__`` pattern, main.py:121-129, with warm-started SQP
    instead of a fresh IPOPT solve).

    A plain container (not a pytree): the OCP closures capture their arrays as jit
    constants. Batching over vehicle-parameter scenarios rebuilds the OCP inside the
    vmapped function (see ``parallel.batch``).
    """

    def __init__(self, ocp: ShootingOCP, sqp_iters: int = 20, qp_iters: int = 30):
        self.ocp = ocp
        self.sqp_iters = sqp_iters
        self.qp_iters = qp_iters

    def solve(self, x0: jnp.ndarray, u_init=None) -> SQPSolution:
        return sqp_solve(
            self.ocp, x0, u_init=u_init,
            iters=self.sqp_iters, qp_iters=self.qp_iters,
        )

    def policy(self) -> Policy:
        N, nu = self.ocp.horizon, self.ocp.nu

        def policy_fn(x, t, carry):
            u_init = carry if not isinstance(carry, tuple) else None
            sol = self.solve(x, u_init=u_init)
            u_traj = sol.u.reshape(N, nu)
            # shift warm start one stage
            u_warm = jnp.concatenate([sol.u[nu:], sol.u[-nu:]])
            aux = {
                "solver_success": sol.converged,
                "input_prediction": u_traj,
                "kkt_res": sol.kkt_res,
                "viol": sol.viol,
            }
            return u_traj[0], u_warm, aux

        return policy_fn

    def initial_carry(self, dtype=jnp.float32):
        return jnp.zeros(self.ocp.n_controls, dtype=dtype)


class ILQRMPC:
    """Receding-horizon nonlinear MPC over the AL-iLQR solver family.

    Same ``MPCController.__call__`` contract as :class:`NonlinearMPC`
    (``session_4/main.py:121-129``) but the per-step solve is an augmented-
    Lagrangian iLQR (:func:`..solvers.ilqr.al_ilqr_solve`) — O(N) Riccati sweeps
    per inner iteration instead of a condensed QP, the better-scaling choice at
    long horizons. Warm start: the previous control trajectory shifted one stage.
    """

    def __init__(
        self,
        prob,
        constraints,
        n_constraints: int,
        outer_iters: int = 6,
        inner_iters: int = 15,
    ):
        self.prob = prob
        self.constraints = constraints
        self.n_constraints = n_constraints
        self.outer_iters = outer_iters
        self.inner_iters = inner_iters

    def solve(self, x0: jnp.ndarray, u_init=None):
        from .ilqr import al_ilqr_solve

        return al_ilqr_solve(
            self.prob,
            self.constraints,
            self.n_constraints,
            x0,
            u_init=u_init,
            outer_iters=self.outer_iters,
            inner_iters=self.inner_iters,
        )

    def policy(self) -> Policy:
        def policy_fn(x, t, carry):
            u_init = carry if not isinstance(carry, tuple) else None
            sol = self.solve(x, u_init=u_init)
            u_warm = jnp.concatenate([sol.us[1:], sol.us[-1:]], axis=0)
            aux = {
                "solver_success": sol.converged,
                "input_prediction": sol.us,
                "viol": sol.viol,
            }
            return sol.us[0], u_warm, aux

        return policy_fn

    def initial_carry(self, dtype=jnp.float32):
        return jnp.zeros((self.prob.N, self.prob.nu), dtype=dtype)
