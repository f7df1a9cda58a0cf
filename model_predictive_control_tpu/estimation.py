"""State estimation: Kalman filtering, moving-horizon estimation, output feedback.

The reference controls the full measured state everywhere (its ``simulate`` loop
feeds ``x`` straight back into the controller; ``session_1/LinearSystem.py:12-14``
defines an output equation that no exercise ever closes a loop around). A
production MPC stack needs the estimation half: this module supplies it,
designed around the engine's existing TPU primitives rather than new machinery —

- **Steady-state Kalman gain** via the *control↔filter DARE duality*: the filter
  DARE is the control DARE of ``(Aᵀ, Cᵀ)``, so the gain reuses
  :func:`..ops.riccati.dare_sda` (structured doubling, branch-free) — no new
  Riccati code.
- **Time-varying Kalman filter** as one ``lax.scan`` carrying ``(x̂, P)``.
- **Moving-horizon estimation (MHE)** transcribed to exactly the engine's hot
  object: a condensed box-QP in the decision vector ``z = [x₀; w₀..w_{M−1}]``
  (arrival cost + process/measurement weights in the Hessian, state bounds as
  box rows). One ``qp_setup`` per window geometry; per-window data is only the
  linear term + bounds, so batched MHE rides the same fused Pallas ADMM kernel
  as batched MPC, and it is differentiable through
  :func:`..solvers.implicit.make_implicit_qp_solver` for noise-covariance
  tuning.
- **Output-feedback MPC**: a policy closure chaining measurement update →
  :class:`..solvers.linear_mpc.LinearMPC` solve, for
  :func:`..control.simulate.simulate` loops driven by noisy outputs ``y``.

Unconstrained MHE with the exact arrival covariance is algebraically the Kalman
filter — ``tests/test_estimation.py`` pins that equivalence to float64 tolerance,
which gates every term of the QP transcription at once.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .models.linear import LinearSystem
from .ops.condensed import prediction_matrices
from .ops.riccati import dare_sda
from .solvers.qp import QPOperator, admm_solve, qp_setup
from .utils.precision import solver_precision
from .utils.pytree import pytree_dataclass, static_field


# ---------------------------------------------------------------------------
# Kalman filtering
# ---------------------------------------------------------------------------


@pytree_dataclass
class KalmanFilter:
    """Steady-state (a priori) Kalman filter for ``x⁺ = Ax + Bu + w``,
    ``y = Cx + v`` with ``w ~ N(0, Qw)``, ``v ~ N(0, Rv)``."""

    system: LinearSystem
    L: jnp.ndarray  # (nx, ny) steady-state innovation gain (a priori form)
    P: jnp.ndarray  # (nx, nx) steady-state a priori error covariance

    def step(self, xhat, u, y_next):
        """Predict with ``u``, then correct with the next measurement."""
        A, B, C = self.system.A, self.system.B, self.system.C
        xpred = A @ xhat + B @ u
        return xpred + self.L @ (y_next - C @ xpred)


@solver_precision
def kalman_gain(
    system: LinearSystem, Qw: jnp.ndarray, Rv: jnp.ndarray, iters: int = 30
) -> KalmanFilter:
    """Steady-state gain from the filter DARE, by duality.

    The filter DARE ``P = APAᵀ − APCᵀ(CPCᵀ+Rv)⁻¹CPAᵀ + Qw`` is the control
    DARE (:func:`..ops.riccati.dare_sda` docstring) evaluated at
    ``(A, B, Q, R) → (Aᵀ, Cᵀ, Qw, Rv)``.
    """
    if system.C is None:
        raise ValueError("kalman_gain needs a system with an output equation")
    A, C = system.A, system.C
    P = dare_sda(A.T, C.T, Qw, Rv, iters=iters)
    S = C @ P @ C.T + Rv
    L = jnp.linalg.solve(S.T, (P @ C.T).T).T  # P Cᵀ S⁻¹ without forming S⁻¹
    return KalmanFilter(system=system, L=L, P=P)


def kalman_filter_trajectory(
    system: LinearSystem,
    Qw: jnp.ndarray,
    Rv: jnp.ndarray,
    xhat0: jnp.ndarray,
    P0: jnp.ndarray,
    us: jnp.ndarray,  # (T, nu) applied inputs
    ys: jnp.ndarray,  # (T, ny) measurements of x_1..x_T
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Time-varying Kalman filter as one scan carrying ``(x̂, P)``.

    ``xhat0``/``P0`` describe the posterior at time 0; step ``k`` predicts
    through ``us[k]`` and corrects with ``ys[k]`` (the measurement of
    ``x_{k+1}``). Returns stacked posteriors ``(T, nx)`` and ``(T, nx, nx)``.
    """
    A, B, C = system.A, system.B, system.C

    @solver_precision
    def step(carry, inp):
        xhat, P = carry
        u, y = inp
        xpred = A @ xhat + B @ u
        Ppred = A @ P @ A.T + Qw
        S = C @ Ppred @ C.T + Rv
        K = jnp.linalg.solve(S.T, (Ppred @ C.T).T).T
        xnew = xpred + K @ (y - C @ xpred)
        KC = K @ C
        I = jnp.eye(A.shape[0], dtype=A.dtype)
        # Joseph form: keeps P symmetric PSD in float32
        Pnew = (I - KC) @ Ppred @ (I - KC).T + K @ Rv @ K.T
        return (xnew, Pnew), (xnew, Pnew)

    _, (xs, Ps) = jax.lax.scan(step, (xhat0, P0), (us, ys))
    return xs, Ps


# ---------------------------------------------------------------------------
# Moving-horizon estimation
# ---------------------------------------------------------------------------


@pytree_dataclass
class MHE:
    """Condensed MHE over a fixed window of ``M`` steps.

    Decision vector ``z = [x₀ (nx); w₀..w_{M−1} (M·nx)]``; window states are
    ``X = Φ x₀ + Γ_u ū + Γ_w w̄`` (the same prediction-matrix build as the MPC
    condensing, with ``B → I`` for the noise channel). The quadratic cost

        ‖x₀ − x̄‖²_{P₀⁻¹} + Σ‖wₖ‖²_{Qw⁻¹} + Σ‖yₖ − C xₖ‖²_{Rv⁻¹}

    fixes the Hessian once per window geometry; per-window data (x̄, ū, ȳ)
    only moves the linear term and the bound shifts — the same split that makes
    batched MPC one fused kernel call.
    """

    system: LinearSystem
    op: QPOperator | None
    H: jnp.ndarray  # (nz, nz) cost Hessian
    Phi: jnp.ndarray  # (M nx, nx)
    Gamma_u: jnp.ndarray  # (M nx, M nu)
    Gamma_w: jnp.ndarray  # (M nx, M nx)
    Cbar: jnp.ndarray  # ((M+1) ny, nz) stacked observation map of z
    obs_shift: jnp.ndarray  # ((M+1) ny, M nu): Cbar_u for the known-input part
    P0_inv: jnp.ndarray
    Qw_inv: jnp.ndarray
    Rv_inv: jnp.ndarray
    x_lb: jnp.ndarray  # (M nx,) stage-state bounds (±inf when unbounded)
    x_ub: jnp.ndarray
    M: int = static_field(default=10)
    iters: int = static_field(default=200)

    @property
    def nx(self) -> int:
        return self.system.A.shape[0]

    def _linear_term(self, xbar, us, ys):
        """q(z) for the window data; ys stacks y₀..y_M (M+1 measurements)."""
        nz = self.H.shape[0]
        nx = self.nx
        yflat = ys.reshape(-1)
        uflat = us.reshape(-1)
        # measurement residual: y − Cbar z − obs_shift ū
        y_eff = yflat - self.obs_shift @ uflat
        q = -(self.Cbar.T @ (jnp.kron(jnp.eye(self.M + 1, dtype=yflat.dtype), self.Rv_inv) @ y_eff))
        q = q.at[:nx].add(-(self.P0_inv @ xbar))
        return q

    def solve(self, xbar, us, ys, warm=None):
        """One window solve → (x̂_M, full_state_window, w_hat, QPSolution).

        ``xbar``: arrival mean for x₀ (prior). ``us``: (M, nu). ``ys``:
        (M+1, ny) measurements of x₀..x_M.
        """
        if self.op is None:
            raise ValueError(
                "this MHE was built without state bounds; use solve_unconstrained"
            )
        q = self._linear_term(xbar, us, ys)
        nx, M = self.nx, self.M
        shift = self.Gamma_u @ us.reshape(-1)
        # box rows: x0 first (unshifted), then the window states x_1..x_M
        l = jnp.concatenate([self.x_lb[:nx], self.x_lb - shift])
        u_b = jnp.concatenate([self.x_ub[:nx], self.x_ub - shift])
        sol = admm_solve(self.op, q, l, u_b, iters=self.iters, warm=warm)
        z = sol.x
        x0 = z[:nx]
        w = z[nx:]
        X = (self.Phi @ x0 + shift + self.Gamma_w @ w).reshape(M, nx)
        return X[-1], jnp.concatenate([x0[None, :], X], axis=0), w.reshape(M, nx), sol

    def solve_batch(
        self, xbars, us, ys, backend: str = "pallas", tile: int = 256,
        warm=None,
    ):
        """Batched window solves on the fused Pallas ADMM kernel (the claim
        the per-window (q, l, u) split exists for): ``xbars (B, nx)``,
        ``us (B, M, nu)``, ``ys (B, M+1, ny)`` → ``(x̂_M (B, nx),
        X (B, M+1, nx), ŵ (B, M, nx), QPSolution)``.

        ``backend="xla"`` vmaps the scalar solver (reference path). ``warm``:
        optional ``(x (B, nz), y (B, rows))`` from a previous batch of
        windows (receding-horizon MHE shares the MPC warm-start economics).
        """
        import jax as _jax

        if self.op is None:
            raise ValueError(
                "this MHE was built without state bounds; vmap "
                "solve_unconstrained instead"
            )
        nx, M = self.nx, self.M
        q = _jax.vmap(self._linear_term)(xbars, us, ys)
        shift = us.reshape(us.shape[0], -1) @ self.Gamma_u.T
        l = jnp.concatenate(
            [jnp.broadcast_to(self.x_lb[:nx], (q.shape[0], nx)),
             self.x_lb - shift], axis=1
        )
        u_b = jnp.concatenate(
            [jnp.broadcast_to(self.x_ub[:nx], (q.shape[0], nx)),
             self.x_ub - shift], axis=1
        )
        if backend == "pallas":
            from .ops.pallas.admm_kernel import admm_solve_pallas

            wx, wy = warm if warm is not None else (None, None)
            sol = admm_solve_pallas(
                self.op, q, l, u_b, wx, wy, iters=self.iters, tile=tile
            )
        elif backend == "xla":
            if warm is None:
                sol = _jax.vmap(
                    lambda qq, ll, uu: admm_solve(
                        self.op, qq, ll, uu, iters=self.iters
                    )
                )(q, l, u_b)
            else:
                sol = _jax.vmap(
                    lambda qq, ll, uu, wx, wy: admm_solve(
                        self.op, qq, ll, uu, iters=self.iters, warm=(wx, wy)
                    )
                )(q, l, u_b, *warm)
        else:
            raise ValueError(f"unknown backend {backend!r}")
        z = sol.x
        x0 = z[:, :nx]
        w = z[:, nx:]
        X = (
            x0 @ self.Phi.T + shift + w @ self.Gamma_w.T
        ).reshape(-1, M, nx)
        X_full = jnp.concatenate([x0[:, None, :], X], axis=1)
        return X[:, -1], X_full, w.reshape(-1, M, nx), sol

    def solve_unconstrained(self, xbar, us, ys):
        """Closed-form window solve (no state bounds): H z = −q."""
        q = self._linear_term(xbar, us, ys)
        z = jnp.linalg.solve(self.H, -q)
        nx, M = self.nx, self.M
        x0 = z[:nx]
        w = z[nx:]
        X = (self.Phi @ x0 + self.Gamma_u @ us.reshape(-1) + self.Gamma_w @ w).reshape(M, nx)
        return X[-1], jnp.concatenate([x0[None, :], X], axis=0), w.reshape(M, nx)


@solver_precision
def make_mhe(
    system: LinearSystem,
    Qw: jnp.ndarray,
    Rv: jnp.ndarray,
    P0: jnp.ndarray,
    M: int,
    x_min: jnp.ndarray | None = None,
    x_max: jnp.ndarray | None = None,
    iters: int = 200,
    rho: float = 0.1,
) -> MHE:
    """Build the condensed MHE QP for a window of ``M`` steps.

    ``x_min``/``x_max`` (shape ``(nx,)``) bound the window states x₁..x_M
    (known physical limits — the one thing a Kalman filter cannot encode).
    """
    if system.C is None:
        raise ValueError("make_mhe needs a system with an output equation")
    A, B, C = system.A, system.B, system.C
    nx, nu = B.shape
    ny = C.shape[0]
    dtype = A.dtype
    I = jnp.eye(nx, dtype=dtype)

    Phi, Gamma_u = prediction_matrices(A, B, M)
    _, Gamma_w = prediction_matrices(A, I, M)

    P0_inv = jnp.linalg.inv(P0.astype(dtype))
    Qw_inv = jnp.linalg.inv(Qw.astype(dtype))
    Rv_inv = jnp.linalg.inv(Rv.astype(dtype))

    # observation map of z = [x0; w]: y0 = C x0; y_k = C (Φ_k x0 + Γ_w,k w) + C Γ_u,k ū
    Cbig = jnp.kron(jnp.eye(M, dtype=dtype), C)  # (M ny, M nx)
    top = jnp.concatenate([C, jnp.zeros((ny, M * nx), dtype)], axis=1)
    rest = jnp.concatenate([Cbig @ Phi, Cbig @ Gamma_w], axis=1)
    Cbar = jnp.concatenate([top, rest], axis=0)  # ((M+1) ny, nz)
    obs_shift = jnp.concatenate(
        [jnp.zeros((ny, M * nu), dtype), Cbig @ Gamma_u], axis=0
    )

    Rbig = jnp.kron(jnp.eye(M + 1, dtype=dtype), Rv_inv)
    H = Cbar.T @ Rbig @ Cbar
    H = H.at[:nx, :nx].add(P0_inv)
    H = H + jax.scipy.linalg.block_diag(
        jnp.zeros((nx, nx), dtype), jnp.kron(jnp.eye(M, dtype=dtype), Qw_inv)
    )
    H = 0.5 * (H + H.T)

    bounded = x_min is not None or x_max is not None
    x_lb = jnp.tile(
        jnp.full((nx,), -jnp.inf, dtype) if x_min is None else jnp.asarray(x_min, dtype), M
    )
    x_ub = jnp.tile(
        jnp.full((nx,), jnp.inf, dtype) if x_max is None else jnp.asarray(x_max, dtype), M
    )

    op = None
    if bounded:
        # box rows: x0 (identity block) AND the window states as functions of z
        A_c = jnp.concatenate(
            [
                jnp.concatenate([I, jnp.zeros((nx, M * nx), dtype)], axis=1),
                jnp.concatenate([Phi, Gamma_w], axis=1),
            ],
            axis=0,
        )  # ((M+1) nx, nz)
        op = qp_setup(H, A_c, rho=rho)

    return MHE(
        system=system, op=op, H=H, Phi=Phi, Gamma_u=Gamma_u, Gamma_w=Gamma_w,
        Cbar=Cbar, obs_shift=obs_shift, P0_inv=P0_inv, Qw_inv=Qw_inv,
        Rv_inv=Rv_inv, x_lb=x_lb, x_ub=x_ub, M=M, iters=iters,
    )


def mhe_trajectory(
    mhe: MHE,
    xbar0: jnp.ndarray,
    us: jnp.ndarray,  # (T, nu), T >= M
    ys: jnp.ndarray,  # (T + 1, ny) measurements of x_0..x_T
    unconstrained: bool = False,
) -> jnp.ndarray:
    """Receding-horizon MHE over a record: one ``lax.scan`` over window starts.

    Window ``k`` estimates ``x_{k+M}`` from ``us[k:k+M]``, ``ys[k:k+M+1]`` and
    the filtering-style arrival mean ``x̄_{k+1} = A x̂₀ + B u_k + ŵ₀`` (the
    smoothed head of the previous window, propagated one step). The arrival
    covariance is held at the build-time ``P₀`` — the standard fixed-arrival
    approximation (use the steady-state :func:`kalman_gain` ``P`` for ``P₀``
    in long records). For EXACT arrival propagation use
    :class:`..estimation_nl.NonlinearMHE` with linear closures and
    ``propagate_arrival=True`` — its Rao–Rawlings filtering recursion equals
    the time-varying KF to 1e-9 in the linear limit
    (``tests/test_estimation_nl.py``).

    Returns the stacked window-end estimates, shape ``(T − M + 1, nx)``.
    """
    M = mhe.M
    T = us.shape[0]
    A, B = mhe.system.A, mhe.system.B

    def win(k, xbar):
        u_w = jax.lax.dynamic_slice_in_dim(us, k, M, axis=0)
        y_w = jax.lax.dynamic_slice_in_dim(ys, k, M + 1, axis=0)
        if unconstrained:
            x_M, X, w = mhe.solve_unconstrained(xbar, u_w, y_w)
        else:
            x_M, X, w, _ = mhe.solve(xbar, u_w, y_w)
        xbar_next = A @ X[0] + B @ u_w[0] + w[0]
        return x_M, xbar_next

    def step(xbar, k):
        x_M, xbar_next = win(k, xbar)
        return xbar_next, x_M

    _, x_ends = jax.lax.scan(step, xbar0, jnp.arange(T - M + 1))
    return x_ends


# ---------------------------------------------------------------------------
# Output-feedback MPC
# ---------------------------------------------------------------------------


def output_feedback_policy(
    ctrl, kf: KalmanFilter
) -> Callable:
    """Chain Kalman correction → MPC solve into one policy for closed loops
    driven by measurements.

    Returns ``policy(y, t, carry) -> (u, carry, aux)`` (the
    :func:`..control.simulate.simulate` policy protocol, with the measurement
    in the state slot) and ``carry = (x̂, mpc_carry)``: correct the *predicted*
    estimate with the new measurement ``y``, solve the MPC at the corrected
    estimate, then predict through the applied input. ``aux`` adds
    ``state_estimate`` to the MPC's per-step log pytree.
    """
    mpc_policy = ctrl.policy()
    A, B, C = kf.system.A, kf.system.B, kf.system.C

    def policy(y, t, carry):
        xhat_pred, mpc_carry = carry
        xhat = xhat_pred + kf.L @ (y - C @ xhat_pred)
        u, mpc_carry, aux = mpc_policy(xhat, t, mpc_carry)
        aux = dict(aux, state_estimate=xhat)
        return u, (A @ xhat + B @ u, mpc_carry), aux

    return policy


def initial_output_feedback_carry(ctrl, xhat0: jnp.ndarray, dtype=jnp.float32):
    return (jnp.asarray(xhat0, dtype), ctrl.initial_carry(dtype))


# ---------------------------------------------------------------------------
# Extended Kalman filter (nonlinear tier)
# ---------------------------------------------------------------------------


class ExtendedKalmanFilter:
    """EKF for ``x⁺ = F(x, u) + w``, ``y = h(x) + v`` (nonlinear tier).

    The nonlinear twin of :class:`KalmanFilter` for the engine's bicycle
    models: Jacobians come from ``jax.jacfwd`` through the discrete step —
    where the reference would need CasADi for exactly this linearization
    (``session_4/main.py:41-46``), here it is one transform on the same
    function the controller already predicts with.

    A plain container (closures capture as jit constants); the covariance
    update uses Joseph form to stay PSD in float32.
    """

    def __init__(self, step_fn: Callable, obs_fn: Callable,
                 Qw: jnp.ndarray, Rv: jnp.ndarray):
        self.step_fn = step_fn
        self.obs_fn = obs_fn
        self.Qw = jnp.asarray(Qw)
        self.Rv = jnp.asarray(Rv)

    @solver_precision
    def step(self, xhat, P, u, y_next):
        """Predict through ``u``, correct with the next measurement."""
        A = jax.jacfwd(self.step_fn, argnums=0)(xhat, u)
        xpred = self.step_fn(xhat, u)
        Ppred = A @ P @ A.T + self.Qw
        C = jax.jacfwd(self.obs_fn)(xpred)
        S = C @ Ppred @ C.T + self.Rv
        K = jnp.linalg.solve(S.T, (Ppred @ C.T).T).T
        xnew = xpred + K @ (y_next - self.obs_fn(xpred))
        KC = K @ C
        I = jnp.eye(xhat.shape[0], dtype=P.dtype)
        Pnew = (I - KC) @ Ppred @ (I - KC).T + K @ self.Rv @ K.T
        return xnew, Pnew


def ekf_trajectory(
    ekf: ExtendedKalmanFilter,
    xhat0: jnp.ndarray,
    P0: jnp.ndarray,
    us: jnp.ndarray,  # (T, nu) applied inputs
    ys: jnp.ndarray,  # (T, ny) measurements of x_1..x_T
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """EKF over a trajectory as one scan carrying ``(x̂, P)`` — same contract
    as :func:`kalman_filter_trajectory`."""

    def step(carry, inp):
        u, y = inp
        xnew, Pnew = ekf.step(*carry, u, y)
        return (xnew, Pnew), (xnew, Pnew)

    _, (xs, Ps) = jax.lax.scan(step, (jnp.asarray(xhat0), jnp.asarray(P0)),
                               (us, ys))
    return xs, Ps


def ekf_output_feedback_policy(ctrl, ekf: ExtendedKalmanFilter) -> Callable:
    """Measurement-driven policy for nonlinear controllers: EKF correct →
    NMPC solve → EKF predict. ``ctrl`` is any controller with the
    ``policy()``/``initial_carry()`` contract (:class:`..solvers.parking.
    ILQRMPC`, :class:`..solvers.nmpc_tracking.TrackingNMPC`, ...).

    Carry = ``(x̂_pred, P, mpc_carry)``; build the initial one with
    :func:`initial_ekf_carry`. ``aux`` adds ``state_estimate``/``cov_trace``.
    """
    mpc_policy = ctrl.policy()

    def policy(y, t, carry):
        xhat_pred, P, mpc_carry = carry
        # correct with the current measurement (same (predict, correct)
        # interleaving as output_feedback_policy)
        C = jax.jacfwd(ekf.obs_fn)(xhat_pred)
        S = C @ P @ C.T + ekf.Rv
        K = jnp.linalg.solve(S.T, (P @ C.T).T).T
        xhat = xhat_pred + K @ (y - ekf.obs_fn(xhat_pred))
        KC = K @ C
        I = jnp.eye(xhat.shape[0], dtype=P.dtype)
        Pcorr = (I - KC) @ P @ (I - KC).T + K @ ekf.Rv @ K.T

        u, mpc_carry, aux = mpc_policy(xhat, t, mpc_carry)

        A = jax.jacfwd(ekf.step_fn, argnums=0)(xhat, u)
        xnext = ekf.step_fn(xhat, u)
        Pnext = A @ Pcorr @ A.T + ekf.Qw
        aux = dict(aux, state_estimate=xhat, cov_trace=jnp.trace(Pcorr))
        return u, (xnext, Pnext, mpc_carry), aux

    return policy


def initial_ekf_carry(ctrl, xhat0, P0, dtype=jnp.float32):
    return (
        jnp.asarray(xhat0, dtype),
        jnp.asarray(P0, dtype),
        ctrl.initial_carry(dtype),
    )
