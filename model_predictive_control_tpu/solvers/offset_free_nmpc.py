"""Offset-free NONLINEAR MPC: disturbance-augmented EKF + nonlinear target shift.

The reference's one robustness workload is nonlinear — exercise 5 runs the same
parking controller against a plant with ``friction × 0.8`` and exact
integration (``session_4/session4_sol.py:443-488``) and *shows* the resulting
trajectory error without fixing it. :mod:`.offset_free` removes such offsets on
the linear tier; this module is its nonlinear twin, completing the loop the
reference opens:

- **Disturbance-augmented EKF**: augment the model with a constant fictitious
  disturbance, ``x⁺ = F(x, u) + B_d d``, ``d⁺ = d``, and estimate ``(x̂, d̂)``
  with an EKF over the stacked state — Jacobians from ``jax.jacfwd`` through
  the same discrete step the controller predicts with (the linearization
  CasADi provides the reference, ``main.py:41-46``, is one transform here).
- **Nonlinear target calculation**: the steady pair ``(x_s, u_s)`` holding the
  tracked outputs at the reference despite ``d̂`` solves

      F(x_s, u_s) + B_d d̂ − x_s = 0,      H x_s − r = 0,

  a square root-finding problem for ``nr = nu`` tracked outputs, solved with a
  fixed-iteration damped Newton under jit (``jacfwd`` of the stacked residual —
  fixed shape, no host round trip, vmappable over scenario batches).
- **Shifted AL-iLQR**: the per-step OCP tracks ``(x_s, u_s)`` under the
  disturbance-corrected model ``F̃(x, u) = F(x, u) + B_d d̂`` — the problem
  closures are rebuilt inside the traced policy around the per-step ``d̂``
  (pure tracing, the :class:`.nmpc_tracking.TrackingNMPC` window pattern), so
  the whole measurement → estimate → target → solve → predict chain stays one
  jitted closed-loop scan.

Integral action falls out exactly as in the linear case: any persistent model
error (wrong friction, integration error) appears in ``d̂`` and shifts the
target until the measured tracked outputs sit on ``r``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..control.simulate import Policy
from ..utils.precision import solver_precision
from ..utils.smallsolve import solve_spd
from .ilqr import ILQRProblem, al_ilqr_solve


class _AugmentedEKF:
    """Shared disturbance-augmented-EKF machinery over ``z = [x; d]``.

    Consumers define ``step_fn``, ``obs_fn``, ``Bd``, ``nx``, ``nd``,
    ``Qw``, ``Rv_mat``, ``dtype``; class attrs ``_P0X``/``_P0D`` set the
    default initial covariance blocks of :meth:`initial_carry`.
    """

    _P0X = 1e-3
    _P0D = 1e-2

    def _step_aug(self, z, u):
        x, d = z[: self.nx], z[self.nx :]
        return jnp.concatenate([self.step_fn(x, u) + self.Bd @ d, d])

    def _obs_aug(self, z):
        return self.obs_fn(z[: self.nx])

    def _ekf_correct(self, z_pred, P, y):
        """Correct the augmented estimate with the current measurement
        (Joseph-form covariance update for f32 PSD safety)."""
        I = jnp.eye(self.nx + self.nd, dtype=P.dtype)
        C = jax.jacfwd(self._obs_aug)(z_pred)
        S = C @ P @ C.T + self.Rv_mat
        # unrolled SPD solve: batched tiny LAPACK LUs serialize on XLA:TPU
        # (utils/smallsolve.py) — this solve sits on the wind_sweep hot path
        K = solve_spd(S, (P @ C.T).T).T
        z = z_pred + K @ (y - self._obs_aug(z_pred))
        KC = K @ C
        Pc = (I - KC) @ P @ (I - KC).T + K @ self.Rv_mat @ K.T
        return z, Pc

    def _ekf_predict(self, z, Pc, u):
        """Predict the augmented estimate through the applied input."""
        A = jax.jacfwd(self._step_aug)(z, u)
        return self._step_aug(z, u), A @ Pc @ A.T + self.Qw

    def initial_carry(self, xhat0, P0_x: float | None = None,
                      P0_d: float | None = None):
        z0 = jnp.concatenate(
            [jnp.asarray(xhat0, self.dtype), jnp.zeros(self.nd, self.dtype)]
        )
        P0 = jax.scipy.linalg.block_diag(
            (self._P0X if P0_x is None else P0_x)
            * jnp.eye(self.nx, dtype=self.dtype),
            (self._P0D if P0_d is None else P0_d)
            * jnp.eye(self.nd, dtype=self.dtype),
        )
        return (z0, P0, jnp.zeros((self.N, self.nu), self.dtype))


class OffsetFreeNMPC(_AugmentedEKF):
    """Measurement-driven offset-free nonlinear MPC (EKF + target shift over
    AL-iLQR).

    Parameters
    ----------
    step_fn : nominal discrete prediction model ``F(x, u) -> x⁺``.
    nx, nu, N : dimensions and horizon.
    Q, R, QN : diagonal weight vectors for the shifted tracking cost.
    u_lb, u_ub : input box (enforced by the AL constraint rows).
    r : (nr,) reference for the tracked outputs ``H x``; needs ``nr == nu``
        (square nonlinear target system).
    H : (nr, nx) tracked-output selector (default: first ``nu`` states).
    Bd : (nx, nd) disturbance-to-state map (default: identity — additive
        state disturbance, the fully observable choice under full-state
        measurement).
    obs_fn : measurement map ``h(x) -> y`` (default: identity). The EKF
        requires the augmented pair ``(F_aug, h)`` observable; with partial
        measurement choose ``Bd`` with ``nd <= ny`` accordingly.
    Qw_x, Qw_d, Rv : EKF covariances (scalars scale identity blocks).
        ``Qw_d`` is the integral-action bandwidth.
    x_lb, x_ub : optional state box rows for the AL solver.
    newton_iters : fixed damped-Newton iterations for the target solve.

    A plain container (not a pytree): closures capture arrays as jit
    constants, matching :class:`.parking.ILQRMPC`.
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
        r,
        H=None,
        Bd=None,
        obs_fn: Callable | None = None,
        Qw_x: float = 1e-4,
        Qw_d: float = 1e-2,
        Rv: float = 1e-5,
        x_lb=None,
        x_ub=None,
        newton_iters: int = 12,
        outer_iters: int = 6,
        inner_iters: int = 15,
        dtype=jnp.float32,
    ):
        self.step_fn = step_fn
        self.nx, self.nu, self.N = nx, nu, N
        self.Q = jnp.asarray(Q, dtype)
        self.R = jnp.asarray(R, dtype)
        self.QN = jnp.asarray(QN, dtype)
        self.u_lb = jnp.asarray(u_lb, dtype)
        self.u_ub = jnp.asarray(u_ub, dtype)
        self.r = jnp.atleast_1d(jnp.asarray(r, dtype))
        nr = self.r.shape[0]
        if nr != nu:
            raise ValueError(
                f"need nr == nu for a square nonlinear target system "
                f"({nr} tracked outputs vs {nu} inputs)"
            )
        self.H = (
            jnp.eye(nx, dtype=dtype)[:nr] if H is None
            else jnp.asarray(H, dtype)
        )
        self.Bd = (
            jnp.eye(nx, dtype=dtype) if Bd is None else jnp.asarray(Bd, dtype)
        )
        self.nd = self.Bd.shape[1]
        self.obs_fn = obs_fn if obs_fn is not None else (lambda x: x)
        ny = self.obs_fn(jnp.zeros(nx, dtype)).shape[0]
        self.Qw = jax.scipy.linalg.block_diag(
            Qw_x * jnp.eye(nx, dtype=dtype), Qw_d * jnp.eye(self.nd, dtype=dtype)
        )
        self.Rv_mat = Rv * jnp.eye(ny, dtype=dtype)
        self.x_lb = None if x_lb is None else jnp.asarray(x_lb, dtype)
        self.x_ub = None if x_ub is None else jnp.asarray(x_ub, dtype)
        self.newton_iters = newton_iters
        self.outer_iters = outer_iters
        self.inner_iters = inner_iters
        self.dtype = dtype
        self.n_constraints = 2 * nu + (
            0 if self.x_lb is None else 2 * nx
        )

    # -- nonlinear target ---------------------------------------------------

    @solver_precision
    def solve_target(self, d_hat, x_guess=None, u_guess=None):
        """Fixed-iteration damped Newton on the square steady-state system.

        Returns ``(x_s, u_s, residual_norm)``; fixed shape, jit/vmap-safe.
        """
        nx, nu = self.nx, self.nu
        w0 = jnp.concatenate(
            [
                jnp.zeros(nx, self.dtype) if x_guess is None else x_guess,
                jnp.zeros(nu, self.dtype) if u_guess is None else u_guess,
            ]
        )

        def g(w):
            x_s, u_s = w[:nx], w[nx:]
            return jnp.concatenate(
                [
                    self.step_fn(x_s, u_s) + self.Bd @ d_hat - x_s,
                    self.H @ x_s - self.r,
                ]
            )

        def newton(w, _):
            J = jax.jacfwd(g)(w)
            # Levenberg damping keeps the fixed-iteration loop safe at
            # singular intermediate Jacobians (branch-free, like the solvers)
            JtJ = J.T @ J + 1e-8 * jnp.eye(w.shape[0], dtype=w.dtype)
            dw = solve_spd(JtJ, J.T @ g(w))
            return w - dw, None

        w, _ = jax.lax.scan(newton, w0, None, length=self.newton_iters)
        res = jnp.linalg.norm(g(w))
        return w[:nx], w[nx:], res

    # -- shifted OCP --------------------------------------------------------

    def _shifted_problem(self, d_hat, x_s, u_s):
        Q, R, QN = self.Q, self.R, self.QN

        def dyn(x, u, t):
            return self.step_fn(x, u) + self.Bd @ d_hat

        def stage_cost(x, u, t):
            e, du = x - x_s, u - u_s
            return e @ (Q * e) + du @ (R * du)

        def terminal_cost(x):
            e = x - x_s
            return e @ (QN * e)

        prob = ILQRProblem(
            dynamics=dyn,
            stage_cost=stage_cost,
            terminal_cost=terminal_cost,
            N=self.N,
            nx=self.nx,
            nu=self.nu,
        )

        def constraints(x, u, t):
            rows = [u - self.u_ub, self.u_lb - u]
            if self.x_lb is not None:
                rows.extend([x - self.x_ub, self.x_lb - x])
            return jnp.concatenate(rows)

        return prob, constraints

    def solve(self, x0, d_hat, u_init=None):
        """One shifted solve at state ``x0`` under disturbance estimate
        ``d̂`` — exposed for direct use; the policy wraps it with the EKF."""
        x_s, u_s, res = self.solve_target(d_hat, x_guess=x0)
        prob, cons = self._shifted_problem(d_hat, x_s, u_s)
        sol = al_ilqr_solve(
            prob, cons, self.n_constraints, x0, u_init=u_init,
            outer_iters=self.outer_iters, inner_iters=self.inner_iters,
            viol_tol=1e-4,
        )
        return sol, (x_s, u_s, res)

    # -- measurement-driven policy ------------------------------------------

    def policy(self) -> Policy:
        """Policy over MEASUREMENTS ``y``: EKF correct → target → shifted
        AL-iLQR → EKF predict. Carry = ``(ẑ_pred (nx+nd,), P (nx+nd,)²,
        u_warm (N, nu))`` from :meth:`initial_carry`. Aux extends the
        ``ControllerLog`` fields with the estimate/target telemetry.
        """
        nx = self.nx

        def policy_fn(y, t, carry):
            z_pred, P, u_warm = carry
            z, Pc = self._ekf_correct(z_pred, P, y)
            x_hat, d_hat = z[:nx], z[nx:]
            sol, (x_s, u_s, target_res) = self.solve(
                x_hat, d_hat, u_init=u_warm
            )
            u = sol.us[0]
            u_next = jnp.concatenate([sol.us[1:], sol.us[-1:]], axis=0)
            z_next, P_next = self._ekf_predict(z, Pc, u)
            aux = {
                "solver_success": sol.converged,
                "state_prediction": sol.xs[1:],
                "input_prediction": sol.us,
                "viol": sol.viol,
                "state_estimate": x_hat,
                "disturbance_estimate": d_hat,
                "target_state": x_s,
                "target_input": u_s,
                "target_residual": target_res,
            }
            return u, (z_next, P_next, u_next), aux

        return policy_fn


class DisturbanceCompensatedTracking(_AugmentedEKF):
    """Offset-free TRACKING: disturbance-augmented EKF + corrected-model
    reference tracking over AL-iLQR — the racing twin of
    :class:`OffsetFreeNMPC` (which regulates to a computed target).

    A persistent unmodeled disturbance (crosswind, slope, payload drag) gives
    the nominal :class:`..nmpc_tracking.TrackingNMPC` a steady tracking
    offset: the controller plans with ``F`` while the plant follows
    ``F + B_d d``. Here the EKF estimates ``d̂`` online and the per-step
    window problem predicts with ``F̃(x, u) = F(x, u) + B_d d̂`` — the model
    error vanishes from the loop and the offset with it. No target
    calculation is needed (the reference IS the target); the stage cost
    tracks the window exactly as the nominal tracker does.

    Same policy/carry contract as :class:`OffsetFreeNMPC` (measurements in,
    ``(ẑ, P, u_warm)`` carry); constraints are the input box (+ optional
    state box).
    """

    _P0X = 1e-4
    _P0D = 1e-3

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
        ref_traj,  # (steps + N + 1, nx)
        Bd=None,
        obs_fn: Callable | None = None,
        Qw_x: float = 1e-5,
        Qw_d: float = 1e-3,
        Rv: float = 1e-5,
        outer_iters: int = 6,
        inner_iters: int = 15,
        ts: float | None = None,
        reproject: bool = True,
        dtype=jnp.float32,
    ):
        self.step_fn = step_fn
        self.nx, self.nu, self.N = nx, nu, N
        self.Q = jnp.asarray(Q, dtype)
        self.R = jnp.asarray(R, dtype)
        self.QN = jnp.asarray(QN, dtype)
        self.u_lb = jnp.asarray(u_lb, dtype)
        self.u_ub = jnp.asarray(u_ub, dtype)
        self.ref_traj = jnp.asarray(ref_traj, dtype)
        self.Bd = (
            jnp.eye(nx, dtype=dtype) if Bd is None else jnp.asarray(Bd, dtype)
        )
        self.nd = self.Bd.shape[1]
        self.obs_fn = obs_fn if obs_fn is not None else (lambda x: x)
        ny = self.obs_fn(jnp.zeros(nx, dtype)).shape[0]
        self.Qw = jax.scipy.linalg.block_diag(
            Qw_x * jnp.eye(nx, dtype=dtype),
            Qw_d * jnp.eye(self.nd, dtype=dtype),
        )
        self.Rv_mat = Rv * jnp.eye(ny, dtype=dtype)
        self.outer_iters = outer_iters
        self.inner_iters = inner_iters
        self.ts = ts
        self.reproject = reproject and ts is not None and nx == 4
        self.dtype = dtype
        self.n_constraints = 2 * nu

    def _reproject_window(self, window, d_hat):
        """Disturbance-consistent reference re-projection (kinematic 4-state
        layout (p_x, p_y, ψ, v)): keep the reference POSITIONS, re-derive the
        heading/speed the corrected model needs to realize them.

        Per stage the required ground motion is ``Δp_ref − d_p`` (subtract
        the per-step position drift ``B_d d̂`` injects): the car must CRAB —
        point its velocity along that direction at the matching speed. A
        persistent lateral disturbance makes the nominal reference states
        self-inconsistent (no input realizes ref_t → ref_{t+1} under the true
        plant), and tracking them couples the position error to the heading
        cost; re-projecting removes the structural residual (measured: the
        remaining error returns to the wind-free baseline).
        """
        drift = (self.Bd @ d_hat)[:2]
        dp = window[1:, :2] - window[:-1, :2] - drift  # (N, 2) required motion
        psi_raw = jnp.arctan2(dp[:, 1], dp[:, 0])
        # align with the (unwrapped) reference heading branch
        k = jnp.round((window[:-1, 2] - psi_raw) / (2.0 * jnp.pi))
        psi = psi_raw + 2.0 * jnp.pi * k
        v = jnp.linalg.norm(dp, axis=1) / self.ts
        head = window[:-1].at[:, 2].set(psi).at[:, 3].set(v)
        return jnp.concatenate([head, window[-1:]], axis=0)

    @solver_precision
    def _input_reference(self, window, d_hat):
        """Disturbance-consistent input reference along the window: per stage
        the ``u_ref_t`` that best advances the corrected model from
        ``ref_t`` to ``ref_{t+1}`` (damped Gauss-Newton on a tiny nu-dim
        least-squares; vmapped over stages). Penalizing ``u − u_ref`` instead
        of ``u`` removes the COST-induced steady offset: with a persistent
        disturbance the holding input is nonzero, and a plain ``uᵀRu``
        penalty trades tracking error against it even when the model is
        perfect.
        """

        def one(r_now, r_next):
            def g(u):
                return self.step_fn(r_now, u) + self.Bd @ d_hat - r_next

            def gn(u, _):
                J = jax.jacfwd(g)(u)
                JtJ = J.T @ J + 1e-8 * jnp.eye(self.nu, dtype=u.dtype)
                # closed-form 2x2 (smallsolve): the per-stage GN step runs
                # B x N lanes deep on the batched wind sweep
                return u - solve_spd(JtJ, J.T @ g(u)), None

            u, _ = jax.lax.scan(
                gn, jnp.zeros(self.nu, self.dtype), None, length=6
            )
            return jnp.clip(u, self.u_lb, self.u_ub)

        return jax.vmap(one)(window[:-1], window[1:])  # (N, nu)

    def _window_problem(self, window, d_hat):
        Q, R, QN = self.Q, self.R, self.QN
        if self.reproject:
            window = self._reproject_window(window, d_hat)
        u_ref = self._input_reference(window, d_hat)

        def dyn(x, u, t):
            return self.step_fn(x, u) + self.Bd @ d_hat

        def stage_cost(x, u, t):
            e = x - window[t]
            du = u - u_ref[t]
            return e @ (Q * e) + du @ (R * du)

        def terminal_cost(x):
            e = x - window[self.N]
            return e @ (QN * e)

        prob = ILQRProblem(
            dynamics=dyn, stage_cost=stage_cost, terminal_cost=terminal_cost,
            N=self.N, nx=self.nx, nu=self.nu,
        )

        def constraints(x, u, t):
            return jnp.concatenate([u - self.u_ub, self.u_lb - u])

        return prob, constraints

    def policy(self) -> Policy:
        """Measurement-driven tracking policy: EKF correct → corrected-model
        window solve → EKF predict. Aux adds the estimate/tracking telemetry."""
        nx = self.nx

        def policy_fn(y, t, carry):
            z_pred, P, u_warm = carry
            z, Pc = self._ekf_correct(z_pred, P, y)
            x_hat, d_hat = z[:nx], z[nx:]
            window = jax.lax.dynamic_slice_in_dim(
                self.ref_traj, t, self.N + 1, axis=0
            )
            prob, cons = self._window_problem(window, d_hat)
            sol = al_ilqr_solve(
                prob, cons, self.n_constraints, x_hat, u_init=u_warm,
                outer_iters=self.outer_iters, inner_iters=self.inner_iters,
                viol_tol=1e-4,
            )
            u = sol.us[0]
            u_next = jnp.concatenate([sol.us[1:], sol.us[-1:]], axis=0)
            z_next, P_next = self._ekf_predict(z, Pc, u)
            aux = {
                "solver_success": sol.converged,
                "input_prediction": sol.us,
                "viol": sol.viol,
                "state_estimate": x_hat,
                "disturbance_estimate": d_hat,
                "ref": window[0],
                "tracking_error": jnp.linalg.norm(x_hat[:2] - window[0][:2]),
            }
            return u, (z_next, P_next, u_next), aux

        return policy_fn
