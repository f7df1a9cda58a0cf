"""Nonlinear moving-horizon estimation (Gauss-Newton MHE for the bicycle tiers).

Round 2 left the estimation layer's nonlinear half filter-only (EKF); this
module completes it with the estimator the EKF cannot replace: a
**moving-horizon estimator** over nonlinear dynamics/measurements with hard
state bounds — the one piece of knowledge (physical limits) a Kalman-type
filter cannot encode. Where the reference would need CasADi+IPOPT to even
pose this problem (``session_4/main.py:39``), here it is a fixed-iteration
Gauss-Newton loop whose inner step is the engine's standard box-QP:

- decision vector ``z = [x₀; w₀..w_{M−1}]`` (the same condensing as the linear
  MHE, :class:`.estimation.MHE`), window states by a nonlinear ``lax.scan``
  rollout ``x_{k+1} = F(x_k, u_k) + w_k``;
- nonlinear least-squares residual (arrival + process + measurement terms,
  square-root-weighted), Jacobians by ``jax.jacfwd`` through the rollout —
  fixed shapes, so the whole window solve jits and vmaps;
- per Gauss-Newton iteration, state bounds enter as a box-QP on the step
  ``δz`` (rows = ``∂X/∂z`` — the linearized window states), solved by the
  engine's PDIP (``qp_setup(setup_admm=False)`` per window is pure traced
  linalg — no host round trip);
- optional **arrival-covariance propagation** (the round-2 linear MHE freezes
  ``P₀``, ``estimation.py`` ``mhe_trajectory`` docstring): the filtering-form
  EKF recursion at the window head updates ``P₀`` between windows.

In the linear-Gaussian unconstrained limit one Gauss-Newton step is exact and
the estimator reduces to the linear MHE / Kalman filter —
``tests/test_estimation_nl.py`` pins both equivalences, which gates every term
of the transcription at once.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .solvers.qp import admm_solve, pdip_solve, qp_setup
from .utils.precision import solver_precision
from .utils.smallsolve import solve_spd


class NonlinearMHE:
    """Gauss-Newton MHE over a fixed window of ``M`` steps.

    Parameters
    ----------
    step_fn : discrete dynamics ``F(x, u) -> x⁺`` (integrator-wrapped ODE).
    obs_fn : measurement map ``h(x) -> y``.
    Qw, Rv : process / measurement noise covariances.
    P0 : arrival covariance (initial; propagated when ``propagate_arrival``).
    M : window length (``M`` process steps, ``M+1`` measurements).
    x_min, x_max : optional hard state bounds on the window states x₀..x_M —
        the capability that separates MHE from the EKF.
    gn_iters : fixed Gauss-Newton iterations per window (2-3 suffice; 1 is
        exact in the linear limit).
    qp_iters : inner-QP iterations for each bounded step.
    qp_solver : ``"pdip"`` (default — tightest per-step accuracy) or
        ``"admm"``. The PDIP's ~2 batched KKT LUs per iteration serialize on
        TPU (measured ~940 windows/s flat in batch under ``vmap`` — small
        batched LUs are the one linalg shape XLA:TPU cannot parallelize);
        the ADMM step factors once per GN iteration and then runs pure
        matmuls, the throughput choice for :meth:`solve_batch`.
    propagate_arrival : update ``P₀`` between windows with the filtering-form
        EKF recursion at the window head instead of freezing it.

    A plain container (closures capture as jit constants), matching the
    engine's nonlinear-controller pattern.
    """

    def __init__(
        self,
        step_fn: Callable,
        obs_fn: Callable,
        Qw: jnp.ndarray,
        Rv: jnp.ndarray,
        P0: jnp.ndarray,
        M: int,
        nx: int,
        x_min=None,
        x_max=None,
        gn_iters: int = 3,
        qp_iters: int = 25,
        qp_solver: str = "pdip",
        propagate_arrival: bool = False,
        reg: float = 1e-9,
    ):
        if qp_solver not in ("pdip", "admm"):
            raise ValueError(f"unknown qp_solver {qp_solver!r}")
        self.qp_solver = qp_solver
        self.step_fn = step_fn
        self.obs_fn = obs_fn
        self.Qw = jnp.asarray(Qw)
        self.Rv = jnp.asarray(Rv)
        self.P0 = jnp.asarray(P0)
        self.M = M
        self.nx = nx
        self.ny = self.Rv.shape[0]
        self.x_min = None if x_min is None else jnp.asarray(x_min)
        self.x_max = None if x_max is None else jnp.asarray(x_max)
        self.bounded = x_min is not None or x_max is not None
        self.gn_iters = gn_iters
        self.qp_iters = qp_iters
        self.propagate_arrival = propagate_arrival
        self.reg = reg
        # square-root weights for the residual (recomputed for traced P0)
        self.Qw_sqrt_inv = _sqrt_inv(self.Qw)
        self.Rv_sqrt_inv = _sqrt_inv(self.Rv)

    # -- window pieces ------------------------------------------------------

    def _states(self, z, us):
        """Window states x₀..x_M from z = [x₀; w̄] — nonlinear rollout."""
        nx, M = self.nx, self.M
        x0 = z[:nx]
        w = z[nx:].reshape(M, nx)

        def body(x, inp):
            u, wk = inp
            x_next = self.step_fn(x, u) + wk
            return x_next, x_next

        _, xs = jax.lax.scan(body, x0, (us, w))
        return jnp.concatenate([x0[None], xs], axis=0)  # (M+1, nx)

    def _residual(self, z, us, ys, xbar, P0_sqrt_inv):
        nx, M = self.nx, self.M
        X = self._states(z, us)
        w = z[nx:].reshape(M, nx)
        r_arr = P0_sqrt_inv @ (z[:nx] - xbar)
        r_w = (w @ self.Qw_sqrt_inv.T).reshape(-1)
        innov = ys - jax.vmap(self.obs_fn)(X)
        r_y = (innov @ self.Rv_sqrt_inv.T).reshape(-1)
        return jnp.concatenate([r_arr, r_w, r_y])

    # -- solve --------------------------------------------------------------

    @solver_precision
    def solve(self, xbar, us, ys, P0=None):
        """One window solve → ``(x̂_M, X (M+1, nx), ŵ (M, nx))``.

        ``xbar``: arrival mean for x₀. ``us``: (M, nu). ``ys``: (M+1, ny)
        measurements of x₀..x_M. ``P0`` overrides the build-time arrival
        covariance (used by the propagating trajectory scan).
        """
        nx, M = self.nx, self.M
        P0 = self.P0 if P0 is None else P0
        P0_sqrt_inv = _sqrt_inv(P0)
        z0 = jnp.concatenate(
            [jnp.asarray(xbar), jnp.zeros(M * nx, dtype=jnp.asarray(xbar).dtype)]
        )

        lb = (
            None if self.x_min is None
            else jnp.tile(self.x_min, M + 1)
        )
        ub = (
            None if self.x_max is None
            else jnp.tile(self.x_max, M + 1)
        )

        def gn_step(z, _):
            r = self._residual(z, us, ys, xbar, P0_sqrt_inv)
            J = jax.jacfwd(
                lambda zz: self._residual(zz, us, ys, xbar, P0_sqrt_inv)
            )(z)
            H = J.T @ J + self.reg * jnp.eye(z.shape[0], dtype=z.dtype)
            g = J.T @ r
            if not self.bounded:
                dz = -jnp.linalg.solve(H, g)
            else:
                # linearized window states bound the STEP: A_c dz within the
                # box shifted by the current states
                X = self._states(z, us).reshape(-1)
                A_c = jax.jacfwd(
                    lambda zz: self._states(zz, us).reshape(-1)
                )(z)
                big = jnp.asarray(1e19, z.dtype)
                l_rows = (
                    jnp.full_like(X, -big) if lb is None else lb - X
                )
                u_rows = (
                    jnp.full_like(X, big) if ub is None else ub - X
                )
                # polish=False in both branches: only the primal step is
                # consumed, and the polish's (n+m)² batched LU blows the TPU
                # scoped-VMEM budget under vmap (solve_batch) — see
                # pdip_solve's docstring
                if self.qp_solver == "admm":
                    op = qp_setup(H, A_c, rho=0.1, n_rho_levels=1)
                    sol = admm_solve(
                        op, g, l_rows, u_rows, iters=self.qp_iters,
                        polish=False, adapt_chunks=1,
                    )
                else:
                    op = qp_setup(H, A_c, setup_admm=False)
                    sol = pdip_solve(
                        op, g, l_rows, u_rows, iters=self.qp_iters,
                        polish=False,
                    )
                dz = sol.x
            return z + dz, None

        z, _ = jax.lax.scan(gn_step, z0, None, length=self.gn_iters)
        X = self._states(z, us)
        w = z[nx:].reshape(M, nx)
        return X[-1], X, w

    def solve_batch(self, xbars, us, ys, P0s=None):
        """Batched window solves: ``xbars (B, nx)``, ``us (B, M, nu)``,
        ``ys (B, M+1, ny)`` → ``(x̂_M (B, nx), X (B, M+1, nx),
        ŵ (B, M, nx))`` — one ``vmap`` over :meth:`solve` (every inner piece
        is traced linalg: the GN Jacobians, the PDIP bounded steps, the
        rollout scans all batch). ``P0s``: optional per-window arrival
        covariances ``(B, nx, nx)``. For the throughput path see
        :meth:`solve_batch_fused` (round 5)."""
        if P0s is None:
            return jax.vmap(lambda xb, u, y: self.solve(xb, u, y))(
                xbars, us, ys
            )
        return jax.vmap(self.solve)(xbars, us, ys, P0s)

    def solve_batch_fused(
        self, xbars, us, ys, *,
        ode_rows, ts: float, obs_indices: tuple,
        integrator: str = "rk4", substeps: int = 1,
        outer_iters: int = 4, inner_iters: int = 8,
        viol_tol: float = 1e-4, tile: int = 512, interpret=None,
    ):
        """Batched bounded MHE windows on the FUSED AL-iLQR factory kernel
        (round 5, VERDICT r4 item 6 — closes the 100× gap to the linear
        tier: the GN outer loop + inner box-QP become one VMEM-resident
        solve per lane).

        The window NLP maps onto the factory's OCP shape exactly:

        - **decision inputs = process noises** (nu = nx) entering ADDITIVELY
          after integration (``input_mode="additive"``, B = I) — the
          discrete model is bit-for-bit ``step_fn(x, u) + w``;
        - the recorded plant inputs ride the per-stage **exo** operand,
          gated by γ ∈ {0, 1}: the ODE is γ·f(x, u), so the PREPENDED
          virtual stage (γ = 0) is the identity map ``x₁ = x̄ + δx₀`` whose
          input δx₀ carries the ARRIVAL cost via per-stage input weights
          (P₀⁻¹ at stage 0, Q_w⁻¹ after — the ``input_weights_rt``
          operand);
        - measurements are the tracking reference: knot k ≥ 1 holds
          y_{k−1} in the measured components with Qd = R_v⁻¹ there and 0
          elsewhere (**component-selector observations** — ``obs_indices``
          maps measurement j to state component obs_indices[j]);
        - the state box applies at every knot including x_M via the
          factory's ``terminal_state_limits`` rows.

        Requirements: DIAGONAL ``Qw``/``Rv``/``P0`` (frozen — the
        arrival-propagation mode stays on the XLA path), selector ``obs_fn``
        consistent with ``obs_indices``, and ``x̄`` inside the state box
        (the fixed knot-0 rows otherwise flag a spurious violation).
        ``ode_rows``: the CONTINUOUS row-form ODE whose
        ``integrator``/``substeps``/``ts`` discretization equals this
        estimator's ``step_fn``.

        Returns the :meth:`solve_batch` tuple ``(x̂_M, X, ŵ)`` plus the
        kernel's converged mask: ``(x̂_M, X, ŵ, converged)``.
        """
        import numpy as np

        from .ops.pallas.ilqr_factory import fused_tracker_solve

        nx, M = self.nx, self.M
        if self.x_min is None and self.x_max is None:
            raise ValueError(
                "solve_batch_fused requires state bounds (the AL kernel "
                "needs constraint rows); the unbounded window belongs on "
                "solve_batch / a Kalman smoother"
            )
        for name, S in (("Qw", self.Qw), ("Rv", self.Rv), ("P0", self.P0)):
            off = np.asarray(S) - np.diag(np.diag(np.asarray(S)))
            if np.abs(off).max() > 1e-12:
                raise ValueError(
                    f"solve_batch_fused requires diagonal {name}"
                )
        f32 = jnp.float32
        B = xbars.shape[0]
        nu_m = us.shape[-1]
        N_ocp = M + 1

        # host-side numpy on the CONCRETE covariance constants (inside a jit
        # trace even constant-operand jnp ops are staged, so float() on them
        # would see tracers)
        qw_inv = jnp.asarray(1.0 / np.diag(np.asarray(self.Qw)), f32)
        p0_inv = jnp.asarray(1.0 / np.diag(np.asarray(self.P0)), f32)
        rv_inv_np = 1.0 / np.diag(np.asarray(self.Rv))
        qd = np.zeros(nx, np.float32)
        for j, idx in enumerate(obs_indices):
            qd[idx] = float(rv_inv_np[j])

        # per-stage input weights: arrival P0^-1 at the virtual stage, Qw^-1
        # after (this is what the factory's input_weights_rt operand exists
        # for)
        rw = jnp.concatenate(
            [
                jnp.broadcast_to(p0_inv[None, None], (B, 1, nx)),
                jnp.broadcast_to(qw_inv[None, None], (B, M, nx)),
            ],
            axis=1,
        )
        # exo: (γ, u_model) per stage; γ=0 makes stage 0 the identity map
        exo = jnp.concatenate(
            [
                jnp.zeros((B, 1, 1 + nu_m), f32),
                jnp.concatenate(
                    [jnp.ones((B, M, 1), f32), us.astype(f32)], axis=-1
                ),
            ],
            axis=1,
        )
        # measurements as the tracking reference (knot 0 = x̄, constant)
        refs = jnp.zeros((B, N_ocp + 1, nx), f32)
        refs = refs.at[:, 0].set(xbars.astype(f32))
        for j, idx in enumerate(obs_indices):
            refs = refs.at[:, 1:, idx].set(ys[..., j].astype(f32))

        big = 1e9
        if self.x_min is not None or self.x_max is not None:
            lb = (
                tuple(float(v) for v in np.asarray(self.x_min))
                if self.x_min is not None else (-big,) * nx
            )
            ub = (
                tuple(float(v) for v in np.asarray(self.x_max))
                if self.x_max is not None else (big,) * nx
            )
            state_limits = (lb, ub)
            terminal_limits = (lb, ub)
        else:
            state_limits = None
            terminal_limits = None

        sol = fused_tracker_solve(
            xbars.astype(f32),
            jnp.zeros((B, N_ocp, nx), f32),
            refs,
            ode_rows=_gated_ode_rows(ode_rows, nu_m),
            nx=nx, nu=nx, N=N_ocp, ts=float(ts), substeps=substeps,
            integrator=integrator,
            limits=None,  # process noises are unbounded — no u-box rows
            weights=(tuple(float(v) for v in qd), (0.0,) * nx, 1.0),
            state_limits=state_limits,
            terminal_state_limits=terminal_limits,
            input_mode="additive", exo=exo, n_exo=1 + nu_m,
            input_weights_rt=rw,
            outer_iters=outer_iters, inner_iters=inner_iters,
            viol_tol=viol_tol, tile=tile, interpret=interpret,
        )
        X = sol.xs[:, 1:]  # knots 1..M+1 = x₀..x_M
        w = sol.us[:, 1:]  # stages 1..M = process noises
        return X[:, -1], X, w, sol.converged

    # -- receding-horizon trajectory ---------------------------------------

    def trajectory(self, xbar0, us, ys):
        """Receding-horizon MHE over a record: one scan over window starts.

        Window ``k`` estimates ``x_{k+M}`` from ``us[k:k+M]``,
        ``ys[k:k+M+1]``. Arrival-prior recursion between windows:

        - ``propagate_arrival=True`` — the **filtering arrival cost**
          (Rao–Rawlings): the prior ``(x̄, P₀)`` takes one EKF step per window
          shift, correcting with the window-head measurement only — the prior
          stays a genuine conditional on *past* data, and in the
          linear-Gaussian unconstrained limit the window-end estimates equal
          the Kalman filter **exactly** (pinned in tests).
        - ``propagate_arrival=False`` — the round-2 linear-MHE approximation:
          the smoothed window head pushed one step
          (``x̄⁺ = F(x̂₀, u₀) + ŵ₀``) with the covariance frozen at the
          build-time ``P₀``.

        Returns stacked window-end estimates, shape ``(T − M + 1, nx)``.
        """
        M = self.M
        T = us.shape[0]
        I = jnp.eye(self.nx, dtype=self.P0.dtype)

        def win(carry, k):
            xbar, P0 = carry
            u_w = jax.lax.dynamic_slice_in_dim(us, k, M, axis=0)
            y_w = jax.lax.dynamic_slice_in_dim(ys, k, M + 1, axis=0)
            x_M, X, w = self.solve(xbar, u_w, y_w, P0=P0)
            if self.propagate_arrival:
                # EKF step at the head on prior data only: correct (x̄, P₀)
                # with this window's head measurement, predict through u₀
                C = jax.jacfwd(self.obs_fn)(xbar)
                S = C @ P0 @ C.T + self.Rv
                K = solve_spd(S, (P0 @ C.T).T).T
                xf = xbar + K @ (y_w[0] - self.obs_fn(xbar))
                KC = K @ C
                P_corr = (I - KC) @ P0 @ (I - KC).T + K @ self.Rv @ K.T
                A = jax.jacfwd(self.step_fn, argnums=0)(xf, u_w[0])
                xbar_next = self.step_fn(xf, u_w[0])
                P0_next = A @ P_corr @ A.T + self.Qw
            else:
                xbar_next = self.step_fn(X[0], u_w[0]) + w[0]
                P0_next = P0
            return (xbar_next, P0_next), x_M

        (_, _), x_ends = jax.lax.scan(
            win, (jnp.asarray(xbar0), self.P0), jnp.arange(T - M + 1)
        )
        return x_ends


import functools as _functools


@_functools.lru_cache(maxsize=32)
def _gated_ode_rows(ode_rows, nu_m: int):
    """γ-gated row-form ODE for the fused MHE window: exo = (γ, u_model),
    ẋ = γ·f(x, u). RK4/Euler of γ·f is exactly the identity map at γ = 0
    (the virtual arrival stage) and exactly the model step at γ = 1. Cached
    on the user ODE's identity so the returned closure is a stable jit key."""

    def gated(xr, er):
        gam = er[0]
        um = tuple(er[1 + j] for j in range(nu_m))
        return tuple(gam * r for r in ode_rows(xr, um))

    return gated


def _sqrt_inv(S):
    """Inverse matrix square root of an SPD matrix (eigh — small, traced)."""
    vals, vecs = jnp.linalg.eigh(S)
    return (vecs / jnp.sqrt(jnp.maximum(vals, 1e-30))) @ vecs.T


def mhe_output_feedback_policy(ctrl, mhe: NonlinearMHE):
    """Close the MPC loop on the MHE itself (bounded-state estimation in the
    loop — what the EKF-based ``..estimation.output_feedback_policy`` cannot
    give when physical limits matter).

    Returns ``policy(y, t, carry)`` for :func:`..control.simulate.simulate`
    driven by measurements, with
    ``carry = (ys_buf (M+1, ny), us_buf (M, nu), x̄, P₀, mpc_carry)`` from
    :func:`initial_mhe_feedback_carry`. Per step: append the new measurement
    to the rolling window, solve the MHE for x̂_t, run the controller at
    x̂_t, append the applied input, and advance the arrival prior with the
    filtering recursion (EKF step on the window-head data, matching
    :meth:`NonlinearMHE.trajectory`'s ``propagate_arrival`` mode).

    The buffers start as if the system had SAT at the initial estimate for M
    steps (replicated first measurement, zero inputs) — the first M windows
    are warm-up approximations that wash out once real history fills the
    buffer; gate tests compare post-warm-up behavior.
    """
    mpc_policy = ctrl.policy()
    I = jnp.eye(mhe.nx, dtype=mhe.P0.dtype)

    def policy(y, t, carry):
        ys_buf, us_buf, xbar, P0, mpc_carry = carry
        ys_buf = jnp.concatenate([ys_buf[1:], y[None]], axis=0)
        x_t, X, w = mhe.solve(xbar, us_buf, ys_buf, P0=P0)
        u, mpc_carry, aux = mpc_policy(x_t, t, mpc_carry)

        # arrival recursion for the next (one-step-shifted) window — SAME
        # per-mode recursion as :meth:`NonlinearMHE.trajectory` (the two
        # receding-horizon implementations must agree configuration for
        # configuration; round-3 advisor finding):
        y_head, u_head = ys_buf[0], us_buf[0]
        if mhe.propagate_arrival:
            # filtering arrival (Rao–Rawlings): EKF step on the head data only
            C = jax.jacfwd(mhe.obs_fn)(xbar)
            S = C @ P0 @ C.T + mhe.Rv
            K = solve_spd(S, (P0 @ C.T).T).T
            xf = xbar + K @ (y_head - mhe.obs_fn(xbar))
            KC = K @ C
            P_corr = (I - KC) @ P0 @ (I - KC).T + K @ mhe.Rv @ K.T
            A = jax.jacfwd(mhe.step_fn, argnums=0)(xf, u_head)
            xbar_next = mhe.step_fn(xf, u_head)
            P0_next = A @ P_corr @ A.T + mhe.Qw
        else:
            # frozen mode: smoothed window head pushed one step, P0 frozen
            xbar_next = mhe.step_fn(X[0], u_head) + w[0]
            P0_next = P0

        us_buf = jnp.concatenate([us_buf[1:], u[None]], axis=0)
        aux = dict(aux, state_estimate=x_t)
        return u, (ys_buf, us_buf, xbar_next, P0_next, mpc_carry), aux

    return policy


def initial_mhe_feedback_carry(ctrl, mhe: NonlinearMHE, xhat0, nu: int,
                               dtype=jnp.float32):
    """Warm-up carry: buffers as if the system sat at ``xhat0`` for M steps."""
    xhat0 = jnp.asarray(xhat0, dtype)
    y0 = mhe.obs_fn(xhat0)
    return (
        jnp.tile(y0[None], (mhe.M + 1, 1)),
        jnp.zeros((mhe.M, nu), dtype),
        xhat0,
        mhe.P0.astype(dtype),
        ctrl.initial_carry(dtype),
    )
