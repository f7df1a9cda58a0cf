"""Model-parametric fused AL-iLQR tracking kernels: bring your own ODE.

Round 4 closing move on the fused-kernel family. The 6-state Pacejka kernel
(``ilqr_dyn_kernel.py``) established that a fused VMEM-resident AL-iLQR
tracker does not need hand-written Jacobians — one packed ``jax.jvp`` of the
RK4-substepped step on an ``(nx + nu, T)`` basis pack yields the exact
Jacobian of whatever dynamics are traced. That makes the kernel body
model-agnostic: every piece of linear algebra in the backward/forward passes
is written as static Python loops over ``range(nx)`` / ``range(nu)`` rows of
``(1, T)`` lanes, so the SAME body compiles for any small state dimension.

This module is that body, factored out as a factory:

    step = make_fused_tracker(
        ode_rows=my_ode,        # continuous dynamics in row form (see below)
        nx=6, nu=2,
        N=15, ts=0.05, substeps=4,
        limits=((lb_a, lb_d), (ub_a, ub_d)),       # input box (required)
        state_limits=((..), (..)),                 # optional state box
        weights=(Qdiag, Rdiag, qN),                # diagonal tracking cost
    )
    sol = step(x0s, u_init, refs)   # (B, nx), (B, N, nu), (B, N+1, nx)

``ode_rows(xr, ur) -> tuple of nx rows`` takes the state as a tuple of nx
arrays and the input as a tuple of nu arrays (each ``(k, T)``-shaped lanes —
the kernel calls it with rollout rows ``(1, T)``, line-search alpha packs
``(A, T)``, and jvp basis packs ``(nx + nu, T)``) and must return the nx
time-derivative rows. Two hard requirements, both consequences of running
inside a Pallas TPU kernel:

- **elementwise jnp ops only** (broadcasting arithmetic, ``sin``/``cos``/
  ``tanh``/``exp``/``where``/...). No matmuls, no reshapes, no gather.
- **Mosaic-lowerable primitives only**: notably there is no ``atan``/
  ``atan2`` lowering — use :func:`matan` (a degree-7 minimax polynomial,
  |err| < 2e-7, whose jvp is exactly self-consistent) as the drop-in.

The OCP solved per scenario lane is the tracking AL-iLQR of
``solvers/ilqr.py::al_ilqr_solve`` (the oracle in the tests): stage cost
``Σ (x−ref_k)ᵀ diag(Q) (x−ref_k) + uᵀ diag(R) u`` + terminal
``qN · (x−ref_N)ᵀ diag(Q) (x−ref_N)``, input-box (and optionally state-box)
constraints as PHR augmented-Lagrangian rows, inner Levenberg-iLQR with a
sublane-packed alpha grid, per-scenario adaptivity throughout. The prediction
model is classic RK4 with ``substeps`` sub-intervals per MPC interval
(``ops/integrators.py::rk4_fine`` semantics).

Reference role: this is the TPU-native generalization of what CasADi gives
the reference for free — *symbolic* problem construction for arbitrary
models (``session_4/main.py:41-113`` builds the OCP from any ``symbolic``
rcracers model). Here the "symbolic layer" is jax tracing into the kernel,
and the payoff is the fused-kernel throughput class (30-80x over vmapped
XLA, measured) for ANY user model instead of one hand-ported specialization.

Supported today: ``1 <= nu <= 8`` (closed-form regularized Quu solves at
nu <= 2, unrolled Cholesky — the ``utils/smallsolve.py`` pattern on (1, T)
lanes — beyond; certified at nu=3/nu=4 in tests/test_ilqr_factory_wide.py),
any ``nx`` small enough for VMEM (the scratch
budget is ~((N+1)·nx·(1+A) + N·nu·(2+A) + N·nu·nx + N·nc) · tile · 4 bytes
with A = len(ALPHAS) = 7 candidate-pack rows; nx ≤ ~12 is comfortable at
tile 512 under the 100 MB scoped-VMEM cap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.pytree import pytree_dataclass

ALPHAS = (1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.01)

# Mosaic has no `atan` lowering (NotImplementedError: Unimplemented primitive
# atan) — slip angles / magic-formula tires and any heading computation need
# it, so the factory ships a degree-7-in-x² minimax polynomial on [0, 1] with
# the standard |x| > 1 range reduction atan(x) = π/2 − atan(1/x). Max abs
# error 1.3e-7 — f32 resolution; jvp differentiates the polynomial itself, so
# kernel Jacobians are exactly consistent with the kernel's own dynamics.
_ATAN_C = (
    0.999999995814084, -0.3333282550224926, 0.19981819870035275,
    -0.14085706888559993, 0.10088014678708343, -0.06183738202876349,
    0.02583659568355391, -0.00511410178248912,
)


def matan(x):
    """Mosaic-compatible ``atan`` for use inside ``ode_rows`` (see module doc)."""
    ax = jnp.abs(x)
    inv = ax > 1.0
    # avoid inf/nan flowing through the unselected 1/ax branch's jvp at ax→0
    a = jnp.where(inv, 1.0 / jnp.maximum(ax, 1e-30), ax)
    s = a * a
    p = _ATAN_C[7]
    for c in _ATAN_C[6::-1]:
        p = p * s + c
    r = a * p
    r = jnp.where(inv, (jnp.pi / 2.0) - r, r)
    return jnp.where(x < 0.0, -r, r)


@functools.lru_cache(maxsize=64)
def step_jacobian_pattern(ode_rows, nx: int, nu: int, n_params: int = 0):
    """Structural sparsity of the discrete step's Jacobian, from jaxpr
    dependency analysis of the user ODE (round 5).

    Traces ``ode_rows`` once with dummy scalars and walks the jaxpr: output
    row r depends on input z_d iff some op chain connects them. The one-step
    map (Euler or RK4, any substep count) then has A-pattern = boolean
    closure of (I ∪ S_x) and B-pattern = closure @ S_u — CONSERVATIVE
    (control flow counts both branches), so a False entry is a structural
    zero of ∂x⁺/∂z and the backward pass can skip its products outright.
    Measured: the kinematic bicycle's positions never enter the dynamics
    derivatives (A columns 0/1 are e_0/e_1), which is exactly the sparsity
    the hand-written kernel (``ilqr_kernel.py::dyn``) exploits analytically.

    Returns (A_pat, B_pat) as tuples-of-tuples of bool; on any analysis
    surprise falls back to fully dense (all True)."""
    import numpy as np
    from jax.extend.core import Literal

    def f(*z):
        xr = tuple(z[:nx])
        ur = tuple(z[nx : nx + nu])
        if n_params:
            pr = tuple(z[nx + nu :])
            return tuple(ode_rows(xr, ur, pr))
        return tuple(ode_rows(xr, ur))

    dense = (
        tuple((True,) * nx for _ in range(nx)),
        tuple((True,) * nu for _ in range(nx)),
    )
    try:
        n_in = nx + nu + n_params
        closed = jax.make_jaxpr(f)(
            *[jnp.zeros((1, 1), jnp.float32)] * n_in
        )
        jaxpr = closed.jaxpr

        deps: dict = {}
        for i, v in enumerate(jaxpr.invars):
            deps[v] = frozenset([i]) if i < nx + nu else frozenset()

        def var_deps(v):
            if isinstance(v, Literal):
                return frozenset()
            return deps.get(v, frozenset())

        def walk(jx):
            for eqn in jx.eqns:
                ind = frozenset().union(
                    *[var_deps(v) for v in eqn.invars]
                ) if eqn.invars else frozenset()
                # conservative on higher-order primitives: all outputs
                # inherit every input dependency (no recursion needed —
                # union over invars is a superset of any inner routing)
                for ov in eqn.outvars:
                    deps[ov] = ind

        walk(jaxpr)
        S = np.zeros((nx, nx + nu), dtype=bool)
        for r, ov in enumerate(jaxpr.outvars):
            for d in var_deps(ov):
                S[r, d] = True
        # closure of the one-substep state map I ∪ S_x
        R = np.eye(nx, dtype=bool) | S[:, :nx]
        for _ in range(nx):
            R = R | (R @ R)
        A_pat = R
        B_pat = R @ S[:, nx:]
        return (
            tuple(tuple(bool(b) for b in row) for row in A_pat),
            tuple(tuple(bool(b) for b in row) for row in B_pat),
        )
    except Exception:  # pragma: no cover - analysis is best-effort
        return dense


def rowform_to_vector(ode_rows, nx: int, nu: int):
    """Adapt a row-form ODE to the ``(x_vec, u_vec) -> xdot_vec`` convention
    used by the XLA solver path (``solvers/ilqr.py``) and the integrators —
    so one definition serves both the fused kernel and its oracle twin."""

    def ode(x, u):
        xr = tuple(x[i] for i in range(nx))
        ur = tuple(u[j] for j in range(nu))
        return jnp.stack(ode_rows(xr, ur))

    return ode


@pytree_dataclass
class BatchedTrackerSolution:
    us: jnp.ndarray  # (B, N, nu)
    xs: jnp.ndarray  # (B, N + 1, nx)
    viol: jnp.ndarray  # (B,)
    converged: jnp.ndarray  # (B,) bool
    lam: jnp.ndarray  # (B, N, nc) converged AL multipliers (warm-start handle)
    inner_iters_executed: jnp.ndarray  # (B,) tile-granular delivered work


def _tracker_tile_kernel(
    x0_ref,  # (nx, T)
    u0_ref,  # (N, nu, T)
    *rest,  # optional inputs + outputs + scratch, in pallas_call order:
    #   [ref_ref (N + 1, nx, T) — tracking reference window, when track=True;
    #    regulation mode (refs=None) drops the operand and the buffer]
    #   [par_ref (n_params, T) — per-scenario static-in-horizon ODE / extra-
    #    constraint parameters, when n_params > 0: ode_rows / extra
    #    constraints receive them as a third tuple of (1, T) rows]
    #   [lam0_ref (N, nc, T) — AL-multiplier warm start, when has_lam]
    #   us_out (N, nu, T), xs_out (N + 1, nx, T), viol_out (1, T),
    #   conv_out (1, T), lam_out (N, nc, T), ni_out (1, T) — executed INNER
    #   iterations summed over the outer AL rounds (delivered-work counter)
    #   scratch: xs_s (N + 1, nx, T), us_s (N, nu, T),
    #   xs_p / us_p ((.., A, T) line-search candidate packs),
    #   k_s (N, nu, T), K_s (N, nu * nx, T), lam_s (N, nc, T)
    ode_rows,  # callable: see module docstring
    nx: int,
    nu: int,
    N: int,
    nc: int,
    ts: float,
    substeps: int,
    integrator: str,  # "rk4" | "euler"
    limits: tuple,  # (lb_u(nu), ub_u(nu))
    state_limits: tuple | None,  # None or (lb_x(nx), ub_x(nx))
    weights: tuple,  # (Qd(nx), Rd(nu), qn)
    extra_constraints,  # None or callable (xr, ur[, pr]) -> rows (c <= 0)
    n_extra: int,
    extra_deps: str,  # "x" | "xu": which variables the extra rows touch
    extra_order: int,  # 1 = Gauss-Newton AL Hessian, 2 = + exact act·∂²c
    n_params: int,
    runtime_weights: bool,
    input_mode: str,  # "ode" | "additive" (x⁺ = step(x; exo) + u, B = I)
    n_exo: int,
    has_rw: bool,  # per-stage input-weight operand replaces RD
    terminal_state_limits: tuple | None,  # box AL rows on x_N
    jac_pattern: tuple,  # (A_pat, B_pat) structural step-Jacobian sparsity
    outer_iters: int,
    inner_iters: int,
    mu_init: float,
    mu_scale: float,
    mu_max: float,
    viol_tol: float,
    tol: float,
    reg_init: float,
    reg_min: float,
    reg_max: float,
    track: bool,
    has_lam: bool,
):
    if track:
        ref_ref, *rest = rest
    else:
        ref_ref = None
    if n_exo:
        exo_ref, *rest = rest  # (N, n_exo, T) per-stage exogenous signals
    else:
        exo_ref = None
    if n_params:
        par_ref, *rest = rest
    else:
        par_ref = None
    if runtime_weights:
        w_ref, *rest = rest  # (nx + nu + 1, T): [Qd rows, Rd rows, qn]
    else:
        w_ref = None
    if has_rw:
        rw_ref, *rest = rest  # (N, nu, T) PER-STAGE input-weight rows
    else:
        rw_ref = None
    if has_lam:
        lam0_ref, *rest = rest
    else:
        lam0_ref = None
    (
        us_out, xs_out, viol_out, conv_out, lam_out, ni_out,
        xs_s, us_s, xs_p, us_p, k_s, K_s, lam_s,
    ) = rest
    # terminal_state_limits: lam_s/lam_out are allocated (N + 1, nc, T) and
    # row N holds the TERMINAL box multipliers (2*nx rows used, zero-padded
    # to nc — the wrapper enforces nc >= 2*nx)
    f32 = jnp.float32
    T = x0_ref.shape[-1]
    NZ = nx + nu  # jvp basis-pack width
    if limits is not None:
        LBU, UBU = limits
    if runtime_weights:
        # cost weights as PER-SCENARIO (1, T) rows instead of compile-time
        # constants (round 5): every QD/RD/QN use below broadcasts against
        # (1, T)/(A, T)/(NZ, T) operands unchanged, so the same kernel body
        # serves traced weights — one executable across a whole Adam tuning
        # run (solvers/implicit.py fused forward) instead of a recompile per
        # weight update
        QD = tuple(w_ref[i : i + 1] for i in range(nx))
        RD = tuple(w_ref[nx + j : nx + j + 1] for j in range(nu))
        QN = w_ref[nx + nu : nx + nu + 1]
    else:
        QD, RD, QN = weights

    # per-scenario parameter rows ((1, T), broadcast over alpha/jvp packs);
    # closed over by the dynamics and extra-constraint calls — they are
    # never differentiated, so the jvp basis stays (nx + nu)-wide
    if n_params:
        pr = tuple(par_ref[p : p + 1] for p in range(n_params))
        ode_call = lambda xr, ur: ode_rows(xr, ur, pr)  # noqa: E731
        if extra_constraints is not None:
            extra_call = lambda xr, ur: extra_constraints(xr, ur, pr)  # noqa: E731
        else:
            extra_call = None
    else:
        ode_call = ode_rows
        extra_call = extra_constraints

    H = ts / substeps

    # per-stage exogenous rows ((1, T)); drive the ODE in additive mode
    if n_exo:
        def exo_rows(t_i):
            er = exo_ref[t_i]  # (n_exo, T)
            return tuple(er[e : e + 1] for e in range(n_exo))
    else:
        def exo_rows(t_i):
            return None

    def _integrate(xr, dr):
        """``substeps`` classic RK4 (rk4_fine semantics) or forward-Euler
        sub-steps (the reference's parking prediction model,
        ``session_4/main.py:76``) of ``ode(x; dr)``."""
        if integrator == "euler":
            for _ in range(substeps):
                k1 = ode_call(xr, dr)
                xr = tuple(xr[i] + H * k1[i] for i in range(nx))
            return xr
        for _ in range(substeps):
            k1 = ode_call(xr, dr)
            x2 = tuple(xr[i] + 0.5 * H * k1[i] for i in range(nx))
            k2 = ode_call(x2, dr)
            x3 = tuple(xr[i] + 0.5 * H * k2[i] for i in range(nx))
            k3 = ode_call(x3, dr)
            x4 = tuple(xr[i] + H * k3[i] for i in range(nx))
            k4 = ode_call(x4, dr)
            xr = tuple(
                xr[i]
                + (H / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i])
                for i in range(nx)
            )
        return xr

    if input_mode == "additive":
        # x⁺ = step(x; exo_t) + u — the OCP input enters ADDITIVELY after
        # integration (nu == nx, B = I). This is the moving-horizon-
        # estimation shape (round 5): decision inputs are process noises,
        # the recorded plant inputs ride the exo operand.
        def step_rows(xr, ur, t_i):
            base = _integrate(xr, exo_rows(t_i))
            return tuple(base[i] + ur[i] for i in range(nx))
    else:
        def step_rows(xr, ur, t_i):
            return _integrate(xr, ur)

    def dyn(x, u, t_i):
        """x (nx, T), u (nu, T) -> x_next (nx, T)."""
        xr = step_rows(
            tuple(x[i : i + 1] for i in range(nx)),
            tuple(u[j : j + 1] for j in range(nu)),
            t_i,
        )
        return jnp.concatenate(xr)

    # jvp basis pack: sublane p of the (NB, T) pack carries direction e_p
    # (p < nx: state component p; p >= nx: input component p - nx; additive
    # mode differentiates over x only — B is the identity). Built from
    # iota — non-scalar captured constants are rejected by pallas.
    NB = nx if input_mode == "additive" else NZ
    _bi = jax.lax.broadcasted_iota(jnp.int32, (NB, 1), 0)

    def _basis(p):
        return (_bi == p).astype(f32)  # (NB, 1)

    def dyn_jac(x, u, t_i):
        """Full exact Jacobian of the RK4-substepped step via one packed jvp.

        Returns (xn (nx, T), A[k][i] (1, T) entries, B[k][j] entries — (1, T)
        rows, literal 1.0 on the diagonal in additive mode, or None for
        structural zeros)."""
        # Each tangent gets a lane-VARYING zero added (0·x is not constant-
        # foldable — 0·NaN ≠ 0 — so it survives to the backend). Without it,
        # a model whose row depends on inputs/states only through constant
        # coefficients (e.g. the planar quadrotor's ω̇ = (u₁−u₂)·arm/I)
        # yields jvp rows that are lane-CONSTANT basis combinations; Mosaic
        # keeps those lane-replicated and then crashes relayouting them at
        # multi-vreg lane widths (tile ≥ 256: "Check failed: limits[i] <=
        # dim(i)"). Measured: no throughput change on the Pacejka tier.
        zero_lanes = 0.0 * x[0:1]  # (1, T)
        tang = tuple(
            jnp.broadcast_to(_basis(p), (NB, T)) + zero_lanes
            for p in range(NB)
        )
        # structurally-zero entries (jaxpr dependency analysis at build time,
        # step_jacobian_pattern) become None — every backward product that
        # touches them is skipped at TRACE time. The kinematic bicycle drops
        # 6 of 16 A entries + 4 of 8 B entries this way; the Pacejka model's
        # position columns vanish the same way the hand kernel's analytic
        # Jacobians do.
        A_pat, B_pat = jac_pattern
        if input_mode == "additive":
            er = exo_rows(t_i)
            prim = tuple(
                jnp.broadcast_to(x[i : i + 1], (NB, T)) for i in range(nx)
            )
            out_p, out_t = jax.jvp(
                lambda *z: _integrate(z, er), prim, tang
            )
            xn = jnp.concatenate(
                [out_p[k][0:1] + u[k : k + 1] for k in range(nx)]
            )
            B = [
                [1.0 if k == j else None for j in range(nu)]
                for k in range(nx)
            ]
        else:
            prim = tuple(
                jnp.broadcast_to(x[i : i + 1], (NB, T)) for i in range(nx)
            ) + tuple(
                jnp.broadcast_to(u[j : j + 1], (NB, T)) for j in range(nu)
            )
            out_p, out_t = jax.jvp(
                lambda *z: step_rows(z[:nx], z[nx:], t_i), prim, tang
            )
            xn = jnp.concatenate([out_p[k][0:1] for k in range(nx)])
            B = [
                [
                    out_t[k][nx + j : nx + j + 1] if B_pat[k][j] else None
                    for j in range(nu)
                ]
                for k in range(nx)
            ]
        A = [
            [
                out_t[k][i : i + 1] if A_pat[k][i] else None
                for i in range(nx)
            ]
            for k in range(nx)
        ]  # A[k][i] = d x_next_k / d x_i
        return xn, A, B

    # ---- cost / constraints ---------------------------------------------------
    # constraint rows: [u - ub_u (nu), lb_u - u (nu)]
    #                (+ [x - ub_x (nx), lb_x - x (nx)] with a state box)
    #                (+ n_extra user rows, c <= 0 form)
    def constraint_row_list(xr, ur):
        rows = []
        if limits is not None:
            for j in range(nu):
                rows.append(ur[j] - UBU[j])
            for j in range(nu):
                rows.append(LBU[j] - ur[j])
        if state_limits is not None:
            LBX, UBX = state_limits
            for i in range(nx):
                rows.append(xr[i] - UBX[i])
            for i in range(nx):
                rows.append(LBX[i] - xr[i])
        if extra_call is not None:
            rows.extend(extra_call(xr, ur))
        return rows

    def constraint_rows(x, u):
        return jnp.concatenate(
            constraint_row_list(
                tuple(x[i : i + 1] for i in range(nx)),
                tuple(u[j : j + 1] for j in range(nu)),
            )
        )

    # tracking reference rows (None in regulation mode: the quadratic cost
    # regulates to the origin and the (N+1, nx, T) ref buffer is dropped)
    if track:
        def ref_rows(t_i):
            rr = ref_ref[t_i]  # (nx, T)
            return tuple(rr[i : i + 1] for i in range(nx))
    else:
        def ref_rows(t_i):
            return None

    def _wz(w):  # STATIC zero weight (Python float 0.0): emit no code
        return isinstance(w, float) and w == 0.0

    def _madd(a, b):  # None-aware accumulate (a may be a skipped zero term)
        return b if a is None else a + b

    def _quad_err(xr, rr):
        if rr is None:
            return sum(
                QD[i] * xr[i] * xr[i] for i in range(nx) if not _wz(QD[i])
            )
        return sum(
            QD[i] * (xr[i] - rr[i]) * (xr[i] - rr[i])
            for i in range(nx)
            if not _wz(QD[i])
        )

    # per-stage input-weight rows (runtime operand) or the static diagonal —
    # e.g. the MHE arrival stage weighs its virtual δx₀ input with P₀⁻¹
    # while every later stage weighs its process noise with Q_w⁻¹
    if has_rw:
        def rd_rows(t_i):
            rw = rw_ref[t_i]  # (nu, T)
            return tuple(rw[j : j + 1] for j in range(nu))
    else:
        def rd_rows(t_i):
            return RD

    def stage_cost_rows(xr, ur, lam, mu, rr, rd):
        rows = constraint_row_list(xr, ur)
        quad = _quad_err(xr, rr) + sum(rd[j] * ur[j] * ur[j] for j in range(nu))
        phi = jnp.zeros_like(quad)
        for r, c in enumerate(rows):
            lam_r = lam[r : r + 1]
            act = jnp.maximum(0.0, lam_r + mu * c)
            phi = phi + (act * act - lam_r * lam_r)
        return quad + phi / (2.0 * mu)

    def stage_cost_value(x, u, lam, mu, t_i):
        return stage_cost_rows(
            tuple(x[i : i + 1] for i in range(nx)),
            tuple(u[j : j + 1] for j in range(nu)),
            lam,
            mu,
            ref_rows(t_i),
            rd_rows(t_i),
        )

    # terminal state-box AL rows (round 5, MHE shape: the estimator bounds
    # x_N too; the multipliers live in lam_s[N])
    if terminal_state_limits is not None:
        TLB, TUB = terminal_state_limits

        def term_rows_list(xr):
            return [xr[i] - TUB[i] for i in range(nx)] + [
                TLB[i] - xr[i] for i in range(nx)
            ]

    def terminal_cost_rows(xr, rr, mu):
        c = QN * _quad_err(xr, rr)
        if terminal_state_limits is not None:
            lamT = lam_s[N]
            phi = jnp.zeros_like(c)
            for r, cr in enumerate(term_rows_list(xr)):
                lam_r = lamT[r : r + 1]
                act = jnp.maximum(0.0, lam_r + mu * cr)
                phi = phi + (act * act - lam_r * lam_r)
            c = c + phi / (2.0 * mu)
        return c

    def terminal_cost_value(x, mu):
        return terminal_cost_rows(
            tuple(x[i : i + 1] for i in range(nx)), ref_rows(N), mu
        )

    # ---- user constraint-row derivatives (packed jvp) --------------------------
    # The derivative basis covers only the z-columns the rows can touch:
    # extra_deps="xu" -> all nx + nu, "x" -> the nx states, or an explicit
    # tuple of z indices (z = x rows then u rows) — e.g. the parking
    # clearances touch (px, py, ψ) only, so deps=(0, 1, 2) shrinks both the
    # gradient pack and the quadratic number of curvature passes.
    if extra_deps == "xu":
        DEPS = tuple(range(nx + nu))
    elif extra_deps == "x":
        DEPS = tuple(range(nx))
    else:
        DEPS = tuple(int(d) for d in extra_deps)
    NE = len(DEPS)
    if extra_call is not None:
        _ei = jax.lax.broadcasted_iota(jnp.int32, (NE, 1), 0)

        def _ebasis(p):
            return (_ei == p).astype(f32)  # (NE, 1)

        def _acc_h(hxx, huu, lux, p, q, v):
            """Accumulate a second-derivative entry into the right block;
            (p, q) are FULL z indices (x rows first, then u rows)."""
            if p > q:
                p, q = q, p
            if q < nx:
                hxx[(p, q)] = hxx.get((p, q), 0.0) + v
            elif p >= nx:
                a, b = p - nx, q - nx
                huu[(a, b)] = huu.get((a, b), 0.0) + v
            else:
                lux[(q - nx, p)] = lux.get((q - nx, p), 0.0) + v

        def extra_derivs(x, u, lam, mu, lx, lu, hxx, huu, lux):
            """AL gradient/Hessian contributions of the user rows.

            One packed ``jax.jvp`` on an (NE, T) basis pack yields every row's
            full gradient (exactly the trick :func:`dyn_jac` uses for the
            dynamics); the m rows are then re-packed into (m, T) sublane
            blocks so the accumulation is one vectorized reduction per matrix
            entry instead of per-row (1, T) op groups. ``extra_order == 2``
            adds the exact constraint-curvature term Σ_r act_r·∂²c_r via NE
            forward-over-forward passes (column q of the Hessian per pass) —
            matching the XLA oracle's ``jax.hessian``; ``extra_order == 1``
            keeps the Gauss-Newton (ALTRO-style) convexification."""
            zrows = [x[i : i + 1] for i in range(nx)] + [
                u[j : j + 1] for j in range(nu)
            ]
            zero_lanes = 0.0 * x[0:1]  # see dyn_jac: defeat lane-constant folding

            # pack only the DEPS columns; the rest stay closed-over constants
            prim = tuple(
                jnp.broadcast_to(zrows[d], (NE, T)) for d in DEPS
            )

            def fn(*zp):
                full = list(zrows)
                for k, d in enumerate(DEPS):
                    full[d] = zp[k]
                return tuple(extra_call(tuple(full[:nx]), tuple(full[nx:])))

            tang = tuple(
                jnp.broadcast_to(_ebasis(p), (NE, T)) + zero_lanes
                for p in range(NE)
            )
            vals, dvals = jax.jvp(fn, prim, tang)
            C = jnp.concatenate([vals[r][0:1] for r in range(n_extra)])  # (m,T)
            G = [
                jnp.concatenate([dvals[r][p : p + 1] for r in range(n_extra)])
                for p in range(NE)
            ]  # G[p] (m, T): ∂c_r/∂z_{DEPS[p]} in row r
            base = (2 * nu if limits is not None else 0) + (
                2 * nx if state_limits is not None else 0
            )
            lam_e = lam[base : base + n_extra]  # (m, T)
            act = jnp.maximum(0.0, lam_e + mu * C)
            ind = mu * (act > 0.0).astype(f32)

            def rsum(v):  # reduce over the row dim -> (1, T)
                return jnp.sum(v, axis=0, keepdims=True)

            for p in range(NE):
                gp = rsum(act * G[p])
                d = DEPS[p]
                if d < nx:
                    lx[d] = _madd(lx[d], gp)
                else:
                    lu[d - nx] = lu[d - nx] + gp
            # Gauss-Newton block: μ·1[act>0]·g gᵀ
            for p in range(NE):
                for q in range(p, NE):
                    _acc_h(
                        hxx, huu, lux, DEPS[p], DEPS[q],
                        rsum(ind * G[p] * G[q]),
                    )
            if extra_order == 2:
                # curvature Σ_r act_r·∂²c_r: contract rows with the FROZEN
                # act weights BEFORE differentiating — the scalar wfn's
                # jvp-of-jvp streams then carry one row instead of m, and
                # the per-pass primal/first-tangent streams are identical
                # across passes (CSE fodder); pass q yields Hessian column q
                def wfn(*zp):
                    rows = fn(*zp)
                    return sum(
                        act[r : r + 1] * rows[r] for r in range(n_extra)
                    )

                for q in range(NE):
                    def hq(*z, _q=q):
                        zl = 0.0 * z[0][0:1]
                        dirn = tuple(
                            (jnp.ones_like(z[0]) if w == _q
                             else jnp.zeros_like(z[0])) + zl
                            for w in range(NE)
                        )
                        return jax.jvp(wfn, z, dirn)[1]

                    _, col = jax.jvp(hq, prim, tang)
                    # col[p] = Σ_r act_r ∂²c_r/∂z_p∂z_q ; canonical p >= q half
                    for p in range(q, NE):
                        _acc_h(
                            hxx, huu, lux, DEPS[p], DEPS[q], col[p : p + 1]
                        )

    def stage_derivs(x, u, lam, mu, rr, rd):
        """lx (list of nx (1,T)), lu (nu), and SPARSE second-derivative dicts:
        hxx {(i, j) i<=j}, huu {(a, b) a<=b}, lux {(a, i)}.

        The diagonal tracking cost and box AL rows touch only diagonals; user
        constraint rows (extra_constraints) contribute dense blocks through
        :func:`extra_derivs`. Absent keys are structural zeros — the backward
        pass emits no code for them, so configs without extra rows compile to
        exactly the round-4 diagonal kernel."""
        if rr is None:
            lx = [
                None if _wz(QD[i]) else 2.0 * QD[i] * x[i : i + 1]
                for i in range(nx)
            ]
        else:
            lx = [
                None if _wz(QD[i]) else 2.0 * QD[i] * (x[i : i + 1] - rr[i])
                for i in range(nx)
            ]
        lu = [2.0 * rd[j] * u[j : j + 1] for j in range(nu)]
        one = jnp.ones((1, T), f32)
        hxx = {
            (i, i): 2.0 * QD[i] * one for i in range(nx) if not _wz(QD[i])
        }
        huu = {(j, j): 2.0 * rd[j] * one for j in range(nu)}
        lux = {}
        if limits is not None:
            for j in range(nu):
                cu = u[j : j + 1] - UBU[j]
                cl = LBU[j] - u[j : j + 1]
                act_u = jnp.maximum(0.0, lam[j : j + 1] + mu * cu)
                act_l = jnp.maximum(0.0, lam[nu + j : nu + j + 1] + mu * cl)
                lu[j] = lu[j] + act_u - act_l
                ind = (act_u > 0.0).astype(f32) + (act_l > 0.0).astype(f32)
                huu[(j, j)] = huu[(j, j)] + mu * ind
        if state_limits is not None:
            LBX, UBX = state_limits
            off = 2 * nu if limits is not None else 0
            for i in range(nx):
                cu = x[i : i + 1] - UBX[i]
                cl = LBX[i] - x[i : i + 1]
                act_u = jnp.maximum(0.0, lam[off + i : off + i + 1] + mu * cu)
                act_l = jnp.maximum(
                    0.0, lam[off + nx + i : off + nx + i + 1] + mu * cl
                )
                lx[i] = _madd(lx[i], act_u - act_l)
                ind = (act_u > 0.0).astype(f32) + (act_l > 0.0).astype(f32)
                hxx[(i, i)] = hxx.get((i, i), 0.0) + mu * ind
        if extra_call is not None:
            extra_derivs(x, u, lam, mu, lx, lu, hxx, huu, lux)
        return lx, lu, hxx, huu, lux

    # ---- trajectory-wide helpers ---------------------------------------------
    def rollout_into(xs_buf, us_from):
        xs_buf[0] = x0_ref[:]

        def body(t_i, x):
            xn = dyn(x, us_from[t_i], t_i)
            xs_buf[t_i + 1] = xn
            return xn

        jax.lax.fori_loop(0, N, body, x0_ref[:])

    def total_cost(xs_buf, us_buf, mu):
        def body(t_i, cost):
            return cost + stage_cost_value(
                xs_buf[t_i], us_buf[t_i], lam_s[t_i], mu, t_i
            )

        cost = jax.lax.fori_loop(0, N, body, jnp.zeros((1, T), f32))
        return cost + terminal_cost_value(xs_buf[N], mu)

    # ---- backward pass --------------------------------------------------------
    def backward(mu, reg):
        """Generic-nx Riccati sweep over stored (xs_s, us_s); writes gains;
        returns (ok (1,T), grad (1,T)). Vxx rides as an (nx², T) block, row
        nx*i+j."""
        xN = xs_s[N]
        rrN = ref_rows(N)
        if rrN is None:
            vx_rows = [
                None if _wz(QD[i]) else 2.0 * QN * QD[i] * xN[i : i + 1]
                for i in range(nx)
            ]
        else:
            vx_rows = [
                None
                if _wz(QD[i])
                else 2.0 * QN * QD[i] * (xN[i : i + 1] - rrN[i])
                for i in range(nx)
            ]
        one_row = jnp.ones((1, T), f32)
        vxx_diag = [
            None if _wz(QD[i]) else 2.0 * QN * QD[i] * one_row
            for i in range(nx)
        ]
        if terminal_state_limits is not None:
            lamT = lam_s[N]
            for i in range(nx):
                cu = xN[i : i + 1] - TUB[i]
                cl = TLB[i] - xN[i : i + 1]
                act_u = jnp.maximum(0.0, lamT[i : i + 1] + mu * cu)
                act_l = jnp.maximum(
                    0.0, lamT[nx + i : nx + i + 1] + mu * cl
                )
                vx_rows[i] = _madd(vx_rows[i], act_u - act_l)
                ind = (act_u > 0.0).astype(f32) + (act_l > 0.0).astype(f32)
                vxx_diag[i] = _madd(vxx_diag[i], mu * ind)
        zero = jnp.zeros((1, T), f32)
        Vx = jnp.concatenate([v if v is not None else zero for v in vx_rows])
        Vxx = jnp.concatenate(
            [
                (vxx_diag[i] if vxx_diag[i] is not None else zero)
                if i == j
                else zero
                for i in range(nx)
                for j in range(nx)
            ]
        )

        # None-aware products: None marks a STRUCTURAL zero (dyn_jac sparsity
        # or an absent Hessian-dict entry) — skipped at trace time, so the
        # emitted code only ever multiplies genuinely-nonzero entries.
        def _mul(a, b):
            if a is None or b is None:
                return None
            if isinstance(a, float) and a == 1.0:
                return b
            return a * b

        def _msum(terms):
            terms = [t for t in terms if t is not None]
            if not terms:
                return None
            s = terms[0]
            for t in terms[1:]:
                s = s + t
            return s

        zrow = jnp.zeros((1, T), f32)

        def _arr(v):  # boundary: storage/solves need real rows
            return zrow if v is None else v

        def body(s, carry):
            Vx, Vxx, ok, grad = carry
            t_i = N - 1 - s
            x = xs_s[t_i]
            u = us_s[t_i]
            _, A, B = dyn_jac(x, u, t_i)
            lx, lu, hxx, huu, lux = stage_derivs(
                x, u, lam_s[t_i], mu, ref_rows(t_i), rd_rows(t_i)
            )

            def V(i, j):
                return Vxx[nx * i + j : nx * i + j + 1]

            Vxr = [Vx[i : i + 1] for i in range(nx)]
            # Qx = lx + A^T Vx ;  Qu = lu + B^T Vx
            Qx = [
                _msum([lx[i]] + [_mul(A[k][i], Vxr[k]) for k in range(nx)])
                for i in range(nx)
            ]
            Qu = [
                _msum([lu[j]] + [_mul(B[k][j], Vxr[k]) for k in range(nx)])
                for j in range(nu)
            ]
            # M = Vxx A  (column sparsity of A carries through)
            M = [
                [
                    _msum([_mul(V(i, k), A[k][j]) for k in range(nx)])
                    for j in range(nx)
                ]
                for i in range(nx)
            ]
            # Qxx = lxx + A^T M (lxx sparse-dict, canonical i<=j), symmetrized
            Qxx = [[None] * nx for _ in range(nx)]
            for i in range(nx):
                for j in range(i, nx):
                    vij = _msum([_mul(A[k][i], M[k][j]) for k in range(nx)])
                    vji = _msum([_mul(A[k][j], M[k][i]) for k in range(nx)])
                    sym = _mul(0.5, _msum([vij, vji]))
                    Qxx[i][j] = _arr(_msum([sym, hxx.get((i, j))]))
                    Qxx[j][i] = Qxx[i][j]
            # VB[k][b] = (Vxx B)[k][b] ;  Quu = luu + B^T Vxx B (nu x nu)
            VB = [
                [
                    _msum([_mul(V(k, m), B[m][b]) for m in range(nx)])
                    for b in range(nu)
                ]
                for k in range(nx)
            ]
            quu = [
                [
                    _arr(_msum(
                        [huu.get((min(a, b), max(a, b)))]
                        + [_mul(B[k][a], VB[k][b]) for k in range(nx)]
                    ))
                    for b in range(nu)
                ]
                for a in range(nu)
            ]
            # Qux = lux + B^T M  (nu x nx); lux is nonzero only when user
            # constraint rows couple x and u (extra_deps includes u columns)
            Qux = [
                [
                    _arr(_msum(
                        [lux.get((a, j))]
                        + [_mul(B[k][a], M[k][j]) for k in range(nx)]
                    ))
                    for j in range(nx)
                ]
                for a in range(nu)
            ]
            # regularized Quu solve; f32 ok-mask (no i1 vectors). Closed form
            # at nu <= 2 (round-4 measured path); unrolled Cholesky beyond
            # (utils/smallsolve.py pattern on (1, T) lanes — round 5).
            if nu == 1:
                q00r = quu[0][0] + reg
                ok_t = (q00r > 0.0).astype(f32)
                det_safe = jnp.where(q00r > 0.0, q00r, jnp.ones_like(q00r))
                inv = [[1.0 / det_safe]]
            elif nu == 2:
                q00r = quu[0][0] + reg
                q11r = quu[1][1] + reg
                q01 = quu[0][1]
                det = q00r * q11r - q01 * q01
                ok_t = ((q00r > 0.0) & (det > 0.0)).astype(f32)
                det_safe = jnp.where(det > 0.0, det, jnp.ones_like(det))
                inv = [
                    [q11r / det_safe, -q01 / det_safe],
                    [-q01 / det_safe, q00r / det_safe],
                ]
            else:
                inv = None
                L = [[None] * nu for _ in range(nu)]
                ok_t = jnp.ones((1, T), f32)
                for a in range(nu):
                    for b in range(a + 1):
                        s = quu[a][b] + (reg if a == b else 0.0)
                        for w in range(b):
                            s = s - L[a][w] * L[b][w]
                        if a == b:
                            ok_t = ok_t * (s > 0.0).astype(f32)
                            s_safe = jnp.where(s > 0.0, s, jnp.ones_like(s))
                            L[a][a] = jnp.sqrt(s_safe)
                        else:
                            L[a][b] = s / L[b][b]

                def chol_solve(rhs):  # rhs: list of nu (1,T) rows
                    y = [None] * nu
                    for a in range(nu):
                        s = rhs[a]
                        for w in range(a):
                            s = s - L[a][w] * y[w]
                        y[a] = s / L[a][a]
                    sol = [None] * nu
                    for a in reversed(range(nu)):
                        s = y[a]
                        for w in range(a + 1, nu):
                            s = s - L[w][a] * sol[w]
                        sol[a] = s / L[a][a]
                    return sol

            if inv is not None:
                kg = [
                    -sum(inv[a][b] * Qu[b] for b in range(nu))
                    for a in range(nu)
                ]
                Kg = [
                    [
                        -sum(inv[a][b] * Qux[b][j] for b in range(nu))
                        for j in range(nx)
                    ]
                    for a in range(nu)
                ]
            else:
                kg = [-v for v in chol_solve(Qu)]
                Kcols = [
                    chol_solve([Qux[a][j] for a in range(nu)])
                    for j in range(nx)
                ]
                Kg = [
                    [-Kcols[j][a] for j in range(nx)] for a in range(nu)
                ]
            # Vx' = Qx + K^T (Quu k + Qu) + Qux^T k  (UNregularized Quu)
            g = [
                sum(quu[a][b] * kg[b] for b in range(nu)) + Qu[a]
                for a in range(nu)
            ]
            Vx_n = jnp.concatenate(
                [
                    Qx[j]
                    + sum(Kg[a][j] * g[a] for a in range(nu))
                    + sum(Qux[a][j] * kg[a] for a in range(nu))
                    for j in range(nx)
                ]
            )
            # Vxx' = Qxx + K^T Quu K + K^T Qux + Qux^T K (symmetric by constr.)
            KQ = [
                [
                    sum(quu[a][b] * Kg[b][j] for b in range(nu))
                    for j in range(nx)
                ]
                for a in range(nu)
            ]
            rows = []
            for i in range(nx):
                for j in range(nx):
                    rows.append(
                        Qxx[i][j]
                        + sum(Kg[a][i] * KQ[a][j] for a in range(nu))
                        + sum(Kg[a][i] * Qux[a][j] for a in range(nu))
                        + sum(Qux[a][i] * Kg[a][j] for a in range(nu))
                    )
            Vxx_n = jnp.concatenate(rows)
            k_s[t_i] = jnp.concatenate(kg)
            K_s[t_i] = jnp.concatenate([Kg[a][j] for a in range(nu) for j in range(nx)])
            grad_t = jnp.abs(Qu[0])
            for a in range(1, nu):
                grad_t = jnp.maximum(grad_t, jnp.abs(Qu[a]))
            grad_n = jnp.maximum(grad, grad_t)
            return Vx_n, Vxx_n, ok * ok_t, grad_n

        ok0 = jnp.ones((1, T), f32)
        grad0 = jnp.zeros((1, T), f32)
        _, _, ok, grad = jax.lax.fori_loop(0, N, body, (Vx, Vxx, ok0, grad0))
        return ok, grad

    # ---- forward pass / line search -------------------------------------------
    A_LS = len(ALPHAS)
    _li = jax.lax.broadcasted_iota(jnp.int32, (A_LS, 1), 0)
    alpha_col = sum(
        jnp.where(_li == k, jnp.float32(a), jnp.float32(0.0))
        for k, a in enumerate(ALPHAS)
    )

    def forward_cost_all(mu):
        """Closed-loop rollouts for the WHOLE alpha grid at once — alphas
        packed into the sublane dim as (A, T) component blocks — storing
        every candidate trajectory into the (…, A, T) packs as it goes.

        Storing the pack is what lets :func:`select_blend` replace the
        historical third rollout (re-rolling at the per-lane accepted alpha)
        with a sublane select: a (1, T) re-rollout costs the same vregs as
        this whole (A, T) pack (A ≤ 8 rides the native sublanes), so
        dropping it removes ~one third of the dynamics work per inner
        iteration — measured +33% on the dynamic tier (95.7k → 127.3k
        solves/s) and +20% on the parking sweep, both at bitwise-identical
        quality (the pack trajectory IS the one the accepted cost was
        evaluated on)."""

        def body(t_i, carry):
            xr = carry[:nx]
            cost = carry[nx]
            for i in range(nx):
                xs_p[t_i, i] = xr[i]
            xh = xs_s[t_i]
            uh = us_s[t_i]
            kg = k_s[t_i]
            Kg = K_s[t_i]
            dx = tuple(xr[i] - xh[i : i + 1] for i in range(nx))
            ur = tuple(
                uh[a : a + 1]
                + alpha_col * kg[a : a + 1]
                + sum(
                    Kg[a * nx + j : a * nx + j + 1] * dx[j] for j in range(nx)
                )
                for a in range(nu)
            )
            for a in range(nu):
                us_p[t_i, a] = ur[a]
            cost = cost + stage_cost_rows(
                xr, ur, lam_s[t_i], mu, ref_rows(t_i), rd_rows(t_i)
            )
            xr = step_rows(xr, ur, t_i)
            return xr + (cost,)

        x0 = x0_ref[:]
        init = tuple(
            jnp.broadcast_to(x0[i : i + 1], (A_LS, T)) for i in range(nx)
        ) + (jnp.zeros((A_LS, T), f32),)
        out = jax.lax.fori_loop(0, N, body, init)
        for i in range(nx):
            xs_p[N, i] = out[i]
        return out[nx] + terminal_cost_rows(out[:nx], ref_rows(N), mu)

    def select_blend(best_alpha, mask):
        """Accept per-lane: pull each lane's best-alpha candidate out of the
        packs (sublane-mask reduction — ALPHAS are distinct, so exactly one
        row matches) and blend into (xs_s, us_s) where ``mask`` accepts."""
        sel = (alpha_col == best_alpha).astype(f32)  # (A, T)

        def pick(pack_row):  # (A, T) -> (1, T)
            # Mask, don't multiply: a NON-selected candidate row may hold a
            # diverged rollout (±inf/NaN — exactly what the isfinite guard on
            # costs anticipates), and 0.0 * inf = NaN would poison the
            # accepted lane's blended trajectory permanently.
            return jnp.sum(
                jnp.where(sel > 0.0, pack_row, 0.0), axis=0, keepdims=True
            )

        def body(t_i, _):
            us_s[t_i] = jnp.where(
                mask > 0.0,
                jnp.concatenate([pick(us_p[t_i, a]) for a in range(nu)]),
                us_s[t_i],
            )
            xs_s[t_i] = jnp.where(
                mask > 0.0,
                jnp.concatenate([pick(xs_p[t_i, i]) for i in range(nx)]),
                xs_s[t_i],
            )
            return 0

        jax.lax.fori_loop(0, N, body, 0)
        xs_s[N] = jnp.where(
            mask > 0.0,
            jnp.concatenate([pick(xs_p[N, i]) for i in range(nx)]),
            xs_s[N],
        )

    # ---- inner iLQR loop -------------------------------------------------------
    def ilqr(mu):
        cost0 = total_cost(xs_s, us_s, mu)

        def cond(carry):
            i, _cost, _reg, grad = carry
            all_done = jnp.all(grad < 0.01 * tol)
            return jnp.logical_and(i < inner_iters, jnp.logical_not(all_done))

        def body(carry):
            i, cost, reg, _grad = carry
            ok, grad = backward(mu, reg)
            costs_all = forward_cost_all(mu)
            costs_all = jnp.where(jnp.isfinite(costs_all), costs_all, jnp.inf)
            best_cost = jnp.min(costs_all, axis=0, keepdims=True)
            best_alpha = jnp.max(
                jnp.where(costs_all <= best_cost, alpha_col, 0.0),
                axis=0,
                keepdims=True,
            )
            improved = (best_cost < cost - 1e-12) & (ok > 0.5)
            select_blend(best_alpha, improved.astype(f32))
            cost_n = jnp.where(improved, best_cost, cost)
            reg_n = jnp.where(
                improved,
                jnp.maximum(reg * 0.5, reg_min),
                jnp.minimum(reg * 10.0, reg_max),
            )
            return i + 1, cost_n, reg_n, grad

        reg0 = jnp.full((1, T), reg_init, f32)
        grad0 = jnp.full((1, T), jnp.inf, f32)
        n_it, _, _, grad = jax.lax.while_loop(
            cond, body, (jnp.int32(0), cost0, reg0, grad0)
        )
        return grad, n_it

    # ---- outer AL loop ----------------------------------------------------------
    def al_cond(carry):
        oi, _mu, viol, lam_step, _ni = carry
        solved = jnp.all((viol < viol_tol) & (lam_step < 1e-3))
        return jnp.logical_and(oi < outer_iters, jnp.logical_not(solved))

    def al_body(carry):
        oi, mu, _viol, _lam_step, ni = carry
        _, n_it = ilqr(mu)
        ni = ni + n_it

        def body(t_i, carry2):
            viol, step, lmax = carry2
            c_rows = constraint_rows(xs_s[t_i], us_s[t_i])
            lam = lam_s[t_i]
            lam_n = jnp.maximum(0.0, lam + mu * c_rows)
            lam_s[t_i] = lam_n
            viol = jnp.maximum(
                viol, jnp.max(jnp.maximum(c_rows, 0.0), axis=0, keepdims=True)
            )
            step = jnp.maximum(
                step, jnp.max(jnp.abs(lam_n - lam), axis=0, keepdims=True)
            )
            lmax = jnp.maximum(
                lmax, jnp.max(jnp.abs(lam_n), axis=0, keepdims=True)
            )
            return viol, step, lmax

        z = jnp.zeros((1, T), f32)
        viol, step, lmax = jax.lax.fori_loop(0, N, body, (z, z, z))
        if terminal_state_limits is not None:
            xN = xs_s[N]
            c_t = jnp.concatenate(
                term_rows_list(tuple(xN[i : i + 1] for i in range(nx)))
            )  # (2*nx, T)
            lamT = lam_s[N][: 2 * nx]
            lam_n = jnp.maximum(0.0, lamT + mu * c_t)
            lam_s[N] = jnp.concatenate(
                [lam_n, jnp.zeros((nc - 2 * nx, T), f32)]
            ) if nc > 2 * nx else lam_n
            viol = jnp.maximum(
                viol, jnp.max(jnp.maximum(c_t, 0.0), axis=0, keepdims=True)
            )
            step = jnp.maximum(
                step, jnp.max(jnp.abs(lam_n - lamT), axis=0, keepdims=True)
            )
            lmax = jnp.maximum(
                lmax, jnp.max(jnp.abs(lam_n), axis=0, keepdims=True)
            )
        lam_step = step / (1.0 + lmax)
        mu_n = jnp.where(viol > viol_tol, jnp.minimum(mu * mu_scale, mu_max), mu)
        return oi + 1, mu_n, viol, lam_step, ni

    # ---- init + run ---------------------------------------------------------------
    n_lam = N + 1 if terminal_state_limits is not None else N

    def init_body(t_i, _):
        us_s[t_i] = u0_ref[t_i]
        return 0

    def init_lam(t_i, _):
        if has_lam:
            lam_s[t_i] = lam0_ref[t_i]
        else:
            lam_s[t_i] = jnp.zeros((nc, T), f32)
        return 0

    jax.lax.fori_loop(0, N, init_body, 0)
    jax.lax.fori_loop(0, n_lam, init_lam, 0)
    rollout_into(xs_s, us_s)

    mu0 = jnp.full((1, T), mu_init, f32)
    inf = jnp.full((1, T), jnp.inf, f32)
    _, _, viol, _, ni_total = jax.lax.while_loop(
        al_cond, al_body, (jnp.int32(0), mu0, inf, inf, jnp.int32(0))
    )

    def out_body(t_i, _):
        us_out[t_i] = us_s[t_i]
        xs_out[t_i] = xs_s[t_i]
        return 0

    def out_lam(t_i, _):
        lam_out[t_i] = lam_s[t_i]
        return 0

    jax.lax.fori_loop(0, N, out_body, 0)
    jax.lax.fori_loop(0, n_lam, out_lam, 0)
    xs_out[N] = xs_s[N]
    viol_out[:] = viol
    conv_out[:] = (viol < viol_tol).astype(f32)
    ni_out[:] = jnp.full((1, T), 1.0, f32) * ni_total.astype(f32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ode_rows", "nx", "nu", "N", "ts", "substeps", "integrator",
        "limits", "state_limits", "weights",
        "extra_constraints", "n_extra", "extra_deps", "extra_order",
        "n_params", "input_mode", "n_exo", "terminal_state_limits",
        "outer_iters", "inner_iters", "tile",
        "mu_init", "mu_scale", "mu_max", "viol_tol", "tol", "interpret",
    ),
)
def fused_tracker_solve(
    x0s: jnp.ndarray,  # (B, nx)
    u_init: jnp.ndarray,  # (B, N, nu)
    refs: jnp.ndarray | None = None,  # (B, N + 1, nx) tracking windows;
    #                                   None = regulation to the origin
    *,
    ode_rows,
    nx: int,
    nu: int,
    N: int,
    ts: float,
    substeps: int,
    limits: tuple | None,  # (lb_u(nu), ub_u(nu)); None = unbounded inputs
    weights: tuple | None = None,  # (Qd(nx), Rd(nu), qn) — static path
    weights_rt: jnp.ndarray | None = None,  # (B, nx+nu+1) traced weights
    state_limits: tuple | None = None,  # (lb_x(nx), ub_x(nx))
    integrator: str = "rk4",  # "rk4" (rk4_fine) | "euler" (reference parking)
    extra_constraints=None,  # callable (xr, ur[, pr]) -> n_extra rows, c <= 0
    n_extra: int = 0,
    extra_deps: str = "xu",  # "x": rows touch states only (halves the basis)
    extra_order: int = 2,  # 2 = exact act·∂²c curvature, 1 = Gauss-Newton
    params: jnp.ndarray | None = None,  # (B, n_params) per-scenario ODE params
    n_params: int = 0,
    input_mode: str = "ode",  # "additive": x⁺ = step(x; exo) + u, B = I
    exo: jnp.ndarray | None = None,  # (B, N, n_exo) per-stage exogenous rows
    n_exo: int = 0,
    input_weights_rt: jnp.ndarray | None = None,  # (B, N, nu) per-stage Rd
    terminal_state_limits: tuple | None = None,  # box AL rows on x_N
    lam_init: jnp.ndarray | None = None,  # (B, N[+1], nc) AL warm start
    outer_iters: int = 6,
    inner_iters: int = 15,
    mu_init: float = 10.0,
    mu_scale: float = 10.0,
    mu_max: float = 1e8,
    viol_tol: float = 1e-4,
    tol: float = 1e-6,
    tile: int = 512,
    interpret: bool | None = None,
) -> BatchedTrackerSolution:
    """Batched AL-iLQR for a user-supplied row-form ODE via the fused Pallas
    kernel; mirrors ``vmap(al_ilqr_solve)`` on the same OCP with per-scenario
    adaptivity. Prefer :func:`make_fused_tracker` for a bound step function
    (stable jit-cache key included).

    ``ode_rows`` / ``extra_constraints`` are static arguments — pass the SAME
    function objects on every call (module-level defs or cached closures) or
    each new identity recompiles the kernel.

    Round-5 generality (VERDICT r4 items 2/3): ``refs=None`` gives regulation
    mode; ``extra_constraints`` adds arbitrary user inequality rows (c ≤ 0)
    with packed-jvp-exact AL derivatives — the obstacle-parking clearances of
    ``session_4/main.py:95-104`` compile through this hook; ``params`` feeds
    per-scenario ODE parameters (the reference's model-mismatch axis); the
    backward pass solves Quu by unrolled Cholesky for ``2 < nu <= 8``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not 1 <= nu <= 8:
        raise NotImplementedError(
            "fused_tracker_solve supports 1 <= nu <= 8 (closed form at "
            "nu <= 2, unrolled Cholesky beyond; wider input spaces would "
            "swamp VMEM with gain rows before the solve is the problem)"
        )
    if extra_constraints is not None and n_extra <= 0:
        raise ValueError("extra_constraints requires n_extra > 0")
    if extra_deps not in ("x", "xu") and not (
        isinstance(extra_deps, tuple)
        and all(isinstance(d, int) and 0 <= d < nx + nu for d in extra_deps)
    ):
        raise ValueError(
            "extra_deps must be 'x', 'xu', or a tuple of z indices "
            "(x rows 0..nx-1, then u rows nx..nx+nu-1)"
        )
    if (params is None) != (n_params == 0):
        raise ValueError("pass params together with n_params > 0")
    if params is not None and n_params != params.shape[-1]:
        raise ValueError("params.shape[-1] must equal n_params")
    if (weights is None) == (weights_rt is None):
        raise ValueError("pass exactly one of weights / weights_rt")
    if input_mode not in ("ode", "additive"):
        raise ValueError("input_mode must be 'ode' or 'additive'")
    if input_mode == "additive":
        if nu != nx:
            raise ValueError("additive input mode requires nu == nx (B = I)")
        if exo is None or n_exo <= 0:
            raise ValueError("additive input mode requires exo / n_exo")
    f32 = jnp.float32
    B = x0s.shape[0]
    track = refs is not None
    has_lam = lam_init is not None
    runtime_weights = weights_rt is not None
    has_rw = input_weights_rt is not None
    nc = (
        (2 * nu if limits is not None else 0)
        + (2 * nx if state_limits is not None else 0)
        + (n_extra if extra_constraints is not None else 0)
    )
    if nc == 0:
        raise ValueError(
            "the AL kernel needs at least one constraint row: pass an input "
            "box (limits), a state box (state_limits), or extra_constraints"
        )
    if terminal_state_limits is not None and nc < 2 * nx:
        raise ValueError(
            "terminal_state_limits rides the lam buffer rows and needs "
            "nc >= 2*nx (add a stage state box)"
        )
    n_lam = N + 1 if terminal_state_limits is not None else N

    Bp = ((B + tile - 1) // tile) * tile
    pad = Bp - B

    def lanes(v, perm):
        v = jnp.transpose(v.astype(f32), perm)
        if pad:
            v = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, pad)])
        return v

    operands = [lanes(x0s, (1, 0)), lanes(u_init, (1, 2, 0))]
    in_specs_extra = []
    spec2 = lambda r: pl.BlockSpec(
        (r, tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    spec3 = lambda a, r: pl.BlockSpec(
        (a, r, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    if track:
        operands.append(lanes(refs, (1, 2, 0)))  # (N+1, nx, B)
        in_specs_extra.append(spec3(N + 1, nx))
    if n_exo:
        operands.append(lanes(exo, (1, 2, 0)))  # (N, n_exo, B)
        in_specs_extra.append(spec3(N, n_exo))
    if n_params:
        operands.append(lanes(params, (1, 0)))  # (n_params, B)
        in_specs_extra.append(spec2(n_params))
    if runtime_weights:
        if weights_rt.shape[-1] != nx + nu + 1:
            raise ValueError("weights_rt must be (B, nx + nu + 1)")
        operands.append(lanes(weights_rt, (1, 0)))  # (nx+nu+1, B)
        in_specs_extra.append(spec2(nx + nu + 1))
    if has_rw:
        operands.append(lanes(input_weights_rt, (1, 2, 0)))  # (N, nu, B)
        in_specs_extra.append(spec3(N, nu))
    if has_lam:
        operands.append(lanes(lam_init, (1, 2, 0)))  # (N[+1], nc, B)
        in_specs_extra.append(spec3(n_lam, nc))

    kernel = functools.partial(
        _tracker_tile_kernel,
        ode_rows=ode_rows,
        nx=nx,
        nu=nu,
        N=N,
        nc=nc,
        ts=float(ts),
        substeps=substeps,
        integrator=integrator,
        limits=limits,
        state_limits=state_limits,
        weights=weights,
        extra_constraints=extra_constraints,
        n_extra=n_extra,
        extra_deps=extra_deps,
        extra_order=extra_order,
        n_params=n_params,
        runtime_weights=runtime_weights,
        input_mode=input_mode,
        n_exo=n_exo,
        has_rw=has_rw,
        terminal_state_limits=terminal_state_limits,
        jac_pattern=(
            # additive mode: A pattern from the ODE's x-dependencies (exo
            # columns play the "input" role in the analysis), B = identity
            (
                step_jacobian_pattern(ode_rows, nx, n_exo, n_params)[0],
                tuple(
                    tuple(k == j for j in range(nu)) for k in range(nx)
                ),
            )
            if input_mode == "additive"
            else step_jacobian_pattern(ode_rows, nx, nu, n_params)
        ),
        outer_iters=outer_iters,
        inner_iters=inner_iters,
        mu_init=float(mu_init),
        mu_scale=float(mu_scale),
        mu_max=float(mu_max),
        viol_tol=float(viol_tol),
        tol=float(tol),
        reg_init=1.0,
        reg_min=1e-8,
        reg_max=1e8,
        track=track,
        has_lam=has_lam,
    )

    grid = (Bp // tile,)

    us_l, xs_l, viol_l, conv_l, lam_l, ni_l = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec2(nx), spec3(N, nu)] + in_specs_extra,
        out_specs=[
            spec3(N, nu), spec3(N + 1, nx), spec2(1), spec2(1),
            spec3(n_lam, nc), spec2(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, nu, Bp), f32),
            jax.ShapeDtypeStruct((N + 1, nx, Bp), f32),
            jax.ShapeDtypeStruct((1, Bp), f32),
            jax.ShapeDtypeStruct((1, Bp), f32),
            jax.ShapeDtypeStruct((n_lam, nc, Bp), f32),
            jax.ShapeDtypeStruct((1, Bp), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N + 1, nx, tile), f32),  # xs_s
            pltpu.VMEM((N, nu, tile), f32),  # us_s
            pltpu.VMEM((N + 1, nx, len(ALPHAS), tile), f32),  # xs_p
            pltpu.VMEM((N, nu, len(ALPHAS), tile), f32),  # us_p
            pltpu.VMEM((N, nu, tile), f32),  # k_s
            pltpu.VMEM((N, nu * nx, tile), f32),  # K_s
            pltpu.VMEM((n_lam, nc, tile), f32),  # lam_s (+ terminal row)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)

    us = jnp.transpose(us_l, (2, 0, 1))[:B]
    xs = jnp.transpose(xs_l, (2, 0, 1))[:B]
    return BatchedTrackerSolution(
        us=us,
        xs=xs,
        viol=viol_l[0, :B],
        converged=conv_l[0, :B] > 0.5,
        lam=jnp.transpose(lam_l, (2, 0, 1))[:B],
        inner_iters_executed=ni_l[0, :B],
    )


def make_fused_tracker(ode_rows, nx: int, nu: int, **config):
    """Bind a row-form ODE + static config into a batched fused solve:

        step = make_fused_tracker(my_ode, nx=6, nu=2, N=15, ts=0.05,
                                  substeps=4, limits=..., weights=...)
        sol = step(x0s, u_init, refs)    # BatchedTrackerSolution
        sol = step(x0s, u_init)          # regulation mode (no reference)

    All keyword ``config`` is forwarded to :func:`fused_tracker_solve`
    statically, so every call through the returned function hits the same
    jit cache entry. Per-call arrays (``params``, ``lam_init``) stay
    call-site keywords.
    """
    return functools.partial(
        fused_tracker_solve, ode_rows=ode_rows, nx=nx, nu=nu, **config
    )
