"""Fused batched AL-iLQR tracking kernel for the 6-state Pacejka bicycle.

Round-4 item 1: the dynamic-tier racing flagship (``parallel/batch.py::
racing_sweep_dynamic``) previously ran on the vmapped-XLA AL-iLQR — the backend
class this repo measured 30-80x slower than its fused kernels (``docs/
ARCHITECTURE.md`` §3). This kernel gives the 6-state dynamic single-track
(Pacejka tire, duty-cycle motor — the parameter surface the reference ships but
never drives, ``session_4/parameters.py:24-43``) the same VMEM-resident
treatment as the 4-state kernel (``ilqr_kernel.py``):

- **batch-in-lanes layout**: every per-stage quantity is a ``(rows, T)`` block;
  all linear algebra is 6x6/2x6/2x2 expanded into static-row FMAs on (1, T)
  slices, vectorized across the T scenarios in lanes.
- **Jacobians by packed jvp, not hand expansion**: where the 4-state kernel
  hand-writes the kinematic-bicycle Jacobians, here a single ``jax.jvp`` call
  evaluates the RK4-substepped Pacejka step on an ``(8, T)`` *basis pack* —
  sublane p carries tangent direction e_p (6 state + 2 input directions) — so
  one pass yields the full exact (6, 8) Jacobian. The pack rides the VPU's
  native 8-sublane tiles, so it costs about one extra dynamics evaluation, and
  the kernel stays correct under any change to the ODE or integrator (jvp is
  exact differentiation of whatever is traced).
- **trajectory buffers in VMEM scratch**; per tile the only HBM traffic is one
  read of (x0, u_warm, reference window) and one write of the solution.
- **per-scenario adaptivity + early exits** identical to the 4-state kernel:
  Levenberg regularization, alpha-grid line search packed into sublanes, AL
  multiplier loop, all (1, T) lanes; f32 masks (Mosaic cannot carry i1 vectors
  through scf.for).

Scope: tracking mode only (the dynamic tier is a lap tracker; references are
required), input-box constraints (nc = 4) — matching the XLA twin
``racing_sweep_dynamic`` solves. The prediction model is RK4 with
``substeps`` Euler-style sub-intervals per MPC interval, identical to
``ops/integrators.py::rk4_fine`` semantics, so the XLA path configured with the
same ``pred_substeps`` is the oracle (tests/test_pallas_ilqr_dyn.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.pytree import pytree_dataclass

NXD = 6  # (p_x, p_y, psi, v_x, v_y, omega)
NU = 2  # (drive a, steer delta)
NZ = NXD + NU  # jvp basis-pack width — exactly the VPU's 8 native sublanes
ALPHAS = (1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.01)

# Mosaic has no `atan` lowering (NotImplementedError: Unimplemented primitive
# atan) — the slip angles and the Pacejka magic formula both need it, so the
# kernel ships a degree-7-in-x² minimax polynomial on [0, 1] with the standard
# |x| > 1 range reduction atan(x) = π/2 − atan(1/x). Max abs error 1.3e-7 —
# f32 resolution; jvp differentiates the polynomial itself, so the kernel's
# Jacobians are exactly consistent with its own dynamics.
_ATAN_C = (
    0.999999995814084, -0.3333282550224926, 0.19981819870035275,
    -0.14085706888559993, 0.10088014678708343, -0.06183738202876349,
    0.02583659568355391, -0.00511410178248912,
)


def _atan(x):
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


@pytree_dataclass
class BatchedDynILQRSolution:
    us: jnp.ndarray  # (B, N, 2)
    xs: jnp.ndarray  # (B, N + 1, 6)
    viol: jnp.ndarray  # (B,)
    converged: jnp.ndarray  # (B,) bool


def _dyn_tile_kernel(
    x0_ref,  # (6, T)
    u0_ref,  # (N, 2, T)
    ref_ref,  # (N + 1, 6, T) tracking reference window
    us_out,  # (N, 2, T)
    xs_out,  # (N + 1, 6, T)
    viol_out,  # (1, T)
    conv_out,  # (1, T)
    xs_s,  # scratch (N + 1, 6, T)
    us_s,  # scratch (N, 2, T)
    xs_c,  # scratch (N + 1, 6, T) line-search candidate
    us_c,  # scratch (N, 2, T)
    k_s,  # scratch (N, 2, T) feedforward gains
    K_s,  # scratch (N, 12, T) feedback gains, row a*6+i
    lam_s,  # scratch (N, nc, T) AL multipliers
    *,
    N: int,
    nc: int,
    ts: float,
    substeps: int,
    model: tuple,  # (lf, lr, m, iz, bf, cf, df, br, cr, dr, cm1, cm2, cr1, cr2)
    limits: tuple,  # (lb_u(2), ub_u(2))
    weights: tuple,  # (Qd(6), Rd(2), qn)
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
):
    f32 = jnp.float32
    T = x0_ref.shape[-1]
    LF, LR, M_, IZ, BF, CF, DF, BR, CR, DR, CM1, CM2, CR1, CR2 = model
    LBU, UBU = limits
    QD, RD, QN = weights

    # ---- dynamics: Pacejka single-track ODE + RK4 substeps -------------------
    # Row-based primitives take per-component arrays of ANY leading shape —
    # (1, T) rollout rows, (A, T) line-search alpha packs, (8, T) jvp basis
    # packs — all broadcast cleanly because everything is elementwise.
    def ode_rows(px, py, psi, vx, vy, om, a, dl):
        """models/bicycle.py::dynamic_bicycle_ode, row form (same math)."""
        eps = 1e-2
        vx_safe = jnp.where(
            vx >= 0.0, jnp.maximum(vx, eps), jnp.minimum(vx, -eps)
        )
        alpha_f = dl - _atan((om * LF + vy) / vx_safe)
        alpha_r = _atan((om * LR - vy) / vx_safe)
        F_f = DF * jnp.sin(CF * _atan(BF * alpha_f))
        F_r = DR * jnp.sin(CR * _atan(BR * alpha_r))
        F_x = (
            (CM1 - CM2 * vx) * a
            - CR2 * vx * jnp.abs(vx)
            - CR1 * jnp.tanh(vx / 0.01)
        )
        sp, cp = jnp.sin(psi), jnp.cos(psi)
        sd, cd = jnp.sin(dl), jnp.cos(dl)
        return (
            vx * cp - vy * sp,
            vx * sp + vy * cp,
            om,
            (F_x - F_f * sd) / M_ + vy * om,
            (F_r + F_f * cd) / M_ - vx * om,
            (F_f * LF * cd - F_r * LR) / IZ,
        )

    H = ts / substeps

    def step_rows(xr, ur):
        """One MPC interval: ``substeps`` classic RK4 steps (rk4_fine)."""
        a, dl = ur
        for _ in range(substeps):
            k1 = ode_rows(*xr, a, dl)
            x2 = tuple(xr[i] + 0.5 * H * k1[i] for i in range(NXD))
            k2 = ode_rows(*x2, a, dl)
            x3 = tuple(xr[i] + 0.5 * H * k2[i] for i in range(NXD))
            k3 = ode_rows(*x3, a, dl)
            x4 = tuple(xr[i] + H * k3[i] for i in range(NXD))
            k4 = ode_rows(*x4, a, dl)
            xr = tuple(
                xr[i]
                + (H / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i])
                for i in range(NXD)
            )
        return xr

    def dyn(x, u):
        """x (6, T), u (2, T) -> x_next (6, T)."""
        xr = step_rows(
            tuple(x[i : i + 1] for i in range(NXD)),
            (u[0:1], u[1:2]),
        )
        return jnp.concatenate(xr)

    # jvp basis pack: sublane p of the (NZ, T) pack carries direction e_p
    # (p < 6: state component p; p >= 6: input component p - 6). Built from
    # iota — non-scalar captured constants are rejected by pallas.
    _bi = jax.lax.broadcasted_iota(jnp.int32, (NZ, 1), 0)

    def _basis(p):
        return (_bi == p).astype(f32)  # (NZ, 1)

    def dyn_jac(x, u):
        """Full exact Jacobian of the RK4-substepped step via one packed jvp.

        Returns (xn (6, T), A[k][i] (1, T) entries, B[k][j] (1, T) entries)."""
        prim = tuple(
            jnp.broadcast_to(x[i : i + 1], (NZ, T)) for i in range(NXD)
        ) + tuple(jnp.broadcast_to(u[j : j + 1], (NZ, T)) for j in range(NU))
        tang = tuple(jnp.broadcast_to(_basis(p), (NZ, T)) for p in range(NZ))
        out_p, out_t = jax.jvp(
            lambda *z: step_rows(z[:NXD], z[NXD:]), prim, tang
        )
        xn = jnp.concatenate([out_p[k][0:1] for k in range(NXD)])
        A = [
            [out_t[k][i : i + 1] for i in range(NXD)] for k in range(NXD)
        ]  # A[k][i] = d x_next_k / d x_i
        B = [
            [out_t[k][NXD + j : NXD + j + 1] for j in range(NU)]
            for k in range(NXD)
        ]
        return xn, A, B

    # ---- cost / constraints ---------------------------------------------------
    # constraint rows (input box only, matching racing_sweep_dynamic's XLA twin):
    #   [u - ub_u (2), lb_u - u (2)]
    def constraint_row_list(ur):
        a, dl = ur
        rows = []
        for j, c in enumerate((a, dl)):
            rows.append(c - UBU[j])
        for j, c in enumerate((a, dl)):
            rows.append(LBU[j] - c)
        return rows

    def constraint_rows(u):
        return jnp.concatenate(constraint_row_list((u[0:1], u[1:2])))

    def ref_rows(t_i):
        rr = ref_ref[t_i]  # (6, T)
        return tuple(rr[i : i + 1] for i in range(NXD))

    def _quad_err(xr, rr):
        return sum(QD[i] * (xr[i] - rr[i]) * (xr[i] - rr[i]) for i in range(NXD))

    def stage_cost_rows(xr, ur, lam, mu, rr):
        rows = constraint_row_list(ur)
        quad = _quad_err(xr, rr) + sum(RD[j] * ur[j] * ur[j] for j in range(NU))
        phi = jnp.zeros_like(quad)
        for r, c in enumerate(rows):
            lam_r = lam[r : r + 1]
            act = jnp.maximum(0.0, lam_r + mu * c)
            phi = phi + (act * act - lam_r * lam_r)
        return quad + phi / (2.0 * mu)

    def stage_cost_value(x, u, lam, mu, t_i):
        return stage_cost_rows(
            tuple(x[i : i + 1] for i in range(NXD)),
            (u[0:1], u[1:2]),
            lam,
            mu,
            ref_rows(t_i),
        )

    def terminal_cost_rows(xr, rr):
        return QN * _quad_err(xr, rr)

    def terminal_cost_value(x):
        return terminal_cost_rows(
            tuple(x[i : i + 1] for i in range(NXD)), ref_rows(N)
        )

    def stage_derivs(x, u, lam, mu, rr):
        """lx (list of 6 (1,T)), lu (2), hxx diag (6), huu diag (2).

        Tracking cost is diagonal and the input-box AL rows touch only lu/huu,
        so all Hessian blocks are diagonal and lux is identically zero."""
        lx = [2.0 * QD[i] * (x[i : i + 1] - rr[i]) for i in range(NXD)]
        lu = [2.0 * RD[j] * u[j : j + 1] for j in range(NU)]
        one = jnp.ones((1, T), f32)
        hxx = [2.0 * QD[i] * one for i in range(NXD)]
        huu = [2.0 * RD[j] * one for j in range(NU)]
        for j in range(NU):
            cu = u[j : j + 1] - UBU[j]
            cl = LBU[j] - u[j : j + 1]
            act_u = jnp.maximum(0.0, lam[j : j + 1] + mu * cu)
            act_l = jnp.maximum(0.0, lam[NU + j : NU + j + 1] + mu * cl)
            lu[j] = lu[j] + act_u - act_l
            ind = (act_u > 0.0).astype(f32) + (act_l > 0.0).astype(f32)
            huu[j] = huu[j] + mu * ind
        return lx, lu, hxx, huu

    # ---- trajectory-wide helpers ---------------------------------------------
    def rollout_into(xs_buf, us_from):
        xs_buf[0] = x0_ref[:]

        def body(t_i, x):
            xn = dyn(x, us_from[t_i])
            xs_buf[t_i + 1] = xn
            return xn

        jax.lax.fori_loop(0, N, body, x0_ref[:])

    def total_cost(xs_buf, us_buf, mu):
        def body(t_i, cost):
            return cost + stage_cost_value(
                xs_buf[t_i], us_buf[t_i], lam_s[t_i], mu, t_i
            )

        cost = jax.lax.fori_loop(0, N, body, jnp.zeros((1, T), f32))
        return cost + terminal_cost_value(xs_buf[N])

    # ---- backward pass --------------------------------------------------------
    def backward(mu, reg):
        """Generic-nx Riccati sweep over stored (xs_s, us_s); writes gains;
        returns (ok (1,T), grad (1,T)). Vxx rides as a (36, T) block, row
        6*i+j."""
        xN = xs_s[N]
        rrN = ref_rows(N)
        Vx = jnp.concatenate(
            [2.0 * QN * QD[i] * (xN[i : i + 1] - rrN[i]) for i in range(NXD)]
        )
        zero = jnp.zeros((1, T), f32)
        Vxx = jnp.concatenate(
            [
                2.0 * QN * QD[i] * jnp.ones((1, T), f32) if i == j else zero
                for i in range(NXD)
                for j in range(NXD)
            ]
        )

        def body(s, carry):
            Vx, Vxx, ok, grad = carry
            t_i = N - 1 - s
            x = xs_s[t_i]
            u = us_s[t_i]
            _, A, B = dyn_jac(x, u)
            lx, lu, hxx, huu = stage_derivs(x, u, lam_s[t_i], mu, ref_rows(t_i))

            def V(i, j):
                return Vxx[NXD * i + j : NXD * i + j + 1]

            Vxr = [Vx[i : i + 1] for i in range(NXD)]
            # Qx = lx + A^T Vx ;  Qu = lu + B^T Vx
            Qx = [
                lx[i] + sum(A[k][i] * Vxr[k] for k in range(NXD))
                for i in range(NXD)
            ]
            Qu = [
                lu[j] + sum(B[k][j] * Vxr[k] for k in range(NXD))
                for j in range(NU)
            ]
            # M = Vxx A  (dense 6x6)
            M = [
                [sum(V(i, k) * A[k][j] for k in range(NXD)) for j in range(NXD)]
                for i in range(NXD)
            ]
            # Qxx = lxx + A^T M (lxx diagonal), symmetrized
            Qxx = [[None] * NXD for _ in range(NXD)]
            for i in range(NXD):
                for j in range(i, NXD):
                    vij = sum(A[k][i] * M[k][j] for k in range(NXD))
                    vji = sum(A[k][j] * M[k][i] for k in range(NXD))
                    sym = 0.5 * (vij + vji)
                    Qxx[i][j] = sym + (hxx[i] if i == j else 0.0)
                    Qxx[j][i] = Qxx[i][j]
            # VB[k][b] = (Vxx B)[k][b] ;  Quu = luu + B^T Vxx B (2x2)
            VB = [
                [sum(V(k, m) * B[m][b] for m in range(NXD)) for b in range(NU)]
                for k in range(NXD)
            ]
            q00 = huu[0] + sum(B[k][0] * VB[k][0] for k in range(NXD))
            q01 = sum(B[k][0] * VB[k][1] for k in range(NXD))
            q11 = huu[1] + sum(B[k][1] * VB[k][1] for k in range(NXD))
            # Qux = B^T M  (2 x 6); lux = 0 (separable cost, input-only rows)
            Qux0 = [sum(B[k][0] * M[k][j] for k in range(NXD)) for j in range(NXD)]
            Qux1 = [sum(B[k][1] * M[k][j] for k in range(NXD)) for j in range(NXD)]
            # regularized 2x2 solve (closed form); f32 ok-mask (no i1 vectors)
            q00r = q00 + reg
            q11r = q11 + reg
            det = q00r * q11r - q01 * q01
            ok_t = ((q00r > 0.0) & (det > 0.0)).astype(f32)
            det_safe = jnp.where(det > 0.0, det, jnp.ones_like(det))
            i00 = q11r / det_safe
            i11 = q00r / det_safe
            i01 = -q01 / det_safe
            k0 = -(i00 * Qu[0] + i01 * Qu[1])
            k1 = -(i01 * Qu[0] + i11 * Qu[1])
            K0 = [-(i00 * Qux0[j] + i01 * Qux1[j]) for j in range(NXD)]
            K1 = [-(i01 * Qux0[j] + i11 * Qux1[j]) for j in range(NXD)]
            # Vx' = Qx + K^T (Quu k + Qu) + Qux^T k  (UNregularized Quu)
            g0 = q00 * k0 + q01 * k1 + Qu[0]
            g1 = q01 * k0 + q11 * k1 + Qu[1]
            Vx_n = jnp.concatenate(
                [
                    Qx[j] + K0[j] * g0 + K1[j] * g1 + Qux0[j] * k0 + Qux1[j] * k1
                    for j in range(NXD)
                ]
            )
            # Vxx' = Qxx + K^T Quu K + K^T Qux + Qux^T K (symmetric by constr.)
            KQ0 = [q00 * K0[j] + q01 * K1[j] for j in range(NXD)]
            KQ1 = [q01 * K0[j] + q11 * K1[j] for j in range(NXD)]
            rows = []
            for i in range(NXD):
                for j in range(NXD):
                    rows.append(
                        Qxx[i][j]
                        + K0[i] * KQ0[j]
                        + K1[i] * KQ1[j]
                        + K0[i] * Qux0[j]
                        + K1[i] * Qux1[j]
                        + Qux0[i] * K0[j]
                        + Qux1[i] * K1[j]
                    )
            Vxx_n = jnp.concatenate(rows)
            k_s[t_i] = jnp.concatenate([k0, k1])
            K_s[t_i] = jnp.concatenate(K0 + K1)
            grad_n = jnp.maximum(
                grad, jnp.maximum(jnp.abs(Qu[0]), jnp.abs(Qu[1]))
            )
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
        packed into the sublane dim as (A, T) component blocks."""

        def body(t_i, carry):
            xr = carry[:NXD]
            cost = carry[NXD]
            xh = xs_s[t_i]
            uh = us_s[t_i]
            kg = k_s[t_i]
            Kg = K_s[t_i]
            dx = tuple(xr[i] - xh[i : i + 1] for i in range(NXD))
            du0 = alpha_col * kg[0:1] + sum(
                Kg[j : j + 1] * dx[j] for j in range(NXD)
            )
            du1 = alpha_col * kg[1:2] + sum(
                Kg[NXD + j : NXD + j + 1] * dx[j] for j in range(NXD)
            )
            ur = (uh[0:1] + du0, uh[1:2] + du1)
            cost = cost + stage_cost_rows(xr, ur, lam_s[t_i], mu, ref_rows(t_i))
            xr = step_rows(xr, ur)
            return xr + (cost,)

        x0 = x0_ref[:]
        init = tuple(
            jnp.broadcast_to(x0[i : i + 1], (A_LS, T)) for i in range(NXD)
        ) + (jnp.zeros((A_LS, T), f32),)
        out = jax.lax.fori_loop(0, N, body, init)
        return out[NXD] + terminal_cost_rows(out[:NXD], ref_rows(N))

    def forward_store(alpha):
        """Rollout at per-scenario alpha (1, T); stores into xs_c/us_c."""
        xs_c[0] = x0_ref[:]

        def body(t_i, x):
            xh = xs_s[t_i]
            uh = us_s[t_i]
            kg = k_s[t_i]
            Kg = K_s[t_i]
            dx = x - xh
            du0 = alpha * kg[0:1] + sum(
                Kg[j : j + 1] * dx[j : j + 1] for j in range(NXD)
            )
            du1 = alpha * kg[1:2] + sum(
                Kg[NXD + j : NXD + j + 1] * dx[j : j + 1] for j in range(NXD)
            )
            u = jnp.concatenate([uh[0:1] + du0, uh[1:2] + du1])
            us_c[t_i] = u
            xn = dyn(x, u)
            xs_c[t_i + 1] = xn
            return xn

        jax.lax.fori_loop(0, N, body, x0_ref[:])

    def blend_candidate(mask):
        def body(t_i, _):
            us_s[t_i] = jnp.where(mask > 0.0, us_c[t_i], us_s[t_i])
            xs_s[t_i] = jnp.where(mask > 0.0, xs_c[t_i], xs_s[t_i])
            return 0

        jax.lax.fori_loop(0, N, body, 0)
        xs_s[N] = jnp.where(mask > 0.0, xs_c[N], xs_s[N])

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
            alpha_eff = jnp.where(
                improved, best_alpha, jnp.zeros_like(best_alpha)
            )
            forward_store(alpha_eff)
            blend_candidate(improved.astype(f32))
            cost_n = jnp.where(improved, best_cost, cost)
            reg_n = jnp.where(
                improved,
                jnp.maximum(reg * 0.5, reg_min),
                jnp.minimum(reg * 10.0, reg_max),
            )
            return i + 1, cost_n, reg_n, grad

        reg0 = jnp.full((1, T), reg_init, f32)
        grad0 = jnp.full((1, T), jnp.inf, f32)
        _, _, _, grad = jax.lax.while_loop(
            cond, body, (jnp.int32(0), cost0, reg0, grad0)
        )
        return grad

    # ---- outer AL loop ----------------------------------------------------------
    def al_cond(carry):
        oi, _mu, viol, lam_step = carry
        solved = jnp.all((viol < viol_tol) & (lam_step < 1e-3))
        return jnp.logical_and(oi < outer_iters, jnp.logical_not(solved))

    def al_body(carry):
        oi, mu, _viol, _lam_step = carry
        _ = ilqr(mu)

        def body(t_i, carry2):
            viol, step, lmax = carry2
            c_rows = constraint_rows(us_s[t_i])
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
        lam_step = step / (1.0 + lmax)
        mu_n = jnp.where(viol > viol_tol, jnp.minimum(mu * mu_scale, mu_max), mu)
        return oi + 1, mu_n, viol, lam_step

    # ---- init + run ---------------------------------------------------------------
    def init_body(t_i, _):
        us_s[t_i] = u0_ref[t_i]
        lam_s[t_i] = jnp.zeros((nc, T), f32)
        return 0

    jax.lax.fori_loop(0, N, init_body, 0)
    rollout_into(xs_s, us_s)

    mu0 = jnp.full((1, T), mu_init, f32)
    inf = jnp.full((1, T), jnp.inf, f32)
    _, _, viol, _ = jax.lax.while_loop(
        al_cond, al_body, (jnp.int32(0), mu0, inf, inf)
    )

    def out_body(t_i, _):
        us_out[t_i] = us_s[t_i]
        xs_out[t_i] = xs_s[t_i]
        return 0

    jax.lax.fori_loop(0, N, out_body, 0)
    xs_out[N] = xs_s[N]
    viol_out[:] = viol
    conv_out[:] = (viol < viol_tol).astype(f32)


def model_tuple(params) -> tuple:
    """Static Pacejka/motor parameter tuple for the kernel, from
    ``VehicleParameters`` (reference constants at ``session_4/parameters.py:24-43``)."""
    return tuple(
        float(getattr(params, f))
        for f in (
            "axis_front", "axis_rear", "mass", "inertia",
            "bf", "cf", "df", "br", "cr", "dr",
            "cm1", "cm2", "cr1", "cr2",
        )
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "N", "ts", "substeps", "model", "limits", "weights",
        "outer_iters", "inner_iters", "tile",
        "mu_init", "mu_scale", "mu_max", "viol_tol", "tol", "interpret",
    ),
)
def al_ilqr_dyn_solve_pallas(
    x0s: jnp.ndarray,  # (B, 6)
    u_init: jnp.ndarray,  # (B, N, 2)
    refs: jnp.ndarray,  # (B, N + 1, 6) tracking reference windows
    *,
    N: int,
    ts: float,
    substeps: int,
    model: tuple,  # model_tuple(params)
    limits: tuple,  # (lb_u(2), ub_u(2))
    weights: tuple,  # (Qd(6), Rd(2), qn)
    outer_iters: int = 6,
    inner_iters: int = 15,
    mu_init: float = 10.0,
    mu_scale: float = 10.0,
    mu_max: float = 1e8,
    viol_tol: float = 1e-4,
    tol: float = 1e-6,
    tile: int = 512,
    interpret: bool | None = None,
) -> BatchedDynILQRSolution:
    """Batched 6-state Pacejka tracking AL-iLQR via the fused Pallas kernel;
    mirrors ``vmap(al_ilqr_solve)`` on the dynamic lap-tracking OCP
    (``racing_sweep_dynamic`` semantics) with per-scenario adaptivity."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    f32 = jnp.float32
    B = x0s.shape[0]
    nc = 2 * NU

    Bp = ((B + tile - 1) // tile) * tile
    pad = Bp - B
    x0_l = jnp.transpose(x0s.astype(f32))  # (6, B)
    u0_l = jnp.transpose(u_init.astype(f32), (1, 2, 0))  # (N, 2, B)
    ref_l = jnp.transpose(refs.astype(f32), (1, 2, 0))  # (N+1, 6, B)
    if pad:
        x0_l = jnp.pad(x0_l, ((0, 0), (0, pad)))
        u0_l = jnp.pad(u0_l, ((0, 0), (0, 0), (0, pad)))
        ref_l = jnp.pad(ref_l, ((0, 0), (0, 0), (0, pad)))

    kernel = functools.partial(
        _dyn_tile_kernel,
        N=N,
        nc=nc,
        ts=float(ts),
        substeps=substeps,
        model=model,
        limits=limits,
        weights=weights,
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
    )

    grid = (Bp // tile,)
    spec2 = lambda r: pl.BlockSpec(
        (r, tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    spec3 = lambda a, r: pl.BlockSpec(
        (a, r, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )

    us_l, xs_l, viol_l, conv_l = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec2(NXD), spec3(N, NU), spec3(N + 1, NXD)],
        out_specs=[spec3(N, NU), spec3(N + 1, NXD), spec2(1), spec2(1)],
        out_shape=[
            jax.ShapeDtypeStruct((N, NU, Bp), f32),
            jax.ShapeDtypeStruct((N + 1, NXD, Bp), f32),
            jax.ShapeDtypeStruct((1, Bp), f32),
            jax.ShapeDtypeStruct((1, Bp), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N + 1, NXD, tile), f32),  # xs_s
            pltpu.VMEM((N, NU, tile), f32),  # us_s
            pltpu.VMEM((N + 1, NXD, tile), f32),  # xs_c
            pltpu.VMEM((N, NU, tile), f32),  # us_c
            pltpu.VMEM((N, NU, tile), f32),  # k_s
            pltpu.VMEM((N, NU * NXD, tile), f32),  # K_s
            pltpu.VMEM((N, nc, tile), f32),  # lam_s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x0_l, u0_l, ref_l)

    us = jnp.transpose(us_l, (2, 0, 1))[:B]
    xs = jnp.transpose(xs_l, (2, 0, 1))[:B]
    return BatchedDynILQRSolution(
        us=us, xs=xs, viol=viol_l[0, :B], converged=conv_l[0, :B] > 0.5
    )
