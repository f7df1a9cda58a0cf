"""Fused batched ADMM kernel (Pallas/Mosaic) — the engine's hot solver path.

Motivation (measured): the XLA ADMM path executes each iteration as a handful of
small kernels over (B, m)/(B, n) tensors — per-iteration HBM round-trips plus
dispatch overhead dominate at MPC sizes (n=20, m=60), leaving the chip >100x under
its bandwidth bound. This kernel runs the ENTIRE fixed-iteration ADMM solve for a
tile of scenarios with all iterate state resident in VMEM: per tile, HBM traffic is
one read of (q, l, u, warm) and one write of (x, z, y) — independent of the
iteration count.

Design:
- grid over scenario tiles (``tile`` scenarios per program); shared operator data
  (A_s, P_s, ρ-ladder KKT inverses) broadcast to every program;
- batch-in-sublanes layout with fused iterations: the ADMM update is affine in
  G = [x | ρz − y], so each iteration is ONE (tile, n+m) @ (n+m, n+m) MXU op
  against a per-ρ-level matrix W (4 padded MXU tiles vs 12 for the three-matmul
  form), run as a manual 3-pass bf16 split (`_dot3`, ~1e-6 relative);
- ρ adaptation per tile between chunks (the XLA path adapts per scenario; within a
  warm-started closed loop tiles behave homogeneously, and a shared ρ keeps the
  KKT-inverse select a cheap one-hot contraction instead of a per-row gather);
- residual/convergence/polish matmuls stay Precision.HIGHEST — they gate exits
  and the success mask right at the tolerance threshold;
- in-kernel CG active-set polish with an early exit on its own residual: it
  runs unconditionally (a convergence-gated variant was ~15% faster but let
  converged tiles drift from the always-polished per-scenario XLA path), and
  its accept test reuses the final chunk's residual products; final residuals
  in the XLA wrapper.

The public wrapper :func:`admm_solve_pallas` mirrors ``vmap(admm_solve)`` and falls
back to interpreter mode off-TPU (tests run it on CPU via ``interpret=True``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...solvers.qp import QPOperator, QPSolution, _unscaled_residuals
from ...utils.precision import solver_precision

# In-kernel matmuls must not fall back to single-pass bf16 on the MXU: solver
# accuracy collapses (measured: closed-loop success 0.44 vs 0.98 in interpret
# mode). HIGHEST = full f32 via multi-pass (6 bf16 MXU passes).
_DOT = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
# DEFAULT precision for pre-split bf16 operands (single MXU pass each). The
# solver_precision context pins HIGHEST globally, which Mosaic rejects for
# bf16 operands — so it must be explicit here.
_DOT_BF16 = dict(
    preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT
)


def _split_bf16(a):
    """Split f32 into (hi, lo) bf16 parts with hi + lo ≈ a (error ~2⁻²²·|a|)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, b_split):
    """3-pass f32-emulated matmul: a @ B with B pre-split by :func:`_split_bf16`.

    Drops the lo·lo term (≲2⁻⁴⁴ relative) — ~1e-6 relative error against the
    solver's 1e-4 tolerance, at HALF the MXU passes of ``Precision.HIGHEST``
    (Mosaic has no ``Precision.HIGH`` lowering, so the split is manual).
    3 passes is also the measured MINIMUM: a 2-pass variant (drop a_lo·b_hi,
    ~2⁻⁸ relative) collapses headline success to 0.635 AND is slower (9.08M
    vs 10.2M — unconverged solves stop exiting early); single-pass bf16 was
    0.44 (round 1).
    """
    b_hi, b_lo = b_split
    a_hi, a_lo = _split_bf16(a)
    return jnp.dot(a_hi, b_hi, **_DOT_BF16) + (
        jnp.dot(a_hi, b_lo, **_DOT_BF16) + jnp.dot(a_lo, b_hi, **_DOT_BF16)
    )


def _admm_tile_kernel(
    # shared operator blocks
    W_ref,  # (R, n+m, n+m) fused iteration matrix per ρ level (see below)
    Wq_ref,  # (R, n, n+m) constant q-term matrix per ρ level
    A_ref,  # (m, n)
    At_ref,  # (n, m)
    P_ref,  # (n, n)
    Pinv_ref,  # (n, n) inv(P_s)
    S_ref,  # (m, m) A_s inv(P_s) A_sᵀ
    rho_ref,  # (R, 1)
    Einv_ref,  # (1, m) 1/E — unscale constraint rows
    Dcinv_ref,  # (1, n) 1/(c·D) — unscale stationarity rows
    # per-tile scenario blocks
    q_ref,  # (T, n)
    l_ref,  # (T, m)
    u_ref,  # (T, m)
    x0_ref,  # (T, n)
    y0_ref,  # (T, m)
    # outputs
    x_out,  # (T, n)
    z_out,  # (T, m)
    y_out,  # (T, m)
    ni_out,  # (T, 1) executed ADMM iterations (tile-wide; early-exit aware)
    *,
    iters: int,
    chunks: int,
    probe_iters: int,
    max_rho_moves: int,
    schedule: str,
    n_levels: int,
    init_idx: int,
    cg_polish: bool,
    cg_iters: int,
    eps_abs: float,
    alpha: float,
):
    f32 = jnp.float32
    q = q_ref[:]
    l = l_ref[:]
    u = u_ref[:]
    A = A_ref[:]
    At = At_ref[:]  # transpose precomputed host-side (in-kernel transpose of
    # non-128-aligned tiles hits Mosaic 'Offset change')
    P = P_ref[:]
    rho2 = rho_ref[:]  # (R, 1) — keep 2D throughout for Mosaic
    n = q.shape[1]
    m = l.shape[1]
    T = q.shape[0]

    Einv = Einv_ref[:]
    Dcinv = Dcinv_ref[:]
    # Per-scenario unscaled cost scale (T, 1): `finish` judges each scenario
    # against its OWN 1 + max|q_u|, so the exit test below uses row-wise
    # residual/scale ratios — exact, with no tile-granularity conservatism
    # (a tile-max scale leaks failures for small-|q| scenarios; a tile-min
    # scale throttles exits to 2.1M solves/s, both measured).
    scale_u = 1.0 + jnp.max(jnp.abs(q) * Dcinv, axis=1, keepdims=True)

    # Fused concatenated-lane formulation. The ADMM update is affine in
    # G = [x | ρz − y]: with W's row blocks [σM⁻¹ | σM⁻¹Aᵀ ; AM⁻¹ | AM⁻¹Aᵀ]
    # and the constant q-term XZq = q·[−M⁻¹ | −M⁻¹Aᵀ], one (T, n+m)@(n+m, n+m)
    # MXU op yields [x̃ | z̃] per iteration where the separate-buffer kernel
    # needed three (12 padded MXU tiles vs 4 — measured 2.0x wall time at the
    # headline config). Relaxation, clip, and the dual update act uniformly on
    # the concatenated lanes: the x-lanes carry bounds ±1e19 (never clip) and
    # a zero dual that provably stays zero.
    x = x0_ref[:]
    y0 = y0_ref[:]
    z0 = jnp.clip(jnp.dot(x, At, **_DOT), l, u)
    C = jnp.concatenate([x, z0], axis=1)  # (T, n+m) primal [x | z]
    Y = jnp.concatenate([jnp.zeros((T, n), f32), y0], axis=1)  # dual [0 | y]
    big = jnp.float32(1e19)
    Lc = jnp.concatenate([jnp.full((T, n), -big, f32), l], axis=1)
    Uc = jnp.concatenate([jnp.full((T, n), big, f32), u], axis=1)
    # lane scale S: x-lanes get 1/ρ so G's x block is exactly x (ρx/ρ)
    lane_is_x = (
        jax.lax.broadcasted_iota(jnp.int32, (1, n + m), 1) < n
    ).astype(f32)

    level_iota2 = jax.lax.broadcasted_iota(jnp.int32, (n_levels, 1), 0)

    def select_level(idx):
        onehot2 = (level_iota2 == idx).astype(f32)  # (R, 1)
        # one-hot contraction as multiply+reduce — Mosaic cannot lower an
        # einsum with a leading shared contraction dim ("r,rij->ij")
        W = jnp.sum(onehot2[:, :, None] * W_ref[:], axis=0)
        Wq = jnp.sum(onehot2[:, :, None] * Wq_ref[:], axis=0)
        rho = jnp.sum(onehot2 * rho2)
        return W, Wq, rho

    # Chunk schedule: an optional short "exit probe" chunk first (warm-started
    # closed-loop solves typically sit at the fixed point and can exit after a
    # dozen iterations — waiting iters/chunks for the first convergence check
    # wastes most of the budget), then either uniform chunks covering the rest
    # ("uniform") or geometrically growing ones ("geometric"). The geometric
    # schedule decouples the exit granularity from the iteration cap: exit
    # checks come every few iterations right after the probe — where most
    # warm-started tiles converge — and stretch out toward the cap, so a deep
    # straggler budget (400+) costs converged tiles nothing. Measured at the
    # headline config: uniform 200/8 chunks = 0.857 s, geometric 400-cap =
    # comparable success at baseline-like wall. The probe chunk never adapts
    # ρ: adapting after so few iterations acts on transient residual ratios
    # and measurably costs success rate.
    probe = max(0, min(probe_iters, iters))
    rem = iters - probe
    if schedule == "geometric":
        lens = []
        nxt = 8.0
        while rem > 0:
            step = min(rem, max(1, int(nxt)))
            lens.append(step)
            rem -= step
            nxt *= 1.6
        chunk_lens = tuple(lens)
        n_chunks = (1 if probe else 0) + len(chunk_lens)
    else:
        # never exceed the caller's iteration budget: with iters <= probe_iters
        # the probe IS the whole budget and no uniform chunks run
        chunk_len = max(1, rem // chunks) if rem > 0 else 0
        chunk_lens = tuple(chunk_len for _ in range(chunks)) if rem > 0 else ()
        n_chunks = (1 if probe else 0) + (chunks if rem > 0 else 0)
    # per-chunk lengths selected by a scalar where-chain over static ints
    # (a jnp table would be a captured constant, which pallas_call rejects;
    # dynamic scalar indexing is fragile in Mosaic anyway)
    all_lens = ((probe,) if probe else ()) + chunk_lens

    def chunk_body(state):
        C, Y, idx, ci, moves, _conv, _Ax, _Px, _Aty = state
        is_probe = jnp.logical_and(ci == 0, jnp.int32(1 if probe else 0) > 0)
        this_len = jnp.int32(all_lens[-1] if all_lens else 0)
        for _j, _L in enumerate(all_lens[:-1]):
            this_len = jnp.where(ci == _j, jnp.int32(_L), this_len)
        W, Wq, rho = select_level(idx)
        W3 = _split_bf16(W)
        # exact: error here is a constant bias shifting the fixed point
        XZq = jnp.dot(q, Wq, **_DOT)  # (T, n+m), constant over the chunk
        inv_rho = 1.0 / rho
        S_lane = jnp.where(lane_is_x > 0.5, inv_rho, 1.0)

        def iter_body(_, carry):
            C, Y, G = carry
            XZ = _dot3(G, W3) + XZq
            T_ = alpha * XZ + (1.0 - alpha) * C
            Cn = jnp.clip(T_ + inv_rho * Y, Lc, Uc)
            Yn = Y + rho * (T_ - Cn)
            Gn = (rho * Cn - Yn) * S_lane
            return Cn, Yn, Gn

        G0 = (rho * C - Y) * S_lane
        C, Y, _ = jax.lax.fori_loop(0, this_len, iter_body, (C, Y, G0))
        x = C[:, :n]
        z = C[:, n:]
        y = Y[:, n:]

        # per-tile rho adaptation (OSQP-style normalized residual ratio)
        # residuals gate the early exit right at the tolerance threshold —
        # bf16x3 noise there measurably leaks failures (success 0.99 -> 0.89),
        # so these stay full-precision (once per chunk, not hot)
        Ax = jnp.dot(x, At, **_DOT)
        Px = jnp.dot(x, P, **_DOT)
        Aty = jnp.dot(y, A, **_DOT)
        rp = jnp.max(jnp.abs(Ax - z))
        rd = jnp.max(jnp.abs(Px + q + Aty))
        rp_rel = rp / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z))), 1e-10
        )
        rd_rel = rd / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))),
            jnp.maximum(jnp.max(jnp.abs(q)), 1e-10),
        )
        rho_now = rho
        target = rho_now * jnp.sqrt(rp_rel / jnp.maximum(rd_rel, 1e-16))
        # manual 2D argmin (1D argmin lowering is fragile in Mosaic)
        diff2 = jnp.abs(jnp.log(rho2) - jnp.log(jnp.maximum(target, 1e-12)))
        is_min = diff2 <= jnp.min(diff2)
        big_i = jnp.int32(n_levels)
        cand = jnp.min(jnp.where(is_min, level_iota2, big_i)).astype(jnp.int32)
        # Hysteresis (OSQP adaptive_rho_tolerance): only move on a >5x target
        # ratio, never once converged — re-adapting ρ on a warm-started,
        # already-converged tile kicks the iterate off the fixed point.
        # Early-exit/hysteresis test in UNSCALED space, exactly mirroring the
        # wrapper's `finish` criterion but with the tile max (conservative: a
        # tile exits only when every scenario in it has converged; polish can
        # only improve). A scaled-space test here measurably over- or
        # under-exits (success 0.990 → 0.980 at margin 1.0).
        rp_u = jnp.max(jnp.abs(Ax - z) * Einv, axis=1, keepdims=True)
        rd_u = jnp.max(jnp.abs(Px + q + Aty) * Dcinv, axis=1, keepdims=True)
        conv = jnp.all(
            jnp.logical_and(
                rp_u < eps_abs * scale_u, rd_u < eps_abs * scale_u
            )
        )
        move = jnp.logical_or(target > 5.0 * rho_now, 5.0 * target < rho_now)
        move = jnp.logical_and(move, jnp.logical_not(is_probe))
        # cap the number of ρ moves per solve: with fine chunk schedules the
        # early-exit checks come often, and letting every boundary re-adapt ρ
        # measurably HURTS success (400 iters / 8 chunks: 0.9876 uncapped vs
        # 0.9995+ capped — each move discards dual-scale progress and the
        # target oscillates). Exit granularity and adaptation frequency are
        # separate knobs.
        move = jnp.logical_and(move, moves < jnp.int32(max_rho_moves))
        do_move = jnp.logical_and(move, jnp.logical_not(conv))
        new_idx = jnp.where(do_move, cand, idx)
        new_moves = moves + do_move.astype(jnp.int32)
        return C, Y, new_idx, ci + 1, new_moves, conv, Ax, Px, Aty

    # Early exit per tile: warm-started closed-loop solves typically converge
    # in a fraction of the iteration budget, and the residuals needed for the
    # test are already computed for ρ adaptation. The while_loop stops a tile's
    # iterations once its (scaled) residuals meet tolerance — worth ~2x wall
    # time at the headline config with identical success rates.
    def not_done(state):
        _C, _Y, _idx, ci, _moves, conv, *_ = state
        return jnp.logical_and(ci < n_chunks, jnp.logical_not(conv))

    # the trailing (Ax, Px, Aty) carry the final chunk's residual products out
    # of the loop so the polish can reuse them for its res0 baseline (zeros are
    # placeholders: the loop always runs >= 1 chunk)
    state = (
        C, Y, jnp.int32(init_idx), jnp.int32(0), jnp.int32(0), jnp.asarray(False),
        jnp.zeros((T, m), f32), jnp.zeros((T, n), f32), jnp.zeros((T, n), f32),
    )
    state = jax.lax.while_loop(not_done, chunk_body, state)
    C, Y, _, ci_f, _, _conv_final, Ax_f, Px_f, Aty_f = state
    # delivered-work accounting (round 4, measured roofline): the executed
    # iteration count is the prefix sum of the static chunk schedule up to the
    # exit chunk — written per tile so bench.py can report delivered-FLOPs MFU
    # next to the full-budget number
    executed = jnp.float32(0.0)
    for k, L in enumerate(all_lens):
        executed = executed + jnp.where(ci_f > k, jnp.float32(L), 0.0)
    ni_out[:] = jnp.full(ni_out.shape, 1.0, f32) * executed
    x = C[:, :n]
    z = C[:, n:]
    y = Y[:, n:]

    def polish_branch(ops):
        x, z, y = ops
        # Matrix-free active-set polish in scaled space. Eliminating x from the
        # equality-KKT system on the detected active set gives the Schur system
        #   M ν = −d∘(b + A P⁻¹ q),  M v = d∘(S (d∘v)) + (1−d)∘v
        # with shared S = A P⁻¹ Aᵀ — solved per scenario by fixed-iteration CG
        # (M is SPD). No per-scenario factorization: every op is a batched
        # matmul or elementwise mask, so the polish runs at ADMM-iteration cost
        # instead of a batched 80×80 LU (which dominated the step time ~50x).
        Pinv = Pinv_ref[:]
        Sm = S_ref[:]
        big_b = jnp.float32(1e19)
        ytol = 1e-6 * jnp.maximum(
            jnp.max(jnp.abs(y), axis=1, keepdims=True), 1e-6
        )
        low = (y < -ytol) & (l > -big_b)
        up = (y > ytol) & (u < big_b)
        d = (low | up).astype(f32)
        b = jnp.where(low, l, jnp.where(up, u, jnp.zeros_like(u)))

        Pinv_q = jnp.dot(q, Pinv, **_DOT)  # (T, n)
        APq = jnp.dot(Pinv_q, At, **_DOT)  # (T, m)
        rhs = -d * (b + APq)

        def Mv(v):
            Sv = jnp.dot(d * v, Sm, **_DOT)
            return d * Sv + (1.0 - d) * v

        def rowsum(a):
            return jnp.sum(a, axis=1, keepdims=True)

        # CG with early exit on its own (already-computed) residual: cold
        # solves with large active sets run the full depth, warm solves with
        # small active sets exit in a handful of iterations — a fixed shallow
        # depth (cg_iters=16) under-converges cold solves (measured: dual
        # residual 8e-4 vs 4e-5, convergence flags lost), a fixed deep depth
        # costs the hot path ~20% wall time.
        rs0 = rowsum(rhs * rhs)

        def cg_cond(carry):
            i, _nu, _r, _p, rs = carry
            not_solved = jnp.max(rs / jnp.maximum(rs0, 1e-30)) > 1e-12
            return jnp.logical_and(i < cg_iters, not_solved)

        def cg_body(carry):
            i, nu, r, pvec, rs = carry
            Mp = Mv(pvec)
            a_cg = rs / jnp.maximum(rowsum(pvec * Mp), 1e-30)
            nu = nu + a_cg * pvec
            r = r - a_cg * Mp
            rs_new = rowsum(r * r)
            beta = rs_new / jnp.maximum(rs, 1e-30)
            pvec = r + beta * pvec
            return i + 1, nu, r, pvec, rs_new

        nu0 = jnp.zeros_like(rhs)
        _, nu, _, _, _ = jax.lax.while_loop(
            cg_cond, cg_body, (jnp.int32(0), nu0, rhs, rhs, rs0)
        )

        y_p = d * nu
        x_p = -jnp.dot(q + jnp.dot(y_p, A, **_DOT), Pinv, **_DOT)
        Az_p = jnp.dot(x_p, At, **_DOT)  # reused for z_p AND the finite test
        z_p = jnp.clip(Az_p, l, u)

        def rowmax(a):
            return jnp.max(a, axis=1, keepdims=True)

        def res_from(Axx, Pxx, Atyy, zz):
            rp = rowmax(jnp.abs(Axx - zz))
            rd = rowmax(jnp.abs(Pxx + q + Atyy))
            return jnp.maximum(rp, rd)

        # res0 reuses the final chunk's products (same x, z, y by construction)
        res0 = res_from(Ax_f, Px_f, Aty_f, z)
        res1 = res_from(
            Az_p, jnp.dot(x_p, P, **_DOT), jnp.dot(y_p, A, **_DOT), z_p
        )
        stol = 1e-7
        sign_bad = rowmax(
            jnp.where(low & (y_p > stol), 1.0, 0.0)
            + jnp.where(up & (y_p < -stol), 1.0, 0.0)
        )
        finite = rowmax(jnp.where(jnp.isfinite(Az_p), 0.0, 1.0))
        accept = (res1 < res0) & (sign_bad < 0.5) & (finite < 0.5)
        x = jnp.where(accept, x_p, x)
        z = jnp.where(accept, z_p, z)
        y = jnp.where(accept, y_p, y)
        return x, z, y

    if cg_polish:
        x, z, y = polish_branch((x, z, y))

    x_out[:] = x
    z_out[:] = z
    y_out[:] = y


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "chunks", "probe_iters", "max_rho_moves", "schedule", "tile", "interpret", "polish",
        "cg_iters", "eps_abs", "alpha", "return_iters"
    ),
)
@solver_precision
def admm_solve_pallas(
    op: QPOperator,
    q: jnp.ndarray,  # (B, n)
    l: jnp.ndarray,  # (B, m)
    u: jnp.ndarray,  # (B, m)
    warm_x: jnp.ndarray | None = None,  # (B, n) unscaled
    warm_y: jnp.ndarray | None = None,  # (B, m) unscaled
    iters: int = 100,
    chunks: int = 2,
    probe_iters: int = 32,
    max_rho_moves: int | None = None,
    schedule: str = "uniform",
    tile: int = 256,
    cg_iters: int = 40,
    alpha: float = 1.6,
    eps_abs: float | None = None,
    polish: bool = True,
    return_iters: bool = False,
    interpret: bool | None = None,
) -> QPSolution:
    """Batched ADMM via the fused Pallas kernel; same semantics as
    ``vmap(admm_solve)`` with per-tile (not per-scenario) ρ adaptation.

    ``interpret=None`` auto-selects: compiled on TPU, interpreter elsewhere (CPU
    tests exercise the same kernel code path).

    ``return_iters=True`` additionally returns the per-scenario EXECUTED
    ADMM iteration count (tile-granular — every scenario in a tile reports
    the tile's count; early exits make it < ``iters``): the delivered-work
    instrument behind ``bench.py``'s ``delivered_mfu`` (round 4).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = q.shape[0]
    n = op.P.shape[0]
    m = op.A_c.shape[0]
    f32 = jnp.float32
    if eps_abs is None:
        eps_abs = 1e-4

    # scale into equilibrated space (cheap elementwise, stays in XLA)
    q_s = (op.c * op.D * q).astype(f32)
    l_s = (op.E * l).astype(f32)
    u_s = (op.E * u).astype(f32)
    if warm_x is None:
        x0 = jnp.zeros((B, n), f32)
    else:
        x0 = (warm_x / op.D).astype(f32)
    if warm_y is None:
        y0 = jnp.zeros((B, m), f32)
    else:
        y0 = (op.c * warm_y / op.E).astype(f32)

    # pad batch to a tile multiple
    Bp = ((B + tile - 1) // tile) * tile
    pad = Bp - B
    if pad:
        padder = lambda a: jnp.pad(a, ((0, pad), (0, 0)))
        q_s, l_s, u_s, x0, y0 = map(padder, (q_s, l_s, u_s, x0, y0))

    R = op.rho_levels.shape[0]
    kernel = functools.partial(
        _admm_tile_kernel,
        iters=iters,
        chunks=chunks,
        probe_iters=probe_iters,
        max_rho_moves=(chunks if max_rho_moves is None else max_rho_moves),
        schedule=schedule,
        n_levels=R,
        init_idx=int(R // 2),
        cg_polish=polish,
        cg_iters=cg_iters,
        eps_abs=float(eps_abs),
        alpha=float(alpha),  # sigma is already folded into W_stack
    )

    # Fused per-level iteration matrices (see kernel docstring): one
    # (T, n+m)@(n+m, n+m) MXU op per ADMM iteration replaces the three
    # small matmuls of the separate-buffer formulation. Built once per jit
    # trace in the operator's own precision, then cast.
    At_s = op.A_s.T
    MA = jax.vmap(lambda M: M @ At_s)(op.Minv_stack)  # (R, n, m)
    AM = jax.vmap(lambda M: op.A_s @ M)(op.Minv_stack)  # (R, m, n)
    AMA = jax.vmap(lambda G: G @ At_s)(AM)  # (R, m, m)
    sig = op.sigma
    W_stack = jnp.concatenate(
        [
            jnp.concatenate([sig * op.Minv_stack, sig * MA], axis=2),
            jnp.concatenate([AM, AMA], axis=2),
        ],
        axis=1,
    )  # (R, n+m, n+m)
    Wq_stack = jnp.concatenate([-op.Minv_stack, -MA], axis=2)  # (R, n, n+m)

    shared = lambda *shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    tiled = lambda cols: pl.BlockSpec(
        (tile, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    x_s, z_s, y_s, ni_s = pl.pallas_call(
        kernel,
        grid=(Bp // tile,),
        in_specs=[
            shared(R, n + m, n + m),
            shared(R, n, n + m),
            shared(m, n),
            shared(n, m),
            shared(n, n),
            shared(n, n),
            shared(m, m),
            shared(R, 1),
            shared(1, m),
            shared(1, n),
            tiled(n),
            tiled(m),
            tiled(m),
            tiled(n),
            tiled(m),
        ],
        out_specs=[tiled(n), tiled(m), tiled(m), tiled(1)],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, n), f32),
            jax.ShapeDtypeStruct((Bp, m), f32),
            jax.ShapeDtypeStruct((Bp, m), f32),
            jax.ShapeDtypeStruct((Bp, 1), f32),
        ],
        # Raise the scoped-VMEM cap above the 16 MB default: v5e has far more
        # physical VMEM, and tiles of 1024-4096 scenarios compile and run under
        # a 100 MB cap (tile=2048 is the new measured knee: 5.43M solves/s at
        # the headline config vs 4.74M at 512).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        W_stack.astype(f32),
        Wq_stack.astype(f32),
        op.A_s.astype(f32),
        op.A_s.T.astype(f32),
        op.P_s.astype(f32),
        op.Pinv_s.astype(f32),
        op.S.astype(f32),
        op.rho_levels.astype(f32)[:, None],
        (1.0 / op.E).astype(f32)[None, :],
        (1.0 / (op.c * op.D)).astype(f32)[None, :],
        q_s,
        l_s,
        u_s,
        x0,
        y0,
    )
    if pad:
        x_s, z_s, y_s, ni_s = x_s[:B], z_s[:B], y_s[:B], ni_s[:B]

    dtype = op.P.dtype
    x = (op.D * x_s).astype(dtype)
    y = (y_s * op.E / op.c).astype(dtype)
    z = (z_s / op.E).astype(dtype)

    def finish(x, y, z, q_i, l_i, u_i):
        rp, rd = _unscaled_residuals(op, x, y, z, q_i)
        scale = 1.0 + jnp.max(jnp.abs(q_i))
        conv = jnp.logical_and(rp < eps_abs * scale, rd < eps_abs * scale)
        return QPSolution(x=x, z=z, y=y, prim_res=rp, dual_res=rd, converged=conv)

    sol = jax.vmap(finish)(x, y, z, q, l, u)
    if return_iters:
        return sol, ni_s[:, 0]
    return sol
