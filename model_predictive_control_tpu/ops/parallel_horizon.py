"""Parallel-in-horizon primitives: O(log N)-depth rollouts and Riccati recursions.

The reference treats the horizon strictly sequentially — the symbolic single-shooting
unroll at ``session_4/main.py:86-104`` and the backward Riccati loop at
``session_1/FHC.py:55-59``. On TPU the horizon is a parallelizable axis: both the
linear rollout (composition of affine maps) and the backward Riccati pass (composition
of conditional value functions) are *associative*, so ``lax.associative_scan`` computes
all N stages in O(log N) depth of batched (N, nx, nx) matmuls — MXU-friendly work
instead of a length-N dependency chain. SURVEY.md §5.7 scopes this as the TPU analog
of sequence parallelism (cf. PAPERS.md: "πMPC: parallel-in-horizon", "Parallel Dynamic
Programming for Conic Linear Quadratic Control").

At the headline N=20 the sequential scan is already cheap next to the batch axis;
these kernels are for the long-horizon regime (N in the hundreds+), where the scan's
critical path starts to dominate a solve.

Riccati parallelization: each stage k carries a conditional value function
``V_k(x_k, x_{k+1}) = ½ x_kᵀ J x_k + ½ (x_{k+1} − A x_k)ᵀ C⁻¹ (x_{k+1} − A x_k)``
(dual/information form so C = B R⁻¹ Bᵀ may be singular), encoded as the element
``(A, C, J)``. Eliminating the shared intermediate state gives the associative combine

    (A₁,C₁,J₁) ⊗ (A₂,C₂,J₂) = ( A₂ W A₁,  A₂ W C₁ A₂ᵀ + C₂,  A₁ᵀ J₂ W A₁ + J₁ ),
    W = (I + C₁ J₂)⁻¹                                   (1 earlier in time than 2)

and the suffix combination of stages k..N yields ``J = P_k``, the cost-to-go matrix —
identical (to rounding) to the sequential recursion at ``session_1/FHC.py:51-61``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.precision import solver_precision
from .riccati import lqr_gain


def _compose_affine(first, second):
    """(M₁,v₁) then (M₂,v₂):  x ↦ M₂(M₁x + v₁) + v₂."""
    M1, v1 = first
    M2, v2 = second
    return M2 @ M1, jnp.einsum("...ij,...j->...i", M2, v1) + v2


def affine_rollout_parallel(
    A: jnp.ndarray,
    B: jnp.ndarray,
    x0: jnp.ndarray,
    controls: jnp.ndarray,
) -> jnp.ndarray:
    """Open-loop LTI/LTV rollout ``x_{k+1} = A_k x_k + B_k u_k`` in O(log N) depth.

    Same contract as :func:`...control.simulate.rollout` on a linear system: returns
    states ``(N + 1, nx)`` including ``x0``. ``A``/``B`` may be time-invariant
    ``(nx, nx)`` / ``(nx, nu)`` or stacked ``(N, nx, nx)`` / ``(N, nx, nu)``.
    """
    controls = jnp.asarray(controls)
    N = controls.shape[0]
    x0 = jnp.asarray(x0)
    As = jnp.broadcast_to(A, (N,) + jnp.shape(A)[-2:])
    Bs = jnp.broadcast_to(B, (N,) + jnp.shape(B)[-2:])
    vs = jnp.einsum("kij,kj->ki", Bs, controls)
    # prefix[k] = map for x0 ↦ x_{k+1}; associative_scan's fn(a, b) receives the
    # earlier prefix first, which is exactly _compose_affine's convention.
    Ms, vs = jax.lax.associative_scan(_compose_affine, (As, vs))
    xs = jnp.einsum("kij,j->ki", Ms, x0) + vs
    return jnp.concatenate([x0[None], xs], axis=0)


def _riccati_combine(first, second):
    """Suffix-combine two value-function elements; ``first`` is earlier in time."""
    A1, C1, J1 = first
    A2, C2, J2 = second
    n = A1.shape[-1]
    I = jnp.eye(n, dtype=A1.dtype)
    # W = (I + C1 J2)⁻¹, batched over leading dims.
    M = I + C1 @ J2
    W_A1 = jnp.linalg.solve(M, A1)
    W_C1 = jnp.linalg.solve(M, C1)
    A = A2 @ W_A1
    C = A2 @ W_C1 @ _T(A2) + C2
    J = _T(A1) @ J2 @ W_A1 + J1
    return A, 0.5 * (C + _T(C)), 0.5 * (J + _T(J))


def _T(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(a, -1, -2)


@solver_precision
def riccati_recursion_parallel(
    A: jnp.ndarray,
    B: jnp.ndarray,
    Q: jnp.ndarray,
    R: jnp.ndarray,
    Pf: jnp.ndarray,
    N: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for :func:`.riccati.riccati_recursion` with O(log N) depth.

    Returns ``(P, K)`` of shapes ``(N + 1, nx, nx)`` / ``(N, nu, nx)``, index 0 =
    stage 0, matching the sequential scan (which matches ``session1_sol.py:44-65``).
    ``A``/``B``/``Q``/``R`` may also be stacked per-stage ``(N, ...)`` for the
    time-varying recursion (the LQT/iLQR backward pass shape).
    """
    nx = Pf.shape[-1]
    dt = Pf.dtype
    As = jnp.broadcast_to(A, (N, nx, nx)).astype(dt)
    Bs = jnp.broadcast_to(B, (N, nx) + jnp.shape(B)[-1:]).astype(dt)
    Qs = jnp.broadcast_to(Q, (N, nx, nx)).astype(dt)
    Rs = jnp.broadcast_to(R, (N,) + jnp.shape(R)[-2:]).astype(dt)

    Cs = jnp.einsum("kij,kjl->kil", Bs, jnp.linalg.solve(Rs, _T(Bs)))
    # stage elements e_0..e_{N-1} plus the terminal element (A=0, C=0, J=Pf)
    zeros = jnp.zeros((1, nx, nx), dt)
    elems = (
        jnp.concatenate([As, zeros], axis=0),
        jnp.concatenate([Cs, zeros], axis=0),
        jnp.concatenate([Qs, Pf[None]], axis=0),
    )
    # suffix[k] = e_k ⊗ e_{k+1} ⊗ … ⊗ e_N: flip, prefix-scan with swapped operands
    # (the accumulated prefix of the flipped array is *later* in time), flip back.
    flipped = jax.tree.map(lambda a: a[::-1], elems)
    scanned = jax.lax.associative_scan(
        lambda acc, new: _riccati_combine(new, acc), flipped
    )
    _, _, J = jax.tree.map(lambda a: a[::-1], scanned)
    P = J  # (N + 1, nx, nx); P[N] = Pf, P[k] = cost-to-go at stage k
    K = jax.vmap(lambda Pn, Ak, Bk, Rk: lqr_gain(Ak, Bk, Rk, Pn))(
        P[1:], As, Bs, Rs
    )
    return P, K


def rollout_parallel(
    system: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None,
    x0: jnp.ndarray,
    controls: jnp.ndarray,
    *,
    A: jnp.ndarray | None = None,
    B: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Parallel open-loop rollout for linear systems.

    Accepts either a ``LinearSystem``-like object exposing ``.A``/``.B`` or explicit
    matrices; falls through to :func:`affine_rollout_parallel`.
    """
    if A is None or B is None:
        if system is None:
            raise ValueError(
                "rollout_parallel needs either a system with .A/.B or explicit "
                "A= and B= matrices"
            )
        A = system.A if A is None else A
        B = system.B if B is None else B
    return affine_rollout_parallel(A, B, x0, controls)


# ---------------------------------------------------------------------------
# Affine parallel LQT: O(log N)-depth solve of the linear-quadratic problem
# WITH linear cost terms — the parallel twin of the stagewise Newton-KKT solve
# (solvers/riccati_ip.py::lq_factor + lq_affine_solve).
# ---------------------------------------------------------------------------
#
# Each stage carries a conditional value element (A, b, C, η, J) encoding
#   V(x, z) = ½xᵀJx + ηᵀx + ½(z − Ax − b)ᵀ C⁻¹ (z − Ax − b)   (information form),
# the affine generalization of the (A, C, J) element above (cf. PAPERS.md:
# "Temporal Parallelization of Dynamic Programming and LQT" — Särkkä /
# García-Fernández). Eliminating the shared intermediate state gives the
# associative combine below; a suffix scan yields every stage's cost-to-go
# (J = P_k, η = p_k) in O(log N) depth, and the closed-loop forward rollout is
# an affine-map composition scan (already associative).


@solver_precision
def lqt_solve_parallel(
    As: jnp.ndarray,
    Bs: jnp.ndarray,
    Qts: jnp.ndarray,
    Rts: jnp.ndarray,
    qts: jnp.ndarray,
    rts: jnp.ndarray,
    x_init: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Solve min Σₖ ½xₖᵀQ̃ₖxₖ + q̃ₖᵀxₖ + ½uₖᵀR̃ₖuₖ + r̃ₖᵀuₖ (+ terminal Q̃_N, q̃_N)
    s.t. x_{k+1} = Aₖxₖ + Bₖuₖ, x₀ = x_init — in O(log N) depth.

    The affine problem is reduced to the pure-quadratic case by appending a
    constant-1 coordinate: with x̃ = [x; 1], the linear cost terms fold into the
    corner blocks of the augmented Q̃ and the control-cost completion
    u = −R̃⁻¹r̃ + δ folds into the augmented dynamics [[A, Bu₀],[0, 1]]. The
    tested value-function combine above then applies verbatim; J̃_k's (nx, nx)
    block is P_k and its last column is the affine term p_k.

    Shapes: As (N, nx, nx), Bs (N, nx, nu), Qts (N+1, nx, nx) (index 0 unused),
    Rts (N, nu, nu), qts (N+1, nx), rts (N, nu). Returns (xs (N+1, nx),
    us (N, nu)), matching the sequential ``lq_factor``/``lq_affine_solve`` pair
    in ``solvers/riccati_ip.py`` to rounding.
    """
    N, nx, nu = Bs.shape
    dt = x_init.dtype

    u0 = -jnp.linalg.solve(Rts, rts[..., None])[..., 0]  # (N, nu)
    Rinv_Bt = jnp.linalg.solve(Rts, _T(Bs))  # (N, nu, nx)
    Cs = Bs @ Rinv_Bt  # B R̃⁻¹ Bᵀ

    na = nx + 1

    def aug_A(A, Bu0):
        out = jnp.zeros((N, na, na), dt)
        out = out.at[:, :nx, :nx].set(A)
        out = out.at[:, :nx, nx].set(Bu0)
        out = out.at[:, nx, nx].set(1.0)
        return out

    def aug_C(C):
        out = jnp.zeros((N, na, na), dt)
        return out.at[:, :nx, :nx].set(C)

    def aug_J(Q, q):
        n_el = Q.shape[0]
        out = jnp.zeros((n_el, na, na), dt)
        out = out.at[:, :nx, :nx].set(Q)
        out = out.at[:, :nx, nx].set(q)
        out = out.at[:, nx, :nx].set(q)
        return out

    Bu0 = jnp.einsum("kij,kj->ki", Bs, u0)
    # stage elements 0..N-1; stage 0's state cost is a constant (x₀ fixed) —
    # zero it so the suffix element at 0 is the value function seen from stage 0
    J_stage = aug_J(Qts[:-1].at[0].set(0.0), qts[:-1].at[0].set(0.0))
    elems = (
        jnp.concatenate([aug_A(As, Bu0), jnp.zeros((1, na, na), dt)], axis=0),
        jnp.concatenate([aug_C(Cs), jnp.zeros((1, na, na), dt)], axis=0),
        jnp.concatenate([J_stage, aug_J(Qts[-1:], qts[-1:])], axis=0),
    )
    flipped = jax.tree.map(lambda a: a[::-1], elems)
    scanned = jax.lax.associative_scan(
        lambda acc, new: _riccati_combine(new, acc), flipped
    )
    _, _, J_aug = jax.tree.map(lambda a: a[::-1], scanned)
    P = J_aug[:, :nx, :nx]  # (N+1, nx, nx); P[N] = Q̃_N
    p = J_aug[:, :nx, nx]  # (N+1, nx); p[N] = q̃_N

    # per-stage gains from (P_{k+1}, p_{k+1}) — one batched solve
    BtP = _T(Bs) @ P[1:]
    Quu = Rts + BtP @ Bs
    Qux = BtP @ As
    qu = rts + jnp.einsum("kij,kj->ki", _T(Bs), p[1:])
    K = -jnp.linalg.solve(Quu, Qux)
    kff = -jnp.linalg.solve(Quu, qu[..., None])[..., 0]

    # closed-loop forward rollout x_{k+1} = (A + BK)x + B kff — affine compose
    Ms = As + Bs @ K
    vs = jnp.einsum("kij,kj->ki", Bs, kff)
    Mcum, vcum = jax.lax.associative_scan(_compose_affine, (Ms, vs))
    xs_tail = jnp.einsum("kij,j->ki", Mcum, x_init) + vcum
    xs = jnp.concatenate([x_init[None], xs_tail], axis=0)
    us = jnp.einsum("kij,kj->ki", K, xs[:-1]) + kff
    return xs, us
