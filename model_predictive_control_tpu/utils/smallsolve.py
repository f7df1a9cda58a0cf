"""Unrolled small-matrix solves for TPU hot paths.

``jnp.linalg.solve`` lowers to LAPACK-style LU custom calls that XLA:TPU
executes essentially serially per batch element — measured on this repo's
workloads as THE scalar bottleneck of otherwise-parallel batched loops
(nonlinear MHE: 940 vs 16k windows/s; the wind sweep's EKF/input-reference
path). For the tiny SPD systems that dominate estimation/targeting code
(2×2 Gauss-Newton steps, ny×ny innovation solves, (nx+nu) target systems),
an UNROLLED Cholesky in plain jnp ops is exact, differentiates, vmaps into
pure elementwise lanes, and costs the VPU almost nothing.

``solve_spd(S, B)`` dispatches on the static size: closed form at n ≤ 2,
unrolled Cholesky + triangular solves for n ≤ SMALL_MAX, and falls back to
``jnp.linalg.solve`` beyond (where the dense path is legitimate).
"""

from __future__ import annotations

import jax.numpy as jnp

SMALL_MAX = 12


def solve_spd(S: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve ``S X = B`` for symmetric positive-definite ``S`` (n, n) with
    ``B`` of shape (n,) or (n, k). Unbatched; compose with ``vmap``."""
    n = S.shape[-1]
    if n == 1:
        return B / S[..., 0, 0]
    if n == 2:
        a, b = S[0, 0], S[0, 1]
        c, d = S[1, 0], S[1, 1]
        det = a * d - b * c
        if B.ndim == 1:
            return jnp.stack(
                [(d * B[0] - b * B[1]) / det, (a * B[1] - c * B[0]) / det]
            )
        return jnp.stack(
            [(d * B[0] - b * B[1]) / det, (a * B[1] - c * B[0]) / det]
        )
    if n <= SMALL_MAX:
        L = _chol_unrolled(S, n)
        return _chol_solve_unrolled(L, B, n)
    return jnp.linalg.solve(S, B)


def _chol_unrolled(S, n: int):
    """Cholesky factor of an n×n SPD matrix via fully unrolled scalar ops
    (static n): returns the rows as a list-of-lists lower triangle."""
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = S[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol_solve_unrolled(L, B, n: int):
    """Solve L Lᵀ x = B with the unrolled triangle; B (n,) or (n, k)."""
    b = [B[i] for i in range(n)]
    # forward: L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # backward: Lᵀ x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)
