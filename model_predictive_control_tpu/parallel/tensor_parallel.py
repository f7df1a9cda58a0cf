"""Explicit tensor-parallel ADMM over the model axis (shard_map).

Round-1 asserted the model-axis claim via one ``with_sharding_constraint``
(``parallel/mesh.py``) without observing what XLA actually did. This module
makes the partitioning EXPLICIT with ``shard_map``: the programmer writes the
per-shard program and the collective, so there is nothing for the compiler to
legally undo.

Partitioning (the classic row-parallel pattern from transformer tensor
parallelism, applied to the ADMM operator):

- constraint rows of ``A_s`` and the iterates ``z, y`` (and bounds ``l, u``)
  are sharded over the ``model`` axis;
- the primal ``x`` is replicated across model shards;
- per iteration:  ``w = σx − q + A_sᵀ(ρz − y)`` needs ONE ``psum`` over the
  model axis (each shard contributes ``A_shᵀ(ρz − y)_sh``);
  ``x̃ = M⁻¹w`` is replicated compute; ``z̃ = A_sh x̃`` and the clip/dual
  update are purely local. One collective per iteration, nothing else.

At session-2 sizes (m = 60 rows) this is not a throughput play — the batch
(data) axis is where the chips earn their keep — but it is the load-bearing
proof that the engine's model-axis story compiles to real collectives and
bit-agrees with the single-device solver. At large m (long horizons, dense
constraint stacks) the same program is the memory-capacity escape hatch: each
shard holds m/n_model rows of the operator and iterate.

ρ is fixed at the operator's init level (no ladder adaptation): the headline
bench measured ρ re-adaptation to be net-harmful on warm-started closed loops
anyway, and a fixed ρ keeps the per-shard program collective-minimal. No
active-set polish inside the sharded region (it needs the full row space);
callers that want polished solutions run :func:`..solvers.qp._polish` on the
gathered result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..solvers.qp import QPOperator, QPSolution, _polish, _unscaled_residuals
from ..utils.precision import solver_precision
from .mesh import DATA_AXIS, MODEL_AXIS


@functools.partial(
    jax.jit, static_argnames=("mesh", "iters", "alpha", "eps_abs", "polish")
)
@solver_precision
def admm_solve_tp(
    op: QPOperator,
    q: jnp.ndarray,  # (B, n)
    l: jnp.ndarray,  # (B, m)
    u: jnp.ndarray,  # (B, m)
    warm_x: jnp.ndarray | None = None,
    warm_y: jnp.ndarray | None = None,
    *,
    mesh,
    iters: int = 100,
    alpha: float = 1.6,
    eps_abs: float | None = None,
    polish: bool = True,
) -> QPSolution:
    """Batched ADMM with the scenario batch sharded over ``data`` and the
    constraint dimension sharded over ``model`` — same solution as
    ``vmap(admm_solve)`` at fixed ρ (to float tolerance).

    Requires ``B % mesh.shape['data'] == 0`` and ``m % mesh.shape['model']
    == 0``.
    """
    dtype = op.P.dtype
    n = op.P.shape[0]
    m = op.A_c.shape[0]
    B = q.shape[0]
    n_model = mesh.shape[MODEL_AXIS]
    if m % n_model != 0:
        raise ValueError(f"m={m} not divisible by model axis {n_model}")
    if B % mesh.shape[DATA_AXIS] != 0:
        raise ValueError(f"B={B} not divisible by data axis")
    if eps_abs is None:
        eps_abs = 1e-6 if dtype == jnp.float64 else 1e-4
    alpha = jnp.asarray(alpha, dtype)

    # equilibrated-space data (same scaling as admm_solve)
    q_s = op.c * op.D * q
    l_s = op.E * l
    u_s = op.E * u
    x0 = jnp.zeros((B, n), dtype) if warm_x is None else warm_x / op.D
    y0 = (
        jnp.zeros((B, m), dtype)
        if warm_y is None
        else op.c * warm_y / op.E
    )

    rho = op.rho_levels[op.rho_init_idx]
    Minv = op.Minv_stack[op.rho_init_idx]
    sigma = op.sigma

    def block(q_b, x_b, y_b, l_b, u_b, A_sh):
        """Per-(data, model) shard: q_b/x_b (B_sh, n) replicated over model;
        y_b/l_b/u_b (B_sh, m_sh) local rows; A_sh (m_sh, n) local rows."""
        z_b = jnp.clip(x_b @ A_sh.T, l_b, u_b)

        def iteration(state, _):
            x, z, y = state
            # row-parallel A_sᵀ(ρz − y): local contribution + ONE psum
            w_part = (rho * z - y) @ A_sh
            w = sigma * x - q_b + jax.lax.psum(w_part, MODEL_AXIS)
            x_t = w @ Minv.T  # replicated compute on every model shard
            z_t = x_t @ A_sh.T  # local rows, no comm
            x_n = alpha * x_t + (1.0 - alpha) * x
            z_pre = alpha * z_t + (1.0 - alpha) * z + y / rho
            z_n = jnp.clip(z_pre, l_b, u_b)
            y_n = y + rho * (alpha * z_t + (1.0 - alpha) * z - z_n)
            return (x_n, z_n, y_n), None

        (x, z, y), _ = jax.lax.scan(
            iteration, (x_b, z_b, y_b), None, length=iters
        )
        return x, z, y

    spec_rep_model = P(DATA_AXIS, None)  # (B, n): batch sharded, cols replicated
    spec_rows = P(DATA_AXIS, MODEL_AXIS)  # (B, m): batch × constraint rows
    spec_A = P(MODEL_AXIS, None)  # (m, n): rows over model

    x_s, z_s, y_s = shard_map(
        block,
        mesh=mesh,
        in_specs=(spec_rep_model, spec_rep_model, spec_rows, spec_rows,
                  spec_rows, spec_A),
        out_specs=(spec_rep_model, spec_rows, spec_rows),
        check_vma=False,
    )(q_s, x0, y0, l_s, u_s, op.A_s)

    # unscale + (optional) full-row polish outside the sharded region
    x = op.D * x_s
    y = y_s * op.E / op.c
    z = z_s / op.E

    def finish(x_i, y_i, z_i, q_i, l_i, u_i):
        if polish:
            x_i, y_i, z_i = _polish(op, q_i, l_i, u_i, x_i, y_i, z_i)
        rp, rd = _unscaled_residuals(op, x_i, y_i, z_i, q_i)
        scale = 1.0 + jnp.max(jnp.abs(q_i))
        conv = jnp.logical_and(rp < eps_abs * scale, rd < eps_abs * scale)
        return QPSolution(
            x=x_i, z=z_i, y=y_i, prim_res=rp, dual_res=rd, converged=conv
        )

    return jax.vmap(finish)(x, y, z, q, l, u)
