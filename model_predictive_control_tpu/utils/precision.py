"""Matmul precision control for solver-grade linear algebra.

TPU MXU matmuls default to bfloat16 passes, which is right for NN workloads but
wrong for small-matrix control math: an f32 DARE solved at default precision leaves
a ~1e-2 Riccati residual on a v5e chip (observed), vs ~1e-6 at HIGHEST. All Riccati /
QP / SQP kernels in this engine therefore run under ``Precision.HIGHEST`` (fp32
accumulation via multiple bf16 passes). Plant/model rollouts stay at default
precision — they are bandwidth-bound and tolerant — with one measured
exception: CERTIFICATE-grade closed loops (the rigid-tube sweep) must run the
whole segment at HIGHEST, because a bf16 plant/nominal matvec at session-2
magnitudes (p ≈ −140) injects O(0.1) un-modeled disturbance outside the
certified set W and voids the mRPI guarantee (measured on v5e: 31% original-box
violations at default precision vs 0.15% at HIGHEST, ``parallel/batch.py::
tube_sweep``).
"""

from __future__ import annotations

import functools
from typing import Callable, TypeVar

import jax

_F = TypeVar("_F", bound=Callable)


def solver_precision(fn: _F) -> _F:
    """Run ``fn`` under ``jax.default_matmul_precision('highest')``."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped  # type: ignore[return-value]
