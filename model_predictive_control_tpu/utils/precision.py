"""Matmul precision control for solver-grade linear algebra.

TPU MXU matmuls default to bfloat16 passes, which is right for NN workloads but
wrong for small-matrix control math: an f32 DARE solved at default precision leaves
a ~1e-2 Riccati residual on a v5e chip (observed), vs ~1e-6 at HIGHEST. All Riccati /
QP / SQP kernels in this engine therefore run under ``Precision.HIGHEST`` (fp32
accumulation via multiple bf16 passes). The plant/model rollouts stay at default
precision — they are bandwidth-bound and tolerant.
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
