"""Structured metrics: JSONL sink + honest device timing.

The reference's telemetry is per-step Python lists on a dataclass
(``session_2/log.py:8-12``) plus prints (``session_4/main.py:268-275``). Here the
per-step telemetry already comes out of ``lax.scan`` as stacked arrays
(``SimResult.logs``); this module adds the host-side layer: summarize a run into
scalars, time it honestly (``block_until_ready`` fencing), and append JSONL records
a dashboard or the bench driver can consume.
"""

from __future__ import annotations

import json
import time
from typing import Any, IO

import jax
import numpy as np


class Timer:
    """Wall-clock timer that fences device async dispatch.

    ``with Timer() as t: out = f(x)`` — the exit fences on ``t.fence(out)`` targets
    registered via :meth:`fence`, or everything if none registered. Read
    ``t.elapsed`` (seconds) after the block.
    """

    def __init__(self):
        self.elapsed: float | None = None
        self._targets: list[Any] = []

    def fence(self, *arrays) -> None:
        self._targets.extend(arrays)

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        if self._targets:
            jax.block_until_ready(self._targets)
        self.elapsed = time.perf_counter() - self._t0


class MetricsLogger:
    """Append-only JSONL metrics sink.

    Each :meth:`write` call emits one line ``{"ts": ..., **record}``. Values are
    coerced host-side (0-d arrays → floats) so records never hold device buffers.
    """

    def __init__(self, path_or_file: str | IO[str]):
        if isinstance(path_or_file, str):
            self._file = open(path_or_file, "a")
            self._owned = True
        else:
            self._file = path_or_file
            self._owned = False

    def write(self, record: dict) -> None:
        coerced = {k: _to_scalar(v) for k, v in record.items()}
        coerced.setdefault("ts", time.time())
        self._file.write(json.dumps(coerced) + "\n")
        self._file.flush()

    def close(self) -> None:
        if self._owned:
            self._file.close()

    def __enter__(self) -> "MetricsLogger":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def _to_scalar(v):
    if isinstance(v, (jax.Array, np.ndarray)):
        arr = np.asarray(v)
        if arr.ndim == 0:
            return arr.item()
        return arr.tolist()
    return v


def summarize_run(result, per_solve_iters: int | None = None) -> dict:
    """Scalar summary of a ``SimResult``/``BatchSimResult``: solver health
    (success rate, residual percentiles — the failure-detection surface, SURVEY §5.3)
    and stability."""
    logs = result.logs if isinstance(result.logs, dict) else {}
    out: dict[str, Any] = {
        "steps": int(result.inputs.shape[0]),
    }
    if hasattr(result, "unstable"):
        out["unstable_frac"] = float(np.mean(np.asarray(result.unstable)))
    if "solver_success" in logs:
        succ = np.asarray(logs["solver_success"]).astype(np.float32)
        out["success_rate"] = float(succ.mean())
        out["success_rate_warm"] = float(succ[1:].mean()) if len(succ) > 1 else None
    for key in ("prim_res", "dual_res", "kkt_res", "viol"):
        if key in logs:
            v = np.asarray(logs[key], dtype=np.float64)
            out[f"{key}_p50"] = float(np.percentile(v, 50))
            out[f"{key}_p99"] = float(np.percentile(v, 99))
            out[f"{key}_max"] = float(v.max())
    if per_solve_iters is not None:
        out["solver_iters"] = per_solve_iters
    return out
