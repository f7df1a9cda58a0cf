"""Profiler hooks (SURVEY §5.1 — absent in the reference, which even disables
IPOPT's timing printout at ``session_4/main.py:38``).

``profile_trace`` wraps ``jax.profiler.trace`` so hot paths can be captured for
TensorBoard/Perfetto without importing the profiler at module scope (it is
unavailable on some minimal hosts; the context degrades to a no-op)."""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """Capture an XLA/TPU profiler trace into ``logdir`` (no-op if ``None`` or the
    profiler is unavailable)."""
    if logdir is None:
        yield
        return
    try:
        import jax.profiler as _prof
    except Exception:
        yield
        return
    with _prof.trace(logdir):
        yield
