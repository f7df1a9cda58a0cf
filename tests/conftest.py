"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is exercised
without TPU hardware (SURVEY.md §4 item 4). float64 is enabled so golden-trajectory
comparisons against the numpy oracle are meaningful at the 1e-4 gate and tighter.

These env vars must be set before jax initializes a backend, hence the import-order
dance here (conftest is imported before any test module).
"""

import os

# The container pins JAX_PLATFORMS=axon (TPU tunnel); tests must run on CPU, so
# override rather than setdefault, and mirror it into jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import time  # noqa: E402
from collections import defaultdict  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def f64():
    import jax.numpy as jnp

    return jnp.float64


# ---------------------------------------------------------------------------
# Per-file wall-time budget fence (VERDICT r2 item 8). The slow tier must stay
# runnable in chunks of < 10 minutes on a 2-CPU box: any single test FILE
# exceeding MPC_FILE_BUDGET_S (default 540 s, leaving headroom under a 600 s
# chunk timeout) fails the session with a named offender instead of silently
# outgrowing the tier. Override per-run: MPC_FILE_BUDGET_S=900 pytest ...;
# set 0 to disable (e.g. single-file debugging under a profiler).
# ---------------------------------------------------------------------------

_FILE_BUDGET_S = float(os.environ.get("MPC_FILE_BUDGET_S", "540"))
_file_times: dict = defaultdict(float)


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_protocol(item, nextitem):
    t0 = time.monotonic()
    yield
    _file_times[str(item.path)] += time.monotonic() - t0


def pytest_sessionfinish(session, exitstatus):
    if _FILE_BUDGET_S <= 0:
        return
    over = {
        f: t for f, t in _file_times.items() if t > _FILE_BUDGET_S
    }
    if over:
        tr = session.config.pluginmanager.get_plugin("terminalreporter")
        for f, t in sorted(over.items(), key=lambda kv: -kv[1]):
            msg = (
                f"FILE BUDGET EXCEEDED: {f} took {t:.0f}s "
                f"(budget {_FILE_BUDGET_S:.0f}s) — split the file or mark "
                "tests slow/parametrize down (tests/conftest.py fence)"
            )
            if tr is not None:
                tr.write_line(msg, red=True, bold=True)
            else:
                print(msg)
        session.exitstatus = 1
