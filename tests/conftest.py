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

import pytest  # noqa: E402


@pytest.fixture
def f64():
    import jax.numpy as jnp

    return jnp.float64
