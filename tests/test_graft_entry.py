"""Driver entry-point coverage (round 5).

``__graft_entry__.py`` is the driver's gate for the whole repo: ``entry()`` is
compile-checked single-chip and ``dryrun_multichip`` validates the multi-chip
sharding path on N virtual devices. Until this file, neither was exercised by
the test suite — a refactor of any re-exported symbol (``session2_problem``,
``make_linear_mpc``, ``admm_solve_tp``, ``racing_sweep``, ``weak_scaling``)
could break the driver without a red test. Runs in the conftest environment
(CPU, 8 virtual devices, x64 on), which matches the driver's virtual-mesh run.
"""

import pathlib
import sys

import jax
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    # the driver compile-checks this; execute it too (cheap at B=64, N=20)
    x_next, warm_x, warm_y, success = jax.jit(fn)(*args)
    assert x_next.shape == args[0].shape
    assert warm_x.shape == args[1].shape
    assert warm_y.shape == args[2].shape
    assert bool(success.all()), "flagship forward step reported solver failure"


@pytest.mark.slow
def test_dryrun_multichip_8dev():
    if len(jax.devices()) < 8:
        pytest.skip("needs the conftest 8-virtual-device CPU mesh")
    # asserts internally: model-axis psum in the compiled HLO, sharded kernel
    # + racing sweep execute, weak-scaling ladder returns both points
    graft.dryrun_multichip(8)
