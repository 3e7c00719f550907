"""Driver-contract guard: __graft_entry__ must expose a jittable single-chip
forward step and a multi-chip dry run that executes on a virtual CPU mesh.

The driver compile-checks entry() on one chip and runs dryrun_multichip(N)
with xla_force_host_platform_device_count=N — the conftest already pins this
process to the 8-device virtual CPU mesh, so both are exercised for real.
"""

import numpy as np
import jax
import pytest


def _load():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_is_finite():
    g = _load()
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


@pytest.mark.parametrize("n", [8, 5])
def test_dryrun_multichip(n):
    g = _load()
    g.dryrun_multichip(n)  # asserts internally (finite loss, exact counts)
