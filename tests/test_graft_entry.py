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
@pytest.mark.slow
def test_dryrun_multichip(n):
    g = _load()
    g.dryrun_multichip(n)  # asserts internally (finite loss, exact counts)


@pytest.mark.slow
def test_dryrun_fallback_rewrites_device_count():
    # Regression (ADVICE r1): a pre-set SMALLER
    # xla_force_host_platform_device_count must be rewritten, not kept —
    # otherwise the CPU fallback comes up with too few devices. Run in a
    # subprocess so the backend really initializes with the small count first.
    import os
    import subprocess
    import sys

    script = (
        "import jax\n"
        # sitecustomize pins the tunneled TPU over JAX_PLATFORMS=cpu; force
        # CPU the same way dryrun_multichip does, then init the backend @ 2.
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 2, jax.devices()\n"
        "import importlib.util\n"
        "spec = importlib.util.spec_from_file_location('ge', %r)\n"
        "m = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(m)\n"
        "m.dryrun_multichip(4)\n"
    ) % os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "__graft_entry__.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip OK on 4 devices" in res.stdout
