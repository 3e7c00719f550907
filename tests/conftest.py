"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; JAX can emulate an 8-device mesh
on CPU (xla_force_host_platform_device_count), which lets the sharding tests
assert N-device == 1-device invariance — coverage the TF reference never had
(its MirroredStrategy degrades to one replica on CPU; see SURVEY.md §4).

Must run before any jax import, hence module-level in conftest.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize (remote-TPU tunnel) imports jax at interpreter start
# and pins jax_platforms to the tunneled TPU; tests must run on the local
# 8-device virtual CPU mesh, so override the config explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The reference defaults to float64 (bear_test.cfg precision); enable x64 so
# the parity-mode (dtype=float64) paths are exercised for real. float32 paths
# are still tested via explicit dtype arguments.
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Parity data fixtures are vendored in-package (bear_tpu/data/fixtures/);
# the upstream reference checkout (read-only), when mounted, is used only to
# cross-check that the vendored copies are still byte-identical.
REFERENCE_PATH = os.environ.get("BEAR_REFERENCE_PATH", "/root/reference")
REFERENCE_DATA = os.path.join(REFERENCE_PATH, "bear_model", "data")

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES_DATA = os.path.join(_REPO_ROOT, "bear_tpu", "data", "fixtures")


def reference_data_available() -> bool:
    return os.path.isdir(REFERENCE_DATA)
