"""Mesh helper and profiling coverage."""

import os

import jax
import numpy as np
import pytest

from bear_tpu.parallel import data_parallel_mesh, grid_mesh, replicate, shard_along

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@needs_8
def test_grid_mesh_and_placement():
    mesh = grid_mesh({"data": 4, "kmer": 2})
    assert mesh.shape == {"data": 4, "kmer": 2}
    x = np.arange(32.0).reshape(8, 4)
    sharded = shard_along(mesh, x, axis=0, mesh_axis="data")
    np.testing.assert_array_equal(np.asarray(sharded), x)
    tree = replicate(mesh, {"a": np.ones(3)})
    np.testing.assert_array_equal(np.asarray(tree["a"]), np.ones(3))


@needs_8
def test_data_parallel_mesh_subset():
    mesh = data_parallel_mesh(4)
    assert mesh.shape == {"data": 4}


def test_profiler_trace_smoke(tmp_path):
    from bear_tpu.utils import trace

    with trace(str(tmp_path)):
        _ = jax.numpy.ones(8).sum().block_until_ready()
    # a trace directory with events should exist
    produced = [
        os.path.join(root, f)
        for root, _, files in os.walk(tmp_path)
        for f in files
    ]
    assert produced, "no profiler trace written"
