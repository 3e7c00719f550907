"""Mesh construction and sharding helpers.

The reference's only distribution strategy is single-host MirroredStrategy
data parallelism with NCCL all-reduce (bear_net.py:246, 273, 290-291). The
TPU-native equivalent: a jax.sharding.Mesh whose ``data`` axis shards the
k-mer batch dimension; parameters stay replicated and XLA inserts psum over
ICI for the gradient/metric reductions (every reduction in the reference is a
SUM — see SURVEY.md §5 — which maps 1:1 onto psum).

A second mesh axis ``kmer`` is used by the counting engine to shard the
``~1.33 * 4^L x (A+1)`` transition-count table at large lag (the natural
"model" axis of BEAR; SURVEY.md §2 parallelism table).

Multi-host: initialize jax.distributed outside, then these helpers see the
global device list; per-host data feeding shards over DCN automatically via
jax.make_array_from_process_local_data.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_device_count() -> int:
    return jax.local_device_count()


def data_parallel_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1D mesh over the first n (default all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)} — a "
                "silently smaller mesh would surface later as an opaque "
                "batch-divisibility error"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def grid_mesh(shape: dict) -> Mesh:
    """N-D mesh from {axis_name: size}, e.g. {'data': 2, 'kmer': 4}."""
    sizes = list(shape.values())
    n = int(np.prod(sizes))
    avail = jax.devices()
    if n > len(avail):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(avail)}")
    devices = np.array(avail[:n]).reshape(sizes)
    return Mesh(devices, tuple(shape.keys()))


def shard_along(mesh: Mesh, x, axis: int = 0, mesh_axis: str = "data"):
    """Place an array with the given dim sharded over a mesh axis."""
    spec = [None] * np.ndim(x)
    spec[axis] = mesh_axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def put_global(x, sharding: NamedSharding):
    """device_put that also works when the sharding spans devices of OTHER
    processes (multi-host training over a global mesh).

    Every process passes the SAME full (globally consistent) host array —
    BEAR datasets are replicated per host by design (counts are merged with
    :func:`bear_tpu.parallel.multihost.allreduce_tables`, so each host holds
    the global table) — and only this process's addressable shards are
    materialized on its local devices. Single-process shardings take the
    plain ``jax.device_put`` fast path.
    """
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        raise ValueError(
            "put_global input must be a host array (or a fully-addressable "
            "device array) replicated on every process; got a jax.Array "
            "spanning non-addressable devices — it cannot be re-sharded "
            "from host data"
        )
    # Multi-host placement goes through the host by design: each process
    # holds the SAME replicated dataset (see docstring), so a device-array
    # input here pays one device->host copy before global placement. The
    # zero-copy on-device handoff (TransitionCounter.to_device_dataset) is a
    # single-process fast path.
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )
