"""Multi-host (pod-slice) execution helpers.

The reference is strictly single-host (MirroredStrategy, SURVEY.md §1). The
TPU-native scale-out story:

- call :func:`initialize` once per process (wraps jax.distributed);
- shard input FILES across hosts with :func:`host_shard` — each host streams
  and counts its local shard on its local devices;
- merge per-host count tables with :func:`allreduce_tables` (one psum over
  DCN per flush) or gather TrainResults via fully-replicated training where
  each host feeds its local batch shard through
  jax.make_array_from_process_local_data.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed (no-op if already initialized or
    single-process). Safe to call unconditionally at program start."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process run (no coordinator configured): nothing to do
        pass


def host_shard(items: Sequence, process_id=None, process_count=None) -> list:
    """Deterministic round-robin shard of a work list (e.g. input files or
    read batches) for this host."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % n == pid]


def allreduce_tables(counter) -> None:
    """Sum a TransitionCounter's host tables across all processes, in place.

    Uses a device psum over the global mesh (rides DCN between hosts). After
    this every host holds the global counts.
    """
    if jax.process_count() == 1:
        return
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import shard_map

    counter.flush()
    devices = np.array(jax.devices())
    mesh = Mesh(devices, ("all",))

    @jax.jit
    def reduce_fn(x):
        return shard_map(
            lambda v: jax.lax.psum(v, "all"),
            mesh=mesh,
            in_specs=P(None),
            out_specs=P(None),
        )(x)

    for l in counter.lags:
        # int64 tables: psum in two int32 halves to stay TPU-friendly.
        host = counter._host[l]
        lo = (host & 0xFFFFFFFF).astype(np.uint32).astype(np.int64)
        hi = (host >> 32).astype(np.int64)
        lo_sum = np.asarray(reduce_fn(jnp.asarray(lo, jnp.float64)))
        hi_sum = np.asarray(reduce_fn(jnp.asarray(hi, jnp.float64)))
        counter._host[l] = (hi_sum.astype(np.int64) << 32) + lo_sum.astype(np.int64)
