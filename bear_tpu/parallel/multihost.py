"""Multi-host (pod-slice) execution helpers.

The reference is strictly single-host (MirroredStrategy, SURVEY.md §1). The
TPU-native scale-out story:

- call :func:`initialize` FIRST THING in the process (before any other JAX
  call — jax.distributed must run before the XLA backend boots);
- shard input FILES across hosts with :func:`host_shard` — each host streams
  and counts its local shard on its local devices;
- merge per-host count tables with :func:`allreduce_tables` (one
  process-allgather + host sum per flush, exact in int64).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed. MUST be the first JAX-related call in the
    process (jax.distributed.initialize refuses to run after the XLA backend
    has started). No-op when no coordinator is configured (single-process) or
    when already initialized."""
    import jax

    if coordinator_address is None and not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return  # single-process run: nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise


def host_shard(items: Sequence, process_id=None, process_count=None) -> list:
    """Deterministic round-robin shard of a work list (e.g. input files or
    read batches) for this host."""
    import jax

    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % n == pid]


def _allgather_i64(arr: np.ndarray) -> np.ndarray:
    """process_allgather an int64 array exactly: two uint32 halves (device
    transports are 32-bit safe without x64). Returns [process_count, ...]."""
    from jax.experimental import multihost_utils

    lo = (arr & 0xFFFFFFFF).astype(np.uint32)
    hi = (arr >> 32).astype(np.uint32)
    lo_all = np.asarray(multihost_utils.process_allgather(lo)).astype(np.int64)
    hi_all = np.asarray(multihost_utils.process_allgather(hi)).astype(np.int64)
    return (hi_all << 32) + lo_all


def allreduce_tables(counter) -> None:
    """Merge a counter's host-side counts across all processes, in place.

    TransitionCounter / ShardedTransitionCounter (dense int64 host tables):
    one exact allgather + host sum per lag. KmerShardedTransitionCounter
    (sparse host accumulator): the consolidated (key, count) pairs are
    length-padded, allgathered, and re-consolidated, so every host ends with
    the global sparse counts. Exact in int64 either way.
    """
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    counter.flush()
    if hasattr(counter, "_sparse"):
        for l in counter.lags:
            keys, vals = counter._consolidated(l)
            n_all = np.asarray(
                multihost_utils.process_allgather(
                    np.array([len(keys)], np.uint32)
                )
            ).reshape(-1)
            n_max = int(n_all.max())
            pad = lambda a: np.pad(a, (0, n_max - len(a)))
            keys_all = _allgather_i64(pad(keys))
            vals_all = _allgather_i64(pad(vals))
            parts = [
                (keys_all[p, : n_all[p]], vals_all[p, : n_all[p]])
                for p in range(len(n_all))
                if n_all[p]
            ]
            counter._sparse[l] = parts
        return
    for l in counter.lags:
        # [process_count, table] on every host, summed exactly in int64.
        counter._host[l] = _allgather_i64(counter._host[l]).sum(axis=0)
