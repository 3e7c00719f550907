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


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               auto_detect: bool = False):
    """Initialize jax.distributed. MUST be the first JAX-related call in the
    process (jax.distributed.initialize refuses to run after the XLA backend
    has started). No-op when already initialized or when no coordinator is
    configured (single-process).

    auto_detect=True forwards a no-arg call to jax.distributed.initialize so
    jax's own cluster detection (TPU pod metadata, SLURM, GKE) can run —
    without it an unconfigured environment is treated as single-process.
    """
    import jax

    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return  # documented no-op on re-initialization
    if (
        coordinator_address is None
        and not os.environ.get("JAX_COORDINATOR_ADDRESS")
        and not auto_detect
    ):
        return  # single-process run: nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        msg = str(e).lower()
        # jax wording: "distributed.initialize should only be called once."
        if "already" not in msg and "once" not in msg:
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


def allreduce_sum_i64(arr) -> np.ndarray:
    """Exact int64 sum of an array across all processes (every host gets the
    total). Useful for count-conservation checks alongside
    :func:`allreduce_tables`."""
    import jax

    arr = np.asarray(arr, dtype=np.int64)
    if jax.process_count() == 1:
        return arr
    return _allgather_i64(arr).sum(axis=0)


def allreduce_tables(counter) -> None:
    """Merge a counter's host-side counts across all processes, in place.

    IDEMPOTENT and streaming-safe: only the counts accumulated since the
    previous allreduce (the per-host DELTA) cross the wire, so calling this
    once per flush — or repeatedly at the end — never double-counts
    previously merged totals. After every call each host holds the global
    counts. Exact in int64.

    TransitionCounter / ShardedTransitionCounter: dense delta allgather +
    sum per lag. KmerShardedTransitionCounter: sparse (key, count) deltas,
    length-padded and allgathered.
    """
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    counter.flush()
    if hasattr(counter, "_sparse"):
        baselines = getattr(counter, "_allreduce_baseline", None)
        if baselines is None:
            baselines = counter._allreduce_baseline = {}
        for l in counter.lags:
            keys, vals = counter._consolidated(l)
            b_keys, b_vals = baselines.get(
                l, (np.zeros(0, np.int64), np.zeros(0, np.int64))
            )
            # local delta: counts only grow, and baseline keys are a subset
            # of the current keys, so subtract baseline values in place.
            d_vals = vals.copy()
            if len(b_keys):
                pos = np.searchsorted(keys, b_keys)
                d_vals[pos] -= b_vals
            nz = d_vals > 0
            d_keys, d_vals = keys[nz], d_vals[nz]
            n_all = np.asarray(
                multihost_utils.process_allgather(
                    np.array([len(d_keys)], np.uint32)
                )
            ).reshape(-1)
            n_max = int(n_all.max())
            pad = lambda a: np.pad(a, (0, n_max - len(a)))
            keys_all = _allgather_i64(pad(d_keys))
            vals_all = _allgather_i64(pad(d_vals))
            parts = [(b_keys, b_vals)] if len(b_keys) else []
            parts += [
                (keys_all[p, : n_all[p]], vals_all[p, : n_all[p]])
                for p in range(len(n_all))
                if n_all[p]
            ]
            counter._sparse[l] = parts
            counter._consolidated_lags.discard(l)
            baselines[l] = counter._consolidated(l)
        return
    baselines = getattr(counter, "_allreduce_baseline", None)
    if baselines is None:
        baselines = counter._allreduce_baseline = {}
    for l in counter.lags:
        base = baselines.get(l, 0)
        delta = counter._host[l] - base
        # [process_count, table] on every host, summed exactly in int64.
        counter._host[l] = base + _allgather_i64(delta).sum(axis=0)
        baselines[l] = counter._host[l].copy()
