"""Multi-device sharded transition counting.

Scales the counting engine over a device mesh: read chunks shard across the
``data`` axis, each device scatter-adds into its own partial table slice of a
[n_devices, table] stack (no communication on the hot path), and partials
merge with ONE all-reduce per flush — the TPU-native replacement for the
reference's heap-merge of sorted KMC dumps (summarize.py:512-591) and the
pattern for cross-host merging over DCN (SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bear_tpu.counting.engine import (
    ReadChunk,
    _count_chunk_kernel,
    lag_offsets,
    reverse_complement_codes,
    table_rows,
)


def _make_sharded_count(mesh: Mesh, axis: str, lags, n_groups, method):
    """Build the jitted shard_map counting step for a mesh: the concatenated
    table [D, total] int32 sharded on axis 0, batch arrays sharded on axis 0
    as [D, B_local, ...]. Each device adds into its own partial table (by
    scatter or the pallas_hist sorted method) — no communication on the hot
    path."""
    from jax import shard_map

    def per_device(tbl_slice, codes_l, lengths_l, skip_l, stopped_l, groups_l):
        out = _count_chunk_kernel(
            tbl_slice[0], codes_l[0], lengths_l[0], skip_l[0], stopped_l[0],
            groups_l[0], lags, n_groups, method,
        )
        return out[None]

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P(axis, None),
            P(axis), P(axis), P(axis), P(axis), P(axis),
        ),
        out_specs=P(axis, None),
    )
    return jax.jit(mapped, donate_argnums=(0,))


class ShardedTransitionCounter:
    """Drop-in multi-device analogue of TransitionCounter.

    Chunks are padded so the batch divides the ``data`` axis; padded rows
    have zero length and no stop, contributing nothing.
    """

    FLUSH_EVERY = (1 << 31) - (1 << 24)

    def __init__(self, mesh: Mesh, lags: Sequence[int], n_groups: int = 1,
                 reverse: bool = False, axis: str = "data",
                 method: str = "auto"):
        from bear_tpu.counting.pallas_hist import padded_size

        self.mesh = mesh
        self.axis = axis
        self.n_dev = mesh.shape[axis]
        self.lags = tuple(sorted(set(int(l) for l in lags)))
        self.n_groups = n_groups
        self.reverse = reverse
        if method not in ("auto", "scatter", "sorted"):
            raise ValueError(f"unknown counting method {method!r}")
        self.method = method
        self._offsets, self._total_size = lag_offsets(self.lags, n_groups)
        self._buf_size = padded_size(self._total_size)
        if self._buf_size > np.iinfo(np.int32).max:
            raise ValueError(
                f"concatenated count table has {self._buf_size:,} entries "
                "(window-padded), beyond int32 indexing — split the lags "
                "across counters"
            )
        self._host: Dict[int, np.ndarray] = {
            l: np.zeros(n_groups * table_rows(l) * 5, dtype=np.int64) for l in self.lags
        }
        self._dev = None
        self._since_flush = 0
        self._count_fns = {}  # method -> jitted shard_map step

    def _resolve_method(self, new_transitions: int) -> str:
        # Mirrors TransitionCounter: the sorted kernel is TPU-only and only
        # pays off for production-size chunks.
        if self.method != "auto":
            return self.method
        if jax.default_backend() != "tpu":
            return "scatter"
        from bear_tpu.counting.engine import TransitionCounter

        return (
            "sorted"
            if new_transitions >= TransitionCounter.SORTED_MIN_TRANSITIONS
            else "scatter"
        )

    def _count_fn(self, method: str):
        if method not in self._count_fns:
            self._count_fns[method] = _make_sharded_count(
                self.mesh, self.axis, self.lags, self.n_groups, method
            )
        return self._count_fns[method]

    @property
    def max_lag(self) -> int:
        return max(self.lags)

    def _table_sharding(self):
        return NamedSharding(self.mesh, P(self.axis, None))

    def _batch_sharding(self):
        return NamedSharding(self.mesh, P(self.axis))

    def _ensure_dev(self):
        if self._dev is None:
            self._dev = jax.device_put(
                jnp.zeros((self.n_dev, self._buf_size), jnp.int32),
                self._table_sharding(),
            )

    def flush(self):
        if self._dev is not None and self._since_flush > 0:
            # The one cross-device reduction: sum partial tables.
            merged = np.asarray(
                jnp.sum(self._dev.astype(jnp.int64), axis=0)
            )[: self._total_size]
            for l in self.lags:
                off = self._offsets[l]
                self._host[l] += merged[off : off + self._host[l].size]
            self._dev = None
            self._since_flush = 0

    def add_chunk(self, chunk: ReadChunk):
        self._add(chunk.codes, chunk.lengths, chunk.skip, chunk.stopped, chunk.groups)
        if self.reverse:
            assert np.all(chunk.skip == 0), "reverse=True requires whole-read chunks"
            rc, rlen = reverse_complement_codes(chunk.codes, chunk.lengths)
            self._add(rc, rlen, chunk.skip, chunk.stopped, chunk.groups)

    def _add(self, codes, lengths, skip, stopped, groups):
        B, L = codes.shape
        pad = (-B) % self.n_dev
        if pad:
            codes = np.concatenate([codes, np.zeros((pad, L), codes.dtype)])
            lengths = np.concatenate([lengths, np.zeros(pad, lengths.dtype)])
            skip = np.concatenate([skip, np.zeros(pad, skip.dtype)])
            stopped = np.concatenate([stopped, np.zeros(pad, bool)])
            groups = np.concatenate([groups, np.zeros(pad, groups.dtype)])
        D = self.n_dev
        Bl = (B + pad) // D

        new_transitions = codes.shape[0] * (L + 1)
        if self._since_flush + new_transitions > self.FLUSH_EVERY:
            self.flush()
        self._ensure_dev()

        bs = self._batch_sharding()
        put = lambda x: jax.device_put(np.asarray(x).reshape((D, Bl) + x.shape[1:]), bs)
        count = self._count_fn(
            self._resolve_method(new_transitions * len(self.lags))
        )
        self._dev = count(
            self._dev, put(codes), put(lengths), put(skip), put(stopped), put(groups)
        )
        self._since_flush += new_transitions

    @property
    def tables(self) -> Dict[int, np.ndarray]:
        self.flush()
        return {
            l: self._host[l].reshape(self.n_groups, table_rows(l), 5)
            for l in self.lags
        }
