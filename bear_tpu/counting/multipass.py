"""Single-chip large-lag counting via sequential row-range passes.

KMC counts k up to 256 on one machine with bounded RAM by making multiple
disk passes (role of reference summarize.py:322-340). The device analog: the
lag-14/15 DNA table (4^14 rows = 268M, 5.4 GB int32 at lag 14; 21 GB at
lag 15) cannot live on one chip, but a 1/``passes`` row-range slice can.
Each pass re-streams the reads and counts only transitions whose context row
falls in this pass's range, reusing the row-range clamp the kmer-sharded
kernel already has (engine._count_chunk_kernel ``shard=``); nonzero entries
drain to a sparse host accumulator keyed by GLOBAL int64 indices.

This is exactly KmerShardedTransitionCounter with the mesh axis replaced by
time: pass p plays device p. All host-side machinery (sparse consolidation,
nonzero_rows/counts_for_rows, to_dataset, export_tsv, save/load_state,
validate) is inherited unchanged — only the device path differs.

Cost model: ``passes``x the input streaming + kernel work for 1/``passes``x
the HBM. The sort+histogram kernel's table stream also shrinks by
``passes``x, so wall-clock grows sublinearly for sort-bound workloads.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from bear_tpu.counting.engine import (
    check_groups,
    ReadChunk,
    _count_chunk_kernel,
    table_rows,
)
from bear_tpu.parallel.counting import KmerShardedTransitionCounter


@functools.partial(
    jax.jit,
    static_argnames=("lags", "n_groups", "method", "A", "per_lag"),
    donate_argnums=(0,),
)
def _count_pass_jit(table, pass_idx, codes, lengths, skip, stopped, groups,
                    lags, n_groups, method, A, per_lag, fresh=None):
    # pass_idx is a TRACED scalar: one compilation serves every pass.
    return _count_chunk_kernel(
        table, codes, lengths, skip, stopped, groups, lags, n_groups, method,
        shard=(pass_idx, dict(per_lag)), A=A, fresh=fresh,
    )


class MultiPassTransitionCounter(KmerShardedTransitionCounter):
    """Count transitions at lags whose table exceeds one chip, on one chip.

    Usage::

        counter = MultiPassTransitionCounter(lags=[14], passes=8)
        for p in range(counter.passes):
            counter.begin_pass(p)
            for chunk in chunk_stream():   # re-streamed each pass
                counter.add_chunk(chunk)
        counter.finish()

    The chunk stream must be IDENTICAL across passes (same reads in any
    order); each transition lands in exactly one pass's row range, so the
    union over passes is the exact full count (oracle-tested).
    """

    def __init__(self, lags: Sequence[int], n_groups: int = 1,
                 passes: int = 2, method: str = "auto",
                 alphabet: str = "dna"):
        from bear_tpu.ops import alphabets as _alpha

        if method not in ("auto", "scatter", "sorted"):
            raise ValueError(f"unknown counting method {method!r}")
        if passes < 1:
            raise ValueError("passes must be >= 1")
        self.passes = int(passes)
        self.alphabet = alphabet
        self.A = _alpha.alphabet_size(alphabet)
        self.A1 = self.A + 1
        self.lags = tuple(sorted(set(int(l) for l in lags)))
        # Context ROW codes must fit int32 inside the kernel (DNA: lag <= 15).
        if self.A ** max(self.lags) > np.iinfo(np.int32).max:
            raise ValueError(
                f"lag {max(self.lags)} context codes exceed int32 for a "
                f"{self.A}-letter alphabet — use "
                "bear_tpu.counting.sparse.SparseTransitionCounter (no dense "
                "table, no passes, DNA lag <= 30 / protein lag <= 13)"
            )
        self.n_groups = n_groups
        self.method = method
        # The row-split layout and drain decomposition are the parent's
        # (the shard axis is time: pass p plays device p).
        self._init_row_split(self.passes, "use more passes")
        # Hashable static form for jit (dict is unhashable as a static arg).
        self._per_lag_static = tuple(sorted(
            (l, v) for l, v in self._per_lag.items()
        ))
        self._pass = 0

    def begin_pass(self, pass_idx: int):
        """Flush any previous pass and start counting rows in range
        ``[pass_idx * stride, (pass_idx + 1) * stride)`` per lag."""
        if not (0 <= pass_idx < self.passes):
            raise ValueError(f"pass_idx {pass_idx} not in [0, {self.passes})")
        self.flush()
        self._pass = int(pass_idx)

    def finish(self):
        """Flush the final pass (any read accessor also flushes)."""
        self.flush()

    def _ensure_dev(self):
        if self._dev is None:
            self._dev = jnp.zeros(self._local_padded, jnp.int32)

    def add_chunk(self, chunk: ReadChunk):
        check_groups(chunk.groups, self.n_groups)
        codes = chunk.codes
        new_transitions = codes.shape[0] * (codes.shape[1] + 1)
        if self._since_flush + new_transitions > self.FLUSH_EVERY:
            self.flush()
        self._ensure_dev()
        self._dev = _count_pass_jit(
            self._dev,
            jnp.int32(self._pass),
            jnp.asarray(codes),
            jnp.asarray(chunk.lengths),
            jnp.asarray(chunk.skip),
            jnp.asarray(chunk.stopped),
            jnp.asarray(chunk.groups),
            self.lags,
            self.n_groups,
            self._resolve_method(new_transitions * len(self.lags)),
            self.A,
            self._per_lag_static,
            fresh=None if chunk.fresh is None else jnp.asarray(chunk.fresh),
        )
        self._since_flush += new_transitions

    def flush(self):
        """Drain this pass's nonzero entries into the host accumulator with
        GLOBAL keys ``(g * rows(lag) + pass*stride + r) * (A+1) + k`` (the
        parent's shard-drain decomposition with the pass index as the shard
        index)."""
        if self._dev is None or self._since_flush == 0:
            return
        self._drain_part(self._dev, self._pass)
        self._dev = None
        self._since_flush = 0

    def sync(self):
        if self._dev is not None:
            self._dev.block_until_ready()


def count_multipass(chunk_factory, lags, n_groups: int = 1, passes: int = 2,
                    method: str = "auto", alphabet: str = "dna",
                    ) -> MultiPassTransitionCounter:
    """Drive a full multi-pass count: ``chunk_factory()`` must return a fresh
    ReadChunk iterator (re-invoked once per pass)."""
    counter = MultiPassTransitionCounter(
        lags=lags, n_groups=n_groups, passes=passes, method=method,
        alphabet=alphabet,
    )
    for p in range(counter.passes):
        counter.begin_pass(p)
        for chunk in chunk_factory():
            counter.add_chunk(chunk)
    counter.finish()
    return counter
