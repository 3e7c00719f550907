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
    check_groups,
    FLUSH_EVERY as _FLUSH_EVERY,
    ReadChunk,
    _count_chunk_kernel,
    lag_offsets,
    rc_boundary_flags,
    reverse_complement_codes,
    table_rows,
)


def _make_sharded_count(mesh: Mesh, axis: str, lags, n_groups, method, A=4,
                        with_fresh: bool = False):
    """Build the jitted shard_map counting step for a mesh: the concatenated
    table [D, total] int32 sharded on axis 0, batch arrays sharded on axis 0
    as [D, B_local, ...]. Each device adds into its own partial table (by
    scatter or the pallas_hist sorted method) — no communication on the hot
    path. with_fresh adds the per-row ambig-piece boundary flag operand."""
    from jax import shard_map

    def per_device(tbl_slice, codes_l, lengths_l, skip_l, stopped_l, groups_l,
                   *fresh_l):
        out = _count_chunk_kernel(
            tbl_slice[0], codes_l[0], lengths_l[0], skip_l[0], stopped_l[0],
            groups_l[0], lags, n_groups, method, A=A,
            fresh=fresh_l[0][0] if with_fresh else None,
        )
        return out[None]

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P(axis, None),
            P(axis), P(axis), P(axis), P(axis), P(axis),
        ) + ((P(axis),) if with_fresh else ()),
        out_specs=P(axis, None),
    )
    return jax.jit(mapped, donate_argnums=(0,))


class ShardedTransitionCounter:
    """Drop-in multi-device analogue of TransitionCounter.

    Chunks are padded so the batch divides the ``data`` axis; padded rows
    have zero length and no stop, contributing nothing.
    """

    FLUSH_EVERY = _FLUSH_EVERY

    def __init__(self, mesh: Mesh, lags: Sequence[int], n_groups: int = 1,
                 reverse: bool = False, axis: str = "data",
                 method: str = "auto", alphabet: str = "dna"):
        from bear_tpu.counting.pallas_hist import padded_size
        from bear_tpu.ops import alphabets as _alpha

        self.mesh = mesh
        self.axis = axis
        self.n_dev = mesh.shape[axis]
        self.alphabet = alphabet
        self.A = _alpha.alphabet_size(alphabet)
        self.A1 = self.A + 1
        if reverse and self.A != 4:
            raise ValueError(
                "reverse-complement counting requires a 4-letter alphabet"
            )
        self.lags = tuple(sorted(set(int(l) for l in lags)))
        if self.A ** max(self.lags) > np.iinfo(np.int32).max:
            raise ValueError(
                f"lag {max(self.lags)} context codes exceed int32 for a "
                f"{self.A}-letter alphabet — use "
                "bear_tpu.counting.sparse.SparseTransitionCounter (no dense "
                "table, DNA lag <= 30 / protein lag <= 13)"
            )
        self.n_groups = n_groups
        self.reverse = reverse
        if method not in ("auto", "scatter", "sorted"):
            raise ValueError(f"unknown counting method {method!r}")
        self.method = method
        self._offsets, self._total_size = lag_offsets(
            self.lags, n_groups, self.A
        )
        self._buf_size = padded_size(self._total_size)
        if self._buf_size > np.iinfo(np.int32).max:
            raise ValueError(
                f"concatenated count table has {self._buf_size:,} entries "
                "(window-padded), beyond int32 indexing — split the lags "
                "across counters"
            )
        self._host: Dict[int, np.ndarray] = {
            l: np.zeros(n_groups * table_rows(l, self.A) * self.A1, np.int64)
            for l in self.lags
        }
        self._dev = None
        self._since_flush = 0
        self._count_fns = {}  # method -> jitted shard_map step

    def _resolve_method(self, new_transitions: int) -> str:
        from bear_tpu.counting.engine import resolve_method

        return resolve_method(self.method, new_transitions)

    def _count_fn(self, method: str, with_fresh: bool = False):
        key = (method, with_fresh)
        if key not in self._count_fns:
            self._count_fns[key] = _make_sharded_count(
                self.mesh, self.axis, self.lags, self.n_groups, method,
                self.A, with_fresh=with_fresh,
            )
        return self._count_fns[key]

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
            # The one cross-device reduction: sum partial tables. int32 is
            # exact here: the per-entry sum across devices is bounded by
            # the transitions since the last flush (< FLUSH_EVERY < 2^31).
            # (An int64 device sum would silently truncate without
            # jax_enable_x64 anyway.)
            merged = np.asarray(jnp.sum(self._dev, axis=0)).astype(np.int64)[
                : self._total_size
            ]
            for l in self.lags:
                off = self._offsets[l]
                self._host[l] += merged[off : off + self._host[l].size]
            self._dev = None
            self._since_flush = 0

    def add_chunk(self, chunk: ReadChunk):
        # Precondition checks run BEFORE the forward add so a rejected
        # chunk leaves the tables untouched (a post-add error would
        # double-count on retry); real errors, not -O-strippable asserts.
        check_groups(chunk.groups, self.n_groups)
        if self.reverse and not np.all(np.asarray(chunk.skip) == 0):
            raise ValueError(
                "reverse=True requires whole-read chunks (skip == 0)"
            )
        self._add(chunk.codes, chunk.lengths, chunk.skip, chunk.stopped,
                  chunk.groups, chunk.fresh)
        if self.reverse:
            rc, rlen = reverse_complement_codes(chunk.codes, chunk.lengths)
            # RC swaps the true-read boundary sides; rc_boundary_flags also
            # handles fresh=None chunks with un-stopped rows (engine.py).
            st_rc, fr_rc = rc_boundary_flags(chunk)
            self._add(rc, rlen, chunk.skip, st_rc, chunk.groups, fresh=fr_rc)

    def _add(self, codes, lengths, skip, stopped, groups, fresh=None):
        B, L = codes.shape
        pad = (-B) % self.n_dev
        if pad:
            codes = np.concatenate([codes, np.zeros((pad, L), codes.dtype)])
            lengths = np.concatenate([lengths, np.zeros(pad, lengths.dtype)])
            skip = np.concatenate([skip, np.zeros(pad, skip.dtype)])
            stopped = np.concatenate([stopped, np.zeros(pad, bool)])
            groups = np.concatenate([groups, np.zeros(pad, groups.dtype)])
            if fresh is not None:
                fresh = np.concatenate([fresh, np.ones(pad, bool)])
        D = self.n_dev
        Bl = (B + pad) // D

        new_transitions = codes.shape[0] * (L + 1)
        if self._since_flush + new_transitions > self.FLUSH_EVERY:
            self.flush()
        self._ensure_dev()

        bs = self._batch_sharding()
        put = lambda x: jax.device_put(np.asarray(x).reshape((D, Bl) + x.shape[1:]), bs)
        count = self._count_fn(
            self._resolve_method(new_transitions * len(self.lags)),
            with_fresh=fresh is not None,
        )
        args = [self._dev, put(codes), put(lengths), put(skip), put(stopped),
                put(groups)]
        if fresh is not None:
            args.append(put(fresh))
        self._dev = count(*args)
        self._since_flush += new_transitions

    @property
    def tables(self) -> Dict[int, np.ndarray]:
        self.flush()
        return {
            l: self._host[l].reshape(
                self.n_groups, table_rows(l, self.A), self.A1
            )
            for l in self.lags
        }


# --- k-mer-axis (tensor-parallel) sharded counting -------------------------


def _make_kmer_sharded_count(mesh: Mesh, axis: str, lags, n_groups, method,
                             per_lag, A=4, with_fresh: bool = False):
    """Jitted shard_map step for table-sharded counting: the table rows are
    range-split over the mesh axis (tensor parallelism — SURVEY.md §2's
    "shard the 4^L x (A+1) count tensor" row); each device receives the FULL
    replicated chunk and keeps only the transitions whose context row falls
    in its range (foreign rows clamp to the drop sentinel). No communication
    on the hot path, no all-reduce ever: shards are disjoint."""
    from jax import shard_map

    def per_device(tbl_slice, codes, lengths, skip, stopped, groups, *fresh):
        d = jax.lax.axis_index(axis).astype(jnp.int32)
        out = _count_chunk_kernel(
            tbl_slice[0], codes, lengths, skip, stopped, groups,
            lags, n_groups, method, shard=(d, per_lag), A=A,
            fresh=fresh[0] if with_fresh else None,
        )
        return out[None]

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P(), P(), P())
        + ((P(),) if with_fresh else ()),
        out_specs=P(axis, None),
    )
    return jax.jit(mapped, donate_argnums=(0,))


class KmerShardedTransitionCounter:
    """Transition counting with the COUNT TABLE sharded over a mesh axis.

    This is the tensor-parallel complement of ShardedTransitionCounter
    (which replicates the table and shards the batch): here each device owns
    a contiguous row range of every lag's table, so tables beyond one chip's
    HBM — lag 14-15 dense DNA tables, many groups — count across the mesh.
    All index arithmetic is shard-local, so the GLOBAL table may exceed
    int32 indexing (the single-device engine's hard limit).

    The host accumulator is SPARSE (per-lag row/count pairs): a dense lag-15
    host table would be 57 GB, while genome-scale data touches a small
    fraction of rows. Flushes pull only nonzero entries per shard.

    Limits: context codes are int32 (lag <= 15 for DNA, <= 7 for proteins);
    each device's local slice must stay below 2^31 entries.
    """

    FLUSH_EVERY = _FLUSH_EVERY

    def __init__(self, mesh: Mesh, lags: Sequence[int], n_groups: int = 1,
                 axis: str = "kmer", method: str = "auto",
                 alphabet: str = "dna"):
        from bear_tpu.counting.pallas_hist import padded_size
        from bear_tpu.ops import alphabets as _alpha

        if method not in ("auto", "scatter", "sorted"):
            raise ValueError(f"unknown counting method {method!r}")
        self.mesh = mesh
        self.axis = axis
        self.n_dev = mesh.shape[axis]
        self.alphabet = alphabet
        self.A = _alpha.alphabet_size(alphabet)
        self.A1 = self.A + 1
        self.lags = tuple(sorted(set(int(l) for l in lags)))
        if self.A ** max(self.lags) > np.iinfo(np.int32).max:
            raise ValueError(
                f"lag {max(self.lags)} context codes exceed int32 for a "
                f"{self.A}-letter alphabet — use "
                "bear_tpu.counting.sparse.SparseTransitionCounter (no dense "
                "table, DNA lag <= 30 / protein lag <= 13)"
            )
        self.n_groups = n_groups
        self.method = method
        self._init_row_split(self.n_dev, "use more devices on the kmer axis")
        self._count_fns = {}

    def _init_row_split(self, n_shards: int, remedy: str):
        """Per-lag row-range split across ``n_shards`` (shard d owns rows
        [d*stride, (d+1)*stride); the last shard's tail rows past rows(lag)
        simply never match), the int32 local-slice guard, and the sparse
        host accumulator state. Shared with MultiPassTransitionCounter,
        whose shard axis is time (pass p plays device p) — the stride
        layout and drain decomposition MUST stay identical between the two
        or their exactness oracles diverge."""
        from bear_tpu.counting.pallas_hist import padded_size

        self._per_lag = {}
        loc_off = 0
        for l in self.lags:
            stride = -(-table_rows(l, self.A) // n_shards)
            self._per_lag[l] = (stride, stride, loc_off)
            loc_off += self.n_groups * stride * self.A1
        self._local_size = loc_off
        self._local_padded = padded_size(loc_off)
        if self._local_padded > np.iinfo(np.int32).max:
            raise ValueError(
                f"per-shard table slice has {self._local_padded:,} entries, "
                f"beyond int32 indexing — {remedy}"
            )
        # Sparse host accumulator: per lag, lists of (flat int64 keys, counts).
        self._sparse: Dict[int, list] = {l: [] for l in self.lags}
        self._consolidated_lags: set = set()  # lags whose single part is
        # already unique+sorted (skip re-sorting on repeated access)
        self._grk_cache: Dict[int, tuple] = {}  # lag -> (keys, g, r, k)
        self._dev = None
        self._since_flush = 0

    def _drain_part(self, part, d: int):
        """Decompose one shard's nonzero local entries into GLOBAL int64
        keys ``(g * rows(lag) + d*stride + r) * (A+1) + k`` and append them
        to the sparse accumulator (bounded chunks via extract_nonzero, so
        device temporaries never approach the shard size)."""
        from bear_tpu.counting.engine import extract_nonzero

        for idx, vals in extract_nonzero(part):
            for l in self.lags:
                stride, local_rows, loc_off = self._per_lag[l]
                A1 = self.A1
                span = self.n_groups * local_rows * A1
                sel = (idx >= loc_off) & (idx < loc_off + span)
                if not sel.any():
                    continue
                t = idx[sel] - loc_off
                g = t // (local_rows * A1)
                r = (t % (local_rows * A1)) // A1
                k = t % A1
                grow = d * stride + r
                key = (g * table_rows(l, self.A) + grow) * A1 + k
                self._sparse[l].append((key, vals[sel]))
                self._consolidated_lags.discard(l)

    @property
    def max_lag(self) -> int:
        return max(self.lags)

    def _resolve_method(self, new_transitions: int) -> str:
        from bear_tpu.counting.engine import resolve_method

        return resolve_method(self.method, new_transitions)

    def _count_fn(self, method: str, with_fresh: bool = False):
        key = (method, with_fresh)
        if key not in self._count_fns:
            self._count_fns[key] = _make_kmer_sharded_count(
                self.mesh, self.axis, self.lags, self.n_groups, method,
                self._per_lag, self.A, with_fresh=with_fresh,
            )
        return self._count_fns[key]

    def _ensure_dev(self):
        if self._dev is None:
            self._dev = jax.device_put(
                jnp.zeros((self.n_dev, self._local_padded), jnp.int32),
                NamedSharding(self.mesh, P(self.axis, None)),
            )

    def add_chunk(self, chunk: ReadChunk):
        check_groups(chunk.groups, self.n_groups)
        codes = chunk.codes
        new_transitions = codes.shape[0] * (codes.shape[1] + 1)
        if self._since_flush + new_transitions > self.FLUSH_EVERY:
            self.flush()
        self._ensure_dev()
        rep = NamedSharding(self.mesh, P())
        put = lambda x: jax.device_put(np.asarray(x), rep)
        count = self._count_fn(
            self._resolve_method(new_transitions * len(self.lags)),
            with_fresh=chunk.fresh is not None,
        )
        args = [self._dev, put(codes), put(chunk.lengths), put(chunk.skip),
                put(chunk.stopped), put(chunk.groups)]
        if chunk.fresh is not None:
            args.append(put(chunk.fresh))
        self._dev = count(*args)
        self._since_flush += new_transitions

    def flush(self):
        """Pull each shard's nonzero entries into the sparse host
        accumulator (global int64 keys ``(g * rows + row) * (A+1) + k``).

        Works shard-by-shard on each shard's OWN device via
        addressable_shards (indexing the global array would copy every
        shard onto one device first) and in bounded chunks
        (engine.extract_nonzero) so device temporaries never approach the
        multi-GB shard size this class exists for. Multi-host: each process
        drains only its local shards; merge with multihost.allreduce_tables.
        """
        if self._dev is None or self._since_flush == 0:
            return
        for sh in self._dev.addressable_shards:
            if sh.replica_id != 0:
                # A mesh with axes beyond the kmer axis replicates each row
                # slice across them; draining every replica would double
                # (or n-fold) all counts. One replica per slice is exact.
                continue
            d = sh.index[0].start or 0
            # [local_padded] on this shard's device
            self._drain_part(sh.data.reshape(-1), d)
        self._dev = None
        self._since_flush = 0

    def _consolidated(self, lag: int):
        """(sorted unique int64 keys, int64 counts) for one lag."""
        self.flush()
        parts = self._sparse[lag]
        if not parts:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        if lag in self._consolidated_lags and len(parts) == 1:
            return parts[0]  # already unique + sorted; skip the re-sort
        keys = np.concatenate([p[0] for p in parts])
        vals = np.concatenate([p[1] for p in parts])
        uniq, inv = np.unique(keys, return_inverse=True)
        exact = np.zeros(len(uniq), np.int64)
        np.add.at(exact, inv, vals)
        self._sparse[lag] = [(uniq, exact)]
        self._consolidated_lags.add(lag)
        return uniq, exact

    def nonzero_rows(self, lag: int) -> np.ndarray:
        keys, _ = self._consolidated(lag)
        return np.unique(keys // self.A1 % table_rows(lag, self.A))

    def counts_for_rows(self, lag: int, rows: np.ndarray) -> np.ndarray:
        """Dense [len(rows), n_groups, A+1] counts for the given rows."""
        keys, vals = self._consolidated(lag)
        A1 = self.A1
        out = np.zeros((len(rows), self.n_groups, A1), np.int64)
        if len(rows) == 0 or len(keys) == 0:
            return out
        # Dedupe the query rows: searchsorted maps each key to ONE position,
        # so duplicate entries in ``rows`` would silently come back zero.
        # Compute over the sorted unique rows and expand at the end.
        uniq_rows, inv_rows = np.unique(np.asarray(rows), return_inverse=True)
        out_u = np.zeros((len(uniq_rows), self.n_groups, A1), np.int64)
        # The (g, r, k) decomposition of the consolidated keys is invariant
        # until the next flush/merge re-consolidates; repeated queries (the
        # scoring path issues one per call) reuse it. Validity is keyed on
        # the identity of the consolidated keys array itself.
        cache = self._grk_cache.get(lag)
        if cache is None or cache[0] is not keys:
            g = keys // A1 // table_rows(lag, self.A)
            r = keys // A1 % table_rows(lag, self.A)
            k = keys % A1
            self._grk_cache[lag] = (keys, g, r, k)
        else:
            _, g, r, k = cache
        pos = np.searchsorted(uniq_rows, r)
        hit = (pos < len(uniq_rows)) & (
            uniq_rows[np.clip(pos, 0, len(uniq_rows) - 1)] == r)
        out_u[pos[hit], g[hit], k[hit]] = vals[hit]
        out[...] = out_u[inv_rows]
        return out

    def to_dataset(self, lag: int, alphabet: str | None = None):
        """In-memory dataset handoff (sparse host path; see
        TransitionCounter.to_dataset)."""
        from bear_tpu.data import CountDataset
        from bear_tpu.counting.engine import rows_to_contexts
        from bear_tpu.ops import alphabets

        alphabet = alphabet or self.alphabet
        if alphabets.alphabet_size(alphabet) != self.A:
            raise ValueError(
                f"count tables are base-{self.A}; alphabet {alphabet!r} has "
                f"{alphabets.alphabet_size(alphabet)} residues"
            )
        rows = self.nonzero_rows(lag)
        kmers = rows_to_contexts(rows, lag, alphabet)
        counts = self.counts_for_rows(lag, rows).astype(np.float64)
        codes = (
            alphabets.encode_kmers(kmers, alphabet)
            if len(kmers)
            else np.zeros((0, lag), np.int8)
        )
        return CountDataset(kmers=kmers, codes=codes, counts=counts,
                            alphabet=alphabet)

    def sync(self):
        """Block until all queued device counting work has completed."""
        if self._dev is not None:
            self._dev.block_until_ready()

    def merge_from(self, other: "KmerShardedTransitionCounter"):
        """Merge partial counts (cross-process/cross-job reduction point)."""
        self.flush()
        other.flush()
        for l in self.lags:
            self._sparse[l].extend(other._sparse[l])
            self._consolidated_lags.discard(l)

    @property
    def tables(self) -> Dict[int, np.ndarray]:
        """Dense host tables {lag: [n_groups, rows, 5]} — only for lags whose
        dense table is host-feasible; use nonzero_rows/counts_for_rows or
        to_dataset at lag 14-15 scale."""
        out = {}
        for l in self.lags:
            entries = self.n_groups * table_rows(l, self.A) * self.A1
            if entries > (1 << 33):
                raise ValueError(
                    f"dense lag-{l} host table would hold {entries:,} int64 "
                    "entries; use nonzero_rows/counts_for_rows instead"
                )
            keys, vals = self._consolidated(l)
            tab = np.zeros(entries, np.int64)
            tab[keys] = vals
            out[l] = tab.reshape(self.n_groups, table_rows(l, self.A), self.A1)
        return out

    def save_state(self, path: str):
        """Checkpoint the sparse accumulated counts (resume point for long
        counting jobs; see TransitionCounter.save_state)."""
        self.flush()
        if not path.endswith(".npz"):
            path += ".npz"  # np.savez appends it; keep load_state symmetric
        arrays = {}
        for l in self.lags:
            keys, vals = self._consolidated(l)
            arrays[f"keys_{l}"] = keys
            arrays[f"vals_{l}"] = vals
        np.savez_compressed(
            path, lags=np.array(self.lags), n_groups=np.array(self.n_groups),
            alphabet=np.array(self.alphabet),
            reverse=np.array(getattr(self, "reverse", False)), **arrays,
        )

    def load_state(self, path: str):
        """Restore counts saved by save_state into THIS counter (the mesh is
        runtime state and is not serialized; construct the counter first)."""
        data = np.load(path)
        ckpt_alpha = str(data["alphabet"]) if "alphabet" in data else "dna"
        ckpt_rev = bool(data["reverse"]) if "reverse" in data else False
        if (
            tuple(int(l) for l in data["lags"]) != self.lags
            or int(data["n_groups"]) != self.n_groups
            or ckpt_alpha != self.alphabet
            or ckpt_rev != bool(getattr(self, "reverse", False))
        ):
            raise ValueError(
                "checkpoint lags/n_groups/reverse/alphabet do not match "
                "counter"
            )
        self.flush()
        for l in self.lags:
            self._sparse[l].append(
                (data[f"keys_{l}"].astype(np.int64),
                 data[f"vals_{l}"].astype(np.int64))
            )
            self._consolidated_lags.discard(l)

    def export_tsv(self, out_prefix: str, lag: int, n_bin_bits: int = 0,
                   seed: int = 0, shuffle: bool = False, rows=None):
        """Reference-format TSV export (see engine.write_tsv_shards)."""
        from bear_tpu.counting.engine import write_tsv_shards

        if rows is None:
            rows = self.nonzero_rows(lag)
        return write_tsv_shards(
            out_prefix, lag, rows, self.counts_for_rows(lag, rows),
            n_bin_bits, seed=seed, shuffle=shuffle, alphabet=self.alphabet,
        )

    def validate(self, expected_transitions=None):
        """Count-conservation invariant (see TransitionCounter.validate)."""
        totals = {l: int(self._consolidated(l)[1].sum()) for l in self.lags}
        values = set(totals.values())
        if len(values) > 1:
            raise AssertionError(
                f"count tables disagree on total transitions: {totals}"
            )
        if expected_transitions is not None:
            got = next(iter(values)) if values else 0
            if got != expected_transitions:
                raise AssertionError(
                    f"count conservation violated: counted {got}, "
                    f"expected {expected_transitions}"
                )
        return totals
