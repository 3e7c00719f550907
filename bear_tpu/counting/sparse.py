"""Sparse-first transition counting: no dense table, no lag ceiling.

The dense counters index a ``~1.33 * A^lag x (A+1)`` table with int32 flat
offsets, which caps DNA at lag 15 and proteins at lag 7 (engine.py:420-424).
KMC — the reference's counter — has no such cap (k <= 256: reference
summarize.py:322-328 passes ``-k{k}`` straight through) because it never
densifies: it sorts packed k-mer codes and merges runs. This module is the
TPU-native version of that design:

    device: rolling context codes in TWO int32 halves (low/high digit
            blocks) + a small type key (n_pad, next symbol, group),
            appended chunk after chunk into a DEVICE-RESIDENT key buffer
            (the role of KMC's in-memory bin accumulation before disk,
            reference summarize.py:322-340)
            -> when the buffer fills (~a dozen chunks), ONE 3-key
            lexicographic sort of the whole window (lax.sort)
            -> run boundaries -> (unique key triple, run length)
    host:   once per WINDOW (not per chunk), reassemble exact int64 global
            keys (g * rows(lag) + row) * (A+1) + next and merge into the
            SAME sparse accumulator the kmer-sharded/multipass counters
            use. At coverage c the within-window duplication factor
            divides the drained bytes by ~c, and no per-chunk scalar sync
            ever happens — the round-4 per-chunk drain was link-bound at
            135x below the dense kernel (PERF.md).

``mesh=`` shards chunk rows over a mesh axis: each device appends its rows'
keys into its own buffer slice (shard_map, no communication), windows sort
per device, and each process drains only its addressable shards — the
data-parallel story of the dense ShardedTransitionCounter applied to the
one counter with no lag ceiling (reference DP counting via
MirroredStrategy, bear_net.py:246). Cross-host merging rides
parallel.multihost.allreduce_tables unchanged (the host accumulator is the
shared ``_sparse`` machinery).

Device memory is bounded by the BUFFER size (never the 4^lag key space), so
one chip counts at any lag whose distinct-context count fits host memory —
the actual resource that bounds the problem (distinct contexts <= corpus
size, ~1e9 for a human genome, vs 4^20 = 1.1e12 table rows).

Capacity: the two int32 digit halves hold floor(log_A 2^31) digits each
(DNA 2x15, protein 2x7), and the int64 global key caps
n_groups * rows(lag) * (A+1) at 2^63 — the binding cap for protein, where
rows(14, 20) * 21 overflows int64. Net: DNA lag <= 30, protein lag <= 13
(max_sparse_lag), both checked at construction.

All host-side machinery (sparse consolidation, nonzero_rows /
counts_for_rows, to_dataset, export_tsv, save/load_state, validate,
TableCounter serving, train_streaming feeds) is inherited from
KmerShardedTransitionCounter unchanged — only the device path differs.

Counting semantics are bit-identical to the dense engine (same ReadChunk
contract: '['-padded prefixes, '$' stop transitions, skip/fresh segment
flags, reverse complement) and oracle-tested against it and against the
brute-force recount.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from bear_tpu.counting.engine import (
    check_groups,
    FLUSH_EVERY,
    ReadChunk,
    pad_offset,
    rc_boundary_flags,
    reverse_complement_codes,
    table_rows,
)
from bear_tpu.parallel.counting import KmerShardedTransitionCounter

_SENT = np.iinfo(np.int32).max  # masked positions sort past every real key
# Consolidate the host accumulator when this many un-merged entries are
# pending (bounds host memory at ~1.5 GB of (key, count) pairs).
CONSOLIDATE_PENDING = 1 << 26
# Default per-device key-buffer budget in TOTAL entries, SPLIT ACROSS LAGS
# (each lag owns one buffer triple; 3 int32 arrays = 12 bytes/entry ->
# 768 MB total at the default). The effective per-lag window adapts down to
# ~16 chunks of the current chunk size, so small jobs never allocate it.
DEVICE_BUFFER = 1 << 26
# Window size target in chunks: capacity adapts to hold about this many
# chunks between drains (the drain amortization factor).
_WINDOW_CHUNKS = 16


def digit_split(A: int) -> int:
    """Digits per int32 half: the largest m with A^m <= int32 max
    (DNA 15, protein 7)."""
    m = 0
    while A ** (m + 1) <= np.iinfo(np.int32).max:
        m += 1
    return m


def max_sparse_lag(A: int, n_groups: int = 1) -> int:
    """Largest lag the sparse counter supports: two int32 digit halves
    (lag <= 2m) AND the int64 global key n_groups * rows(lag) * (A+1)."""
    m = digit_split(A)
    lag = 2 * m
    while lag > 0 and n_groups * table_rows(lag, A) * (A + 1) > np.iinfo(np.int64).max:
        lag -= 1
    return lag


def _chunk_keys(codes, lengths, skip, stopped, groups, fresh,
                lags, n_groups, A, with_fresh):
    """Per lag: flattened [B*(L+1)] masked key triples (t, hi, lo) for every
    transition position of a chunk (masked positions carry the sentinel t).

    Key layout per transition position (same index math as
    engine._count_chunk_kernel, which it is oracle-tested against):
      lo = sum_{i=1..min(lag,m)}  d_i * A^(i-1)     (d_i = i-th previous base)
      hi = sum_{i=m+1..lag}       d_i * A^(i-1-m)
      t  = (n_pad * (A+1) + next) * n_groups + group   (masked -> sentinel)
    Pads beyond the read start read the zero padding, which is exactly the
    truncated-prefix code; n_pad in the t key disambiguates 'A' digits from
    '[' pads. Traced inside the append step (one dispatch per chunk).
    """
    B, L = codes.shape
    P = L + 1
    j = jnp.arange(P, dtype=jnp.int32)[None, :]
    codes32 = codes.astype(jnp.int32)
    lengths = lengths.astype(jnp.int32)[:, None]
    skip = skip.astype(jnp.int32)[:, None]
    groups32 = groups.astype(jnp.int32)[:, None]
    A1 = A + 1
    max_lag = max(lags)
    m = digit_split(A)

    padded = jnp.pad(codes32, ((0, 0), (max_lag, 1)))
    nxt = jnp.where(j < lengths, padded[:, max_lag : max_lag + P], A)
    mask = (j >= skip) & (
        (j < lengths) | ((j == lengths) & stopped.astype(bool)[:, None])
    )
    fresh_col = fresh.astype(bool)[:, None] if with_fresh else None

    out = {}
    lo_acc = jnp.zeros((B, P), dtype=jnp.int32)
    hi_acc = jnp.zeros((B, P), dtype=jnp.int32)
    pow_lo = 1
    pow_hi = 1
    for l in range(1, max_lag + 1):
        shifted = padded[:, max_lag - l : max_lag - l + P]
        if l <= m:
            lo_acc = lo_acc + shifted * pow_lo
            pow_lo *= A
        else:
            hi_acc = hi_acc + shifted * pow_hi
            pow_hi *= A
        if l not in lags:
            continue
        mask_l = mask if fresh_col is None else mask & (fresh_col | (j >= l))
        n_pad = jnp.maximum(0, l - j)
        t = jnp.where(
            mask_l, (n_pad * A1 + nxt) * n_groups + groups32, _SENT
        )
        out[l] = (t.reshape(-1), hi_acc.reshape(-1), lo_acc.reshape(-1))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("lags", "n_groups", "A", "with_fresh"),
    donate_argnums=(0,),
)
def _append_chunk_jit(bufs, offset, codes, lengths, skip, stopped, groups,
                      fresh, lags, n_groups, A, with_fresh):
    """Compute a chunk's key triples and write them into the per-lag device
    buffers at ``offset`` — ONE dispatch per chunk, no sync, no fetch.
    ``bufs``: {lag: (t_buf, hi_buf, lo_buf)} (donated)."""
    keys = _chunk_keys(codes, lengths, skip, stopped, groups, fresh,
                       lags, n_groups, A, with_fresh)
    out = {}
    for l in lags:
        t, h, lo_ = keys[l]
        bt, bh, bl = bufs[l]
        out[l] = (
            jax.lax.dynamic_update_slice(bt, t, (offset,)),
            jax.lax.dynamic_update_slice(bh, h, (offset,)),
            jax.lax.dynamic_update_slice(bl, lo_, (offset,)),
        )
    return out


@jax.jit
def _window_sort_jit(bt, bh, bl):
    """One 3-key lexicographic sort of a whole key-buffer window + run-start
    scalars. Sentinel-t entries (masked positions and the unfilled tail)
    sort past every real key and are excluded by ``n_valid``. Only the two
    scalars are fetched; _compact_runs_jit gathers exactly the run heads."""
    ts, hs, ls = jax.lax.sort((bt, bh, bl), num_keys=3)
    valid = ts != _SENT
    prev_ne = jnp.concatenate([
        jnp.ones(1, bool),
        (ts[1:] != ts[:-1]) | (hs[1:] != hs[:-1]) | (ls[1:] != ls[:-1]),
    ])
    run_start = valid & prev_ne
    return ts, hs, ls, jnp.sum(run_start.astype(jnp.int32)), jnp.sum(
        valid.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("u_pad",))
def _compact_runs_jit(ts, hs, ls, u_pad):
    """Gather the first u_pad run heads of a sorted key stream: positions +
    key triples. u_pad buckets to powers of two so distinct run counts reuse
    a handful of compilations (the device_nonzero pattern)."""
    N = ts.shape[0]
    valid = ts != _SENT
    prev_ne = jnp.concatenate([
        jnp.ones(1, bool),
        (ts[1:] != ts[:-1]) | (hs[1:] != hs[:-1]) | (ls[1:] != ls[:-1]),
    ])
    run_start = valid & prev_ne
    pos = jnp.nonzero(run_start, size=u_pad, fill_value=N)[0].astype(jnp.int32)
    safe = jnp.clip(pos, 0, N - 1)
    return pos, ts[safe], hs[safe], ls[safe]


class SparseTransitionCounter(KmerShardedTransitionCounter):
    """Sparse-first counter for lags beyond the dense-table range (DNA
    lag >= 16, protein lag >= 8; up to lag 30 / 13), single-chip or
    sharded over a device mesh.

    Drop-in for the other counters' read surface (nonzero_rows,
    counts_for_rows, to_dataset, export_tsv, save/load_state, validate,
    merge_from) and ReadChunk ingest surface (add_chunk incl. reverse
    complement, segment skip, ambig fresh flags). Chunks append their raw
    key triples into a device-resident buffer (one dispatch, no sync); the
    buffer sorts and drains to the host once per ~16 chunks or at
    ``flush()`` — never per chunk.

    Parameters
    ----------
    mesh / axis : optional jax Mesh: chunk rows shard over ``axis``; each
        device buffers and sorts its own rows' keys and each process
        drains only its local shards (merge across processes with
        parallel.multihost.allreduce_tables).
    device_buffer : per-device key-buffer budget in TOTAL entries,
        split across the counted lags (12 bytes/entry); each lag's
        effective window adapts down to ~16 chunks of the current chunk
        size and ratchets up for bigger chunks.
    """

    FLUSH_EVERY = FLUSH_EVERY

    def __init__(self, lags: Sequence[int], n_groups: int = 1,
                 reverse: bool = False, alphabet: str = "dna",
                 mesh=None, axis: str = "data",
                 device_buffer: int = DEVICE_BUFFER):
        from bear_tpu.ops import alphabets as _alpha

        self.alphabet = alphabet
        self.A = _alpha.alphabet_size(alphabet)
        self.A1 = self.A + 1
        if reverse and self.A != 4:
            raise ValueError(
                "reverse-complement counting requires a 4-letter alphabet"
            )
        self.lags = tuple(sorted(set(int(l) for l in lags)))
        cap = max_sparse_lag(self.A, n_groups)
        if max(self.lags) > cap:
            raise ValueError(
                f"lag {max(self.lags)} exceeds the sparse counter's cap of "
                f"{cap} for a {self.A}-letter alphabet at n_groups="
                f"{n_groups} (two int32 digit halves + the int64 global key)"
            )
        self.n_groups = n_groups
        self.reverse = reverse
        self.mesh = mesh
        self.axis = axis
        self.n_dev = int(mesh.shape[axis]) if mesh is not None else 1
        if device_buffer < 1:
            raise ValueError("device_buffer must be >= 1")
        self.device_buffer = int(device_buffer)
        self._m = digit_split(self.A)
        self._sparse = {l: [] for l in self.lags}
        self._consolidated_lags: set = set()
        self._grk_cache = {}
        self._pending = 0  # un-consolidated host entries across all lags
        self._buf = None   # {lag: (t, hi, lo)} device buffers
        self._cap = None   # effective per-device capacity (set on first add)
        self._fill = 0     # filled entries per device (same for every lag)
        self._mesh_append = {}  # with_fresh -> jitted shard_map append
        self._buf_maker = None  # jitted buffer allocator (per capacity)
        self._last_upad = {}    # lag -> previous window's compact bucket

    @property
    def max_lag(self) -> int:
        return max(self.lags)

    def add_chunk(self, chunk: ReadChunk):
        check_groups(chunk.groups, self.n_groups)
        if self.reverse and np.any(np.asarray(chunk.skip) != 0):
            # Same contract as TransitionCounter.add_chunk: RC of a
            # continuation segment needs right-side context the row lacks;
            # segmented long sequences use chunk_reads(reverse=True).
            raise ValueError(
                "reverse=True requires whole-read chunks (skip == 0); "
                "for segmented long sequences use chunk_reads(reverse=True)"
            )
        self._add(chunk.codes, chunk.lengths, chunk.skip, chunk.stopped,
                  chunk.groups, chunk.fresh)
        if self.reverse:
            rc, rlen = reverse_complement_codes(chunk.codes, chunk.lengths)
            st_rc, fr_rc = rc_boundary_flags(chunk)
            self._add(rc, rlen, chunk.skip, st_rc, chunk.groups, fresh=fr_rc)

    # --- device buffer management -----------------------------------------

    def _ensure_cap(self, n_local: int, row_width: int):
        """Size the effective per-device window capacity: ~16 chunks of
        the CURRENT chunk's size, bounded by the configured budget SPLIT
        ACROSS LAGS (every lag owns its own buffer triple — a 20-lag
        summarize job must not allocate 20 full budgets), never below one
        row's transitions (so row slicing terminates). The capacity
        RATCHETS UP when a bigger chunk (or wider rows) arrives — a small
        first chunk must not pin the window size for the whole stream, and
        collapsing to one-row windows would reintroduce the per-chunk
        drain this design removes (each raise drains once and reallocates;
        monotonic, so raises are rare)."""
        want = max(
            min(self.device_buffer // len(self.lags),
                _WINDOW_CHUNKS * n_local),
            row_width,
        )
        if self._cap is None:
            self._cap = want
        elif want > self._cap:
            self._drain_all()
            self._cap = want
            self._buf_maker = None

    def _new_buffers(self):
        """Fresh sentinel-t buffers (hi/lo need no reset: runs are keyed on
        t first and sentinel entries never start a counted run)."""
        if self._buf_maker is None:
            cap = self._cap
            if self.mesh is None:
                self._buf_maker = jax.jit(
                    lambda: (jnp.full((cap,), _SENT, jnp.int32),
                             jnp.zeros((cap,), jnp.int32),
                             jnp.zeros((cap,), jnp.int32)))
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh = NamedSharding(self.mesh, P(self.axis, None))
                self._buf_maker = jax.jit(
                    lambda: (jnp.full((self.n_dev, cap), _SENT, jnp.int32),
                             jnp.zeros((self.n_dev, cap), jnp.int32),
                             jnp.zeros((self.n_dev, cap), jnp.int32)),
                    out_shardings=(sh, sh, sh))
        self._buf = {l: self._buf_maker() for l in self.lags}
        self._fill = 0

    def _mesh_append_fn(self, with_fresh: bool):
        if with_fresh not in self._mesh_append:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            lags, n_groups, A = self.lags, self.n_groups, self.A
            axis = self.axis

            def per_device(bufs, offset, codes, lengths, skip, stopped,
                           groups, *fresh):
                keys = _chunk_keys(
                    codes[0], lengths[0], skip[0], stopped[0], groups[0],
                    fresh[0][0] if with_fresh else None,
                    lags, n_groups, A, with_fresh,
                )
                out = {}
                for l in lags:
                    t, h, lo_ = keys[l]
                    bt, bh, bl = bufs[l]
                    out[l] = (
                        jax.lax.dynamic_update_slice(bt[0], t, (offset,))[None],
                        jax.lax.dynamic_update_slice(bh[0], h, (offset,))[None],
                        jax.lax.dynamic_update_slice(bl[0], lo_, (offset,))[None],
                    )
                return out

            mapped = shard_map(
                per_device,
                mesh=self.mesh,
                in_specs=(
                    P(axis, None), P(),
                    P(axis), P(axis), P(axis), P(axis), P(axis),
                ) + ((P(axis),) if with_fresh else ()),
                out_specs=P(axis, None),
            )
            self._mesh_append[with_fresh] = jax.jit(
                mapped, donate_argnums=(0,))
        return self._mesh_append[with_fresh]

    def _add(self, codes, lengths, skip, stopped, groups, fresh=None):
        B, L = codes.shape
        if B == 0:
            return
        P_ = L + 1
        D = self.n_dev
        pad = (-B) % D
        n_local = ((B + pad) // D) * P_
        self._ensure_cap(n_local, P_)
        if n_local > self._cap:
            # A single chunk larger than the buffer: slice its rows so each
            # slice fits (keeps the windowed path the only code path).
            codes = np.asarray(codes)
            rows_per = max(D, (self._cap // P_) * D)
            for s0 in range(0, B, rows_per):
                sl = slice(s0, s0 + rows_per)
                self._add(codes[sl], np.asarray(lengths)[sl],
                          np.asarray(skip)[sl], np.asarray(stopped)[sl],
                          np.asarray(groups)[sl],
                          None if fresh is None else np.asarray(fresh)[sl])
            return
        if self._buf is not None and self._fill + n_local > self._cap:
            self._drain_all()
        if self._buf is None:
            self._new_buffers()

        if self.mesh is not None or pad:
            # Padding / mesh placement run on the host. The single-device
            # no-pad path below takes arrays AS GIVEN instead — a chunk
            # already staged on device flows straight into the append jit
            # (an unconditional np.asarray would fetch it back per call).
            codes = np.asarray(codes)
            lengths = np.asarray(lengths)
            skip = np.asarray(skip)
            stopped = np.asarray(stopped)
            groups = np.asarray(groups)
            if fresh is not None:
                fresh = np.asarray(fresh)
        if pad:
            codes = np.concatenate([codes, np.zeros((pad, L), codes.dtype)])
            lengths = np.concatenate([lengths, np.zeros(pad, lengths.dtype)])
            skip = np.concatenate([skip, np.zeros(pad, skip.dtype)])
            stopped = np.concatenate([stopped, np.zeros(pad, bool)])
            groups = np.concatenate([groups, np.zeros(pad, groups.dtype)])
            if fresh is not None:
                fresh = np.concatenate([fresh, np.ones(pad, bool)])

        with_fresh = fresh is not None
        offset = jnp.int32(self._fill)
        if self.mesh is None:
            self._buf = _append_chunk_jit(
                self._buf, offset, jnp.asarray(codes), jnp.asarray(lengths),
                jnp.asarray(skip), jnp.asarray(stopped), jnp.asarray(groups),
                jnp.asarray(fresh) if with_fresh else jnp.zeros(
                    codes.shape[0], bool),
                self.lags, self.n_groups, self.A, with_fresh,
            )
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            bs = NamedSharding(self.mesh, P(self.axis))
            Bl = (B + pad) // D
            put = lambda x: jax.device_put(  # noqa: E731
                np.asarray(x).reshape((D, Bl) + x.shape[1:]), bs)
            args = [self._buf, offset, put(codes), put(lengths), put(skip),
                    put(stopped), put(groups)]
            if with_fresh:
                args.append(put(fresh))
            self._buf = self._mesh_append_fn(with_fresh)(*args)
        self._fill += n_local

    def _drain_all(self):
        """Sort every lag's buffer window, fetch only the consolidated runs,
        and merge them into the host accumulator. One scalar sync + one
        run fetch per (lag, device) per WINDOW."""
        # Detach the buffer FIRST: _push may trigger a host consolidation,
        # whose inherited machinery calls flush() — with the buffer still
        # attached that re-enters this drain (infinite recursion).
        buf, self._buf = self._buf, None
        fill, self._fill = self._fill, 0
        if buf is None or fill == 0:
            return
        for l in self.lags:
            bt, bh, bl = buf[l]
            if self.mesh is None:
                self._drain_one(l, bt, bh, bl)
            else:
                # Per-device windows drain independently on their own
                # device; a process drains only its addressable shards
                # (multi-host merging is allreduce_tables' job).
                sh_h = {s.device: s.data for s in bh.addressable_shards}
                sh_l = {s.device: s.data for s in bl.addressable_shards}
                for s in bt.addressable_shards:
                    if s.replica_id != 0:
                        # Axes beyond `axis` replicate buffer slices;
                        # draining every replica would multiply counts.
                        continue
                    self._drain_one(
                        l, s.data.reshape(-1),
                        sh_h[s.device].reshape(-1),
                        sh_l[s.device].reshape(-1),
                    )

    def _drain_one(self, lag: int, bt, bh, bl):
        ts, hs, ls, n_runs, n_valid = _window_sort_jit(bt, bh, bl)
        # Speculative compact: dispatch the run gather with the PREVIOUS
        # window's u_pad BEFORE the run-count scalar fetch syncs — window
        # distinct counts are stable in steady state, so the gather is
        # usually in flight already when the scalar arrives (saves one
        # dispatch round trip per drain; matters on remote-dispatch links).
        guess = self._last_upad.get(lag)
        spec = _compact_runs_jit(ts, hs, ls, guess) if guess else None
        U = int(n_runs)
        if U == 0:
            return
        nv = int(n_valid)
        u_pad = 1 << (U - 1).bit_length()
        if spec is not None and u_pad <= guess:
            pos, t_g, h_g, l_g = spec  # first U entries are exact
        else:
            pos, t_g, h_g, l_g = _compact_runs_jit(ts, hs, ls, u_pad)
        self._last_upad[lag] = u_pad
        pos = np.asarray(pos[:U], np.int64)
        counts = np.diff(np.append(pos, nv)).astype(np.int64)
        self._push(lag, np.asarray(t_g[:U]), np.asarray(h_g[:U]),
                   np.asarray(l_g[:U]), counts)

    def _push(self, lag: int, t: np.ndarray, hi: np.ndarray, lo: np.ndarray,
              counts: np.ndarray):
        """Reassemble exact int64 global keys from the device key triple and
        append to the shared sparse accumulator."""
        A, A1, m = self.A, self.A1, self._m
        t = t.astype(np.int64)
        g = t % self.n_groups
        tn = t // self.n_groups
        nxt = tn % A1
        n_pad = tn // A1
        ctx = hi.astype(np.int64) * (A ** min(lag, m)) + lo.astype(np.int64)
        row = pad_offset(lag, n_pad, A) + ctx
        key = (g * table_rows(lag, A) + row) * A1 + nxt
        self._sparse[lag].append((key, counts))
        self._consolidated_lags.discard(lag)
        self._pending += len(key)
        if self._pending > CONSOLIDATE_PENDING:
            for l in self.lags:
                self._consolidated(l)
            # Everything is merged now: the pending counter tracks UN-merged
            # appended entries only. Resetting to the consolidated store size
            # instead would keep it above the threshold once the corpus holds
            # > CONSOLIDATE_PENDING distinct keys, re-triggering a full
            # concatenate+unique of the whole accumulator on EVERY subsequent
            # push — quadratic host cost at genome scale.
            self._pending = 0

    def flush(self):
        """Drain the device buffer into the host accumulator. Called by
        every host-read path (nonzero_rows, tables, save_state, validate,
        allreduce_tables) via the inherited machinery."""
        self._drain_all()

    def finish(self):
        self.flush()

    def sync(self):
        """Block until all queued device append work has completed."""
        if self._buf is not None:
            for l in self.lags:
                for arr in self._buf[l]:
                    arr.block_until_ready()
