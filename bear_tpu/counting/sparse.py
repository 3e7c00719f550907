"""Sparse-first transition counting: no dense table, no lag ceiling.

The dense counters index a ``~1.33 * A^lag x (A+1)`` table with int32 flat
offsets, which caps DNA at lag 15 and proteins at lag 7 (engine.py:420-424).
KMC — the reference's counter — has no such cap (k <= 256: reference
summarize.py:322-328 passes ``-k{k}`` straight through) because it never
densifies: it sorts packed k-mer codes and merges runs. This module is the
TPU-native version of that design:

    device: rolling context codes in TWO int32 halves (low/high digit
            blocks) + a small type key (n_pad, next symbol, group)
            -> one 3-key lexicographic sort per chunk (lax.sort)
            -> run boundaries -> (unique key triple, run length)
    host:   reassemble exact int64 global keys
            (g * rows(lag) + row) * (A+1) + next and merge into the SAME
            sparse accumulator the kmer-sharded/multipass counters use.

Device memory is bounded by the CHUNK size (never the 4^lag key space), so
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


@functools.partial(
    jax.jit, static_argnames=("lags", "n_groups", "A", "with_fresh")
)
def _sorted_runs_jit(codes, lengths, skip, stopped, groups, fresh,
                     lags, n_groups, A, with_fresh):
    """Per lag: masked key triples -> 3-key lexicographic sort -> run-start
    mask. Returns {lag: (t_sorted, hi_sorted, lo_sorted, n_runs, n_valid)};
    the sorted arrays stay on device — only the two scalars are fetched, and
    a second jit (_compact_runs_jit) gathers exactly the run heads.

    Key layout per transition position (same index math as
    engine._count_chunk_kernel, which it is oracle-tested against):
      lo = sum_{i=1..min(lag,m)}  d_i * A^(i-1)     (d_i = i-th previous base)
      hi = sum_{i=m+1..lag}       d_i * A^(i-1-m)
      t  = (n_pad * (A+1) + next) * n_groups + group   (masked -> sentinel)
    Pads beyond the read start read the zero padding, which is exactly the
    truncated-prefix code; n_pad in the t key disambiguates 'A' digits from
    '[' pads.
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
        ts, hs, ls = jax.lax.sort(
            (t.reshape(-1), hi_acc.reshape(-1), lo_acc.reshape(-1)),
            num_keys=3,
        )
        valid = ts != _SENT
        prev_ne = jnp.concatenate([
            jnp.ones(1, bool),
            (ts[1:] != ts[:-1]) | (hs[1:] != hs[:-1]) | (ls[1:] != ls[:-1]),
        ])
        run_start = valid & prev_ne
        out[l] = (ts, hs, ls, jnp.sum(run_start.astype(jnp.int32)),
                  jnp.sum(valid.astype(jnp.int32)))
    return out


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
    """Single-chip sparse-first counter for lags beyond the dense-table
    range (DNA lag >= 16, protein lag >= 8; up to lag 30 / 13).

    Drop-in for the other counters' read surface (nonzero_rows,
    counts_for_rows, to_dataset, export_tsv, save/load_state, validate,
    merge_from) and ReadChunk ingest surface (add_chunk incl. reverse
    complement, segment skip, ambig fresh flags). Unlike the dense
    counters there is no deferred device flush: each chunk is sorted and
    consolidated on device, and only its distinct (key, count) pairs cross
    to the host.
    """

    FLUSH_EVERY = FLUSH_EVERY

    def __init__(self, lags: Sequence[int], n_groups: int = 1,
                 reverse: bool = False, alphabet: str = "dna"):
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
        self._m = digit_split(self.A)
        self._sparse = {l: [] for l in self.lags}
        self._consolidated_lags: set = set()
        self._grk_cache = {}
        self._pending = 0  # un-consolidated host entries across all lags

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

    def _add(self, codes, lengths, skip, stopped, groups, fresh=None):
        with_fresh = fresh is not None
        runs = _sorted_runs_jit(
            jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(skip),
            jnp.asarray(stopped), jnp.asarray(groups),
            jnp.asarray(fresh) if with_fresh else jnp.zeros(
                codes.shape[0], bool),
            self.lags, self.n_groups, self.A, with_fresh,
        )
        for l in self.lags:
            ts, hs, ls, n_runs, n_valid = runs[l]
            U = int(n_runs)
            if U == 0:
                continue
            nv = int(n_valid)
            u_pad = 1 << (U - 1).bit_length()
            pos, t_g, h_g, l_g = _compact_runs_jit(ts, hs, ls, u_pad)
            pos = np.asarray(pos[:U], np.int64)
            counts = np.diff(np.append(pos, nv)).astype(np.int64)
            self._push(l, np.asarray(t_g[:U]), np.asarray(h_g[:U]),
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

    # Chunks consolidate eagerly; these are API-parity no-ops.
    def flush(self):
        pass

    def finish(self):
        pass

    def sync(self):
        pass
