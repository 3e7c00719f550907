"""TPU-native k-mer transition counting engine.

Replaces the reference's three-stage KMC pipeline (bear_model/summarize.py:
stage-1 prefix/suffix fastq rewriting, stage-2 external C++ KMC count/sort/
dump subprocesses, stage-3 Python heap-merge of sorted dumps) with a single
device pass:

    host: stream reads -> int8 base codes (bear_tpu.counting.fastx)
    device: rolling base-4 context codes for every lag + scatter-add into
            dense per-lag transition-count tables        (one jitted kernel)
    merge: psum/all-reduce of per-device partial tables  (multi-chip)

There is no sort, no disk round-trip, and no string processing on the hot
path; the k-mer string only exists at the TSV-export boundary.

Count-table layout
------------------
The context alphabet is residues + the start pad '['; since '[' occurs only
as a prefix run, a lag-l context is (n_pad, suffix) with suffix in base 4 of
length l - n_pad. Table row index:

    offset(n_pad) = (4^(l-n_pad) - 1) / 3
    row = offset(n_pad) + base4(suffix)
    rows(l) = (4^(l+1) - 1) / 3    (~1.33 * 4^l)

Columns are the transition symbols A,C,G,T,$ in the reference's order
(summarize.py:59-64). Tables are [n_groups, rows(l), 5].

Counting semantics parity (oracle: reference tests/test_summarize.py:90-114):
for lag l, each read contributes len+1 transitions of the '['*l padded,
']'-terminated sequence — prefix contexts included, one stop transition.
Counts exceeding 2^32 do NOT clamp (KMC's documented 4-billion limit,
summarize.py:66-67, is deliberately fixed here): the device accumulates int32
per flush window and the host accumulator is int64.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

STOP = 4  # transition column of '$'
PAD_LEN_ALIGN = 64
FLUSH_EVERY = (1 << 31) - (1 << 24)  # transitions between int32 flushes
SORTED_MIN_TRANSITIONS = 1 << 20  # below this the sorted method's full-table
# window pass costs more than it saves over plain scatter
NONZERO_CHUNK = 1 << 26  # bound device temps during nonzero extraction


def resolve_method(method: str, new_transitions: int) -> str:
    """Counting-kernel selection shared by every counter: 'auto' picks the
    sorted MXU-histogram kernel on TPU for production-size chunks and XLA
    scatter otherwise (the sorted kernel is Mosaic/TPU-only)."""
    if method != "auto":
        return method
    if jax.default_backend() != "tpu":
        return "scatter"
    return "sorted" if new_transitions >= SORTED_MIN_TRANSITIONS else "scatter"


def _exact_count_limit(dtype) -> int:
    """Largest integer `dtype` represents exactly ON DEVICE. 64-bit types
    degrade to their 32-bit versions without jax_enable_x64 (astype silently
    downcasts — the exact rounding the range guards exist to prevent)."""
    dt = np.dtype(dtype)
    if dt.itemsize == 8 and not jax.config.jax_enable_x64:
        dt = np.dtype("float32" if dt.kind == "f" else "int32")
    # exact ints up to 2^(mantissa+1): f32 2^24, bf16 2^8, f64 2^53.
    # ml_dtypes floats (bfloat16 etc., numpy kind 'V') need ml_dtypes.finfo.
    import ml_dtypes

    for finfo in (np.finfo, ml_dtypes.finfo):
        try:
            return 1 << (finfo(dt).nmant + 1)
        except ValueError:
            continue
    return int(np.iinfo(dt).max)


def extract_nonzero(dev, chunk: int = NONZERO_CHUNK):
    """Yield (global int64 indices, int64 values) of a device array's nonzero
    entries, chunked so device temporaries stay bounded (a single
    jnp.nonzero over a multi-GB buffer would allocate comparable-size mask/
    cumsum temporaries and can OOM the chip)."""
    for start in range(0, dev.size, chunk):
        part = dev[start : start + chunk]
        idx = np.asarray(jnp.nonzero(part)[0], dtype=np.int64)
        if idx.size == 0:
            continue
        vals = np.asarray(part[jnp.asarray(idx)]).astype(np.int64)
        yield idx + start, vals


def table_rows(lag: int, A: int = 4) -> int:
    """Context rows of a lag-`lag` table over an A-residue alphabet:
    sum of A^k for k = 0..lag (every '['-padded suffix length)."""
    return (A ** (lag + 1) - 1) // (A - 1)


def pad_offset(lag: int, n_pad, A: int = 4) -> int:
    """Row offset of the contexts with n_pad leading '['s."""
    return (A ** (lag - n_pad) - 1) // (A - 1)


def check_groups(groups, n_groups: int) -> None:
    """Reject out-of-range dataset-group ids BEFORE they reach a device
    kernel: the concatenated flat layout has no guard rows between lags, so
    a group id >= n_groups produces an IN-BOUNDS index inside the NEXT
    lag's table region (or the window-pad tail) and silently corrupts
    counts — scatter's mode='drop' only drops indices beyond the buffer.
    Every counter's add_chunk calls this once per chunk (cheap host min/max
    over [B] int)."""
    g = np.asarray(groups)
    if g.size and (int(g.min()) < 0 or int(g.max()) >= n_groups):
        raise ValueError(
            f"chunk group ids must be in [0, {n_groups}); got range "
            f"[{int(g.min())}, {int(g.max())}]"
        )


def context_to_row(context: str, lag: int, alphabet: str = "dna") -> int:
    """Host-side: context string (may contain leading '[') -> table row."""
    from bear_tpu.ops import alphabets as _alpha

    letters = "".join(_alpha.input_letters(alphabet)[:-1])
    A = len(letters)
    assert len(context) == lag
    n_pad = len(context) - len(context.lstrip("["))
    code = 0
    for ch in context[n_pad:]:
        code = code * A + letters.index(ch)
    return pad_offset(lag, n_pad, A) + code


def row_to_context(row: int, lag: int, alphabet: str = "dna") -> str:
    """Host-side inverse of context_to_row."""
    return rows_to_contexts(np.array([row]), lag, alphabet)[0]


def rows_to_contexts(rows, lag: int, alphabet: str = "dna") -> np.ndarray:
    """Vectorized inverse of context_to_row: row indices -> context strings
    (millions of rows in NumPy, no per-row Python)."""
    from bear_tpu.ops import alphabets as _alpha

    letters_s = "".join(_alpha.input_letters(alphabet)[:-1])
    A = len(letters_s)
    rows = np.asarray(rows, dtype=np.int64)
    bounds = np.array(
        [(A**k - 1) // (A - 1) for k in range(lag + 2)], dtype=np.int64
    )
    m = np.searchsorted(bounds, rows, side="right") - 1  # suffix length
    code = rows - (A**m - 1) // (A - 1)
    letters = np.frombuffer(letters_s.encode(), dtype=np.uint8)
    chars = np.full((len(rows), lag), ord("["), dtype=np.uint8)
    rem = code.copy()
    for i in range(lag):  # digit i is the (i+1)-th letter from the right
        pos = lag - 1 - i
        digit = (rem % A).astype(np.int64)
        rem //= A
        valid = i < m
        chars[valid, pos] = letters[digit[valid]]
    return np.char.decode(chars.view(f"S{lag}").reshape(-1), "ascii")


@functools.partial(jax.jit, static_argnames=("off", "G", "R5", "A1"))
def _device_row_totals(dev, off: int, G: int, R5: int, A1: int = 5):
    """Per-row grand totals of one lag's slice of the flat device buffer.

    NEVER reshapes the full table to an A1-minor layout: the TPU (8,128)
    tile would pad an 89M x 5 int32 table to ~92 GB of HBM. Flat strided
    slices keep every intermediate at its true size."""
    sl = jax.lax.dynamic_slice_in_dim(dev, off, G * R5)
    per_entry = jnp.sum(sl.reshape(G, R5), axis=0)  # [R5]
    return sum(per_entry[k::A1] for k in range(A1))  # [R5 // A1]


@functools.partial(jax.jit, static_argnames=("off", "G", "R5", "A1"))
def _device_gather_counts(dev, rows, off: int, G: int, R5: int, A1: int = 5):
    """Gather [len(rows), G, A1] int32 counts (plus their max, for the float
    range check) from the flat device buffer with lane-friendly [N] gathers
    (see _device_row_totals on why not reshape)."""
    sl = jax.lax.dynamic_slice_in_dim(dev, off, G * R5)
    base = rows * A1
    cols = [sl[base + (g * R5 + k)] for g in range(G) for k in range(A1)]
    out = jnp.stack(cols, axis=1).reshape(-1, G, A1)
    return out, (jnp.max(out) if out.size else jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, static_argnames=("size",))
def _sized_nonzero(v, size: int):
    return jnp.nonzero(v, size=size, fill_value=0)[0].astype(jnp.int32)


def device_nonzero(v) -> jnp.ndarray:
    """Nonzero indices of a device vector WITHOUT the eager jnp.nonzero
    host round trip (which materializes the whole vector on the host —
    measured 52 s vs 0.9 s for an 89M-entry lag-13 row-total vector over a
    tunneled link). Two phases: a scalar count fetch, then a jitted sized
    nonzero bucketed to the next power of two (so distinct counts reuse a
    handful of compilations); the exact-length trim happens on the host
    over at most 2x the true indices."""
    n = int(jnp.count_nonzero(v))
    if n == 0:
        return jnp.zeros(0, jnp.int32)
    n_pad = 1 << (n - 1).bit_length()
    padded = _sized_nonzero(v, n_pad)
    return jnp.asarray(np.asarray(padded)[:n])


@functools.partial(jax.jit, static_argnames=("lag", "A"))
def decode_rows(rows, lag: int, A: int = 4):
    """Device-side inverse of context_to_row: table row indices -> int8 k-mer
    codes [N, lag] (pad '[' = code A), pure integer arithmetic in-register.

    This is what lets counts hand off to training WITHOUT the table ever
    leaving the device: no k-mer strings, no host round trip (the host path
    is rows_to_contexts + alphabets.encode_kmers).
    """
    rows = jnp.asarray(rows, jnp.int32)
    bounds = jnp.asarray(
        [(A**k - 1) // (A - 1) for k in range(lag + 2)], jnp.int32
    )
    m = jnp.searchsorted(bounds, rows, side="right").astype(jnp.int32) - 1
    code = rows - bounds[m]
    # position p holds the suffix digit with exponent lag-1-p, valid for the
    # last m positions; earlier positions are the '[' pad (code A).
    exps = jnp.asarray([A ** (lag - 1 - p) for p in range(lag)], jnp.int32)
    digits = (code[:, None] // exps[None, :]) % A
    pad = jnp.arange(lag, dtype=jnp.int32)[None, :] < (lag - m)[:, None]
    return jnp.where(pad, A, digits).astype(jnp.int8)


@dataclass
class ReadChunk:
    """A padded batch of encoded reads/segments ready for the device kernel.

    codes : [B, L] int8 base codes (0..3; padding is 0 and masked off).
    lengths : [B] number of real bases in each row.
    skip : [B] transitions at positions < skip are not counted (used for
        continuation segments of long sequences, which carry a max_lag
        overlap as context only).
    stopped : [B] whether a '$' transition is emitted at position == length.
    groups : [B] dataset group of each row.
    fresh : optional [B] bool; None means all True. A fresh row starts at a
        true read boundary: positions j < lag count with '['-padded prefix
        contexts. A non-fresh row (an ambig="skip" piece after an ambiguous
        base) instead DROPS, per lag l, transitions at positions j < l —
        their context window would cross the ambiguous base.
    """

    codes: np.ndarray
    lengths: np.ndarray
    skip: np.ndarray
    stopped: np.ndarray
    groups: np.ndarray
    fresh: np.ndarray | None = None


def lag_offsets(lags, n_groups, A: int = 4):
    """Offsets of each lag's flat table inside the single concatenated device
    buffer, and the total size. One buffer + ONE scatter per chunk covers all
    lags (13 separate scatters would pay 13x the scatter fixed costs)."""
    offsets = {}
    total = 0
    for l in sorted(lags):
        offsets[l] = total
        total += n_groups * table_rows(l, A) * (A + 1)
    return offsets, total


def _count_chunk_kernel(table, codes, lengths, skip, stopped, groups, lags,
                        n_groups, method="scatter", shard=None, A=4,
                        fresh=None):
    """Jitted device kernel: add one chunk's transitions into the persistent
    concatenated dense table (donated, updated in place).

    table: FLAT int32, padded to whole pallas_hist windows.
    method: 'scatter' = XLA scatter-add (universal; ~10 ns/transition on TPU,
    the serial scatter-apply bound). 'sorted' = sort the flat indices and
    accumulate per-table-window histograms on the MXU (pallas_hist; ~3x
    scatter on v5e for production-size chunks).

    shard: optional k-mer-axis sharding (tensor parallelism over the table —
    the device holds only a row range of each lag's table):
    ``(shard_idx, {lag: (row_stride, local_rows, local_offset)})`` where
    shard_idx is this device's index along the mesh's kmer axis (traced
    scalar) and the per-lag entries are static ints. Rows outside the shard
    clamp to the sentinel and are dropped. All index arithmetic stays in the
    LOCAL range, so the GLOBAL table may exceed int32 indexing (lag 14-15)."""
    B, L = codes.shape
    P = L + 1  # transition positions 0..L (stop can land at j == length <= L)
    j = jnp.arange(P, dtype=jnp.int32)[None, :]  # [1, P]
    codes32 = codes.astype(jnp.int32)
    lengths = lengths.astype(jnp.int32)[:, None]
    skip = skip.astype(jnp.int32)[:, None]
    groups32 = groups.astype(jnp.int32)[:, None]

    A1 = A + 1
    offsets, _ = lag_offsets(lags, n_groups, A)
    max_lag = max(lags)
    # ONE padded buffer ([ max_lag zeros | codes | one zero ]); every shifted
    # view below is a slice of it. Per-shift jnp.pads each materialized a
    # [B, P] int32 buffer in HBM and cost 8 ms/pass at lag 13 on v5e
    # (54.3 -> 46.4 ms/pass measured, 309 -> 362 M transitions/s).
    padded = jnp.pad(codes32, ((0, 0), (max_lag, 1)))

    # next symbol at position j: s[j] for j < len, '$' at j == len (if stopped)
    nxt = jnp.where(j < lengths, padded[:, max_lag : max_lag + P], A)
    mask = (j >= skip) & (
        (j < lengths) | ((j == lengths) & stopped.astype(bool)[:, None])
    )

    # shifted[i][b, j] = codes[b, j - i - 1] (0 when out of range): the
    # (i+1)-th previous base of transition position j.
    shifted = []
    for i in range(1, max_lag + 1):
        shifted.append(padded[:, max_lag - i : max_lag - i + P])

    # masked positions: index 0 with a zero update (scatter) or a sentinel
    # index that sorts past the table end and is never counted (sorted).
    # In sharded mode every masked/foreign position goes to the sentinel,
    # which is out of bounds for scatter (mode='drop') and sorts past the
    # end for the sorted kernel.
    sentinel = table.shape[0]
    masked_to = 0 if (method == "scatter" and shard is None) else sentinel
    all_flat = []
    upd_list = []
    fresh_col = None if fresh is None else fresh.astype(bool)[:, None]
    code_acc = jnp.zeros((B, P), dtype=jnp.int32)
    pow4 = 1
    upd_one = mask.astype(jnp.int32)
    for l in range(1, max_lag + 1):
        # rolling base-A suffix code: digits beyond the read start read the
        # zero padding, which is exactly the truncated-prefix code.
        code_acc = code_acc + shifted[l - 1] * pow4
        pow4 *= A
        if l not in lags:
            continue
        # Non-fresh rows (ambig pieces) drop positions whose lag-l context
        # window would cross the ambiguous base: j < l.
        mask_l = mask if fresh_col is None else mask & (fresh_col | (j >= l))
        n_pad = jnp.maximum(0, l - j)  # [1, P] broadcasting over rows
        offset = (A ** (l - n_pad) - 1) // (A - 1)
        row = offset + code_acc
        if shard is None:
            flat = offsets[l] + (groups32 * table_rows(l, A) + row) * A1 + nxt
            keyed = jnp.where(mask_l, flat, masked_to)
            if fresh_col is not None:
                upd_list.append(mask_l.astype(jnp.int32).reshape(-1))
        else:
            shard_idx, per_lag = shard
            stride_l, local_rows_l, loc_off_l = per_lag[l]
            rloc = row - shard_idx * stride_l
            ok = mask_l & (rloc >= 0) & (rloc < local_rows_l)
            rloc = jnp.clip(rloc, 0, local_rows_l - 1)
            flat = loc_off_l + (groups32 * local_rows_l + rloc) * A1 + nxt
            keyed = jnp.where(ok, flat, masked_to)
        # Stay FLAT on device: a [rows, 5] layout would tile the minor dim to
        # 128 on TPU (25x padded HBM); the reshape happens host-side.
        all_flat.append(keyed.reshape(-1))
    flat_cat = jnp.concatenate(all_flat)
    if method == "sorted":
        from bear_tpu.counting import pallas_hist

        return pallas_hist.sorted_window_update(table, flat_cat)
    if shard is not None:
        # Foreign/masked keys are at the (out-of-bounds) sentinel: dropped.
        return table.at[flat_cat].add(1, mode="drop")
    if upd_list:
        return table.at[flat_cat].add(jnp.concatenate(upd_list), mode="drop")
    upd_cat = jnp.tile(upd_one.reshape(-1), len(all_flat))
    return table.at[flat_cat].add(upd_cat, mode="drop")


@functools.partial(
    jax.jit, static_argnames=("lags", "n_groups", "method", "A"),
    donate_argnums=(0,),
)
def _count_chunk_jit(table, codes, lengths, skip, stopped, groups, lags,
                     n_groups, method="scatter", A=4, fresh=None):
    return _count_chunk_kernel(
        table, codes, lengths, skip, stopped, groups, lags, n_groups, method,
        A=A, fresh=fresh,
    )


class TransitionCounter:
    """Accumulates transition counts over streamed read chunks.

    The per-lag tables live ON DEVICE as flat int32 buffers, updated in place
    (buffer donation) — no per-chunk zeroing, no per-chunk device->host
    traffic. A flush into the host-side int64 accumulator happens only when
    the transitions since the last flush approach int32 range (so counts can
    exceed 2^32 without clamping, fixing KMC's documented 4-billion cutoff),
    on merge, and on output access.

    lags : which lags to count (the reference counts 1..max_lag;
        pass a single lag for training-only use).
    n_groups : number of dataset groups (merged columns).
    reverse : also count the reverse complement of every read (the
        reference's -r pass semantics: forward AND reverse counts in one
        table set, test_summarize.py:100-114).
    method : 'scatter' (XLA scatter-add, universal), 'sorted' (sort + MXU
        window histograms, see pallas_hist — ~3x on TPU for big chunks), or
        'auto' (sorted on TPU for production-size chunks, scatter otherwise).
    alphabet : residue alphabet of the input codes — 'dna' (default), 'rna',
        or 'prot'. Protein counting is a capability the reference lacks (its
        KMC pipeline is DNA-only); reverse=True requires a 4-letter
        alphabet (reverse complement is undefined for proteins).
    """

    FLUSH_EVERY = globals()["FLUSH_EVERY"]  # module constants, aliased for
    SORTED_MIN_TRANSITIONS = globals()["SORTED_MIN_TRANSITIONS"]  # callers

    def __init__(self, lags: Sequence[int], n_groups: int = 1,
                 reverse: bool = False, method: str = "auto",
                 alphabet: str = "dna"):
        from bear_tpu.ops import alphabets as _alpha

        if method not in ("auto", "scatter", "sorted"):
            raise ValueError(f"unknown counting method {method!r}")
        self.alphabet = alphabet
        self.A = _alpha.alphabet_size(alphabet)
        self.A1 = self.A + 1
        if reverse and self.A != 4:
            raise ValueError(
                "reverse-complement counting requires a 4-letter alphabet"
            )
        self.lags = tuple(sorted(set(int(l) for l in lags)))
        if self.A ** (max(self.lags)) > np.iinfo(np.int32).max:
            raise ValueError(
                f"lag {max(self.lags)} context codes exceed int32 for a "
                f"{self.A}-letter alphabet — use "
                "bear_tpu.counting.sparse.SparseTransitionCounter (no dense "
                "table, DNA lag <= 30 / protein lag <= 13)"
            )
        self.n_groups = n_groups
        self.reverse = reverse
        self.method = method
        self._offsets, self._total_size = lag_offsets(
            self.lags, n_groups, self.A
        )
        from bear_tpu.counting.pallas_hist import padded_size

        # The device buffer is padded to whole pallas_hist windows so either
        # method can run against it; the pad tail is never indexed.
        self._buf_size = padded_size(self._total_size)
        if self._buf_size > np.iinfo(np.int32).max:
            # Scatter indices are int32 on TPU (int64 requires jax x64 and
            # halves throughput); beyond 2^31 entries the flat index would
            # wrap negative and mode='drop' would SILENTLY lose counts.
            raise ValueError(
                f"concatenated count table has {self._buf_size:,} entries "
                "(window-padded), beyond int32 indexing — split the lags "
                "across multiple TransitionCounters or reduce n_groups"
            )
        self._host: Dict[int, np.ndarray] = {
            l: np.zeros(n_groups * table_rows(l, self.A) * self.A1, np.int64)
            for l in self.lags
        }
        self._dev = None  # lazy: ONE concatenated flat int32 device buffer
        self._since_flush = 0
        self._host_dirty = False  # True once any count reached self._host

    @property
    def max_lag(self) -> int:
        return max(self.lags)

    def _ensure_dev(self):
        if self._dev is None:
            self._dev = jnp.zeros(self._buf_size, dtype=jnp.int32)

    def _resolve_method(self, new_transitions: int) -> str:
        return resolve_method(self.method, new_transitions)

    def sync(self):
        """Block until all queued device counting work has completed (public
        timing/sync point; the device buffer itself stays private)."""
        if self._dev is not None:
            self._dev.block_until_ready()

    def flush(self):
        """Fold the device int32 partials into the host int64 accumulator.

        When the table is sparse (distinct k-mers << 4^lag — the typical
        genome case) only the nonzero entries move off-device: a ~100x
        device->host traffic reduction that matters doubly over a tunneled
        interconnect."""
        if self._dev is not None and self._since_flush > 0:
            dev = self._dev
            nnz = int(jnp.count_nonzero(dev))
            if nnz * 3 < dev.size:
                for idx, vals in extract_nonzero(dev):
                    self._scatter_host(idx, vals)
            else:
                # int32 view; += promotes per-slice (an eager .astype(int64)
                # would allocate a 2x-table-size transient)
                dense = np.asarray(dev)
                for l in self.lags:
                    off = self._offsets[l]
                    self._host[l] += dense[off : off + self._host[l].size]
            self._dev = jnp.zeros(self._buf_size, dtype=jnp.int32)
            self._since_flush = 0
            self._host_dirty = True

    def _scatter_host(self, idx: np.ndarray, vals: np.ndarray):
        """Route concatenated-buffer indices into the per-lag host tables."""
        bounds = [self._offsets[l] for l in self.lags] + [self._total_size]
        for i, l in enumerate(self.lags):
            sel = (idx >= bounds[i]) & (idx < bounds[i + 1])
            if sel.any():
                self._host[l][idx[sel] - bounds[i]] += vals[sel]

    def add_chunk(self, chunk: ReadChunk):
        check_groups(chunk.groups, self.n_groups)
        if self.reverse and np.any(np.asarray(chunk.skip) != 0):
            # RC of a continuation segment would need right-side context;
            # reverse counting of segmented sequences is handled by the
            # caller emitting RC segments (chunk_reads(reverse=True)).
            # Checked BEFORE the forward add so a failed chunk leaves the
            # tables untouched (a post-add error would double-count on
            # retry), and as a real error, not an -O-strippable assert.
            raise ValueError(
                "reverse=True requires whole-read chunks (skip == 0); "
                "for segmented long sequences use chunk_reads(reverse=True)"
            )
        self._add(chunk.codes, chunk.lengths, chunk.skip, chunk.stopped,
                  chunk.groups, chunk.fresh)
        if self.reverse:
            rc, rlen = reverse_complement_codes(chunk.codes, chunk.lengths)
            # The true-read boundaries swap sides under reversal; the helper
            # also handles fresh=None chunks whose rows are not all stopped
            # (ambig pieces from trailing-N reads) — see rc_boundary_flags.
            st_rc, fr_rc = rc_boundary_flags(chunk)
            self._add(rc, rlen, chunk.skip, st_rc, chunk.groups, fresh=fr_rc)

    def _add(self, codes, lengths, skip, stopped, groups, fresh=None):
        new_transitions = codes.shape[0] * (codes.shape[1] + 1)
        if self._since_flush + new_transitions > self.FLUSH_EVERY:
            self.flush()
        self._ensure_dev()
        n_lags = len(self.lags)
        self._dev = _count_chunk_jit(
            self._dev,
            jnp.asarray(codes),
            jnp.asarray(lengths),
            jnp.asarray(skip),
            jnp.asarray(stopped),
            jnp.asarray(groups),
            self.lags,
            self.n_groups,
            self._resolve_method(new_transitions * n_lags),
            A=self.A,
            fresh=None if fresh is None else jnp.asarray(fresh),
        )
        self._since_flush += new_transitions

    @property
    def tables(self) -> Dict[int, np.ndarray]:
        """Host int64 tables {lag: [n_groups, rows(lag), A+1]} (flushes
        first)."""
        self.flush()
        return {
            l: self._host[l].reshape(
                self.n_groups, table_rows(l, self.A), self.A1
            )
            for l in self.lags
        }

    def merge_from(self, other: "TransitionCounter"):
        """Merge partial counts (cross-host/process reduction point)."""
        self.flush()
        other.flush()
        self._host_dirty = True
        for l in self.lags:
            self._host[l] += other._host[l]

    # -- durability / invariants ------------------------------------------

    def save_state(self, path: str):
        """Checkpoint accumulated counts (for long counting jobs — the
        reference can only restart whole summarize stages, summarize.py
        -s12/-s3; here any chunk boundary is a resume point)."""
        self.flush()
        if not path.endswith(".npz"):
            path += ".npz"  # np.savez appends it; keep load_state symmetric
        np.savez_compressed(
            path,
            lags=np.array(self.lags),
            n_groups=np.array(self.n_groups),
            reverse=np.array(self.reverse),
            alphabet=np.array(self.alphabet),
            **{f"table_{l}": self._host[l] for l in self.lags},
        )

    @classmethod
    def load_state(cls, path: str) -> "TransitionCounter":
        if not path.endswith(".npz") and not os.path.exists(path):
            path += ".npz"
        data = np.load(path)
        tc = cls(
            lags=[int(l) for l in data["lags"]],
            n_groups=int(data["n_groups"]),
            reverse=bool(data["reverse"]),
            alphabet=str(data["alphabet"]) if "alphabet" in data else "dna",
        )
        for l in tc.lags:
            tc._host[l] = data[f"table_{l}"].astype(np.int64)
        tc._host_dirty = True
        return tc

    def validate(self, expected_transitions: Optional[int] = None):
        """Count-conservation invariant: every table must hold exactly the
        same grand total (= number of transitions counted, x2 if reverse).
        Returns the per-lag totals."""
        totals = {l: int(t.sum()) for l, t in self.tables.items()}
        values = set(totals.values())
        if len(values) > 1:
            raise AssertionError(f"count tables disagree on total transitions: {totals}")
        if expected_transitions is not None:
            want = expected_transitions * (2 if self.reverse else 1)
            got = next(iter(values)) if values else 0
            if got != want:
                raise AssertionError(
                    f"count conservation violated: counted {got}, expected {want}"
                )
        return totals

    # -- output ------------------------------------------------------------

    def nonzero_rows(self, lag: int) -> np.ndarray:
        return np.nonzero(self.tables[lag].sum(axis=(0, 2)))[0]

    def to_dataset(self, lag: int, alphabet: str | None = None):
        """Direct in-memory handoff to training (no TSV round-trip — a
        capability the reference lacks)."""
        from bear_tpu.data import CountDataset
        from bear_tpu.ops import alphabets

        alphabet = alphabet or self.alphabet
        if alphabets.alphabet_size(alphabet) != self.A:
            raise ValueError(
                f"count tables are base-{self.A}; alphabet {alphabet!r} has "
                f"{alphabets.alphabet_size(alphabet)} residues"
            )
        rows = self.nonzero_rows(lag)
        kmers = rows_to_contexts(rows, lag, alphabet)
        counts = self.tables[lag][:, rows, :].transpose(1, 0, 2).astype(np.float64)
        codes = alphabets.encode_kmers(kmers, alphabet) if len(kmers) else np.zeros((0, lag), np.int8)
        return CountDataset(kmers=kmers, codes=codes, counts=counts, alphabet=alphabet)

    def to_device_dataset(self, lag: int, alphabet: str | None = None,
                          dtype=jnp.float32):
        """Counts -> training handoff that stays ON DEVICE: the count table
        never crosses to the host and no k-mer strings are built. K-mer codes
        are decoded arithmetically from the nonzero row indices (decode_rows)
        and counts are gathered straight out of the resident device buffer.

        Falls back to uploading the host accumulator's nonzero rows when
        earlier flushes moved counts off device (the device buffer alone is
        then not authoritative). Returns (codes [N, lag] int8 device array,
        counts [N, n_groups, A+1] device array); alphabet must match the
        counter's residue count (the table layout is base-A).
        """
        from bear_tpu.ops import alphabets as _alpha

        alphabet = alphabet or self.alphabet
        if _alpha.alphabet_size(alphabet) != self.A:
            raise ValueError(
                f"count tables are base-{self.A}; alphabet {alphabet!r} "
                f"has {_alpha.alphabet_size(alphabet)} residues"
            )
        rows_total = table_rows(lag, self.A)
        if self._dev is not None and not self._host_dirty:
            G = self.n_groups
            R5 = rows_total * self.A1
            off = self._offsets[lag]
            row_tot = _device_row_totals(self._dev, off, G, R5, self.A1)
            rows = device_nonzero(row_tot)
            counts_i, cmax = _device_gather_counts(
                self._dev, rows, off, G, R5, self.A1
            )
            if int(cmax) > _exact_count_limit(dtype):
                raise ValueError(
                    f"a count reached {int(cmax):,}, beyond {np.dtype(dtype).name}'s "
                    f"exact integer range ({_exact_count_limit(dtype):,}) — use "
                    "dtype=jnp.float64 with jax_enable_x64 (the no-clamp "
                    "guarantee would otherwise silently round)"
                )
            counts = counts_i.astype(dtype)
        else:
            self.flush()
            rows_np = self.nonzero_rows(lag)
            rows = jnp.asarray(rows_np.astype(np.int32))
            counts_np = self.tables[lag][:, rows_np, :].transpose(1, 0, 2)
            cmax = counts_np.max() if counts_np.size else 0
            if cmax > _exact_count_limit(dtype):
                raise ValueError(
                    f"a count reached {cmax:,}, beyond {np.dtype(dtype).name}'s "
                    f"exact integer range ({_exact_count_limit(dtype):,}) — use "
                    "dtype=jnp.float64 with jax_enable_x64"
                )
            counts = jnp.asarray(counts_np.astype(np.dtype(dtype)))
        return decode_rows(rows, lag, self.A), counts

    def export_tsv(
        self,
        out_prefix: str,
        lag: int,
        n_bin_bits: int = 0,
        seed: int = 0,
        shuffle: bool = False,
        rows: Optional[np.ndarray] = None,
    ):
        """Write reference-format TSVs: ``{out_prefix}_lag_{l}_file_{b}.tsv``
        rows ``kmer\\t[[g0 counts],[g1 counts],...]`` sharded uniformly at
        random into 2^n_bin_bits files (summarize.py:429-449).

        shuffle=True randomizes the row order inside each shard — absorbing
        the tutorial's external ``shuf`` step (docs/usage.rst:192-196), which
        non-vanilla training requires."""
        if rows is None:
            rows = self.nonzero_rows(lag)
        tab = self.tables[lag]
        per_row = tab[:, rows, :].transpose(1, 0, 2)  # [n, G, A+1]
        return write_tsv_shards(
            out_prefix, lag, rows, per_row, n_bin_bits, seed=seed,
            shuffle=shuffle, alphabet=self.alphabet,
        )


def write_tsv_shards(out_prefix: str, lag: int, rows: np.ndarray,
                     per_row_counts: np.ndarray, n_bin_bits: int = 0,
                     seed: int = 0, shuffle: bool = False,
                     alphabet: str = "dna"):
    """Write reference-format count TSV shards for the given table rows.

    rows: [n] table row indices; per_row_counts: [n, n_groups, 5] aligned
    with rows. Rows shard uniformly at random into 2^n_bin_bits files
    (reference summarize.py:429-449); shuffle randomizes order inside each
    shard. Uses the native bear_format_tsv formatter when available."""
    rng = np.random.default_rng(seed)
    n_bins = 2**n_bin_bits
    if shuffle:
        perm = rng.permutation(len(rows))
        rows, per_row_counts = rows[perm], per_row_counts[perm]
    bins = (
        rng.integers(0, n_bins, size=len(rows))
        if n_bins > 1
        else np.zeros(len(rows), int)
    )
    paths = [f"{out_prefix}_lag_{lag}_file_{b}.tsv" for b in range(n_bins)]
    # Remove stale higher-numbered shards from an earlier run with the same
    # prefix: glob consumers (check_summarize, multi-file training) would
    # otherwise silently merge old counts in.
    import glob as _glob

    for stale in _glob.glob(f"{out_prefix}_lag_{lag}_file_*.tsv"):
        suffix = stale.rsplit("_file_", 1)[1][:-4]
        if suffix.isdigit() and int(suffix) >= n_bins:
            os.remove(stale)
    kmers = rows_to_contexts(rows, lag, alphabet)
    n_groups = per_row_counts.shape[1]
    from bear_tpu.counting import fastx as _fastx

    native = _fastx._native()
    if native is not None and getattr(native, "_has_format", False):
        # Native formatter (~50x the per-row Python loop): one
        # bear_format_tsv call per output shard.
        kmers_b = kmers.astype(f"S{lag}")
        for b, p in enumerate(paths):
            sel = bins == b
            with open(p, "wb") as fh:
                fh.write(native.format_tsv(kmers_b[sel], per_row_counts[sel]))
        return paths
    # Fallback formatter: one shard AT A TIME (n_bins can be 2^12+; opening
    # every shard at once would blow the OS fd limit mid-export and leave a
    # partial shard set on disk). One stable argsort + searchsorted bounds
    # give each shard's row indices as a contiguous slice — a per-shard
    # ``bins == b`` rescan is O(n_bins * n) (billions of comparisons at
    # 2^12 shards over millions of rows).
    order = np.argsort(bins, kind="stable")
    bounds = np.searchsorted(bins[order], np.arange(n_bins + 1))
    for b, p in enumerate(paths):
        sel = order[bounds[b] : bounds[b + 1]]
        with open(p, "w") as fh:
            for i in sel:
                mat = "[[" + "],[".join(
                    ",".join(str(int(c)) for c in per_row_counts[i, g])
                    for g in range(n_groups)
                ) + "]]"
                fh.write(f"{kmers[i]}\t{mat}\n")
    return paths


def reverse_complement_codes(codes: np.ndarray, lengths: np.ndarray):
    """RC on 2-bit codes: complement is 3 - c, reversal is per-row by length
    (vectorized gather; out-of-range slots read position 0 and stay masked)."""
    B, L = codes.shape
    j = np.arange(L)[None, :]
    src = lengths[:, None] - 1 - j
    valid = src >= 0
    rc = np.where(valid, 3 - codes[np.arange(B)[:, None], np.clip(src, 0, L - 1)], 0)
    return rc.astype(codes.dtype), lengths.copy()


def rc_boundary_flags(chunk: ReadChunk):
    """(stopped, fresh) flags for counting a chunk's reverse complement.

    Under reversal the true-read boundaries swap sides: the RC row may emit
    '['-prefix transitions iff the forward row ended at a true read end
    (stopped), and its '$' transition iff the forward row began at a true
    start (fresh). ``chunk.fresh is None`` means every row is fresh — it does
    NOT mean every row is stopped (e.g. 'ACGTN' under ambig-skip yields one
    piece, fresh=True stop=False, and batch padding rows are never stopped),
    so the RC flags must be derived from BOTH arrays, never by passing
    ``chunk.stopped`` through unswapped.

    Returns (stopped_rc, fresh_rc); fresh_rc is None when the plain
    whole-read fast path (no flag work in the kernel) is exact: all real rows
    fresh AND stopped. Length-0 rows are padding when stopped=False (may
    never emit the empty-read '[' -> '$') but REAL empty reads when
    stopped=True (fresh&stop by construction; their RC is the same empty read
    and keeps the transition).
    """
    st = np.asarray(chunk.stopped, dtype=bool)
    real = np.asarray(chunk.lengths) > 0
    fr = (np.ones_like(st) if chunk.fresh is None
          else np.asarray(chunk.fresh, dtype=bool))
    if bool(((fr & st) | ~real).all()):
        return chunk.stopped, None
    return fr & (real | st), st


def chunks_from_packed(
    codes_flat: np.ndarray,
    offsets: np.ndarray,
    groups,
    max_lag: int,
    batch_size: int = 1024,
    segment_len: int = 1 << 16,
    reverse: bool = False,
    max_chunk_elems: int = 1 << 25,
    ambig_code: int | None = None,
) -> Iterable[ReadChunk]:
    """Vectorized chunk construction from a packed read buffer — the
    production host path: the C++ parser (fastx) emits (codes_flat, offsets)
    for a whole file, and this packer fills padded ReadChunks with one native
    memcpy/RC-copy per row (bear_fill_chunks; NumPy-gather fallback). No
    per-read Python loop; the generator path chunk_reads serves
    heterogeneous/streamed input.

    groups: scalar or [n_reads] per-read group ids.
    Long reads are split into ``segment_len`` segments with a max_lag overlap
    (skip rule), exactly like chunk_reads. reverse=True also packs each
    read's reverse complement. Chunks are capped at ``max_chunk_elems``
    padded elements, so long-contig segments shrink the row count instead of
    inflating the chunk (and its device-transfer size) by ~100x.

    ambig_code: when set (parse with ambig=True -> code 4), reads split at
    ambiguous bases into pieces, vectorized: the first piece keeps its
    '['-prefix transitions, the last its '$' transition, and every transition
    whose window crosses the ambiguous base is dropped (split_ambiguous
    semantics). Pieces reference the original buffer (no rewrite copy).
    """
    if segment_len < max_lag:
        raise ValueError(
            f"segment_len ({segment_len}) must be >= max_lag ({max_lag}): "
            "continuation segments carry a max_lag context overlap"
        )
    codes_flat = np.ascontiguousarray(codes_flat, dtype=np.int8)
    offsets = np.asarray(offsets, dtype=np.int64)
    lengths_all = np.diff(offsets)
    n_reads = len(lengths_all)
    if n_reads == 0:
        return
    groups = np.broadcast_to(np.asarray(groups, dtype=np.int32), (n_reads,))
    read_starts = offsets[:-1]
    read_fresh = read_stop = None  # None = all True
    if ambig_code is not None:
        amb = np.flatnonzero(codes_flat == ambig_code)
        if len(amb):
            # Expand reads into N-free pieces. Positions amb are strictly
            # inside their read ([off_r, off_{r+1})), so 'right' search is
            # exact even next to empty reads.
            cut_read = np.searchsorted(offsets, amb, side="right") - 1
            n_cuts = np.bincount(cut_read, minlength=n_reads)
            cut_base = np.concatenate([[0], np.cumsum(n_cuts)[:-1]])
            per_read = n_cuts + 1
            piece_read = np.repeat(np.arange(n_reads), per_read)
            piece_ord = np.arange(len(piece_read)) - np.repeat(
                np.concatenate([[0], np.cumsum(per_read)[:-1]]), per_read
            )
            cut_at = cut_base[piece_read] + piece_ord
            p_starts = np.where(
                piece_ord == 0,
                offsets[piece_read],
                amb[np.clip(cut_at - 1, 0, len(amb) - 1)] + 1,
            )
            last = piece_ord == n_cuts[piece_read]
            p_ends = np.where(
                last,
                offsets[piece_read + 1],
                amb[np.clip(cut_at, 0, len(amb) - 1)],
            )
            fresh_p = piece_ord == 0
            # Keep empty pieces only for originally-empty reads (preserves
            # the empty-read '['->'$' semantics); pieces emptied by splitting
            # count nothing and would only waste rows.
            keep = (p_ends > p_starts) | (fresh_p & last & (n_cuts[piece_read] == 0))
            read_starts = p_starts[keep]
            lengths_all = (p_ends - p_starts)[keep]
            groups = groups[piece_read[keep]]
            read_fresh = fresh_p[keep]
            read_stop = last[keep]
            n_reads = len(read_starts)
            if n_reads == 0:
                return

    from bear_tpu.counting import fastx as _fastx

    native = _fastx._native()
    if native is not None and not getattr(native, "_has_fill", False):
        native = None  # stale .so without bear_fill_chunks

    # Expand reads into (start, seg_len, skip, stopped, group, rc) segment rows.
    n_segs = np.maximum(1, -(-(lengths_all) // segment_len)).astype(np.int64)
    seg_read = np.repeat(np.arange(n_reads), n_segs)
    seg_ord = np.arange(len(seg_read)) - np.repeat(
        np.concatenate([[0], np.cumsum(n_segs)[:-1]]), n_segs
    )
    seg_begin = seg_ord * segment_len  # position within the read
    read_len = lengths_all[seg_read]
    seg_end = np.minimum(seg_begin + segment_len, read_len)
    first = seg_ord == 0
    start_in_read = np.where(first, seg_begin, seg_begin - max_lag)
    seg_lengths = seg_end - start_in_read
    skip = np.where(first, 0, max_lag).astype(np.int32)
    at_end = seg_end == read_len
    seg_groups = groups[seg_read]
    # Per-variant boundary flags. For ambig pieces the RC swaps fresh<->stop
    # (the true-read boundary changes sides under reversal); continuation
    # segments are fresh=True — skip=max_lag already drops their j < lag
    # positions, so the flag is inert there.
    if read_fresh is None:
        flags = {False: (at_end, None), True: (at_end, None)}
    else:
        flags = {
            False: (at_end & read_stop[seg_read],
                    read_fresh[seg_read] | ~first),
            True: (at_end & read_fresh[seg_read],
                   read_stop[seg_read] | ~first),
        }

    variants = [(False,)] + ([(True,)] if reverse else [])
    order = np.arange(len(seg_read))
    for (rc,) in variants:
        s = 0
        while s < len(order):
            look = order[s : s + batch_size]
            # Cap padded chunk size: long segments take fewer rows per chunk.
            # Fixed point: shrinking B can exclude the wide rows that forced
            # the shrink, so recompute the width over the kept prefix until
            # stable — short reads ahead of a long contig then pack at their
            # own width instead of the contig's.
            B = len(look)
            L = 0
            while True:
                L = int(seg_lengths[look[:B]].max())
                L = -(-L // PAD_LEN_ALIGN) * PAD_LEN_ALIGN
                B_new = max(1, min(len(look), max_chunk_elems // max(L, 1)))
                if B_new >= B:
                    break
                B = B_new
            sel = look[:B]
            s += len(sel)
            # Pad the row count to the budgeted batch size so trailing
            # partial chunks keep the same (B, L) shape (one compilation).
            B = max(
                len(sel),
                min(batch_size, max(1, max_chunk_elems // max(L, 1))),
            )
            out = np.zeros((B, L), dtype=np.int8)
            lens = np.zeros(B, dtype=np.int32)
            lens[: len(sel)] = seg_lengths[sel]
            # The RC read has the same length, so its segmentation reuses
            # the same (start_in_read, seg_lengths, skip, stopped) rows;
            # RC-read position p reads the complement of original position
            # (read_len - 1 - p), i.e. the copy starts at the range's last
            # forward-strand base and walks backward.
            if rc:
                starts_abs = (
                    read_starts[seg_read[sel]]
                    + read_len[sel] - 1 - start_in_read[sel]
                )
            else:
                starts_abs = read_starts[seg_read[sel]] + start_in_read[sel]
            if native is not None:
                native.fill_chunks(
                    codes_flat, starts_abs, seg_lengths[sel],
                    np.full(len(sel), rc, np.uint8), out,
                )
            else:
                j = np.arange(L)[None, :]
                sgn = -1 if rc else 1
                src = starts_abs[:, None] + sgn * j
                valid = j < seg_lengths[sel][:, None]
                vals = codes_flat[np.clip(src, 0, len(codes_flat) - 1)]
                if rc:
                    vals = 3 - vals
                out[: len(sel)] = np.where(valid, vals, 0)
            sk = np.zeros(B, dtype=np.int32)
            st = np.zeros(B, dtype=bool)
            gr = np.zeros(B, dtype=np.int32)
            stopped_v, fresh_v = flags[rc]
            sk[: len(sel)] = skip[sel]
            st[: len(sel)] = stopped_v[sel]
            gr[: len(sel)] = seg_groups[sel]
            if fresh_v is None:
                fr = None
            else:
                fr = np.ones(B, dtype=bool)
                fr[: len(sel)] = fresh_v[sel]
                if fr.all():
                    fr = None
            yield ReadChunk(out, lens, sk, st, gr, fr)


def split_ambiguous(
    encoded: Iterable[tuple], ambig_code: int = 4
) -> Iterable[tuple[np.ndarray, int, bool, bool]]:
    """Split encoded reads at ambiguous bases (code ``ambig_code``) into
    (piece, group, fresh, stop) items for chunk_reads.

    Semantics (ambig="skip"): any transition whose window — the lag-l context
    plus the next symbol — covers an ambiguous base is dropped. The first
    piece keeps its '['-padded prefix transitions (true read start); the last
    piece keeps its '$' stop transition (true read end); interior boundaries
    emit neither. Per-lag sub-window validity is enforced by the kernel's
    ``fresh`` rule. The reference pipeline folds N to A instead
    (summarize.py:69-70) — that stays the default elsewhere.
    """
    for item in encoded:
        arr, group = item[0], item[1]
        cuts = np.flatnonzero(arr == ambig_code)
        if len(cuts) == 0:
            yield arr, group, True, True
            continue
        bounds = np.concatenate([[-1], cuts, [len(arr)]])
        n_pieces = len(bounds) - 1
        for i in range(n_pieces):
            piece = arr[bounds[i] + 1 : bounds[i + 1]]
            if len(piece) == 0:
                continue  # nothing countable between adjacent ambig bases
            yield piece, group, i == 0, i == n_pieces - 1


def chunk_reads(
    encoded: Iterable[tuple],
    max_lag: int,
    batch_size: int = 1024,
    segment_len: int = 1 << 16,
    reverse: bool = False,
    max_chunk_elems: int = 1 << 25,
) -> Iterable[ReadChunk]:
    """Batch encoded reads (code_array, group) into padded ReadChunks.

    Items may also be (code_array, group, fresh, stop) — the output of
    split_ambiguous — where fresh/stop say whether the row begins/ends at a
    true read boundary (emitting '['-padded prefixes / the '$' transition).

    Long sequences (genomes) are split into segments of ``segment_len`` with a
    ``max_lag`` overlap carried as context-only (skip = max_lag), so counting
    streams at constant memory regardless of sequence length. Chunks cap at
    ``max_chunk_elems`` padded elements: wide (long-segment) chunks carry
    fewer rows instead of ballooning.

    reverse=True additionally emits each read's reverse complement as its own
    read BEFORE segmentation — the correct way to get forward+RC counts for
    arbitrarily long sequences (a TransitionCounter(reverse=True) can only
    RC whole-read chunks, never continuation segments, which lack their
    right-side context). For flagged pieces the RC swaps fresh<->stop (the
    true-read boundary changes sides under reversal).
    """
    if reverse:
        def with_rc(stream):
            for item in stream:
                code_arr, group = item[0], item[1]
                f = bool(item[2]) if len(item) > 2 else True
                s = bool(item[3]) if len(item) > 3 else True
                yield code_arr, group, f, s
                yield (3 - code_arr[::-1]).astype(code_arr.dtype), group, s, f

        encoded = with_rc(encoded)

    # rows: codes, group, skip, stopped, fresh
    rows: List[tuple[np.ndarray, int, int, bool, bool]] = []
    run_maxlen = 0  # padded length of the widest pending row

    def emit():
        nonlocal rows, run_maxlen
        if not rows:
            return None
        maxlen = run_maxlen
        # Pad the row count to the batch size (element-budget-capped): zero-
        # length rows count nothing, and a CONSTANT chunk shape means one
        # kernel compilation (a trailing odd-shaped chunk would otherwise
        # recompile).
        # max(maxlen, 1): a batch of only zero-length rows emits a (B, 0)
        # chunk rather than dividing by zero.
        B = max(
            len(rows),
            min(batch_size, max(1, max_chunk_elems // max(maxlen, 1))),
        )
        codes = np.zeros((B, maxlen), dtype=np.int8)
        lengths = np.zeros(B, dtype=np.int32)
        skip = np.zeros(B, dtype=np.int32)
        stopped = np.zeros(B, dtype=bool)
        groups = np.zeros(B, dtype=np.int32)
        fresh = np.ones(B, dtype=bool)
        for i, (c, g, s, st, fr) in enumerate(rows):
            codes[i, : len(c)] = c
            lengths[i] = len(c)
            skip[i] = s
            stopped[i] = st
            groups[i] = g
            fresh[i] = fr
        rows = []
        run_maxlen = 0
        return ReadChunk(codes, lengths, skip, stopped, groups,
                         None if fresh.all() else fresh)

    def push(row):
        """Append a row; returns a chunk to yield first if adding the row
        would push the pending batch past the element budget (a wide row
        must not retroactively inflate many narrow padded rows)."""
        nonlocal run_maxlen
        padded = -(-len(row[0]) // PAD_LEN_ALIGN) * PAD_LEN_ALIGN
        flushed = None
        if rows and (len(rows) + 1) * max(run_maxlen, padded) > max_chunk_elems:
            flushed = emit()
        rows.append(row)
        run_maxlen = max(run_maxlen, padded)
        return flushed

    if segment_len < max_lag:
        raise ValueError(
            f"segment_len ({segment_len}) must be >= max_lag ({max_lag}): "
            "continuation segments carry a max_lag context overlap"
        )
    for item in encoded:
        code_arr, group = item[0], item[1]
        p_fresh = bool(item[2]) if len(item) > 2 else True
        p_stop = bool(item[3]) if len(item) > 3 else True
        n = len(code_arr)
        if n <= segment_len:
            pre = push((code_arr, group, 0, p_stop, p_fresh))
            if pre is not None:
                yield pre
        else:
            start = 0
            first = True
            while start < n:
                end = min(start + segment_len, n)
                seg_start = start if first else start - max_lag
                # Continuation segments are fresh=True: skip=max_lag already
                # drops every j < lag position, so the flag is inert there.
                pre = push((
                    code_arr[seg_start:end], group,
                    0 if first else max_lag,
                    (end == n) and p_stop,
                    p_fresh if first else True,
                ))
                if pre is not None:
                    yield pre
                if len(rows) >= batch_size:
                    yield emit()
                first = False
                start = end
        if len(rows) >= batch_size:
            yield emit()
    last = emit()
    if last is not None:
        yield last
