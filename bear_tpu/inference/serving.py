"""Production serving: fully on-device batch sequence scoring.

The analysis-oriented scoring path (bear_tpu.inference.scoring, mirroring the
reference's get_var_probs) builds per-call Python lookups — right for
interactive work, wrong for high-throughput serving. ``BearServer``
precompiles one jitted function that takes a padded batch of integer-coded
sequences and returns per-sequence log-probabilities with zero host work:

    rolling '['-padded context codes  (same index math as the counting kernel)
    -> gather transition counts from the device-resident table
    -> concentrations = ar(context)/h + counts
    -> MAP log-prob sum, or per-sequence posterior-sampled scores (one
       Dirichlet draw per (sequence, context row), reused on revisit — the
       same stateless semantics as assembly).

Scores include the start-pad contexts and the stop transition, matching
get_bear_probs_seqs' padding semantics (reference get_var_probs.py:573-574).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bear_tpu.counting.engine import table_rows
from bear_tpu.ops import alphabets
from bear_tpu.ops.loggamma import fold_in_many, log_dirichlet_draw_keyed_t


# Marsaglia-Tsang proposals per lane in the serving samplers. Acceptance is
# >= 95% per proposal and the proposal itself is the Wilson-Hilferty cube
# (the standard Gamma approximation), so the ~0.05^n residual that falls
# back to the clamped last proposal is still near-distribution — 3 keeps the
# contamination at ~1e-4 with a ~2x cheaper kernel than 6 (measured on v5e).
SAMPLE_PROPOSALS = 3


def _sampled_logp_picked(keys, conc, nxt):
    """Row-keyed posterior Dirichlet log-prob OF THE CHOSEN category for a
    [..., A+1] concentration tensor: ONE fused fixed-iteration sampling pass
    over every row (see log_dirichlet_draw_keyed_t), replacing a
    vmap-of-vmap of per-row fold_in + rejection-loop draws (50x slower;
    PERF.md). keys.shape and nxt.shape must equal conc.shape[:-1]; same
    key + concentration => same draw (the stateless revisit semantics of
    assembly/serving).

    The whole computation runs element-MINOR ([A+1, M] with M = the flat
    element count in the TPU lane dimension) and selects the chosen
    category with a one-hot sum — no [M, A+1, F] intermediate and no
    take_along_axis gather ever materializes. The [.., A, F]-minor layout
    of the previous version tiled to (8, 128) at ~68x padding and was the
    entire sampled-vs-MAP serving gap (PERF.md)."""
    shp = conc.shape[:-1]
    A1 = conc.shape[-1]
    lg = log_dirichlet_draw_keyed_t(
        keys.reshape(-1), conc.reshape(-1, A1).T, n_iter=SAMPLE_PROPOSALS)
    lse = jax.scipy.special.logsumexp(lg, axis=0)
    sel = jnp.arange(A1, dtype=jnp.int32)[:, None] == nxt.reshape(-1)[None, :]
    # -inf draws (zero concentration): picked when selected (score -inf),
    # excluded from the one-hot sum otherwise.
    picked = jnp.sum(jnp.where(sel, lg, 0.0), axis=0)
    return (picked - lse).reshape(shp)


def _context_rows_and_next(codes, lengths, lag, A=4):
    """Vectorized context-row/next-symbol extraction for '['-padded,
    ']'-terminated sequences: codes [B, L] int32 (0..A-1), lengths [B].

    Returns rows [B, L+1], nxt [B, L+1], mask [B, L+1] — one entry per
    transition position j=0..len (j==len is the stop)."""
    B, L = codes.shape
    P = L + 1
    j = jnp.arange(P, dtype=jnp.int32)[None, :]
    lengths = lengths.astype(jnp.int32)[:, None]
    codes32 = codes.astype(jnp.int32)

    code_acc = jnp.zeros((B, P), dtype=jnp.int32)
    powA = 1
    for i in range(1, lag + 1):
        shifted = jnp.pad(codes32, ((0, 0), (i, 0)))[:, :P]
        code_acc = code_acc + shifted * powA
        powA *= A
    n_pad = jnp.maximum(0, lag - j)
    rows = (A ** (lag - n_pad) - 1) // (A - 1) + code_acc

    codes_ext = jnp.pad(codes32, ((0, 0), (0, 1)))
    nxt = jnp.where(j < lengths, codes_ext, A)
    mask = j <= lengths  # includes the stop transition
    return rows, nxt, mask


def _rows_from_codes(codes: np.ndarray, lag: int, A: int) -> np.ndarray:
    """Vectorized general-alphabet context-code -> table-row math (same
    index math as TableCounter.rows / the counting kernel). codes [.., lag]
    with '[' coded as A."""
    codes = codes.astype(np.int64)
    is_pad = codes == A
    n_pad = is_pad.sum(axis=-1)
    powA = A ** np.arange(lag - 1, -1, -1, dtype=np.int64)
    code = np.where(is_pad, 0, codes) @ powA
    return (A ** (lag - n_pad) - 1) // (A - 1) + code


def contexts_to_rows(contexts, lag: int, alphabet: str = "dna") -> np.ndarray:
    """Context strings (may contain leading '[') -> table rows, vectorized
    over any alphabet."""
    codes = alphabets.encode_kmers(np.asarray(contexts), alphabet)
    return _rows_from_codes(codes, lag, alphabets.alphabet_size(alphabet))


def table_from_dataset(dataset, lag: int, train_col: int = 0) -> np.ndarray:
    """Dense ``[table_rows(lag), A+1]`` transition table from one column of
    an in-memory CountDataset — the bridge from a trained model directory's
    count TSVs (load_bear_dataset) to a device-resident serving table.

    Duplicate k-mer rows (possible across summarize shard files)
    accumulate."""
    if dataset.lag != lag:
        raise ValueError(
            f"dataset lag {dataset.lag} != model lag {lag}"
        )
    A = alphabets.alphabet_size(dataset.alphabet)
    rows = _rows_from_codes(dataset.codes, lag, A)
    table = np.zeros((table_rows(lag, A), A + 1), dataset.counts.dtype)
    np.add.at(table, rows, dataset.counts[:, train_col, :])
    return table


def _rows_to_onehot_contexts(rows, lag, dtype, A=4):
    """Device-side inverse of the row index: [..,] rows -> one-hot
    [.., lag, A+1] '['-padded contexts (integer-exact suffix-length decode)."""
    # suffix length m: number of boundaries (A^k - 1)/(A-1) <= row, k = 1..lag
    m = jnp.zeros(rows.shape, dtype=jnp.int32)
    for k in range(1, lag + 1):
        m = m + (rows >= (A**k - 1) // (A - 1)).astype(jnp.int32)
    code = rows - (A**m - 1) // (A - 1)
    digs = []
    rem = code
    for _ in range(lag):
        digs.append(rem % A)
        rem = rem // A
    digits = jnp.stack(digs[::-1], axis=-1)  # leftmost..rightmost residues
    pos = jnp.arange(lag, dtype=jnp.int32)
    is_pad = pos < (lag - m)[..., None]
    classes = jnp.where(is_pad, A, digits)
    return alphabets.one_hot(classes, A + 1, dtype)


class BearServer:
    """Precompiled batch scorer over a device-resident count table.

    Parameters
    ----------
    table : [table_rows(lag), A+1] transition counts (train column).
    lag : model lag.
    h : BEAR concentration (None for BMM-only with ``van``).
    ar_apply : jitted (one_hot [.., lag, 5] -> probs [.., 5]) closure, e.g.
        from load_bear; None with ``van`` for vanilla BEAR.
    van : BMM symmetric prior (used when ar_apply is None).
    mesh / mesh_axis : optional device mesh: the count table is row-split
        over ``mesh_axis`` (tensor parallelism — serving at lag 14-15 where
        the table exceeds one chip's HBM). Each device gathers its own rows
        and one psum per batch assembles the full gather; queries and scores
        stay replicated.
    """

    def __init__(self, table, lag: int, *, h: Optional[float] = None,
                 ar_apply=None, van: Optional[float] = None,
                 dtype=jnp.float32, alphabet: str = "dna",
                 mesh=None, mesh_axis: str = "kmer"):
        assert (ar_apply is None) != (van is None), "specify exactly one of ar_apply / van"
        A = alphabets.alphabet_size(alphabet)
        assert np.shape(table)[0] == table_rows(lag, A), (
            f"table rows {np.shape(table)[0]} != rows(lag={lag}, A={A})"
        )
        if mesh is None:
            self._table = jnp.asarray(np.asarray(table), dtype=dtype)

            def gather_rows(tbl, rows):
                return tbl[rows]

        else:
            from jax import shard_map
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_shard = int(mesh.shape[mesh_axis])
            rows_total = int(np.shape(table)[0])
            local = -(-rows_total // n_shard)
            padded = local * n_shard
            table_np = np.asarray(table)
            np_dtype = np.dtype(dtype)
            tail = tuple(table_np.shape[1:])

            def _shard_cb(idx):
                # Materialize ONE shard's row range at a time: the whole
                # point of mesh= is a table too large for one device (and a
                # full padded host copy would double host RAM at lag 15).
                sl = idx[0]
                start = sl.start or 0
                stop = padded if sl.stop is None else sl.stop
                out = np.zeros((stop - start,) + tail, np_dtype)
                m = min(stop, rows_total)
                if m > start:
                    out[: m - start] = table_np[start:m]
                return out

            self._table = jax.make_array_from_callback(
                (padded,) + tail, NamedSharding(mesh, P(mesh_axis)), _shard_cb
            )

            def per_shard(tbl_local, rows):
                # Each device owns rows [lo, lo+local); exactly one shard
                # contributes each query row, so the psum is an exact gather.
                lo = jax.lax.axis_index(mesh_axis).astype(jnp.int32) * local
                loc = jnp.clip(rows - lo, 0, local - 1)
                vals = tbl_local[loc]
                mine = ((rows >= lo) & (rows - lo < local))[..., None]
                return jax.lax.psum(
                    jnp.where(mine, vals, jnp.zeros((), vals.dtype)), mesh_axis
                )

            gather_rows = shard_map(
                per_shard, mesh=mesh,
                in_specs=(P(mesh_axis), P()), out_specs=P(),
            )

        self._lag = lag
        self._alphabet = alphabet
        self.lag = lag
        self.alphabet = alphabet

        def concentrations(rows, counts):
            # No extra epsilon: get_pdf forms concs = ar/h + counts with
            # none (load_bear's ar_apply already carries +EPSILON), so
            # serving scores match get_bear_probs_seqs exactly; zero
            # concentrations (van=0, count 0) are handled by the sampler's
            # -inf masking and the MAP path's log.
            if ar_apply is None:
                return counts + van
            oh = _rows_to_onehot_contexts(rows, lag, dtype, A)
            probs = ar_apply(oh)
            return probs / h + counts

        def log_prob_map(table_arr, codes, lengths):
            rows, nxt, mask = _context_rows_and_next(codes, lengths, lag, A)
            conc = concentrations(rows, gather_rows(table_arr, rows))
            logp = jnp.log(conc / jnp.sum(conc, axis=-1, keepdims=True))
            picked = jnp.take_along_axis(logp, nxt[..., None], axis=-1)[..., 0]
            return jnp.sum(jnp.where(mask, picked, 0.0), axis=-1)

        def log_prob_sampled_multi(table_arr, codes, lengths, keys):
            """keys: [S] sample keys. Windows + gathers + concentrations run
            ONCE; only the Dirichlet draw grows the in-kernel sample axis
            (the reference's analysis default is mc_samples=41,
            get_var_probs.py:174-175 / 343-346 — a host loop would redo all
            gathers per sample). Returns [B, S]."""
            rows, nxt, mask = _context_rows_and_next(codes, lengths, lag, A)
            conc = concentrations(rows, gather_rows(table_arr, rows))
            B = rows.shape[0]

            def one(key):
                # Per-(sequence, row) keys — each sequence scores under its
                # own sampled AR model; same row within a sequence reuses
                # one draw.
                seq_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                    jnp.arange(B))
                elem_keys = jax.vmap(fold_in_many, in_axes=(0, 0))(seq_keys,
                                                                   rows)
                picked = _sampled_logp_picked(elem_keys, conc, nxt)
                return jnp.sum(jnp.where(mask, picked, 0.0), axis=-1)

            return jax.vmap(one, out_axes=-1)(keys)

        def snv_delta_map(table_arr, rows_wt, nxt_wt, seq_len, pos, alt, ref):
            """MAP Δ log-prob (mutant - wild-type) for substitutions.

            A substitution at sequence position p touches exactly the
            transitions t in [p, p+lag]: at t == p the NEXT symbol changes;
            at t > p the context row shifts by (alt - ref) * A^(t-p-1)
            (the row codec weights the i-th previous base by A^(i-1) —
            identical digit order to _context_rows_and_next, so no window
            strings are ever built). Only the 2(lag+1) touched windows are
            gathered per variant — the device analog of
            get_bear_probs' Δ-window scoring (reference
            get_var_probs.py:293-334, 343-454)."""
            i = jnp.arange(lag + 1, dtype=jnp.int32)[None, :]
            t = pos[:, None] + i                       # [V, lag+1]
            valid = t <= seq_len                       # t == len is the stop
            tc = jnp.clip(t, 0, seq_len)
            r_wt = rows_wt[tc]
            n_wt = nxt_wt[tc]
            powA = jnp.asarray(
                [1] + [A ** k for k in range(lag)], jnp.int32)[None, :]
            shift = (alt - ref)[:, None] * powA
            r_mt = jnp.where(i >= 1, r_wt + shift, r_wt)
            n_mt = jnp.where(i == 0, alt[:, None], n_wt)

            def logp(rows, nxt):
                conc = concentrations(rows, gather_rows(table_arr, rows))
                lp = jnp.log(conc / jnp.sum(conc, axis=-1, keepdims=True))
                return jnp.take_along_axis(lp, nxt[..., None], axis=-1)[..., 0]

            d = logp(r_mt, n_mt) - logp(r_wt, n_wt)
            return jnp.sum(jnp.where(valid, d, 0.0), axis=-1)

        def snv_delta_sampled(table_arr, rows_wt, nxt_wt, seq_len, pos, alt,
                              ref, keys):
            """Posterior-SAMPLED Δ log-prob for substitutions: every touched
            window's transition distribution is one Dirichlet draw, keyed
            statelessly on the table row (fold_in(key, row)) so the shared
            i==0 context draws identically for wt and mt — the same
            stateless-draw semantics as log_prob_sampled / assembly.
            ``keys``: [S] sample keys; window math, gathers, and
            concentrations run once, only the draw grows the sample axis
            (reference MC default mc_samples=41, get_var_probs.py:174-175).
            Returns [V, S]."""
            i = jnp.arange(lag + 1, dtype=jnp.int32)[None, :]
            t = pos[:, None] + i
            valid = t <= seq_len
            tc = jnp.clip(t, 0, seq_len)
            r_wt = rows_wt[tc]
            n_wt = nxt_wt[tc]
            powA = jnp.asarray(
                [1] + [A ** k for k in range(lag)], jnp.int32)[None, :]
            shift = (alt - ref)[:, None] * powA
            r_mt = jnp.where(i >= 1, r_wt + shift, r_wt)
            n_mt = jnp.where(i == 0, alt[:, None], n_wt)
            conc_mt = concentrations(r_mt, gather_rows(table_arr, r_mt))
            conc_wt = concentrations(r_wt, gather_rows(table_arr, r_wt))

            def one(key):
                def logp(rows, conc, nxt):
                    return _sampled_logp_picked(fold_in_many(key, rows),
                                                conc, nxt)

                d = logp(r_mt, conc_mt, n_mt) - logp(r_wt, conc_wt, n_wt)
                return jnp.sum(jnp.where(valid, d, 0.0), axis=-1)

            return jax.vmap(one, out_axes=-1)(keys)

        def _wt_windows(rows1, nxt1, pos, n_wt, i_wt):
            """Wild-type covering windows by TRANSITION arithmetic: a
            variant's wild-type windows are exactly transitions
            t = pos..pos+n_wt-1 of the precomputed per-sequence
            (row, next) arrays — no wild-type window building at all (the
            same trick as the SNV path; reference get_var_probs.py:293-334
            slices window strings per variant instead). ``i_wt`` is
            arange(max wt window count) (an argument so its width is free
            of the mutant width)."""
            i = i_wt.astype(jnp.int32)[None, :]
            m_wt = i < n_wt[:, None]
            tc = jnp.clip(pos[:, None] + i, 0, rows1.shape[0] - 1)
            return rows1[tc], nxt1[tc], m_wt

        def _mt_windows(C, n_mt):
            """Mutant covering windows from the [V, Q] local char-code
            matrix (int8: left lag context | variant letters | right
            context): the Horner row recurrence and next-symbol extraction
            run IN-KERNEL so the host ships ~1 byte per (variant, offset)
            instead of precomputed int32 row/next/mask matrices (9 bytes —
            host-link traffic was the arbitrary-variant bottleneck both
            over the tunnel and on PCIe hosts; PERF.md round 4). Window i
            of a variant covers chars C[:, i:i+lag] with next symbol
            C[:, i+lag]; '['-pads (code A) contribute digit 0 and are
            counted for the prefix-block offset — _rows_from_codes' math,
            int32-exact for every lag a dense/sharded table can hold."""
            Q = C.shape[1]
            W_mt = Q - lag
            C32 = C.astype(jnp.int32)
            code = jnp.zeros(C.shape[:1] + (W_mt,), jnp.int32)
            npad = jnp.zeros_like(code)
            for k in range(lag):
                ch = C32[:, k:k + W_mt]
                is_pad = ch == A
                npad += is_pad
                code = code * A + jnp.where(is_pad, 0, ch)
            rows_mt = (A ** (lag - npad) - 1) // (A - 1) + code
            nxt_mt = C32[:, lag:]
            m_mt = jnp.arange(W_mt, dtype=jnp.int32)[None, :] < n_mt[:, None]
            return rows_mt, nxt_mt, m_mt

        def var_delta_map(table_arr, rows1, nxt1, pos, n_wt, i_wt, C_mt,
                          n_mt):
            """MAP Δ log-prob for ARBITRARY variants (multi-base
            substitutions, insertions, deletions): wild-type windows are
            gathered in-kernel from the sequence transition arrays, mutant
            windows are built in-kernel from the int8 char matrix
            (_mt_windows) — the host supplies only chars and counts.
            Covering-window semantics of get_bear_probs (reference
            get_var_probs.py:293-334), all gathers and likelihood math in
            one launch."""

            def logp(rows, nxt):
                conc = concentrations(rows, gather_rows(table_arr, rows))
                lp = jnp.log(conc / jnp.sum(conc, axis=-1, keepdims=True))
                return jnp.take_along_axis(lp, nxt[..., None], axis=-1)[..., 0]

            rows_mt, nxt_mt, m_mt = _mt_windows(C_mt, n_mt)
            rows_wt, nxt_wt, m_wt = _wt_windows(rows1, nxt1, pos, n_wt, i_wt)
            return (jnp.sum(jnp.where(m_mt, logp(rows_mt, nxt_mt), 0.0), -1)
                    - jnp.sum(jnp.where(m_wt, logp(rows_wt, nxt_wt), 0.0), -1))

        def var_delta_sampled(table_arr, rows1, nxt1, pos, n_wt, i_wt,
                              C_mt, n_mt, keys):
            """Posterior-SAMPLED Δ for arbitrary variants; draws are keyed
            statelessly on the table row so windows shared between wild type
            and mutant draw identically (their Δ contribution cancels
            exactly, as in the host MC path). ``keys``: [S] sample keys —
            gathers and concentrations run once, the draw carries the
            in-kernel sample axis. Returns [V, S]."""
            rows_mt, nxt_mt, m_mt = _mt_windows(C_mt, n_mt)
            rows_wt, nxt_wt, m_wt = _wt_windows(rows1, nxt1, pos, n_wt, i_wt)
            conc_mt = concentrations(rows_mt,
                                     gather_rows(table_arr, rows_mt))
            conc_wt = concentrations(rows_wt,
                                     gather_rows(table_arr, rows_wt))

            def one(key):
                def logp(rows, conc, nxt):
                    return _sampled_logp_picked(fold_in_many(key, rows),
                                                conc, nxt)

                return (
                    jnp.sum(jnp.where(m_mt, logp(rows_mt, conc_mt, nxt_mt),
                                      0.0), -1)
                    - jnp.sum(jnp.where(m_wt, logp(rows_wt, conc_wt, nxt_wt),
                                        0.0), -1))

            return jax.vmap(one, out_axes=-1)(keys)

        self._map_fn = jax.jit(log_prob_map)
        self._sample_multi_fn = jax.jit(log_prob_sampled_multi)
        # Single-key compatibility wrapper (same draws as keys=[key]).
        self._sample_fn = jax.jit(
            lambda t, c, l, k: log_prob_sampled_multi(t, c, l, k[None])[..., 0]
        )
        self._snv_fn = jax.jit(snv_delta_map)
        self._snv_sample_fn = jax.jit(snv_delta_sampled)
        self._var_fn = jax.jit(var_delta_map)
        self._var_sample_fn = jax.jit(var_delta_sampled)
        # Raw (unjitted) sampled closures + cache for in-kernel sample
        # reductions (reduce="mean_std"/"quantiles"): the [V, S] delta
        # tensor reduces over S BEFORE leaving the kernel, so the host
        # fetches [V, 2] / [V, k] instead of S-fold sample tensors — at the
        # reference's mc_samples=41 analysis default (get_var_probs.py:
        # 174-175) the full-sample output fetch dominated DMS scoring
        # (43 MB per chunk; PERF.md round 4).
        self._snv_sample_raw = snv_delta_sampled
        self._var_sample_raw = var_delta_sampled
        self._score_sample_raw = log_prob_sampled_multi
        self._reduced_cache = {}

    @staticmethod
    def _reduce_width(reduce: str, quantiles) -> int:
        """Output columns of an in-kernel sample reduction (the single
        source of truth for the reduced shapes)."""
        if reduce == "mean_std":
            return 2
        if reduce == "quantiles":
            return len(quantiles)
        raise ValueError(f"unknown reduce {reduce!r}")

    def _sampled_reduced_fn(self, which: str, reduce: str, quantiles):
        """jitted sampled-delta kernel with an in-kernel reduction over the
        sample axis. Cached per (kernel, reduce, quantiles)."""
        qs = tuple(float(q) for q in quantiles) if reduce == "quantiles" else None
        key = (which, reduce, qs)
        fn = self._reduced_cache.get(key)
        if fn is None:
            raw = {"snv": self._snv_sample_raw,
                   "var": self._var_sample_raw,
                   "score": self._score_sample_raw}[which]
            if reduce == "mean_std":
                def red(d):
                    # ddof=1: the MC standard error convention for S draws.
                    # S=1 has no spread estimate — report 0, not the 0/0
                    # NaN ddof=1 would produce.
                    ddof = min(1, d.shape[-1] - 1)
                    return jnp.stack(
                        [jnp.mean(d, -1), jnp.std(d, -1, ddof=ddof)], -1)
            elif reduce == "quantiles":
                qv = jnp.asarray(qs, jnp.float32)

                def red(d):
                    return jnp.quantile(d, qv, axis=-1).T
            else:
                raise ValueError(f"unknown reduce {reduce!r}")
            fn = jax.jit(lambda *a: red(raw(*a)))
            self._reduced_cache[key] = fn
        return fn

    @classmethod
    def from_model_dir(cls, path: str, *, train_col: int = 0,
                       double_softmax: bool = True, dtype=jnp.float32,
                       mesh=None, mesh_axis: str = "kmer"):
        """Build a server from a trained model directory (config.cfg +
        results.pickle): loads the fitted (h, ar_func) via load_bear and the
        training counts via load_bear_dataset, densifies the ``train_col``
        column into a device table, and precompiles the scoring kernels.
        The device analogue of the reference's load-model-then-scan-counts
        setup in get_var_probs.py:59-82 + 429-451."""
        from bear_tpu.inference.scoring import load_bear, load_bear_dataset

        lag, alphabet_name, h, ar_apply, info = load_bear(
            path, double_softmax=double_softmax
        )
        dataset = load_bear_dataset(info)
        table = table_from_dataset(dataset, lag, train_col=train_col)
        return cls(table, lag, h=h, ar_apply=ar_apply, dtype=dtype,
                   alphabet=alphabet_name, mesh=mesh, mesh_axis=mesh_axis)

    def log_prob_map(self, codes, lengths):
        """MAP per-sequence log-probabilities: [B]."""
        return self._map_fn(self._table, jnp.asarray(codes), jnp.asarray(lengths))

    def log_prob_sampled(self, codes, lengths, key):
        """Posterior-sampled per-sequence log-probabilities: [B]. Each
        sequence scores under its own sampled AR model; repeated contexts
        within a sequence reuse one draw (assembly's stateless semantics)."""
        return self._sample_fn(
            self._table, jnp.asarray(codes), jnp.asarray(lengths), key
        )

    def log_prob_sampled_multi(self, codes, lengths, keys):
        """Posterior-sampled log-probabilities for a [S] array of sample
        keys in ONE launch: [B, S]. Context rows, table gathers, and
        concentrations are computed once; only the Dirichlet draw carries
        the sample axis (the reference's MC analysis default is 41 samples,
        get_var_probs.py:174-175)."""
        return self._sample_multi_fn(
            self._table, jnp.asarray(codes), jnp.asarray(lengths), keys
        )

    def delta_scores_snv(self, wt_seq: str, positions, alt_bases,
                         batch: int = 1 << 17, mode: str = "map",
                         key=None, mc_samples: int = 1,
                         reduce: str = "none",
                         quantiles=(0.05, 0.5, 0.95)):
        """Δ log-prob (mutant − wild-type) for a batch of substitutions,
        entirely on device: DMS-scale scoring (10^6 SNVs in seconds) where
        the host get_bear_probs path loops per variant.

        Parameters
        ----------
        wt_seq : wild-type sequence (string over the alphabet).
        positions : [V] 0-based positions into wt_seq.
        alt_bases : [V] alternate letters (str/array) or integer codes.
        mode : "map" (posterior-mean log-probs; exactly matches
            ``get_bear_probs(..., get_map=True)``, tested) or "sample"
            (each touched window scored under a posterior Dirichlet draw —
            the MC mode; requires ``key``).
        mc_samples : with mode="sample", number of independent draws;
            output gains a trailing sample axis when > 1.
        reduce : with mode="sample": "none" returns the raw per-draw
            scores; "mean_std" reduces the sample axis IN-KERNEL to
            [V, 2] (mean, ddof-1 std); "quantiles" to [V, len(quantiles)].
            The standard DMS consumption is these statistics — reducing
            on device cuts the output fetch mc_samples-fold (the full-
            sample fetch dominated MC-41 scoring; PERF.md). Draw values
            are identical to reduce="none" with the same key.
        quantiles : probability points for reduce="quantiles".

        Returns [V] float scores (or [V, mc_samples] / [V, 2] /
        [V, len(quantiles)]).
        """
        codes = alphabets.encode_kmers(
            np.array([wt_seq]), self._alphabet
        ).astype(np.int32)  # [1, L]
        L = codes.shape[1]
        rows, nxt, _ = _context_rows_and_next(
            jnp.asarray(codes), jnp.asarray([L], jnp.int32), self._lag,
            alphabets.alphabet_size(self._alphabet),
        )
        rows1, nxt1 = rows[0], nxt[0]  # [L+1]
        pos = np.asarray(positions, dtype=np.int32)
        if pos.ndim != 1:
            raise ValueError("positions must be 1-D")
        if (pos < 0).any() or (pos >= L).any():
            raise ValueError("SNV position outside the wild-type sequence")
        alt = np.asarray(alt_bases)
        if alt.dtype.kind in "US":
            alt = alphabets.encode_kmers(alt, self._alphabet)[:, 0]
        alt = alt.astype(np.int32)
        ref = codes[0, pos].astype(np.int32)
        if reduce != "none" and mode != "sample":
            raise ValueError('reduce= requires mode="sample"')
        if mode == "map":
            fn, keys = self._snv_fn, None
            width = None
        elif mode == "sample":
            if key is None:
                raise ValueError('mode="sample" requires key=')
            # ONE launch per chunk carries ALL samples in-kernel (gathers
            # and concentrations amortize across the sample axis); the
            # chunk scales as ~2M/mc_samples rows so the [B, lag+1, A+1, S]
            # draw tensors stay memory-bounded (~4 GB of proposal temps).
            # Measured on v5e at S=41: chunk 4096 -> 45K snvs/s (launch
            # overhead bound), 32768 -> 76K.
            keys = jnp.stack(
                [jax.random.fold_in(key, s) for s in range(mc_samples)])
            if reduce == "none":
                fn, width = self._snv_sample_fn, mc_samples
            else:
                fn = self._sampled_reduced_fn("snv", reduce, quantiles)
                width = self._reduce_width(reduce, quantiles)
            batch = min(batch, max(batch // mc_samples,
                                   (1 << 21) // mc_samples, 1))
        else:
            raise ValueError(f"unknown mode {mode!r}")
        V = len(pos)
        out = np.empty((V,) if keys is None else (V, width), np.float32)
        for s in range(0, V, batch):
            e = min(s + batch, V)
            n = e - s
            # Pad the tail chunk to the batch shape (one compilation);
            # alt == ref rows are exact zero-delta no-ops.
            p_b = np.zeros(min(batch, max(V, 1)), np.int32)
            a_b = np.zeros_like(p_b)
            r_b = np.zeros_like(p_b)
            p_b[:n], a_b[:n], r_b[:n] = pos[s:e], alt[s:e], ref[s:e]
            args = (self._table, rows1, nxt1, jnp.int32(L),
                    jnp.asarray(p_b), jnp.asarray(a_b), jnp.asarray(r_b))
            if keys is not None:
                args = args + (keys,)
            out[s:e] = np.asarray(fn(*args))[:n]
        if mode == "map" or reduce != "none":
            return out
        return out[..., 0] if mc_samples == 1 else out

    def _encode_ragged(self, strs, lens, maxlen):
        """Encode a sequence of variable-length strings into a padded
        (0-filled) [N, maxlen] code matrix via ONE host join + byte-LUT
        gather — no per-string Python and no per-length-group passes (the
        earlier group-wise version was the dominant host cost of
        10^6-variant scoring; PERF.md round 4)."""
        lens = np.asarray(lens)
        out = np.zeros((len(strs), maxlen), np.int32)
        if len(strs) == 0 or maxlen == 0:
            return out
        try:
            joined = "".join(strs)
        except TypeError:  # bytes elements (rare caller choice)
            joined = "".join(
                s.decode("ascii") if isinstance(s, bytes) else s
                for s in strs)
        flat = alphabets.encode_string(joined, self._alphabet)
        # Boolean-mask assignment walks rows in order, matching the join.
        mask = np.arange(maxlen)[None, :] < lens[:, None]
        out[mask] = flat
        return out

    def delta_scores_variants(self, wt_seq: str, variants, *,
                              batch: int = 1 << 18, mode: str = "map",
                              key=None, mc_samples: int = 1,
                              reduce: str = "none",
                              quantiles=(0.05, 0.5, 0.95)):
        """Δ log-prob (mutant − wild-type) for ARBITRARY variants — multi-
        base substitutions, insertions, deletions in the reference's
        'AAG23CC' syntax (get_var_probs.py:336-341) — batched on device.

        Covering-window semantics are identical to get_bear_probs /
        _variant_windows (reference get_var_probs.py:293-334), but nothing
        is built per variant in Python: wild-type windows are pure
        transition arithmetic in-kernel (the SNV trick generalized), and
        the host builds only an int8 char matrix — one vectorized gather
        into the encoded sequence selects left-context / variant / right-
        context characters for every (variant, offset) at once; the window
        rows, next symbols, and masks derive in-kernel (_mt_windows, the
        _rows_from_codes math as a Horner recurrence). 10^6 mixed
        SNV+indel variants score in seconds on one chip.

        Returns [V] float scores (or [V, mc_samples] with mode="sample"
        and mc_samples > 1); MAP scores exactly match
        ``get_bear_probs(..., get_map=True)``. ``reduce``/``quantiles``
        as in :meth:`delta_scores_snv`: an in-kernel reduction over the
        sample axis returning [V, 2] ("mean_std") or [V, len(quantiles)]
        ("quantiles") — the fetch shrinks mc_samples-fold while draw
        values stay identical to reduce="none".
        """
        from bear_tpu.inference.scoring import parse_var

        lag = self._lag
        A = alphabets.alphabet_size(self._alphabet)
        wt_codes = alphabets.encode_kmers(
            np.array([wt_seq]), self._alphabet)[0].astype(np.int32)  # [L]
        L = len(wt_codes)
        if isinstance(variants, np.ndarray):
            variants = variants.tolist()
        else:
            variants = list(variants)
        # Strings parse ('AAG23CC' grammar); (wt_aa, mt_aa, pos) triples
        # pass through — mixing is allowed.
        parsed = [parse_var(v) if isinstance(v, str) else v
                  for v in variants]
        V = len(parsed)
        if reduce != "none" and mode != "sample":
            raise ValueError('reduce= requires mode="sample"')
        if V == 0:
            # Honor the documented shapes even when empty: [0] for MAP /
            # single-sample, [0, mc_samples] for a multi-sample request,
            # [0, k] for a reduced request.
            if mode == "sample" and reduce != "none":
                return np.zeros((0, self._reduce_width(reduce, quantiles)),
                                np.float32)
            if mode == "sample" and mc_samples != 1:
                return np.zeros((0, mc_samples), np.float32)
            return np.zeros((0,), np.float32)

        # Per-sequence transition arrays, shared by every variant's
        # wild-type side (computed once, on device).
        rows, nxt, _ = _context_rows_and_next(
            jnp.asarray(wt_codes[None, :]), jnp.asarray([L], jnp.int32),
            lag, A)
        rows1, nxt1 = rows[0], nxt[0]  # [L+1]

        # '['-padded + '$'-terminated char codes; both out-of-alphabet
        # symbols carry code A ('[' only ever appears in context prefixes,
        # '$' only as a final next symbol, so the shared code is unambiguous
        # — alphabets.py's input/output column convention).
        padded_enc = np.concatenate([
            np.full(lag, A, np.int32), wt_codes, np.full(1, A, np.int32)])
        len_padded = L + lag + 1

        # One C-level unzip + fromiter per field (three list comprehensions
        # with per-item len() were ~1 s of the 10^6-variant host budget).
        wt_aas, mt_aas, pos_t = zip(*parsed)
        pos = np.fromiter(pos_t, np.int64, V)
        lw = np.fromiter(map(len, wt_aas), np.int64, V)
        lm = np.fromiter(map(len, mt_aas), np.int64, V)
        if (pos < 0).any() or (pos + lw > L).any():
            raise ValueError("variant outside the wild-type sequence")
        # Validated: everything below fits int32 (rows are int32 by the
        # dense-table contract), and int32 halves the [V, W] host traffic.
        pos, lw, lm = (a.astype(np.int32) for a in (pos, lw, lm))
        max_lw, max_lm = int(max(lw.max(), 1)), int(max(lm.max(), 1))
        wt_var = self._encode_ragged(wt_aas, lw, max_lw)
        mt_var = self._encode_ragged(mt_aas, lm, max_lm)

        # Vectorized wild-type match assert (reference get_var_probs.py:309).
        span = np.arange(max_lw, dtype=np.int32)[None, :]
        in_wt = span < lw[:, None]
        ref_at = wt_codes[np.clip(pos[:, None] + span, 0, L - 1)]
        mism = in_wt & (ref_at != wt_var)
        if mism.any():
            bad = int(np.nonzero(mism.any(1))[0][0])
            raise AssertionError(
                f"variant {parsed[bad]} does not match wild-type sequence "
                f"at position {int(pos[bad])}"
            )

        p_pad = pos + lag
        right_len = np.clip(len_padded - (p_pad + lw), 0, lag)
        n_wt = (lw + right_len).astype(np.int32)  # wt covering windows
        n_mt = (lm + right_len).astype(np.int32)  # mt covering windows
        W_wt = int(n_wt.max())

        # Mutant local char matrix C[v, q]: left context (lag), variant
        # letters (lm), right context (truncated at '$') — one vectorized
        # 3-way select over gathers, shipped as int8 (1 byte per
        # (variant, offset)). The window rows / next symbols / masks are
        # derived IN-KERNEL (_mt_windows): shipping precomputed int32
        # matrices cost 9x the link bytes and ~2 s of host Horner per 10^6
        # variants (PERF.md round 4).
        Q = 2 * lag + max_lm
        q = np.arange(Q, dtype=np.int32)[None, :]
        is_left = q < lag
        is_mid = (q >= lag) & (q < lag + lm[:, None])
        idx_l = np.clip(p_pad[:, None] - lag + q, 0, len_padded - 1)
        idx_r = np.clip(p_pad[:, None] + lw[:, None] + (q - lag - lm[:, None]),
                        0, len_padded - 1)
        C = np.where(
            is_left, padded_enc[idx_l],
            np.where(is_mid,
                     mt_var[np.arange(V)[:, None],
                            np.clip(q - lag, 0, max_lm - 1)],
                     padded_enc[idx_r])).astype(np.int8)
        pos32 = pos

        if mode == "map":
            fn, keys = self._var_fn, None
            width = None
        elif mode == "sample":
            if key is None:
                raise ValueError('mode="sample" requires key=')
            # In-kernel sample axis: one launch per chunk scores ALL
            # samples (gathers/window math amortize); chunk scales as
            # ~1M/mc_samples rows (arbitrary-variant windows are ~2x the
            # SNV count, so half the SNV row budget).
            keys = jnp.stack(
                [jax.random.fold_in(key, s) for s in range(mc_samples)])
            if reduce == "none":
                fn, width = self._var_sample_fn, mc_samples
            else:
                fn = self._sampled_reduced_fn("var", reduce, quantiles)
                width = self._reduce_width(reduce, quantiles)
            batch = min(batch, max(batch // mc_samples,
                                   (1 << 20) // mc_samples, 1))
        else:
            raise ValueError(f"unknown mode {mode!r}")

        i_wt = jnp.arange(W_wt, dtype=jnp.int32)
        B = min(batch, V)
        out = np.empty((V,) if keys is None else (V, width), np.float32)
        for s in range(0, V, B):
            e = min(s + B, V)
            n = e - s
            # Pad the tail chunk to the batch shape (one compilation);
            # padded variants are fully masked no-ops (n_wt=0, n_mt=0).
            p_b = np.zeros(B, np.int32)
            nw_b = np.zeros(B, np.int32)
            nm_b = np.zeros(B, np.int32)
            c_b = np.zeros((B, Q), np.int8)
            p_b[:n], nw_b[:n], nm_b[:n] = pos32[s:e], n_wt[s:e], n_mt[s:e]
            c_b[:n] = C[s:e]
            args = (self._table, rows1, nxt1, jnp.asarray(p_b),
                    jnp.asarray(nw_b), i_wt, jnp.asarray(c_b),
                    jnp.asarray(nm_b))
            if keys is not None:
                args = args + (keys,)
            out[s:e] = np.asarray(fn(*args))[:n]
        if mode == "map" or reduce != "none":
            return out
        return out[..., 0] if mc_samples == 1 else out

    def score(self, seqs, mode: str = "map", key=None,
              pad_to: Optional[int] = None, mc_samples: int = 1,
              reduce: str = "none", quantiles=(0.05, 0.5, 0.95)):
        """Convenience host API: list of strings -> [B] scores. Pads to
        ``pad_to`` (or the max length rounded up to 64) so repeated calls
        reuse the compiled kernel. With mode="sample" and mc_samples > 1,
        returns [B, mc_samples] independent posterior draws (each sample
        index folds a fresh key; within one sample the usual per-sequence
        stateless draw semantics hold). ``reduce``/``quantiles`` as in
        :meth:`delta_scores_snv`: an in-kernel reduction over the sample
        axis returning [B, 2] ("mean_std") or [B, len(quantiles)]."""
        if reduce != "none" and mode != "sample":
            raise ValueError('reduce= requires mode="sample"')
        seqs = list(seqs)
        lengths = np.asarray([len(s) for s in seqs], np.int32)
        maxlen = int(lengths.max()) if len(seqs) else 0
        L = pad_to or (-(-max(maxlen, 1) // 64) * 64)
        # Vectorized by length group (no per-string Python encode) — the
        # same pattern as the variant path; keeps 10^6-sequence batches off
        # the host interpreter.
        codes = self._encode_ragged(seqs, lengths, L).astype(np.int8)
        if mode == "map":
            return np.asarray(self.log_prob_map(codes, lengths))
        if mode == "sample":
            base = key if key is not None else jax.random.key(0)
            if reduce != "none":
                keys = jnp.stack(
                    [jax.random.fold_in(base, s) for s in range(mc_samples)])
                fn = self._sampled_reduced_fn("score", reduce, quantiles)
                return np.asarray(fn(self._table, jnp.asarray(codes),
                                     jnp.asarray(lengths), keys))
            if mc_samples == 1:
                return np.asarray(self.log_prob_sampled(codes, lengths, base))
            keys = jnp.stack(
                [jax.random.fold_in(base, s) for s in range(mc_samples)])
            return np.asarray(
                self.log_prob_sampled_multi(codes, lengths, keys))
        raise ValueError(f"unknown mode {mode!r}")
