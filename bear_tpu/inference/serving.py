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
from bear_tpu.ops.loggamma import log_dirichlet_draw


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

        def log_prob_sampled(table_arr, codes, lengths, key):
            rows, nxt, mask = _context_rows_and_next(codes, lengths, lag, A)
            conc = concentrations(rows, gather_rows(table_arr, rows))
            B = rows.shape[0]
            seq_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))

            def draw(seq_key, row, c):
                lg = log_dirichlet_draw(jax.random.fold_in(seq_key, row), c)
                return lg - jax.scipy.special.logsumexp(lg)

            logp = jax.vmap(jax.vmap(draw, in_axes=(None, 0, 0)))(seq_keys, rows, conc)
            picked = jnp.take_along_axis(logp, nxt[..., None], axis=-1)[..., 0]
            return jnp.sum(jnp.where(mask, picked, 0.0), axis=-1)

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
                              ref, key):
            """Posterior-SAMPLED Δ log-prob for substitutions: every touched
            window's transition distribution is one Dirichlet draw, keyed
            statelessly on the table row (fold_in(key, row)) so the shared
            i==0 context draws identically for wt and mt — the same
            stateless-draw semantics as log_prob_sampled / assembly."""
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

            def logp(rows, nxt):
                conc = concentrations(rows, gather_rows(table_arr, rows))

                def draw(row, c):
                    lg = log_dirichlet_draw(jax.random.fold_in(key, row), c)
                    return lg - jax.scipy.special.logsumexp(lg)

                lp = jax.vmap(jax.vmap(draw))(rows, conc)
                return jnp.take_along_axis(lp, nxt[..., None], axis=-1)[..., 0]

            d = logp(r_mt, n_mt) - logp(r_wt, n_wt)
            return jnp.sum(jnp.where(valid, d, 0.0), axis=-1)

        def var_delta_map(table_arr, rows_wt, nxt_wt, m_wt, rows_mt, nxt_mt,
                          m_mt):
            """MAP Δ log-prob for ARBITRARY variants (multi-base
            substitutions, insertions, deletions): the host supplies the
            padded wild-type/mutant window rows + next symbols + validity
            masks (exactly get_bear_probs' covering windows, reference
            get_var_probs.py:293-334); the device does all the gathers and
            likelihood math in one launch."""

            def logp(rows, nxt):
                conc = concentrations(rows, gather_rows(table_arr, rows))
                lp = jnp.log(conc / jnp.sum(conc, axis=-1, keepdims=True))
                return jnp.take_along_axis(lp, nxt[..., None], axis=-1)[..., 0]

            return (jnp.sum(jnp.where(m_mt, logp(rows_mt, nxt_mt), 0.0), -1)
                    - jnp.sum(jnp.where(m_wt, logp(rows_wt, nxt_wt), 0.0), -1))

        def var_delta_sampled(table_arr, rows_wt, nxt_wt, m_wt, rows_mt,
                              nxt_mt, m_mt, key):
            """Posterior-SAMPLED Δ for arbitrary variants; draws are keyed
            statelessly on the table row so windows shared between wild type
            and mutant draw identically (their Δ contribution cancels
            exactly, as in the host MC path)."""

            def logp(rows, nxt):
                conc = concentrations(rows, gather_rows(table_arr, rows))

                def draw(row, c):
                    lg = log_dirichlet_draw(jax.random.fold_in(key, row), c)
                    return lg - jax.scipy.special.logsumexp(lg)

                lp = jax.vmap(jax.vmap(draw))(rows, conc)
                return jnp.take_along_axis(lp, nxt[..., None], axis=-1)[..., 0]

            return (jnp.sum(jnp.where(m_mt, logp(rows_mt, nxt_mt), 0.0), -1)
                    - jnp.sum(jnp.where(m_wt, logp(rows_wt, nxt_wt), 0.0), -1))

        self._map_fn = jax.jit(log_prob_map)
        self._sample_fn = jax.jit(log_prob_sampled)
        self._snv_fn = jax.jit(snv_delta_map)
        self._snv_sample_fn = jax.jit(snv_delta_sampled)
        self._var_fn = jax.jit(var_delta_map)
        self._var_sample_fn = jax.jit(var_delta_sampled)

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

    def delta_scores_snv(self, wt_seq: str, positions, alt_bases,
                         batch: int = 1 << 17, mode: str = "map",
                         key=None, mc_samples: int = 1):
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

        Returns [V] float scores (or [V, mc_samples]).
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
        if mode == "map":
            variants = [(None, self._snv_fn)]
        elif mode == "sample":
            if key is None:
                raise ValueError('mode="sample" requires key=')
            variants = [(jax.random.fold_in(key, s), self._snv_sample_fn)
                        for s in range(mc_samples)]
        else:
            raise ValueError(f"unknown mode {mode!r}")
        outs = []
        for k, fn in variants:
            out = np.empty(len(pos), np.float32)
            for s in range(0, len(pos), batch):
                e = min(s + batch, len(pos))
                n = e - s
                # Pad the tail chunk to the batch shape (one compilation);
                # alt == ref rows are exact zero-delta no-ops.
                p_b = np.zeros(min(batch, max(len(pos), 1)), np.int32)
                a_b = np.zeros_like(p_b)
                r_b = np.zeros_like(p_b)
                p_b[:n], a_b[:n], r_b[:n] = pos[s:e], alt[s:e], ref[s:e]
                args = (self._table, rows1, nxt1, jnp.int32(L),
                        jnp.asarray(p_b), jnp.asarray(a_b), jnp.asarray(r_b))
                if k is not None:
                    args = args + (k,)
                out[s:e] = np.asarray(fn(*args))[:n]
            outs.append(out)
        if mode == "map":
            return outs[0]
        return outs[0] if mc_samples == 1 else np.stack(outs, axis=-1)

    def delta_scores_variants(self, wt_seq: str, variants, *,
                              batch: int = 4096, mode: str = "map",
                              key=None, mc_samples: int = 1):
        """Δ log-prob (mutant − wild-type) for ARBITRARY variants — multi-
        base substitutions, insertions, deletions in the reference's
        'AAG23CC' syntax (get_var_probs.py:336-341) — batched on device.

        The host builds each variant's covering (k+1)-mer windows once
        (identical semantics to get_bear_probs / _variant_windows,
        reference get_var_probs.py:293-334), encodes them to table rows
        vectorized, and the device scores every variant in fixed-shape
        batches. For pure SNV scans prefer :meth:`delta_scores_snv`, whose
        windows are pure row arithmetic (no host window building at all).

        Returns [V] float scores (or [V, mc_samples] with mode="sample"
        and mc_samples > 1); MAP scores exactly match
        ``get_bear_probs(..., get_map=True)``.
        """
        from bear_tpu.inference.scoring import (
            STOP, _variant_windows, parse_var,
        )

        lag = self._lag
        padded = lag * "[" + wt_seq + STOP
        parsed = [parse_var(v) if isinstance(v, str) else tuple(v)
                  for v in np.asarray(variants)]
        V = len(parsed)
        if V == 0:
            return np.zeros((0,), np.float32)

        ctx, nxt, counts = {"wt": [], "mt": []}, {"wt": [], "mt": []}, {"wt": [], "mt": []}
        for var in parsed:
            wt_k, mt_k = _variant_windows(padded, var, lag)
            for side, ks in (("wt", wt_k), ("mt", mt_k)):
                ctx[side] += [k[:-1] for k in ks]
                nxt[side] += [k[-1] for k in ks]
                counts[side].append(len(ks))

        sides = {}
        for side in ("wt", "mt"):
            n = np.asarray(counts[side], np.int64)
            W = int(n.max()) if len(n) else 1
            rows_f = contexts_to_rows(ctx[side], lag, self._alphabet)
            nxt_f = alphabets.encode_output_symbols(
                np.asarray(nxt[side]), self._alphabet
            ).astype(np.int32)
            rows = np.zeros((V, W), np.int32)
            nxts = np.zeros((V, W), np.int32)
            mask = np.arange(W)[None, :] < n[:, None]
            rows[mask] = rows_f
            nxts[mask] = nxt_f
            sides[side] = (rows, nxts, mask)

        if mode == "map":
            variants_fns = [(None, self._var_fn)]
        elif mode == "sample":
            if key is None:
                raise ValueError('mode="sample" requires key=')
            variants_fns = [(jax.random.fold_in(key, s), self._var_sample_fn)
                            for s in range(mc_samples)]
        else:
            raise ValueError(f"unknown mode {mode!r}")

        outs = []
        B = min(batch, V)
        for k, fn in variants_fns:
            out = np.empty(V, np.float32)
            for s in range(0, V, B):
                e = min(s + B, V)
                chunk = []
                for side in ("wt", "mt"):
                    rows, nxts, mask = sides[side]
                    # Pad the tail chunk to the batch shape (one
                    # compilation); padded rows are fully masked no-ops.
                    r = np.zeros((B, rows.shape[1]), np.int32)
                    x = np.zeros_like(r)
                    m = np.zeros((B, rows.shape[1]), bool)
                    r[: e - s], x[: e - s], m[: e - s] = (
                        rows[s:e], nxts[s:e], mask[s:e])
                    chunk += [jnp.asarray(r), jnp.asarray(x), jnp.asarray(m)]
                args = (self._table, *chunk)
                if k is not None:
                    args = args + (k,)
                out[s:e] = np.asarray(fn(*args))[: e - s]
            outs.append(out)
        if mode == "map":
            return outs[0]
        return outs[0] if mc_samples == 1 else np.stack(outs, axis=-1)

    def score(self, seqs, mode: str = "map", key=None, pad_to: Optional[int] = None):
        """Convenience host API: list of strings -> [B] scores. Pads to
        ``pad_to`` (or the max length rounded up to 64) so repeated calls
        reuse the compiled kernel."""
        codes_list = [
            alphabets.encode_kmers(np.array([s]), self._alphabet)[0] for s in seqs
        ]
        maxlen = max(len(c) for c in codes_list)
        L = pad_to or (-(-maxlen // 64) * 64)
        B = len(seqs)
        codes = np.zeros((B, L), np.int8)
        lengths = np.zeros(B, np.int32)
        for i, c in enumerate(codes_list):
            codes[i, : len(c)] = c
            lengths[i] = len(c)
        if mode == "map":
            return np.asarray(self.log_prob_map(codes, lengths))
        if mode == "sample":
            return np.asarray(
                self.log_prob_sampled(
                    codes, lengths,
                    key if key is not None else jax.random.key(0),
                )
            )
        raise ValueError(f"unknown mode {mode!r}")
