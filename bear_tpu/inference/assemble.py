"""Sequence generation (assembly) from a BEAR posterior.

Replaces the reference's assemble_no_ends (bear_model/assemble.py:21-184),
whose per-step Python loop with KMC queries and pandas caching dominated the
profiled run (139 s of 165 s, program.prof). Here the whole rollout is ONE
jitted ``lax.scan`` on device:

- transition counts are gathers into the counting engine's dense table;
- "each generated sequence keeps its own sampled AR model"
  (reference assemble.py:27-28, 132) is reproduced WITHOUT caching: the
  Dirichlet draw for (sequence i, context row r) uses
  ``fold_in(fold_in(key, i), r)``, so revisiting a context within one
  sequence reuses the same sampled probabilities while distinct sequences
  stay independent — the reference's AppearanceDict semantics, stateless;
- next letters are Gumbel-max draws (reference assemble.py:134), folded by
  step so repeated visits still advance randomly.

Ends are disabled (no_ends semantics): stop transitions get zero probability.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bear_tpu.counting.engine import table_rows
from bear_tpu.ops import alphabets
from bear_tpu.ops.loggamma import log_dirichlet_draw

_RC = str.maketrans("ACGT", "TGCA")


def _revcomp(s: str) -> str:
    return s.translate(_RC)[::-1]


def _rollout(
    table,
    seed_codes,
    lengths,
    key,
    h,
    van,
    *,
    lag,
    ar_apply,
    get_map,
    max_steps,
    dtype=jnp.float32,
):
    """jitted scan generating max_steps letters for a batch of sequences.

    table : [rows(lag), A+1] transition counts (device), OR a
        (sorted_rows [n], counts [n, A+1]) pair for a SPARSE table (lag
        beyond any dense table: counts gather via an in-scan binary
        search into the nonzero rows; absent contexts count zero).
    seed_codes : [B, lag] int32 codes of the seeds' last lag residues.
    lengths : [B] number of letters to generate per sequence.
    Returns [B, max_steps] int32 generated letters (0..3; padded where
    beyond lengths).
    """
    B = seed_codes.shape[0]
    # Context codes exceed int32 beyond lag 15 (the sparse-table regime);
    # the row/key arithmetic promotes to int64 there (requires x64 —
    # checked by assemble_no_ends).
    big = 4**lag > np.iinfo(np.int32).max
    idt = jnp.int64 if big else jnp.int32
    sparse = isinstance(table, tuple)
    offset0 = jnp.asarray((4**lag - 1) // 3, idt)
    mod = jnp.asarray(4**lag, idt)
    pow4 = (4 ** jnp.arange(lag - 1, -1, -1, dtype=idt)).astype(idt)
    ctx0 = jnp.sum(seed_codes.astype(idt) * pow4, axis=-1)
    seq_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))

    def gather_counts(rows):
        if not sparse:
            return table[rows].astype(dtype)
        rows_sorted, vals = table
        n = rows_sorted.shape[0]
        if n == 0:  # empty table: prior-only generation
            return jnp.zeros((rows.shape[0], vals.shape[1]), dtype)
        slot = jnp.searchsorted(rows_sorted, rows)
        slot_c = jnp.clip(slot, 0, max(n - 1, 0))
        hit = (slot < n) & (rows_sorted[slot_c] == rows)
        return jnp.where(hit[:, None], vals[slot_c].astype(dtype), 0.0)

    def fold_row(seq_key, row):
        if not big:
            return jax.random.fold_in(seq_key, row)
        # fold_in data must fit 32 bits: split the int64 row (two folds
        # keep the same-row-same-draw contract; draws at lag <= 15 are
        # unchanged).
        k = jax.random.fold_in(seq_key, (row & 0x7FFFFFFF).astype(jnp.uint32))
        return jax.random.fold_in(k, (row >> 31).astype(jnp.uint32))

    def step(carry, t):
        ctx, window = carry  # ctx: [B] rolling base-4 code; window [B, lag]
        rows = offset0 + ctx
        counts = gather_counts(rows)  # [B, A+1]
        if ar_apply is not None:
            oh = alphabets.one_hot(window, 5, dtype)
            conc = ar_apply(oh) / h + counts
        else:
            conc = van + counts
        # no-ends: never stop.
        conc = conc.at[:, -1].set(0.0)
        if get_map:
            log_probs = jnp.log(
                jnp.maximum(conc, 1e-30)
                / jnp.sum(conc[:, :-1], axis=-1, keepdims=True)
            )
        else:
            # Per-(sequence, context) Dirichlet draw, reused on revisit
            # (same key -> same draw; the shared boost-identity sampler).
            def draw(seq_key, row, c):
                return log_dirichlet_draw(fold_row(seq_key, row), c)

            lg = jax.vmap(draw)(seq_keys, rows, conc)
            log_probs = lg - jax.scipy.special.logsumexp(lg, axis=-1, keepdims=True)
        gumbel_key = jax.random.fold_in(key, 2_000_003 + t)
        g = jax.random.gumbel(gumbel_key, (B, 4), dtype=dtype)
        letters = jnp.argmax(g + log_probs[:, :4], axis=-1).astype(jnp.int32)
        ctx_next = (ctx * 4 + letters.astype(idt)) % mod
        window_next = jnp.concatenate([window[:, 1:], letters[:, None]], axis=-1)
        active = t < lengths
        ctx = jnp.where(active, ctx_next, ctx)
        window = jnp.where(active[:, None], window_next, window)
        return (ctx, window), letters

    (_, _), letters = jax.lax.scan(
        step, (ctx0, seed_codes.astype(jnp.int32)), jnp.arange(max_steps)
    )
    return letters.T  # [B, max_steps]


_rollout_jit = jax.jit(
    _rollout,
    static_argnames=("lag", "ar_apply", "get_map", "max_steps", "dtype"),
)


def assemble_no_ends(
    seeds,
    lengths_to_gen,
    num_to_gen: int,
    *,
    lag: int,
    counter_table: np.ndarray,
    h: Optional[float] = None,
    ar_apply=None,
    van: Optional[float] = None,
    get_map: bool = False,
    alphabet_name: str = "dna",
    batch_size: int = 1024,
    seed: int = 0,
    save_folder: Optional[str] = None,
    dtype=jnp.float32,
):
    """Generate sequences by extending seeds in both directions
    (reference assemble.py:21-184, minus the KMC plumbing).

    Parameters
    ----------
    seeds : list of seed sequences (each >= lag long).
    lengths_to_gen : [len(seeds), 2] letters to generate (left, right).
    num_to_gen : generated samples per seed.
    counter_table : [table_rows(lag), A+1] transition counts — e.g.
        ``TransitionCounter(lags=[lag], reverse=True).tables[lag][group]``
        (reverse=True mirrors the reference's KMC reverse counting) — OR a
        ``bear_tpu.inference.scoring.SparseTableIndex`` (any object with
        sorted ``.rows`` / aligned ``.counts``): generation then runs off
        a SPARSE table via in-scan binary search, enabling assembly at
        lag >= 16 where no dense table exists (requires x64 beyond lag 15
        for exact int64 row arithmetic).
    h, ar_apply : BEAR model (ar_apply: one-hot -> probs); or
    van : BMM prior instead of a BEAR model.
    get_map : extend with the MAP model rather than sampled AR models.

    Returns
    -------
    gen_seqs : [len(seeds), num_to_gen] array of generated sequences.
    sw_ent : list of per-seed site-wise entropy arrays.
    """
    assert (van is None) != (ar_apply is None), "specify exactly one of van / ar_apply+h"
    assert ar_apply is None or h is not None, (
        "ar_apply requires h (concentrations are ar_probs / h; h=None would "
        "silently divide by zero and generate degenerate sequences)"
    )
    seeds = [str(s) for s in seeds]
    for s in seeds:
        assert len(s) >= lag, "seeds must be at least lag long"
    lengths_to_gen = np.asarray(lengths_to_gen).reshape(len(seeds), 2)

    fwd_seqs = np.repeat(np.array(seeds), num_to_gen)
    lengths_rep = np.repeat(lengths_to_gen, num_to_gen, axis=0)  # [B, 2]
    rev_seqs = np.array([_revcomp(s) for s in fwd_seqs])

    if hasattr(counter_table, "rows") and hasattr(counter_table, "counts"):
        if 4**lag > np.iinfo(np.int32).max and not jax.config.jax_enable_x64:
            raise ValueError(
                "sparse-table assembly beyond lag 15 needs exact int64 row "
                "arithmetic — enable jax_enable_x64"
            )
        rows_np = np.asarray(counter_table.rows)
        table = (jnp.asarray(rows_np),
                 jnp.asarray(np.asarray(counter_table.counts), dtype=dtype))
    else:
        table = jnp.asarray(np.asarray(counter_table), dtype=dtype)
        # no-ends counting: stop column unused (zeroed in the kernel).
        assert table.shape[0] == table_rows(lag)

    key = jax.random.key(seed)
    flanks = []
    for direction, (seqs_all, lens_all) in enumerate(
        [(rev_seqs, lengths_rep[:, 0]), (fwd_seqs, lengths_rep[:, 1])]
    ):
        out_parts = []
        for start in range(0, len(seqs_all), batch_size):
            sub = seqs_all[start : start + batch_size]
            sub_lens = lens_all[start : start + batch_size]
            max_steps = int(np.max(sub_lens)) if len(sub_lens) else 0
            if max_steps == 0:
                out_parts += [""] * len(sub)
                continue
            # Bucket the scan length to the next power of two (>= 64): each
            # distinct max_steps would otherwise compile its own scan. The
            # scan already masks with `t < lengths`, so extra steps only
            # cost device time, never correctness.
            max_steps = max(64, 1 << (max_steps - 1).bit_length())
            seed_codes = np.stack(
                [alphabets.encode_kmers(np.array([s[-lag:]]), "dna")[0] for s in sub]
            ).astype(np.int32)
            letters = _rollout_jit(
                table,
                jnp.asarray(seed_codes),
                jnp.asarray(sub_lens.astype(np.int32)),
                jax.random.fold_in(key, direction * 1_000_003 + start),
                jnp.asarray(0.0 if h is None else h, dtype=dtype),
                jnp.asarray(0.0 if van is None else van, dtype=dtype),
                lag=lag,
                ar_apply=ar_apply,
                get_map=get_map,
                max_steps=max_steps,
                dtype=dtype,
            )
            letters = np.asarray(letters)
            # Vectorized codes -> strings: byte LUT + one tobytes per row
            # (a per-letter "".join costs seconds at millions of letters).
            lut = np.frombuffer(
                "".join(alphabets.input_letters(alphabet_name)[:4]).encode(),
                np.uint8,
            )
            rows = lut[letters]
            for i in range(len(sub)):
                n = int(sub_lens[i])
                out_parts.append(rows[i, :n].tobytes().decode("ascii"))
        flanks.append(out_parts)

    gen = [
        _revcomp(left) + seed_s + right
        for left, right, seed_s in zip(flanks[0], flanks[1], fwd_seqs)
    ]
    gen_seqs = np.array(gen).reshape(-1, num_to_gen)

    # Site-wise entropy of the generated ensembles (reference assemble.py:
    # 152-155) — pure NumPy byte comparisons: the previous one-hot path
    # shipped [group, L, A1] floats through the device for a host-side mean.
    from scipy.special import xlogy

    letter_bytes = [ord(c) for c in alphabets.input_letters(alphabet_name)]
    sw_ent = []
    for group in gen_seqs:
        arr = np.array([np.frombuffer(s.encode("ascii"), np.uint8) for s in group])
        probs = np.stack([(arr == b).mean(axis=0) for b in letter_bytes], axis=-1)
        sw_ent.append(-np.sum(xlogy(probs, probs), axis=-1))

    if save_folder is not None:
        _save_outputs(gen_seqs, sw_ent, lengths_to_gen, save_folder, alphabet_name)
    return gen_seqs, sw_ent


def _save_outputs(gen_seqs, sw_ent, lengths_to_gen, save_folder, alphabet_name):
    """Fasta + entropy plots (reference assemble.py:157-183)."""
    import os

    os.makedirs(save_folder, exist_ok=True)
    with open(os.path.join(save_folder, "seqs.fa"), "w") as fh:
        for i, seqs in enumerate(gen_seqs):
            for j, s in enumerate(seqs):
                fh.write(f">seq{i}_rep{j}\n{s}\n")
    try:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt
    except Exception:
        return
    A = alphabets.alphabet_size(alphabet_name)
    plt.figure(figsize=[10, 5])
    plt.xlabel("position", fontsize=15)
    plt.ylabel("entropy", fontsize=15)
    xlim = [0, 0]
    for ent, l2g in zip(sw_ent, np.asarray(lengths_to_gen)):
        xs = np.arange(len(ent)) - l2g[0]
        xlim = [min(xlim[0], xs.min()), max(xlim[1], xs.max())]
        plt.plot(xs, ent, color="blue", linewidth=1, alpha=0.1)
    plt.plot(xlim, np.log(A) * np.ones(2), color="black", linewidth=2)
    plt.xlim(xlim)
    plt.ylim([0, plt.ylim()[1]])
    plt.savefig(os.path.join(save_folder, "entropy.png"), dpi=200)
    plt.close()
