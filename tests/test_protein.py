"""Protein-alphabet coverage: the reference trains protein models from
externally-prepared count files (alphabets include 'prot', core.py:142-153);
verify the full train/eval/scoring stack handles the 21-letter alphabet."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from bear_tpu.models import bear_net, get_ar_func
from bear_tpu.ops import alphabets


def _protein_data(n=120, lag=3, seed=0):
    rng = np.random.default_rng(seed)
    A1 = alphabets.alphabet_size("prot") + 1  # 21
    codes = rng.integers(0, 20, size=(n, lag)).astype(np.int8)
    counts = rng.poisson(2.0, size=(n, 2, A1)).astype(np.float64)
    return codes, counts, A1


def test_protein_train_eval():
    codes, counts, A1 = _protein_data()
    ar = get_ar_func("linear", 3, 20, dtype=jnp.float64)
    res = bear_net.train(
        codes, counts[:, 0], num_kmers=len(codes), ar_func=ar,
        alphabet="prot", batch_size=64, epochs=30, learning_rate=0.02,
        train_ar=False, dtype=jnp.float64,
    )
    assert np.isfinite(res.losses).all()
    assert res.losses[-1] < res.losses[0]
    out = bear_net.evaluation(
        codes, counts, 0, 1, "prot", res.h, ar, res.params["ar"],
        np.array([0.1, 1.0]), dtype=jnp.float64,
    )
    assert np.isfinite(out[0]) and out[5].shape == (2,)


@pytest.mark.slow
def test_protein_cnn_and_attention():
    codes, counts, A1 = _protein_data(lag=5)
    for name, kwargs in [
        ("cnn", {"filter_width": 3, "num_filters": 8, "kmer_layer1_width": 8}),
        ("attention", {"d_model": 32, "num_heads": 2, "mlp_width": 32}),
    ]:
        ar = get_ar_func(name, 5, 20, kwargs, dtype=jnp.float64)
        probs = ar.apply(
            ar.init(jax.random.key(0)), alphabets.one_hot(codes, 21, jnp.float64)
        )
        assert probs.shape == (len(codes), 21)
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-6)


def test_protein_scoring():
    from bear_tpu.data import CountDataset
    from bear_tpu.inference import get_bear_probs_seqs

    rng = np.random.default_rng(1)
    lag = 2
    letters = alphabets.input_letters("prot")[:-1]
    kmer_strings = np.array(
        ["".join(rng.choice(letters, lag)) for _ in range(40)]
    )
    kmer_strings = np.unique(kmer_strings)
    ds = CountDataset(
        kmers=kmer_strings,
        codes=alphabets.encode_kmers(kmer_strings, "prot"),
        counts=rng.poisson(3.0, (len(kmer_strings), 1, 21)).astype(np.float64),
        alphabet="prot",
    )
    seqs = ["".join(rng.choice(letters, 6)) for _ in range(3)]
    scores = get_bear_probs_seqs(
        None, seqs, 0, vans=[1.0], lag=lag, alphabet_name="prot",
        data=ds, mc_samples=16,
    )
    assert scores.shape == (3, 1, 16)
    assert np.isfinite(scores).all()


# --- protein k-mer COUNTING (the reference's KMC pipeline is DNA-only) -----


def _brute_force_protein_counts(seqs, groups, lag, n_groups):
    """Oracle: dict recount of '['-padded, ']'-terminated transitions."""
    from collections import defaultdict

    counts = defaultdict(lambda: np.zeros((n_groups, 21), np.int64))
    res = alphabets.residues("prot")
    for s, g in zip(seqs, groups):
        padded = "[" * lag + s + "]"
        for i in range(lag, len(padded)):
            ctx = padded[i - lag : i]
            nxt = 20 if padded[i] == "]" else res.index(padded[i])
            counts[ctx][g, nxt] += 1
    return counts


def test_protein_counting_matches_oracle():
    from bear_tpu.counting.engine import (
        ReadChunk,
        TransitionCounter,
        context_to_row,
        rows_to_contexts,
    )

    rng = np.random.default_rng(31)
    res = alphabets.residues("prot")
    seqs = ["".join(rng.choice(list(res), rng.integers(8, 25)))
            for _ in range(30)]
    groups = [int(g) for g in rng.integers(0, 2, len(seqs))]
    for lag in (1, 2, 3):
        tc = TransitionCounter(lags=[lag], n_groups=2, alphabet="prot")
        B = len(seqs)
        L = max(len(s) for s in seqs)
        mat = np.zeros((B, L), np.int8)
        lens = np.zeros(B, np.int32)
        for i, s in enumerate(seqs):
            mat[i, : len(s)] = [res.index(c) for c in s]
            lens[i] = len(s)
        tc.add_chunk(ReadChunk(mat, lens, np.zeros(B, np.int32),
                               np.ones(B, bool),
                               np.asarray(groups, np.int32)))
        tc.validate(expected_transitions=sum(len(s) + 1 for s in seqs))
        oracle = _brute_force_protein_counts(seqs, groups, lag, 2)
        tab = tc.tables[lag]
        rows = tc.nonzero_rows(lag)
        kmers = rows_to_contexts(rows, lag, "prot")
        assert set(kmers) == set(oracle.keys())
        for ctx, want in oracle.items():
            r = context_to_row(ctx, lag, "prot")
            np.testing.assert_array_equal(tab[:, r, :], want)


@pytest.mark.slow
def test_protein_counts_to_training_end_to_end():
    # counts -> dataset -> BEAR training -> evaluation, all protein.
    import jax.numpy as jnp
    from bear_tpu.counting.engine import ReadChunk, TransitionCounter
    from bear_tpu.models import bear_net, get_ar_func

    rng = np.random.default_rng(33)
    res = alphabets.residues("prot")
    B, L, lag = 120, 40, 2
    mat = rng.integers(0, 20, size=(B, L)).astype(np.int8)
    tc = TransitionCounter(lags=[lag], n_groups=2, alphabet="prot")
    tc.add_chunk(ReadChunk(mat, np.full(B, L, np.int32),
                           np.zeros(B, np.int32), np.ones(B, bool),
                           rng.integers(0, 2, B).astype(np.int32)))
    ds = tc.to_dataset(lag)
    assert ds.alphabet == "prot" and ds.counts.shape[-1] == 21
    # device handoff agrees with host handoff
    codes_d, counts_d = tc.to_device_dataset(lag, dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(codes_d), ds.codes)
    np.testing.assert_array_equal(np.asarray(counts_d), ds.counts)
    ar = get_ar_func("linear", lag, 20, dtype=jnp.float64)
    r = bear_net.train(ds.codes, ds.counts[:, 0], num_kmers=ds.num_kmers,
                       ar_func=ar, alphabet="prot", batch_size=256, epochs=3,
                       learning_rate=0.01, dtype=jnp.float64)
    out = bear_net.evaluation(ds.codes, ds.counts, 0, 1, "prot", r.h, ar,
                              r.params["ar"], [1.0], dtype=jnp.float64)
    assert np.isfinite(float(out[3]))


def test_protein_reverse_and_lag_guards():
    from bear_tpu.counting.engine import TransitionCounter

    with pytest.raises(ValueError, match="4-letter"):
        TransitionCounter(lags=[2], alphabet="prot", reverse=True)
    with pytest.raises(ValueError, match="int32"):
        TransitionCounter(lags=[8], alphabet="prot")


def test_summarize_cli_protein(tmp_path):
    # Protein counting via the summarize CLI (reference: DNA-only via KMC).
    from bear_tpu.counting.summarize import build_parser, main as summarize_main

    rng = np.random.default_rng(7)
    res = alphabets.residues("prot")
    fa = tmp_path / "prots.fa"
    with open(fa, "w") as f:
        for i in range(20):
            f.write(f">p{i}\n" + "".join(rng.choice(list(res), 15)) + "\n")
    csv = tmp_path / "in.csv"
    csv.write_text(f"{fa},0,fa\n")
    args = build_parser().parse_args(
        [str(csv), str(tmp_path / "out"), "-l", "2", "--alphabet", "prot"]
    )
    summarize_main(args)
    total = 0
    n_letters = set()
    import json as _json
    for line in open(tmp_path / "out_lag_2_file_0.tsv"):
        kmer, mat = line.split("\t")
        counts = _json.loads(mat)
        assert len(counts[0]) == 21  # 20 residues + stop
        n_letters.update(kmer)
        total += sum(counts[0])
    assert total == 20 * 16  # len+1 transitions per sequence
    assert n_letters <= set(res + "[")
    # reverse complement is rejected for proteins
    args_r = build_parser().parse_args(
        [str(csv), str(tmp_path / "o2"), "-l", "2", "--alphabet", "prot", "-r"]
    )
    with pytest.raises(ValueError, match="4-letter"):
        summarize_main(args_r)


def test_protein_snv_and_variant_scoring():
    # Device SNV row-shift arithmetic and the vectorized variant windows on
    # the 20-letter alphabet: both paths agree exactly; indels stay finite.
    import jax.numpy as jnp

    from bear_tpu.counting.engine import ReadChunk, TransitionCounter
    from bear_tpu.inference.serving import BearServer
    from bear_tpu.ops import alphabets

    LAG, A = 2, 20
    rng = np.random.default_rng(0)
    codes = rng.integers(0, A, (12, 30)).astype(np.int8)
    tc = TransitionCounter(lags=[LAG], n_groups=1, method="scatter",
                           alphabet="prot")
    tc.add_chunk(ReadChunk(
        codes=codes, lengths=np.full(12, 30, np.int32),
        skip=np.zeros(12, np.int32), stopped=np.ones(12, bool),
        groups=np.zeros(12, np.int32)))
    server = BearServer(tc.tables[LAG][0], LAG, van=0.3, dtype=jnp.float64,
                        alphabet="prot")
    letters = "".join(alphabets.input_letters("prot")[:-1])
    wt = "".join(letters[b] for b in codes[0][:15])
    pos = [0, 5, 14]
    alt = [letters[3], letters[7], letters[0]]
    snv = server.delta_scores_snv(wt, pos, alt)
    gen = server.delta_scores_variants(
        wt, [(wt[p], a, p) for p, a in zip(pos, alt)])
    np.testing.assert_allclose(snv, gen, rtol=1e-9)
    indels = server.delta_scores_variants(
        wt, [(wt[2:4], wt[2], 2), ("", letters[5], 7)])
    assert np.isfinite(np.asarray(indels)).all()


def test_protein_table_counter_random_access_and_scoring():
    # TableCounter speaks any alphabet (base-A row codec) — protein
    # random-access queries over a dense counter AND the sparse-first
    # counter at lag >= 8 (both beyond the reference's DNA-only KMC
    # queries), plus whole-sequence MAP scoring through the counter.
    from collections import Counter as PyCounter

    from bear_tpu.counting.engine import ReadChunk, TransitionCounter
    from bear_tpu.counting.sparse import SparseTransitionCounter
    from bear_tpu.inference.scoring import TableCounter, get_bear_probs_seqs
    from bear_tpu.ops import alphabets

    rng = np.random.default_rng(55)
    letters = alphabets.input_letters("prot")[:-1]
    out_letters = alphabets.output_letters("prot")
    B, L = 40, 18
    codes = rng.integers(0, 20, (B, L)).astype(np.int8)
    chunk = ReadChunk(codes, np.full(B, L, np.int32), np.zeros(B, np.int32),
                      np.ones(B, bool), np.zeros(B, np.int32))

    for lag, counter in [
        (4, TransitionCounter(lags=[4], n_groups=1, alphabet="prot",
                              method="scatter")),
        (9, SparseTransitionCounter(lags=[9], n_groups=1, alphabet="prot")),
    ]:
        counter.add_chunk(chunk)
        tc = TableCounter(counter, lag)
        # brute-force oracle over every window of the first 10 reads
        oracle = PyCounter()
        for b in range(10):
            s = "".join(letters[c] for c in codes[b])
            padded = "[" * lag + s
            for j in range(L + 1):
                nxt = s[j] if j < L else "]"
                oracle[(padded[j:j + lag], nxt)] += 1
        ctxs = sorted(set(k for k, _ in oracle))
        got = tc(np.array(ctxs))
        for i, ctx in enumerate(ctxs):
            for k, sym in enumerate(out_letters):
                want = oracle.get((ctx, sym), 0)
                assert got[i, k] >= want, (lag, ctx, sym)
        # whole-sequence MAP scoring through the counter (BMM prior)
        seqs = ["".join(letters[c] for c in codes[0])]
        scores = get_bear_probs_seqs(
            None, seqs, 0, get_map=True, vans=[0.5], lag=lag,
            alphabet_name="prot", counter=tc,
        )
        assert np.isfinite(scores).all() and scores[0, 0] < 0
