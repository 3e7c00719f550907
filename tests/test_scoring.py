"""Scoring oracles, mirroring reference tests/test_var_prob.py: exact counter
parity on the toy sequences, variant scores vs analytic Beta moments
(digamma closed form), MAP vs exact quotients, whole-seq scores incl. the
correlated-transition marginal case — on both the counter path and the
dataset path."""

import jax
import numpy as np
import pytest
from scipy import stats as st
from scipy.special import digamma, logsumexp

from bear_tpu.counting import TransitionCounter, chunk_reads
from bear_tpu.counting import fastx
from bear_tpu.inference import (
    DatasetCounter,
    TableCounter,
    get_bear_probs,
    get_bear_probs_seqs,
    get_pdf,
    parse_var,
)

TOY_SEQS = ["TTTAT", "TTCTT", "TTTTT", "TTTTT"]
LAG = 3
A_SIZE = 4


def make_counter(reverse=False):
    tc = TransitionCounter(lags=[LAG], n_groups=1, reverse=reverse)
    enc = [(fastx.encode_seq(s), 0) for s in TOY_SEQS]
    for chunk in chunk_reads(iter(enc), LAG):
        tc.add_chunk(chunk)
    return TableCounter(tc, LAG)


def make_dataset():
    tc = TransitionCounter(lags=[LAG], n_groups=1)
    enc = [(fastx.encode_seq(s), 0) for s in TOY_SEQS]
    for chunk in chunk_reads(iter(enc), LAG):
        tc.add_chunk(chunk)
    return tc.to_dataset(LAG)


def test_counter_exact_counts():
    # Reference test_var_prob.py:8-18 (same toy data, same expectations).
    counter = make_counter(reverse=False)
    got = counter(np.array(["TTT", "TTA", "[[T"]))
    np.testing.assert_array_equal(
        got, [[1, 0, 0, 4, 2], [0, 0, 0, 1, 0], [0, 0, 0, 4, 0]]
    )
    counter_rev = make_counter(reverse=True)
    got = counter_rev(np.array(["TTT", "[AT", "AAA"]))
    np.testing.assert_array_equal(
        got, [[1, 0, 0, 4, 2], [1, 0, 0, 0, 0], [4, 0, 0, 0, 3]]
    )


def _true_var_scores_mc(vans):
    def dir_mean(seen, all_, van):
        return digamma(seen + van) - digamma(all_ + (A_SIZE + 1) * van)

    true = np.empty((2, len(vans)))
    for i, van in enumerate(vans):
        true[0, i] = (2 * dir_mean(4, 7, van) + dir_mean(2, 7, van)) - (
            dir_mean(1, 7, van) + 2 * dir_mean(1, 1, van)
        )
        true[1, i] = (
            dir_mean(1, 4, van) + dir_mean(0, 1, van) + 2 * dir_mean(0, 0, van)
        ) - (dir_mean(3, 4, van) + dir_mean(1, 7, van) + 2 * dir_mean(1, 1, van))
    return true


def _true_var_scores_map(vans):
    def q(seen, all_, van):
        return np.log((seen + van) / (all_ + (A_SIZE + 1) * van))

    true = np.empty((2, len(vans)))
    for i, van in enumerate(vans):
        true[0, i] = (2 * q(4, 7, van) + q(2, 7, van)) - (q(1, 7, van) + 2 * q(1, 1, van))
        true[1, i] = (q(1, 4, van) + q(0, 1, van) + 2 * q(0, 0, van)) - (
            q(3, 4, van) + q(1, 7, van) + 2 * q(1, 1, van)
        )
    return true


@pytest.mark.parametrize("branch", ["counter", "data"])
@pytest.mark.slow
def test_variant_mc_and_map(branch):
    # Reference test_var_prob.py:20-78.
    wt_seq = "TTTAT"
    vars_ = np.array(["A3T", "T2C"])
    vans = np.array([0.1, 1, 10])
    kwargs = dict(lag=LAG, alphabet_name="dna")
    if branch == "counter":
        kwargs["counter"] = make_counter()
    else:
        kwargs["data"] = make_dataset()

    scores = get_bear_probs(
        None, wt_seq, vars_, 0, mc_samples=300000, vans=vans, **kwargs
    )
    true = _true_var_scores_mc(vans)
    frac_err = (scores.mean(-1) - true) / true
    assert np.all(np.abs(frac_err) < 0.02), frac_err

    scores_map = get_bear_probs(None, wt_seq, vars_, 0, get_map=True, vans=vans, **kwargs)
    np.testing.assert_allclose(scores_map, _true_var_scores_map(vans), rtol=1e-9)


@pytest.mark.parametrize("branch", ["counter", "data"])
@pytest.mark.slow
def test_seqs_mc_map_marg(branch):
    # Reference test_var_prob.py:81-173.
    seqs = ["TTTAT", "TTCAT", "TTTTTTTTTT"]
    vans = np.array([0.1, 1, 10])
    kwargs = dict(lag=LAG, alphabet_name="dna")
    if branch == "counter":
        kwargs["counter"] = make_counter()
    else:
        kwargs["data"] = make_dataset()

    def dir_mean(seen, all_, van):
        return digamma(seen + van) - digamma(all_ + (A_SIZE + 1) * van)

    # Mean scores (expectation is linear; correlations don't matter).
    true_mean = np.empty((3, len(vans)))
    for i, van in enumerate(vans):
        true_mean[0, i] = (
            2 * dir_mean(4, 4, van) + dir_mean(3, 4, van) + dir_mean(1, 7, van)
            + 2 * dir_mean(1, 1, van)
        )
        true_mean[1, i] = (
            2 * dir_mean(4, 4, van) + dir_mean(1, 4, van) + dir_mean(0, 1, van)
            + 2 * dir_mean(0, 0, van)
        )
        true_mean[2, i] = (
            2 * dir_mean(4, 4, van) + dir_mean(3, 4, van)
            + 7 * (dir_mean(4, 7, van))
            + 7 * 0  # placeholder; correlated terms handled below
        )
    # Sequence 3: [[[TTTTTTTTTT] = 2 starts + [TT->T + 7x TTT->T + TTT->$.
    for i, van in enumerate(vans):
        true_mean[2, i] = (
            2 * dir_mean(4, 4, van) + dir_mean(3, 4, van)
            + 7 * dir_mean(4, 7, van) + dir_mean(2, 7, van)
        )

    scores = get_bear_probs_seqs(None, seqs, 0, mc_samples=40000, vans=vans, **kwargs)
    frac_err = (scores.mean(-1) - true_mean) / true_mean
    assert np.all(np.abs(frac_err) < 0.01), frac_err

    # MAP exact.
    def q(seen, all_, van):
        return np.log((seen + van) / (all_ + (A_SIZE + 1) * van))

    true_map = np.empty((3, len(vans)))
    for i, van in enumerate(vans):
        true_map[0, i] = 2 * q(4, 4, van) + q(3, 4, van) + q(1, 7, van) + 2 * q(1, 1, van)
        true_map[1, i] = 2 * q(4, 4, van) + q(1, 4, van) + q(0, 1, van) + 2 * q(0, 0, van)
        true_map[2, i] = 2 * q(4, 4, van) + q(3, 4, van) + 7 * q(4, 7, van) + q(2, 7, van)
    scores_map = get_bear_probs_seqs(None, seqs, 0, get_map=True, vans=vans, **kwargs)
    np.testing.assert_allclose(scores_map, true_map, rtol=1e-9)

    # Exact marginal vs a correlated Monte-Carlo oracle
    # (reference test_var_prob.py:104-144): sampled Beta draws with the
    # TTT->T / TTT->$ correlation for sequence 3.
    rng = np.random.default_rng(0)
    N = 50000
    margs = get_bear_probs_seqs(None, seqs, 0, get_marg=True, vans=vans, **kwargs)

    def log_dir_draws(seen, all_, van):
        return np.log(rng.beta(seen + van, all_ - seen + A_SIZE * van, size=N))

    true_marg = np.empty((3, len(vans), N))
    for i, van in enumerate(vans):
        true_marg[0, i] = (
            log_dir_draws(4, 4, van) + log_dir_draws(4, 4, van)
            + log_dir_draws(3, 4, van) + log_dir_draws(1, 7, van)
            + log_dir_draws(1, 1, van) + log_dir_draws(1, 1, van)
        )
        true_marg[1, i] = (
            log_dir_draws(4, 4, van) + log_dir_draws(4, 4, van)
            + log_dir_draws(1, 4, van) + log_dir_draws(0, 1, van)
            + log_dir_draws(0, 0, van) + log_dir_draws(0, 0, van)
        )
        ttt_t = np.log(rng.beta(4 + van, 2 + van, size=N))
        ttt_mod = np.log(rng.beta(6 + 2 * van, 1 + 3 * van, size=N))
        true_marg[2, i] = (
            log_dir_draws(4, 4, van) + log_dir_draws(4, 4, van)
            + log_dir_draws(3, 4, van)
            + 7 * (ttt_t + ttt_mod)
            + (np.log1p(-np.exp(ttt_t)) + ttt_mod)
        )
    true_lse = logsumexp(true_marg, axis=-1) - np.log(N)
    frac_err = (margs - true_lse) / true_lse
    assert np.all(np.abs(frac_err) < 0.01), frac_err


def test_parse_var():
    assert parse_var("AAG23CC") == ("AAG", "CC", 23)
    assert parse_var("A0T") == ("A", "T", 0)
    assert parse_var("C45G") == ("C", "G", 45)


def test_bear_model_stacking_and_h_vector():
    # With an AR model and vector h, model order is [h models..., vans...];
    # MAP prepends the raw AR model (reference get_var_probs.py:136-153).
    ds = make_dataset()
    kmers = ds.kmers
    counts = ds.counts

    def ar_apply(oh):
        return np.full((oh.shape[0], 5), 0.2)

    hs = np.array([0.5, 2.0])
    vans = [1.0]
    pdf = get_pdf(kmers, counts, hs, ar_apply, 5, vans, 0, "dna", get_map=True)
    assert pdf.log_probs.shape == (len(kmers), 5, 1 + len(hs) + len(vans), 1)
    # Raw AR row is log of uniform 0.2.
    np.testing.assert_allclose(pdf.log_probs[:, :, 0, 0], np.log(0.2), rtol=1e-12)
    # BEAR rows: conc = 0.2/h + counts.
    row = int(np.argmax(kmers == "TTT"))
    conc = 0.2 / 0.5 + counts[row, 0]
    np.testing.assert_allclose(
        pdf.log_probs[row, :, 1, 0], np.log(conc / conc.sum()), rtol=1e-12
    )


def test_bear_path_equals_bmm_with_matching_prior():
    # With a uniform AR function, BEAR at h is exactly BMM with
    # van = (1/5)/h — the model-stacking paths must agree to the sample.
    ds = make_dataset()
    h = 0.4
    van_equiv = (1.0 / 5.0) / h

    def ar_apply(oh):
        return np.full((oh.shape[0], 5), 0.2)

    pdf_bear = get_pdf(ds.kmers, ds.counts, np.array([h]), ar_apply, 64, [],
                       0, "dna", key=jax.random.key(7))
    pdf_van = get_pdf(ds.kmers, ds.counts, None, None, 64, [van_equiv],
                      0, "dna", key=jax.random.key(7))
    np.testing.assert_allclose(pdf_bear.log_probs, pdf_van.log_probs, rtol=1e-12)


def test_variant_mismatch_raises():
    with pytest.raises(AssertionError, match="does not match wild-type"):
        get_bear_probs(
            None, "TTTAT", np.array(["G3T"]), 0, vans=[1.0],
            lag=LAG, alphabet_name="dna", counter=make_counter(),
        )


def test_pdf_to_dataframe():
    # DataFrame bridge mirrors the reference get_pdf's pandas structure
    # (index = (k+1)-mer, one column per model/sample).
    pd = pytest.importorskip("pandas")
    from bear_tpu.inference.scoring import Pdf

    rng = np.random.default_rng(0)
    lp = rng.normal(size=(2, 5, 3, 1))
    pdf = Pdf(kmers=np.array(["AC", "GT"]), log_probs=lp, alphabet_name="dna")
    df = pdf.to_dataframe()
    assert list(df.columns) == ["model0", "model1", "model2"]
    assert df.shape == (10, 3)
    np.testing.assert_allclose(df.loc["ACT", "model1"], lp[0, 3, 1, 0])
    np.testing.assert_allclose(df.loc["GT]", "model2"], lp[1, 4, 2, 0])

    lp2 = rng.normal(size=(1, 5, 1, 4))
    df2 = Pdf(kmers=np.array(["AA"]), log_probs=lp2, alphabet_name="dna").to_dataframe()
    assert list(df2.columns) == [f"model0_sample{s}" for s in range(4)]


def test_marg_scoring_ignores_out_of_alphabet_letters():
    # An 'N' in a scored sequence must contribute NOTHING to the marginal
    # (reference builds an all-zero count vector for unmatched letters);
    # the old argmax fallback silently counted it as an 'A' transition.
    ds = make_dataset()
    kwargs = dict(lag=LAG, alphabet_name="dna", data=ds, vans=[1.0],
                  get_marg=True)
    base = "TTTATTCT"
    with_n = base[:5] + "N" + base[6:]   # replaces a 'T'
    fake_a = base[:5] + "A" + base[6:]   # what the old bug scored instead
    s_n = get_bear_probs_seqs(None, [with_n], 0, **kwargs)
    s_fake = get_bear_probs_seqs(None, [fake_a], 0, **kwargs)
    assert not np.allclose(s_n, s_fake)
    # and the N must not silently equal the original either (it removes a
    # transition's contribution)
    s_base = get_bear_probs_seqs(None, [base], 0, **kwargs)
    assert not np.allclose(s_n, s_base)


def test_variant_windows_equal_full_sequence_delta_fuzz():
    # Windowed variant scoring (get_bear_probs) computes the delta from the
    # covering (k+1)-mers only; it must equal the FULL-sequence score delta
    # exactly (terms outside the windows cancel), for SNPs, insertions and
    # deletions alike — MAP mode, BEAR-with-h and BMM models.
    from bear_tpu.counting import TransitionCounter, chunk_reads, fastx
    from bear_tpu.inference.scoring import get_bear_probs, get_bear_probs_seqs

    rng = np.random.default_rng(77)
    lag = 3
    train_seqs = ["".join(rng.choice(list("ACGT"), rng.integers(15, 40)))
                  for _ in range(30)]
    tc = TransitionCounter(lags=[lag], n_groups=1)
    enc = ((fastx.encode_seq(s), 0) for s in train_seqs)
    for chunk in chunk_reads(enc, lag, batch_size=16):
        tc.add_chunk(chunk)
    ds = tc.to_dataset(lag)

    wt = "".join(rng.choice(list("ACGT"), 30))
    vars_, mutants = [], []
    for _ in range(12):
        pos = int(rng.integers(lag, len(wt) - lag - 2))
        kind = rng.integers(0, 3)
        if kind == 0:  # SNP
            old = wt[pos]
            new = rng.choice([b for b in "ACGT" if b != old])
            vars_.append(f"{old}{pos}{new}")
            mutants.append(wt[:pos] + new + wt[pos + 1:])
        elif kind == 1:  # insertion (empty wt side)
            ins = "".join(rng.choice(list("ACGT"), 2))
            vars_.append(f"{wt[pos]}{pos}{wt[pos]}{ins}")
            mutants.append(wt[:pos + 1] + ins + wt[pos + 1:])
        else:  # deletion of 2 bases
            vars_.append(f"{wt[pos:pos + 3]}{pos}{wt[pos]}")
            mutants.append(wt[:pos + 1] + wt[pos + 3:])

    common = dict(train_col=0, get_map=True, vans=[0.3, 2.0], lag=lag,
                  alphabet_name="dna", data=ds, h=np.array([0.7]))
    windowed = get_bear_probs(None, wt, vars_, **common)
    full = get_bear_probs_seqs(None, [wt] + mutants, **common)
    delta = full[1:] - full[0]
    np.testing.assert_allclose(windowed, delta, rtol=1e-9, atol=1e-9)


def test_sparse_table_index_live_after_more_counting():
    # The persistent sparse index must stay LIVE: counts added to the
    # counter AFTER the index/TableCounter is built are visible on the
    # next query (the index detects consolidation staleness and rebuilds —
    # the pre-round-5 per-query rescan semantics, at index cost only when
    # something changed; code-review r5 finding).
    from bear_tpu.counting.engine import ReadChunk
    from bear_tpu.counting.sparse import SparseTransitionCounter

    rng = np.random.default_rng(71)
    lag = 16

    def chunk():
        B = 30
        return ReadChunk(
            rng.integers(0, 4, (B, 25)).astype(np.int8),
            np.full(B, 25, np.int32), np.zeros(B, np.int32),
            np.ones(B, bool), np.zeros(B, np.int32),
        )

    c1, c2 = chunk(), chunk()
    sp = SparseTransitionCounter(lags=[lag], n_groups=1)
    sp.add_chunk(c1)
    tc = TableCounter(sp, lag)
    ctx1 = "".join("ACGT"[b] for b in c1.codes[0, :lag])
    before = tc(np.array([ctx1])).copy()
    assert before.sum() > 0
    sp.add_chunk(c2)  # counted AFTER the TableCounter was built
    ctx2 = "".join("ACGT"[b] for b in c2.codes[0, :lag])
    after2 = tc(np.array([ctx2]))
    assert after2.sum() > 0, "post-construction counts must be visible"
    # full-table agreement with a fresh TableCounter
    both = np.stack([ctx1, ctx2])
    np.testing.assert_array_equal(tc(both), TableCounter(sp, lag)(both))
