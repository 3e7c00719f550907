"""BearServer: on-device batch scoring agrees with the analysis scoring path
(MAP exact up to the epsilon regularizer) and the sampled mode matches
analytic Dirichlet means."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import digamma

from bear_tpu.counting import TransitionCounter, chunk_reads
from bear_tpu.counting import fastx
from bear_tpu.inference import get_bear_probs_seqs
from bear_tpu.inference.serving import BearServer

TOY_SEQS = ["TTTAT", "TTCTT", "TTTTT", "TTTTT"]
LAG = 3


def _counter():
    tc = TransitionCounter(lags=[LAG], n_groups=1)
    enc = [(fastx.encode_seq(s), 0) for s in TOY_SEQS]
    for chunk in chunk_reads(iter(enc), LAG):
        tc.add_chunk(chunk)
    return tc


def test_map_matches_analysis_path():
    tc = _counter()
    van = 1.0
    server = BearServer(tc.tables[LAG][0], LAG, van=van, dtype=jnp.float64)
    seqs = ["TTTAT", "TTCAT", "TTTTTTTTTT"]
    got = server.score(seqs, mode="map")

    want = get_bear_probs_seqs(
        None, seqs, 0, get_map=True, vans=[van], lag=LAG, alphabet_name="dna",
        data=tc.to_dataset(LAG),
    )[:, 0]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_map_bear_model_path():
    tc = _counter()
    h = 0.5

    def ar_apply(oh):
        return jnp.full(oh.shape[:-2] + (5,), 0.2, dtype=oh.dtype)

    server = BearServer(tc.tables[LAG][0], LAG, h=h, ar_apply=ar_apply,
                        dtype=jnp.float64)
    got = server.score(["TTTAT"], mode="map")
    # BEAR with uniform AR at h == BMM with van = 0.2/h.
    server_van = BearServer(tc.tables[LAG][0], LAG, van=0.2 / h, dtype=jnp.float64)
    want = server_van.score(["TTTAT"], mode="map")
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_sampled_mean_matches_analytic():
    tc = _counter()
    van = 1.0
    server = BearServer(tc.tables[LAG][0], LAG, van=van, dtype=jnp.float64)
    seq = "TTTAT"
    # E[log p] per transition: digamma(seen+van) - digamma(total+5van).
    def dir_mean(seen, all_):
        return digamma(seen + van) - digamma(all_ + 5 * van)

    want = (
        2 * dir_mean(4, 4)          # [[[ -> T, [[T -> T
        + dir_mean(3, 4)            # [TT -> T
        + dir_mean(1, 7)            # TTT -> A
        + 2 * dir_mean(1, 1)        # TTA -> T, TAT -> ]
    )
    n = 4000
    scores = []
    B = 500
    from bear_tpu.ops import alphabets

    c = alphabets.encode_kmers(np.array([seq]), "dna")[0]
    codes = np.tile(c, (B, 1)).astype(np.int8)
    lengths = np.full(B, len(seq), np.int32)
    for rep in range(n // B):
        s = server.log_prob_sampled(codes, lengths, jax.random.key(rep))
        scores.append(np.asarray(s))
    got = np.concatenate(scores).mean()
    assert abs(got - want) / abs(want) < 0.02, (got, want)


def test_batch_padding_consistency():
    tc = _counter()
    server = BearServer(tc.tables[LAG][0], LAG, van=0.5, dtype=jnp.float64)
    single = server.score(["TTTAT"], mode="map")
    batch = server.score(["TTTAT", "TTCATTTT", "TTTTT"], mode="map")
    np.testing.assert_allclose(batch[0], single[0], rtol=1e-12)


def test_protein_serving_matches_analysis_path():
    # Protein BearServer (base-20 tables) matches get_bear_probs_seqs — a
    # serving surface the DNA-only reference cannot offer at all.
    from bear_tpu.counting.engine import ReadChunk, TransitionCounter
    from bear_tpu.inference import get_bear_probs_seqs
    from bear_tpu.ops import alphabets as _alpha

    rng = np.random.default_rng(9)
    lag = 2
    mat = rng.integers(0, 20, (150, 30)).astype(np.int8)
    tc = TransitionCounter(lags=[lag], n_groups=1, alphabet="prot")
    tc.add_chunk(ReadChunk(mat, np.full(150, 30, np.int32),
                           np.zeros(150, np.int32), np.ones(150, bool),
                           np.zeros(150, np.int32)))
    ds = tc.to_dataset(lag)
    srv = BearServer(tc.tables[lag][0], lag=lag, van=1.0, alphabet="prot")
    res = _alpha.residues("prot")
    seqs = ["".join(rng.choice(list(res), 12)) for _ in range(5)]
    got = srv.score(seqs, mode="map")
    want = get_bear_probs_seqs(None, seqs, 0, vans=[1.0], lag=lag,
                               alphabet_name="prot", data=ds,
                               get_map=True)[:, 0]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sharded_table_serving_matches_dense():
    # Tensor-parallel serving: the table row-split over an 8-device mesh
    # (one psum per batch assembles the gather) must reproduce the dense
    # single-device scores exactly — MAP and per-sequence sampled, BMM and
    # BEAR readings.
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from bear_tpu.parallel import data_parallel_mesh

    mesh = data_parallel_mesh(8, axis_name="kmer")
    tc = _counter()
    table = tc.tables[LAG][0]
    seqs = ["TTTAT", "TTCAT", "TTTTTTTTTT", "A"]

    dense = BearServer(table, LAG, van=1.0, dtype=jnp.float64)
    shard = BearServer(table, LAG, van=1.0, dtype=jnp.float64,
                       mesh=mesh, mesh_axis="kmer")
    np.testing.assert_allclose(
        dense.score(seqs, mode="map"), shard.score(seqs, mode="map"),
        rtol=1e-12)
    key = jax.random.key(7)
    np.testing.assert_allclose(
        dense.score(seqs, mode="sample", key=key),
        shard.score(seqs, mode="sample", key=key), rtol=1e-12)

    def ar_apply(oh):
        return jnp.full(oh.shape[:-2] + (5,), 0.2, dtype=oh.dtype)

    dense_b = BearServer(table, LAG, h=0.5, ar_apply=ar_apply, dtype=jnp.float64)
    shard_b = BearServer(table, LAG, h=0.5, ar_apply=ar_apply, dtype=jnp.float64,
                         mesh=mesh)
    np.testing.assert_allclose(
        dense_b.score(seqs, mode="map"), shard_b.score(seqs, mode="map"),
        rtol=1e-12)


def test_snv_delta_scores_match_get_bear_probs():
    # Device Δ-window SNV scoring == the host get_bear_probs MAP path,
    # including '['-padded edge windows and the '$'-covering tail windows.
    from bear_tpu.inference.scoring import TableCounter, get_bear_probs

    tc = _counter()
    van = 0.7
    server = BearServer(tc.tables[LAG][0], LAG, van=van, dtype=jnp.float64)
    wt = "TTTATTCTTAG"
    rng = np.random.default_rng(0)
    letters = "ACGT"
    pos, alt, var_strs = [], [], []
    for p in list(range(len(wt))):  # every position, incl. both edges
        choices = [c for c in letters if c != wt[p]]
        a = choices[int(rng.integers(len(choices)))]
        pos.append(p)
        alt.append(a)
        var_strs.append(f"{wt[p]}{p}{a}")

    got = server.delta_scores_snv(wt, pos, alt)
    want = get_bear_probs(
        None, wt, var_strs, 0, vans=[van], get_map=True,
        counter=TableCounter(tc, LAG), lag=LAG,
        alphabet_name="dna",
    )[:, 0]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)

    # identity substitutions are exact zeros
    same = server.delta_scores_snv(wt, [3, 5], [wt[3], wt[5]])
    np.testing.assert_array_equal(same, np.zeros(2, np.float32))

    # small-batch chunking equals one-shot
    chunked = server.delta_scores_snv(wt, pos, alt, batch=3)
    np.testing.assert_allclose(chunked, got, rtol=1e-6)


def test_snv_delta_scores_bear_model():
    # AR+h mode against a brute-force window recomputation (softmax linear
    # AR, concentrations = probs/h + counts, MAP log prob).
    from bear_tpu.inference.scoring import _variant_windows, parse_var
    from bear_tpu.ops import alphabets as alph

    tc = _counter()
    table = tc.tables[LAG][0].astype(np.float64)
    rng = np.random.default_rng(1)
    W = rng.normal(size=(LAG, 5, 5)) * 0.3
    h = 0.37

    def ar_apply(oh):
        logits = jnp.einsum("...jk,jkl->...l", oh, jnp.asarray(W))
        return jax.nn.softmax(logits)

    server = BearServer(table, LAG, h=h, ar_apply=ar_apply, dtype=jnp.float64)
    wt = "TTCTTATTT"
    vars_ = ["T0A", "C2G", "A5C", "T8G"]
    got = server.delta_scores_snv(
        wt, [parse_var(v)[2] for v in vars_],
        [parse_var(v)[1] for v in vars_],
    )

    from bear_tpu.counting.engine import context_to_row

    padded = LAG * "[" + wt + "]"

    def logp_win(kmers):
        tot = 0.0
        for km in kmers:
            ctx, nx = km[:-1], km[-1]
            row = context_to_row(ctx, LAG)
            oh = alph.one_hot(
                alph.encode_kmers(np.array([ctx]), "dna"), 5, jnp.float64
            )[0]
            probs = np.asarray(ar_apply(oh))
            conc = probs / h + table[row]
            nxt_idx = "ACGT]".index(nx)
            tot += np.log(conc[nxt_idx] / conc.sum())
        return tot

    for v, g in zip(vars_, got):
        wt_k, mt_k = _variant_windows(padded, parse_var(v), LAG)
        want = logp_win(mt_k) - logp_win(wt_k)
        np.testing.assert_allclose(g, want, rtol=1e-5, err_msg=v)


def test_snv_delta_sampled_mean_matches_analytic():
    # mode="sample": the MC mean over draws converges to the analytic
    # expectation E[log p] = digamma(alpha_k) - digamma(sum alpha) summed
    # over the touched windows (same Beta/Dirichlet-moment oracle style as
    # the reference's tests/test_var_prob.py).
    tc = _counter()
    van = 1.5
    server = BearServer(tc.tables[LAG][0], LAG, van=van, dtype=jnp.float64)
    wt = "TTTATTCTT"
    pos, alt = [2, 6], ["G", "A"]

    S = 1500
    key = jax.random.key(0)
    draws = server.delta_scores_snv(wt, pos, alt, mode="sample", key=key,
                                    mc_samples=S)
    assert draws.shape == (2, S)

    # analytic expectation via the MAP machinery's windows
    from bear_tpu.inference.scoring import _variant_windows, parse_var
    from bear_tpu.counting.engine import context_to_row

    table = tc.tables[LAG][0].astype(np.float64)
    padded = LAG * "[" + wt + "]"

    def e_logp(kmers):
        tot = 0.0
        for km in kmers:
            row = context_to_row(km[:-1], LAG)
            conc = table[row] + van
            k = "ACGT]".index(km[-1])
            tot += digamma(conc[k]) - digamma(conc.sum())
        return tot

    for j, (p, a) in enumerate(zip(pos, alt)):
        var = parse_var(f"{wt[p]}{p}{a}")
        wt_k, mt_k = _variant_windows(padded, var, LAG)
        want = e_logp(mt_k) - e_logp(wt_k)
        got = draws[j].mean()
        se = draws[j].std() / np.sqrt(S)
        assert abs(got - want) < 5 * se + 1e-3, (got, want, se)

    # single-draw convenience shape
    one = server.delta_scores_snv(wt, pos, alt, mode="sample", key=key)
    assert one.shape == (2,)
    import pytest
    with pytest.raises(ValueError, match="requires key"):
        server.delta_scores_snv(wt, pos, alt, mode="sample")


def test_variant_delta_scores_generic_match_get_bear_probs():
    # delta_scores_variants == host get_bear_probs MAP for the full variant
    # grammar: SNVs, multi-base substitutions, insertions, deletions,
    # including edge positions whose windows are '['-padded or '$'-covering.
    from bear_tpu.inference.scoring import TableCounter, get_bear_probs

    tc = _counter()
    van = 0.7
    server = BearServer(tc.tables[LAG][0], LAG, van=van, dtype=jnp.float64)
    wt = "TTTATTCTTAG"
    vars_ = [
        "T0A",          # SNV at the left edge
        "G10C",         # SNV at the right edge
        "TA2CG",        # multi-base substitution
        "T5ACT",        # insertion (1 -> 3)
        "TTC4G",        # deletion (3 -> 1)
        "T8",           # pure deletion (1 -> 0)
        "A3A",          # identity
    ]
    got = server.delta_scores_variants(wt, vars_)
    want = get_bear_probs(
        None, wt, vars_, 0, vans=[van], get_map=True,
        counter=TableCounter(tc, LAG), lag=LAG, alphabet_name="dna",
    )[:, 0]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
    assert got[-1] == 0.0  # identity: every window shared

    # small-batch chunking equals one-shot
    chunked = server.delta_scores_variants(wt, vars_, batch=2)
    np.testing.assert_allclose(chunked, got, rtol=1e-6)

    # empty variant list honors the documented shape in every mode
    assert server.delta_scores_variants(wt, []).shape == (0,)
    key0 = jax.random.key(0)
    assert server.delta_scores_variants(
        wt, [], mode="sample", key=key0).shape == (0,)
    assert server.delta_scores_variants(
        wt, [], mode="sample", key=key0, mc_samples=5).shape == (0, 5)


def test_variant_delta_scores_snv_agreement_and_sampling():
    # On pure SNVs the generic window path and the row-arithmetic SNV path
    # agree exactly, in BOTH modes (sampled draws are keyed on the table
    # row, so the two paths see identical Dirichlet draws).
    tc = _counter()
    server = BearServer(tc.tables[LAG][0], LAG, van=0.4, dtype=jnp.float64)
    wt = "TTTATTCTT"
    vars_ = ["T0G", "A3C", "C6A", "T8C"]
    pos = [0, 3, 6, 8]
    alt = ["G", "C", "A", "C"]

    map_var = server.delta_scores_variants(wt, vars_)
    map_snv = server.delta_scores_snv(wt, pos, alt)
    np.testing.assert_allclose(map_var, map_snv, rtol=1e-6)

    key = jax.random.key(5)
    s_var = server.delta_scores_variants(wt, vars_, mode="sample", key=key,
                                         mc_samples=3)
    s_snv = server.delta_scores_snv(wt, pos, alt, mode="sample", key=key,
                                    mc_samples=3)
    assert s_var.shape == (4, 3)
    np.testing.assert_allclose(s_var, s_snv, rtol=1e-5)

    # sampled identity variant: all windows shared -> exact zero
    z = server.delta_scores_variants(wt, ["T0T"], mode="sample", key=key)
    np.testing.assert_array_equal(z, np.zeros(1, np.float32))

    import pytest
    with pytest.raises(ValueError, match="requires key"):
        server.delta_scores_variants(wt, vars_, mode="sample")
    with pytest.raises(ValueError, match="unknown mode"):
        server.delta_scores_variants(wt, vars_, mode="nope")


def test_variant_delta_scores_pure_insertions():
    # Pure insertions (empty wt_aa) through the vectorized device windows:
    # at the start, mid-sequence, and APPENDED at pos == len(wt) (the
    # stop-transition edge), all exactly matching the host oracle.
    from bear_tpu.inference.scoring import TableCounter, get_bear_probs

    tc = _counter()
    server = BearServer(tc.tables[LAG][0], LAG, van=0.7, dtype=jnp.float64)
    wt = "TTTATTCTTAG"
    vars_ = ["0AC", "5G", "11TT"]
    got = server.delta_scores_variants(wt, vars_)
    want = get_bear_probs(
        None, wt, vars_, 0, vans=[0.7], get_map=True,
        counter=TableCounter(tc, LAG), lag=LAG, alphabet_name="dna",
    )[:, 0]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_sharded_table_sampled_modes_match_dense():
    # Row-split (mesh=) serving in SAMPLED modes: draws are keyed on table
    # rows, which are identical either way, so sharded == dense exactly.
    from jax.sharding import Mesh

    from bear_tpu.counting.engine import table_rows

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    rng = np.random.default_rng(0)
    table = rng.poisson(0.4, (table_rows(LAG), 5)).astype(np.float64)
    dense = BearServer(table, LAG, van=0.5, dtype=jnp.float64)
    mesh = Mesh(np.array(jax.devices()), ("kmer",))
    shard = BearServer(table, LAG, van=0.5, dtype=jnp.float64, mesh=mesh)
    codes = rng.integers(0, 4, (16, 40)).astype(np.int8)
    lengths = np.full(16, 40, np.int32)
    key = jax.random.key(1)
    np.testing.assert_allclose(
        np.asarray(dense.log_prob_sampled(codes, lengths, key)),
        np.asarray(shard.log_prob_sampled(codes, lengths, key)), rtol=1e-12)
    wt = "".join("ACGT"[c] for c in codes[0])
    np.testing.assert_allclose(
        dense.delta_scores_snv(wt, [3, 10], ["A", "C"], mode="sample", key=key),
        shard.delta_scores_snv(wt, [3, 10], ["A", "C"], mode="sample", key=key),
        rtol=1e-12)


def test_mc_sample_axis_prefix_consistency():
    # The in-kernel [S] sample axis keys sample s with fold_in(key, s)
    # independent of S: column s of an mc_samples=5 call must bit-equal
    # column s of an mc_samples=3 call, and column 0 must equal the
    # mc_samples=1 result — for SNVs, arbitrary variants, and score().
    tc = _counter()
    server = BearServer(tc.tables[LAG][0], LAG, van=0.5, dtype=jnp.float64)
    wt = "TTTATTCTT"
    key = jax.random.key(7)

    pos, alt = [1, 4, 6], ["G", "A", "C"]
    s5 = server.delta_scores_snv(wt, pos, alt, mode="sample", key=key,
                                 mc_samples=5)
    s3 = server.delta_scores_snv(wt, pos, alt, mode="sample", key=key,
                                 mc_samples=3)
    s1 = server.delta_scores_snv(wt, pos, alt, mode="sample", key=key)
    np.testing.assert_array_equal(s5[:, :3], s3)
    np.testing.assert_array_equal(s5[:, 0], s1)

    vars_ = ["T1G", "AT3C", "4TGG", "C6"]
    v5 = server.delta_scores_variants(wt, vars_, mode="sample", key=key,
                                      mc_samples=5)
    v3 = server.delta_scores_variants(wt, vars_, mode="sample", key=key,
                                      mc_samples=3)
    np.testing.assert_array_equal(v5[:, :3], v3)

    seqs = ["TTTAT", "TTCTT"]
    q5 = server.score(seqs, mode="sample", key=key, mc_samples=5)
    q3 = server.score(seqs, mode="sample", key=key, mc_samples=3)
    np.testing.assert_array_equal(q5[:, :3], q3)


def test_score_sample_mc_axis():
    tc = _counter()
    server = BearServer(tc.tables[LAG][0], LAG, van=0.5, dtype=jnp.float64)
    seqs = ["TTTAT", "TTCTT"]
    key = jax.random.key(2)
    one = server.score(seqs, mode="sample", key=key)
    many = server.score(seqs, mode="sample", key=key, mc_samples=3)
    assert many.shape == (2, 3)
    # sample 0 folds key index 0, not the base key: draws differ from the
    # single-draw call but are themselves deterministic
    many2 = server.score(seqs, mode="sample", key=key, mc_samples=3)
    np.testing.assert_array_equal(many, many2)
    assert one.shape == (2,)
    assert not np.array_equal(many[:, 0], many[:, 1])


def test_variant_scores_wt_shorter_than_lag():
    # Wild-type shorter than the lag: every window is '['-padded and/or
    # '$'-covering; device paths equal the host oracle and each other.
    from bear_tpu.inference.scoring import TableCounter, get_bear_probs

    tc = _counter()
    server = BearServer(tc.tables[LAG][0], LAG, van=0.7, dtype=jnp.float64)
    wt = "TA"  # shorter than LAG
    vars_ = ["T0A", "A1G", "1GG", "2C"]
    got = server.delta_scores_variants(wt, vars_)
    want = get_bear_probs(
        None, wt, vars_, 0, vans=[0.7], get_map=True,
        counter=TableCounter(tc, LAG), lag=LAG, alphabet_name="dna",
    )[:, 0]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        server.delta_scores_snv(wt, [0, 1], ["A", "G"]),
        server.delta_scores_variants(wt, ["T0A", "A1G"]), rtol=1e-9)


def test_sampled_reduce_in_kernel_matches_host_reduction():
    # reduce="mean_std"/"quantiles" reduce the sample axis IN-KERNEL; with
    # the same key the draws are identical to reduce="none", so the reduced
    # outputs must match a host-side reduction of the full-sample output
    # (to f32 reduction reassociation), for both the SNV and the arbitrary-
    # variant kernels.
    import pytest

    tc = _counter()
    server = BearServer(tc.tables[LAG][0], LAG, van=0.8, dtype=jnp.float64)
    wt = "TTTATTCTTAG"
    pos = [1, 4, 7, 9]
    alt = ["G", "C", "A", "C"]
    vars_ = [f"{wt[p]}{p}{a}" for p, a in zip(pos, alt)]
    key = jax.random.key(7)
    S = 33
    qs = (0.1, 0.5, 0.9)

    full = server.delta_scores_snv(wt, pos, alt, mode="sample", key=key,
                                   mc_samples=S)
    ms = server.delta_scores_snv(wt, pos, alt, mode="sample", key=key,
                                 mc_samples=S, reduce="mean_std")
    assert ms.shape == (4, 2)
    np.testing.assert_allclose(ms[:, 0], full.mean(-1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ms[:, 1], full.std(-1, ddof=1), rtol=1e-4,
                               atol=1e-6)
    qt = server.delta_scores_snv(wt, pos, alt, mode="sample", key=key,
                                 mc_samples=S, reduce="quantiles",
                                 quantiles=qs)
    assert qt.shape == (4, 3)
    np.testing.assert_allclose(
        qt, np.quantile(full.astype(np.float64), qs, axis=-1).T,
        rtol=1e-5, atol=1e-5)

    full_v = server.delta_scores_variants(wt, vars_, mode="sample", key=key,
                                          mc_samples=S)
    ms_v = server.delta_scores_variants(wt, vars_, mode="sample", key=key,
                                        mc_samples=S, reduce="mean_std")
    np.testing.assert_allclose(ms_v[:, 0], full_v.mean(-1), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(ms_v[:, 1], full_v.std(-1, ddof=1), rtol=1e-4,
                               atol=1e-6)
    qt_v = server.delta_scores_variants(wt, vars_, mode="sample", key=key,
                                        mc_samples=S, reduce="quantiles",
                                        quantiles=qs)
    np.testing.assert_allclose(
        qt_v, np.quantile(full_v.astype(np.float64), qs, axis=-1).T,
        rtol=1e-5, atol=1e-5)

    # chunked == one-shot for reduced outputs (reduction is per-variant)
    ms_chunked = server.delta_scores_variants(
        wt, vars_, mode="sample", key=key, mc_samples=S, reduce="mean_std",
        batch=2)
    np.testing.assert_allclose(ms_chunked, ms_v, rtol=1e-6)

    # contract errors + empty shapes
    with pytest.raises(ValueError, match="requires mode"):
        server.delta_scores_snv(wt, pos, alt, reduce="mean_std")
    with pytest.raises(ValueError, match="requires mode"):
        server.delta_scores_variants(wt, vars_, reduce="quantiles")
    assert server.delta_scores_variants(
        wt, [], mode="sample", key=key, mc_samples=S,
        reduce="mean_std").shape == (0, 2)
    assert server.delta_scores_variants(
        wt, [], mode="sample", key=key, mc_samples=S, reduce="quantiles",
        quantiles=qs).shape == (0, 3)


def test_sampled_reduce_mean_std_single_sample_no_nan():
    # mc_samples=1 has no spread estimate: the std column must be exact 0,
    # never the ddof-1 0/0 NaN (code-review r5 finding).
    tc = _counter()
    server = BearServer(tc.tables[LAG][0], LAG, van=0.8, dtype=jnp.float64)
    wt = "TTTATTCTT"
    out = server.delta_scores_snv(wt, [2, 5], ["G", "A"], mode="sample",
                                  key=jax.random.key(1), reduce="mean_std")
    assert out.shape == (2, 2)
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[:, 1], np.zeros(2, np.float32))
    full = server.delta_scores_snv(wt, [2, 5], ["G", "A"], mode="sample",
                                   key=jax.random.key(1), mc_samples=1)
    np.testing.assert_allclose(out[:, 0], full, rtol=1e-6)


def test_score_reduce_in_kernel():
    # score(mode="sample", reduce=...) matches a host reduction of the raw
    # [B, S] samples with the same key; contract errors enforced.
    import pytest

    tc = _counter()
    server = BearServer(tc.tables[LAG][0], LAG, van=0.6, dtype=jnp.float64)
    seqs = ["TTTATT", "TTCT", "TA"]
    key = jax.random.key(9)
    S = 17
    full = server.score(seqs, mode="sample", key=key, mc_samples=S)
    ms = server.score(seqs, mode="sample", key=key, mc_samples=S,
                      reduce="mean_std")
    assert ms.shape == (3, 2)
    np.testing.assert_allclose(ms[:, 0], full.mean(-1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ms[:, 1], full.std(-1, ddof=1), rtol=1e-4,
                               atol=1e-6)
    qt = server.score(seqs, mode="sample", key=key, mc_samples=S,
                      reduce="quantiles", quantiles=(0.25, 0.75))
    np.testing.assert_allclose(
        qt, np.quantile(full.astype(np.float64), (0.25, 0.75), axis=-1).T,
        rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="requires mode"):
        server.score(seqs, reduce="mean_std")
