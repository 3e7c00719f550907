"""Lag selection: data with genuine order-k structure must select lag >= k,
and iid data must prefer the smallest lag (Bayes factor penalizes complexity)."""

import numpy as np

from bear_tpu.counting import TransitionCounter, chunk_reads
from bear_tpu.counting import fastx
from bear_tpu.models.lag_selection import select_lag


def _count(seqs, lags):
    tc = TransitionCounter(lags=lags, n_groups=1)
    enc = [(fastx.encode_seq(s), 0) for s in seqs]
    for chunk in chunk_reads(iter(enc), max(lags), batch_size=64):
        tc.add_chunk(chunk)
    return tc


def test_structured_data_selects_higher_lag():
    # "AACAAG" repeat: ambiguous at lag 1 ('A'->{A,C,G}) and lag 2
    # ('AA'->{C,G}), deterministic at lag 3 — the marginal likelihood must
    # pick lag 3 (lag 4 fits equally but pays the complexity penalty).
    seqs = ["AACAAG" * 30] * 8
    tc = _count(seqs, [1, 2, 3, 4])
    sel = select_lag(tc)
    assert sel.best == 3
    assert sel.log_marginals.shape == (4, 3)


def test_iid_data_selects_lag_1():
    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("ACGT"), 400)) for _ in range(6)]
    tc = _count(seqs, [1, 3, 5])
    sel = select_lag(tc)
    assert sel.best == 1
    assert sel.best_alpha(1) in (0.01, 0.1, 1.0)


def test_cli_counts_mode_matches_counter_sweep(tmp_path):
    """The CLI's two routes agree: scoring exported TSVs reproduces the
    in-memory counter sweep exactly, and the JSON output is well-formed."""
    import json
    import os

    from bear_tpu.models import lag_select_cli

    seqs = ["AACAAG" * 30] * 8
    lags = [1, 2, 3]
    tc = _count(seqs, lags)
    prefix = os.path.join(tmp_path, "toy")
    for lag in lags:
        tc.export_tsv(prefix, lag, n_bin_bits=0)
    # fasta + csv input for the counting route
    fa = os.path.join(tmp_path, "seqs.fasta")
    with open(fa, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">s{i}\n{s}\n")
    csv = os.path.join(tmp_path, "in.csv")
    with open(csv, "w") as fh:
        fh.write(f"{fa},0,fa\n")

    args = lag_select_cli.build_parser().parse_args(
        [prefix, "--counts", "-l", "3", "--json"]
    )
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        best_counts = lag_select_cli.main(args)
    payload = json.loads(buf.getvalue())
    assert best_counts == payload["best_lag"] == 3

    args2 = lag_select_cli.build_parser().parse_args([csv, "-l", "3"])
    with contextlib.redirect_stdout(io.StringIO()):
        best_counted = lag_select_cli.main(args2)
    assert best_counted == 3

    sel = select_lag(tc)
    np.testing.assert_allclose(
        np.array(payload["log_marginals"]), sel.log_marginals[:3], rtol=1e-12
    )


def test_cli_counting_route_honors_ambig(tmp_path):
    # ADVICE r1: the counting route must forward --ambig so lags scored
    # directly agree with lags scored from --ambig skip TSVs on N-ful data.
    import contextlib
    import io
    import json
    import os

    from bear_tpu.counting.engine import split_ambiguous
    from bear_tpu.models import lag_select_cli

    seqs = ["AACNAAG" * 20] * 6
    fa = os.path.join(tmp_path, "seqs.fasta")
    with open(fa, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">s{i}\n{s}\n")
    csv = os.path.join(tmp_path, "in.csv")
    with open(csv, "w") as fh:
        fh.write(f"{fa},0,fa\n")

    def run(extra):
        args = lag_select_cli.build_parser().parse_args(
            [csv, "-l", "2", "--json"] + extra
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            lag_select_cli.main(args)
        return json.loads(buf.getvalue())

    # Oracle: counter fed through split_ambiguous.
    tc = TransitionCounter(lags=[1, 2], n_groups=1)
    enc = ((fastx.encode_seq(s, ambig=True), 0) for s in seqs)
    for chunk in chunk_reads(split_ambiguous(enc), 2, batch_size=64):
        tc.add_chunk(chunk)
    sel_skip = select_lag(tc)

    got_skip = run(["--ambig", "skip"])
    np.testing.assert_allclose(np.array(got_skip["log_marginals"]),
                               sel_skip.log_marginals, rtol=1e-12)
    got_default = run([])
    assert not np.allclose(np.array(got_default["log_marginals"]),
                           sel_skip.log_marginals)


def test_select_lag_sparse_matches_dense():
    # The sparse-accessor sweep (lag 14-15 scale model selection) equals the
    # dense-table sweep exactly, through both a MultiPass and a kmer-sharded
    # counter, and through select_lag's auto-dispatch.
    import numpy as np

    from bear_tpu.counting.engine import ReadChunk, TransitionCounter
    from bear_tpu.counting.multipass import MultiPassTransitionCounter
    from bear_tpu.models.lag_selection import select_lag, select_lag_sparse

    rng = np.random.default_rng(0)
    n_reads, rlen = 16, 40
    codes = rng.integers(0, 4, size=(n_reads, rlen)).astype(np.int8)
    chunk = ReadChunk(
        codes=codes,
        lengths=np.full(n_reads, rlen, np.int32),
        skip=np.zeros(n_reads, np.int32),
        stopped=np.ones(n_reads, bool),
        groups=rng.integers(0, 2, n_reads).astype(np.int32),
    )
    dense = TransitionCounter(lags=[2, 3], n_groups=2, method="scatter")
    dense.add_chunk(chunk)
    want = select_lag(dense, group=1)

    mp = MultiPassTransitionCounter(lags=[2, 3], n_groups=2, passes=3,
                                    method="scatter")
    for p in range(mp.passes):
        mp.begin_pass(p)
        mp.add_chunk(chunk)
    mp.finish()
    got = select_lag_sparse(mp, group=1)
    np.testing.assert_allclose(got.log_marginals, want.log_marginals,
                               rtol=1e-12)
    assert got.best == want.best
    # tiny batch_size exercises the row streaming
    got_b = select_lag_sparse(mp, group=1, batch_size=7)
    np.testing.assert_allclose(got_b.log_marginals, want.log_marginals,
                               rtol=1e-12)


def test_h_scan_streaming_matches_in_memory():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bear_tpu.models import bear_net, get_ar_func

    rng = np.random.default_rng(4)
    lag, n = 3, 96
    codes = rng.integers(0, 4, (n, lag)).astype(np.int8)
    counts = rng.poisson(5.0, (n, 2, 5)).astype(np.float64)
    ar = get_ar_func("linear", lag, 4, dtype=jnp.float64)
    params = [np.asarray(p) for p in ar.init(jax.random.key(0))]
    hs = [0.01, 0.1, 1.0]
    kw = dict(batch_size=16, dtype=jnp.float64, seed=3)

    want = bear_net.h_scan(codes, counts, 0, 1, "dna", hs, ar, params, **kw)

    def shards():  # >= 2 shards, batch-aligned
        yield codes[:32], counts[:32]
        yield codes[32:], counts[32:]

    got = bear_net.h_scan_streaming(shards, 0, 1, "dna", hs, ar, params,
                                    block_steps=2, **kw)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_cli_passes_and_kmer_shards_match_single(tmp_path):
    # The large-lag counting routes through the CLI (--passes multipass,
    # --kmer-shards mesh) reproduce the single-device evidence table
    # exactly (the sweep auto-dispatches to the sparse accessors).
    import contextlib
    import io
    import json
    import os

    from bear_tpu.models import lag_select_cli

    rng = np.random.default_rng(3)
    seqs = ["".join(rng.choice(list("ACGT"), 120)) for _ in range(5)]
    fa = os.path.join(tmp_path, "seqs.fasta")
    with open(fa, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">s{i}\n{s}\n")
    csv = os.path.join(tmp_path, "in.csv")
    with open(csv, "w") as fh:
        fh.write(f"{fa},0,fa\n")

    def run(extra):
        args = lag_select_cli.build_parser().parse_args(
            [csv, "-l", "3", "--json"] + extra)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            lag_select_cli.main(args)
        return json.loads(buf.getvalue())

    base = run([])
    for extra in (["--passes", "3"], ["--kmer-shards", "2"]):
        got = run(extra)
        assert got["best_lag"] == base["best_lag"]
        np.testing.assert_allclose(np.array(got["log_marginals"]),
                                   np.array(base["log_marginals"]),
                                   rtol=1e-12)


def test_select_lag_sparse_with_sparse_first_counter():
    # Model selection sweeps the sparse-FIRST counter (lags beyond any
    # dense table) through the same sparse accessors: a multi-lag
    # SparseTransitionCounter incl. a lag >= 16 entry ranks lags and the
    # dense-range entries match the dense counter's evidence exactly.
    from bear_tpu.counting.engine import ReadChunk, TransitionCounter
    from bear_tpu.counting.sparse import SparseTransitionCounter
    from bear_tpu.models.lag_selection import select_lag_sparse

    rng = np.random.default_rng(44)
    lags = [2, 4, 17]
    sp = SparseTransitionCounter(lags=lags, n_groups=1)
    dense = TransitionCounter(lags=[2, 4], n_groups=1, method="scatter")
    B, L = 80, 40
    chunk = ReadChunk(
        rng.integers(0, 4, (B, L)).astype(np.int8),
        np.full(B, L, np.int32), np.zeros(B, np.int32),
        np.ones(B, bool), np.zeros(B, np.int32),
    )
    sp.add_chunk(chunk)
    dense.add_chunk(chunk)
    got = select_lag_sparse(sp)
    want = select_lag(dense)
    assert got.log_marginals.shape == (3, 3)
    np.testing.assert_allclose(got.log_marginals[:2], want.log_marginals,
                               rtol=1e-12)
    assert np.isfinite(got.log_marginals).all()
