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
