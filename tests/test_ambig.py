"""Ambiguous-base (N) handling oracle.

ambig="skip" semantics: a transition is counted iff its whole window — the
lag-l context (with '['-padding only at a TRUE read start) plus the next
symbol (or '$' at a TRUE read end) — covers no ambiguous base. Neither the
reference (summarize.py:69-70 folds N to A) nor KMC has this; the oracle here
is a brute-force Python recount with the window rule applied literally.
"""

from collections import defaultdict

import numpy as np
import pytest

from bear_tpu.counting import TransitionCounter, chunk_reads, context_to_row
from bear_tpu.counting import engine, fastx
from bear_tpu.counting.engine import chunks_from_packed, split_ambiguous
from bear_tpu.counting.summarize import build_parser, main as summarize_main

ALPHABET = {"A": 0, "C": 1, "G": 2, "T": 3, "]": 4}
RC = str.maketrans("ACGTN", "TGCAN")


def revcomp(s):
    return s.translate(RC)[::-1]


def brute_force_ambig(seqs_groups, max_lag, n_groups, reverse=False):
    """Count (context, next) per lag over '['*lag + s + ']', dropping any
    transition whose window full[j-lag : j+1] covers an N."""
    out = [defaultdict(lambda: np.zeros((n_groups, 5), dtype=np.int64))
           for _ in range(max_lag)]
    for seq, group in seqs_groups:
        variants = [seq, revcomp(seq)] if reverse else [seq]
        for s in variants:
            for li in range(max_lag):
                lag = li + 1
                full = "[" * lag + s + "]"
                for j in range(lag, len(full)):
                    if "N" in full[j - lag : j + 1]:
                        continue
                    out[li][full[j - lag : j]][group][ALPHABET[full[j]]] += 1
    return out


def assert_match(counter, oracle, max_lag, n_groups):
    for li in range(max_lag):
        lag = li + 1
        table = counter.tables[lag]
        seen = set()
        for kmer, mat in oracle[li].items():
            row = context_to_row(kmer, lag)
            seen.add(row)
            np.testing.assert_array_equal(
                table[:, row, :], mat, err_msg=f"lag {lag} kmer {kmer!r}"
            )
        extra = set(int(r) for r in counter.nonzero_rows(lag)) - seen
        assert not extra, f"lag {lag}: unexpected nonzero rows {extra}"


def seqs_with_ns(rng, n, lo=10, hi=24, p_n=0.12):
    """Random reads with Ns sprinkled, plus adversarial boundary cases."""
    base = [
        "".join(rng.choice(list("ACGTN"), rng.integers(lo, hi),
                           p=[0.22, 0.22, 0.22, 0.22, 0.12]))
        for _ in range(n)
    ]
    return base + [
        "NACGT",        # N at read start: no '[' prefixes survive
        "ACGTN",        # N at read end: no '$' transition survives
        "ACNNGT",       # consecutive Ns
        "NNN",          # all ambiguous: counts nothing
        "N",            # single ambiguous base
        "ACGTACG",      # clean read: identical to default behavior
    ]


def test_stream_split_matches_oracle():
    rng = np.random.default_rng(7)
    max_lag, n_groups = 5, 2
    seqs = seqs_with_ns(rng, 10)
    groups = [int(g) for g in rng.integers(0, n_groups, len(seqs))]
    counter = TransitionCounter(lags=range(1, max_lag + 1), n_groups=n_groups)
    enc = ((fastx.encode_seq(s, ambig=True), g) for s, g in zip(seqs, groups))
    for chunk in chunk_reads(split_ambiguous(enc), max_lag, batch_size=4):
        counter.add_chunk(chunk)
    oracle = brute_force_ambig(list(zip(seqs, groups)), max_lag, n_groups)
    assert_match(counter, oracle, max_lag, n_groups)


def test_stream_split_reverse_matches_oracle():
    rng = np.random.default_rng(8)
    max_lag, n_groups = 4, 2
    seqs = seqs_with_ns(rng, 8)
    groups = [int(g) for g in rng.integers(0, n_groups, len(seqs))]
    counter = TransitionCounter(lags=range(1, max_lag + 1), n_groups=n_groups)
    enc = ((fastx.encode_seq(s, ambig=True), g) for s, g in zip(seqs, groups))
    for chunk in chunk_reads(split_ambiguous(enc), max_lag, batch_size=3,
                             reverse=True):
        counter.add_chunk(chunk)
    oracle = brute_force_ambig(list(zip(seqs, groups)), max_lag, n_groups,
                               reverse=True)
    assert_match(counter, oracle, max_lag, n_groups)


def test_counter_level_rc_swaps_flags():
    # TransitionCounter(reverse=True) RCs whole-read chunks itself; with
    # ambig pieces the fresh/stop flags must swap sides under reversal.
    max_lag, n_groups = 3, 1
    seqs = ["ACGNTT", "NGGAC", "CCGTN"]
    counter = TransitionCounter(lags=range(1, max_lag + 1), n_groups=n_groups,
                                reverse=True)
    enc = ((fastx.encode_seq(s, ambig=True), 0) for s in seqs)
    for chunk in chunk_reads(split_ambiguous(enc), max_lag, batch_size=2):
        counter.add_chunk(chunk)
    oracle = brute_force_ambig([(s, 0) for s in seqs], max_lag, n_groups,
                               reverse=True)
    assert_match(counter, oracle, max_lag, n_groups)


def test_counter_level_rc_all_fresh_unstopped():
    # Regression (ADVICE r1, high): a chunk whose rows are ALL fresh=True
    # with stop=False (every read trailing-N, e.g. 'ACGTN') used to collapse
    # fresh to None; the counter-level RC branch then passed the unswapped
    # stop flags — counting '['-prefix transitions whose window crosses the N
    # and dropping the valid '$' transition.
    for seqs in (["ACGTN"], ["ACGTN", "ACGTN", "GGTAN"]):
        for max_lag in (1, 2):
            counter = TransitionCounter(lags=range(1, max_lag + 1),
                                        n_groups=1, reverse=True)
            enc = ((fastx.encode_seq(s, ambig=True), 0) for s in seqs)
            for chunk in chunk_reads(split_ambiguous(enc), max_lag,
                                     batch_size=4):
                counter.add_chunk(chunk)
            oracle = brute_force_ambig([(s, 0) for s in seqs], max_lag, 1,
                                       reverse=True)
            assert_match(counter, oracle, max_lag, 1)


def test_sharded_counter_rc_all_fresh_unstopped():
    # Same regression through ShardedTransitionCounter(reverse=True).
    import jax
    from jax.sharding import Mesh
    from bear_tpu.parallel.counting import ShardedTransitionCounter

    seqs = ["ACGTN", "GGTAN"]
    max_lag = 2
    mesh = Mesh(np.array(jax.devices()), ("data",))
    counter = ShardedTransitionCounter(mesh, lags=range(1, max_lag + 1),
                                       n_groups=1, reverse=True)
    enc = ((fastx.encode_seq(s, ambig=True), 0) for s in seqs)
    for chunk in chunk_reads(split_ambiguous(enc), max_lag, batch_size=4):
        counter.add_chunk(chunk)
    oracle = brute_force_ambig([(s, 0) for s in seqs], max_lag, 1,
                               reverse=True)
    for li in range(max_lag):
        lag = li + 1
        tbl = counter.tables[lag]
        rows_seen = set()
        for kmer, mat in oracle[li].items():
            row = context_to_row(kmer, lag)
            rows_seen.add(row)
            np.testing.assert_array_equal(tbl[:, row, :], mat,
                                          err_msg=f"lag {lag} {kmer!r}")
        extra = set(np.flatnonzero(tbl.sum(axis=(0, 2))).tolist()) - rows_seen
        assert not extra, f"lag {lag}: unexpected rows {extra}"


def test_rc_boundary_flags_empty_read_vs_padding():
    # Real empty reads (stop=True, length 0) keep their RC '['->'$';
    # padding rows (stop=False, length 0) never gain one.
    chunk = engine.ReadChunk(
        codes=np.zeros((3, 4), np.int8),
        lengths=np.array([4, 0, 0], np.int32),
        skip=np.zeros(3, np.int32),
        stopped=np.array([False, True, False]),  # piece, empty read, padding
        groups=np.zeros(3, np.int32),
        fresh=np.array([True, True, True]),
    )
    st_rc, fr_rc = engine.rc_boundary_flags(chunk)
    assert fr_rc is not None
    np.testing.assert_array_equal(st_rc, [True, True, False])
    np.testing.assert_array_equal(fr_rc, [False, True, False])


@pytest.mark.parametrize("segment_len", [1 << 16, 7])
def test_packed_split_matches_oracle(segment_len):
    # The vectorized packed-path rewrite (reads -> N-free pieces), including
    # pieces long enough to re-segment (segment_len=7 < piece lengths).
    rng = np.random.default_rng(9)
    max_lag, n_groups = 5, 3
    seqs = seqs_with_ns(rng, 12, lo=10, hi=40)
    groups = np.array([int(g) for g in rng.integers(0, n_groups, len(seqs))],
                      dtype=np.int32)
    codes = [fastx.encode_seq(s, ambig=True) for s in seqs]
    flat = np.concatenate(codes).astype(np.int8)
    offsets = np.concatenate([[0], np.cumsum([len(c) for c in codes])])
    for reverse in (False, True):
        counter = TransitionCounter(lags=range(1, max_lag + 1),
                                    n_groups=n_groups)
        for chunk in chunks_from_packed(flat, offsets, groups, max_lag,
                                        batch_size=4,
                                        segment_len=segment_len,
                                        reverse=reverse, ambig_code=4):
            counter.add_chunk(chunk)
        oracle = brute_force_ambig(list(zip(seqs, groups)), max_lag, n_groups,
                                   reverse=reverse)
        assert_match(counter, oracle, max_lag, n_groups)


def test_packed_empty_reads_preserved():
    # Originally-empty reads keep their '['^lag -> '$' transition; reads
    # emptied by N-splitting must NOT invent one.
    max_lag = 2
    seqs = ["", "N", "ACG"]
    codes = [fastx.encode_seq(s, ambig=True) for s in seqs]
    flat = (np.concatenate(codes).astype(np.int8)
            if any(len(c) for c in codes) else np.zeros(0, np.int8))
    offsets = np.concatenate([[0], np.cumsum([len(c) for c in codes])])
    counter = TransitionCounter(lags=range(1, max_lag + 1), n_groups=1)
    for chunk in chunks_from_packed(flat, offsets, np.zeros(3, np.int32),
                                    max_lag, ambig_code=4):
        counter.add_chunk(chunk)
    for lag in (1, 2):
        stop_row = context_to_row("[" * lag, lag)
        # exactly one '['^lag -> '$' (from the truly-empty read)
        assert counter.tables[lag][0, stop_row, 4] == 1


@pytest.mark.slow
def test_sharded_counters_match_oracle():
    # Both multi-device counters (replicated-table DP and row-split TP) on
    # the virtual 8-device mesh under ambig pieces.
    import jax
    from jax.sharding import Mesh
    from bear_tpu.parallel.counting import (
        KmerShardedTransitionCounter,
        ShardedTransitionCounter,
    )

    rng = np.random.default_rng(10)
    max_lag, n_groups = 4, 2
    seqs = seqs_with_ns(rng, 8)
    groups = [int(g) for g in rng.integers(0, n_groups, len(seqs))]
    oracle = brute_force_ambig(list(zip(seqs, groups)), max_lag, n_groups)

    for cls, axis in ((ShardedTransitionCounter, "data"),
                      (KmerShardedTransitionCounter, "kmer")):
        mesh = Mesh(np.array(jax.devices()), (axis,))
        counter = cls(mesh, lags=range(1, max_lag + 1), n_groups=n_groups,
                      method="scatter")
        enc = ((fastx.encode_seq(s, ambig=True), g)
               for s, g in zip(seqs, groups))
        for chunk in chunk_reads(split_ambiguous(enc), max_lag, batch_size=4):
            counter.add_chunk(chunk)
        for li in range(max_lag):
            lag = li + 1
            tbl = counter.tables[lag]
            for kmer, mat in oracle[li].items():
                row = context_to_row(kmer, lag)
                np.testing.assert_array_equal(
                    tbl[:, row, :], mat,
                    err_msg=f"{cls.__name__} lag {lag} kmer {kmer!r}",
                )


def test_cli_ambig_skip_end_to_end(tmp_path):
    rng = np.random.default_rng(11)
    seqs = seqs_with_ns(rng, 6)
    fa = tmp_path / "in.fa"
    with open(fa, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">s{i}\n{s}\n")
    csv = tmp_path / "in.csv"
    csv.write_text(f"{fa},0,fa\n")
    max_lag = 4
    out_prefix = str(tmp_path / "out")
    args = build_parser().parse_args(
        [str(csv), out_prefix, "-l", str(max_lag), "--ambig", "skip"]
    )
    n_bins, _ = summarize_main(args)
    oracle = brute_force_ambig([(s, 0) for s in seqs], max_lag, 1)

    import csv as csvmod
    import json
    import os

    for li in range(max_lag):
        lag = li + 1
        found = {}
        for b in range(n_bins):
            path = f"{out_prefix}_lag_{lag}_file_{b}.tsv"
            if not os.path.exists(path):
                continue
            with open(path, newline="") as fh:
                for kmer, mat in csvmod.reader(fh, delimiter="\t"):
                    found[kmer] = np.array(json.loads(mat), dtype=np.int64)
        expect = {k: m for k, m in oracle[li].items() if m.sum() > 0}
        assert set(found) == set(expect), f"lag {lag} kmer set"
        for k, m in expect.items():
            np.testing.assert_array_equal(found[k], m, err_msg=f"lag {lag} {k}")


def test_default_mode_unchanged_folds_n_to_a():
    # ambig="a" (the default) must keep reference-compatible N->A folding.
    seqs = ["ACNGT"]
    counter = TransitionCounter(lags=[2], n_groups=1)
    enc = ((fastx.encode_seq(s), 0) for s in seqs)
    for chunk in chunk_reads(enc, 2, batch_size=2):
        counter.add_chunk(chunk)
    ref = TransitionCounter(lags=[2], n_groups=1)
    enc2 = ((fastx.encode_seq(s.replace("N", "A")), 0) for s in seqs)
    for chunk in chunk_reads(enc2, 2, batch_size=2):
        ref.add_chunk(chunk)
    np.testing.assert_array_equal(counter.tables[2], ref.tables[2])


def test_check_summarize_cli_ambig(tmp_path):
    # The standalone oracle checker verifies an --ambig skip run exactly
    # (and would catch any drift between kernel and oracle semantics).
    from bear_tpu.counting import check_summarize

    rng = np.random.default_rng(12)
    seqs = seqs_with_ns(rng, 5)
    fa = tmp_path / "in.fa"
    with open(fa, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">s{i}\n{s}\n")
    csv = tmp_path / "in.csv"
    csv.write_text(f"{fa},0,fa\n")
    out_prefix = str(tmp_path / "out")
    cli = [str(csv), out_prefix, "-l", "3", "-r", "--ambig", "skip"]
    summarize_main(build_parser().parse_args(cli))  # mutates its args
    assert check_summarize.main(build_parser().parse_args(cli)) == 0
    # sanity: the checker FAILS if run in default mode against skip outputs
    args_bad = build_parser().parse_args([str(csv), out_prefix, "-l", "3", "-r"])
    with pytest.raises(AssertionError):
        check_summarize.main(args_bad)


def test_check_summarize_rna_reverse(tmp_path):
    # Regression: the checker's complement map was hardcoded ACGT->TGCA and
    # crashed on rna reverse checks (A must pair with U, not T).
    rng = np.random.default_rng(13)
    seqs = ["".join(rng.choice(list("ACGU"), 12)) for _ in range(4)]
    fa = tmp_path / "in.fa"
    with open(fa, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">s{i}\n{s}\n")
    csv = tmp_path / "in.csv"
    csv.write_text(f"{fa},0,fa\n")
    out_prefix = str(tmp_path / "out")
    cli = [str(csv), out_prefix, "-l", "3", "-r", "--alphabet", "rna"]
    summarize_main(build_parser().parse_args(cli))  # mutates its args
    from bear_tpu.counting import check_summarize

    assert check_summarize.main(build_parser().parse_args(cli)) == 0
