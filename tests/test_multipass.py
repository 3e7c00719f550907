"""Multi-pass single-chip counting: the union over row-range passes must
equal the one-pass table exactly (each transition lands in exactly one
pass's range), for any pass count, including ambig pieces and revcomp."""

import numpy as np
import pytest

from bear_tpu.counting import TransitionCounter, chunk_reads, fastx
from bear_tpu.counting.engine import split_ambiguous
from bear_tpu.counting.multipass import (
    MultiPassTransitionCounter,
    count_multipass,
)


def _random_seqs(rng, n, lo=12, hi=30, letters="ACGT"):
    return ["".join(rng.choice(list(letters), rng.integers(lo, hi)))
            for _ in range(n)]


@pytest.mark.parametrize(
    "passes", [1, 2, 3, pytest.param(7, marks=pytest.mark.slow)])
def test_multipass_matches_single_pass(passes):
    rng = np.random.default_rng(31)
    max_lag, n_groups = 5, 2
    seqs = _random_seqs(rng, 12)
    groups = [int(g) for g in rng.integers(0, n_groups, len(seqs))]
    lags = range(1, max_lag + 1)

    ref = TransitionCounter(lags=lags, n_groups=n_groups)
    for chunk in chunk_reads(
        iter([(fastx.encode_seq(s), g) for s, g in zip(seqs, groups)]),
        max_lag, batch_size=4,
    ):
        ref.add_chunk(chunk)

    def factory():
        return chunk_reads(
            iter([(fastx.encode_seq(s), g) for s, g in zip(seqs, groups)]),
            max_lag, batch_size=4,
        )

    mp = count_multipass(factory, lags=lags, n_groups=n_groups, passes=passes)
    for l in lags:
        rows = ref.nonzero_rows(l)
        np.testing.assert_array_equal(np.sort(mp.nonzero_rows(l)),
                                      np.sort(rows), err_msg=f"lag {l} rows")
        np.testing.assert_array_equal(
            mp.counts_for_rows(l, rows),
            ref.tables[l][:, rows, :].transpose(1, 0, 2),
            err_msg=f"lag {l}",
        )
    mp.validate(expected_transitions=sum(len(s) + 1 for s in seqs)
                * len(list(lags)) // len(list(lags)))


def test_multipass_ambig_and_reverse_chunks():
    # Ambig pieces (fresh flags) and chunk-level revcomp stream through the
    # pass-range kernel unchanged.
    rng = np.random.default_rng(32)
    max_lag = 3
    seqs = ["ACGTNAC", "NACGT", "CCGTN"] + _random_seqs(rng, 5, letters="ACGTN")
    lags = range(1, max_lag + 1)

    def stream():
        enc = ((fastx.encode_seq(s, ambig=True), 0) for s in seqs)
        return chunk_reads(split_ambiguous(enc), max_lag, batch_size=3,
                           reverse=True)

    ref = TransitionCounter(lags=lags, n_groups=1)
    for chunk in stream():
        ref.add_chunk(chunk)
    mp = count_multipass(stream, lags=lags, n_groups=1, passes=3)
    for l in lags:
        rows = ref.nonzero_rows(l)
        np.testing.assert_array_equal(
            mp.counts_for_rows(l, rows),
            ref.tables[l][:, rows, :].transpose(1, 0, 2),
        )
        np.testing.assert_array_equal(np.sort(mp.nonzero_rows(l)),
                                      np.sort(rows))


def test_multipass_dataset_and_tsv_roundtrip(tmp_path):
    # Inherited surface: to_dataset and export_tsv work over global keys.
    rng = np.random.default_rng(33)
    seqs = _random_seqs(rng, 6)
    lag = 4

    def factory():
        return chunk_reads(iter([(fastx.encode_seq(s), 0) for s in seqs]),
                           lag, batch_size=4)

    mp = count_multipass(factory, lags=[lag], passes=4)
    ref = TransitionCounter(lags=[lag], n_groups=1)
    for chunk in factory():
        ref.add_chunk(chunk)

    ds = mp.to_dataset(lag)
    ds_ref = ref.to_dataset(lag)
    np.testing.assert_array_equal(ds.kmers, ds_ref.kmers)
    np.testing.assert_array_equal(ds.counts, ds_ref.counts)

    mp.export_tsv(str(tmp_path / "mp"), lag, n_bin_bits=0)
    ref.export_tsv(str(tmp_path / "ref"), lag, n_bin_bits=0)
    assert ((tmp_path / f"mp_lag_{lag}_file_0.tsv").read_bytes()
            == (tmp_path / f"ref_lag_{lag}_file_0.tsv").read_bytes())


def test_multipass_guards():
    with pytest.raises(ValueError, match="exceed int32"):
        MultiPassTransitionCounter(lags=[16], passes=64)
    with pytest.raises(ValueError, match="passes"):
        MultiPassTransitionCounter(lags=[3], passes=0)
    with pytest.raises(ValueError, match="pass_idx"):
        MultiPassTransitionCounter(lags=[3], passes=2).begin_pass(2)


def test_multipass_save_load_state(tmp_path):
    rng = np.random.default_rng(34)
    seqs = _random_seqs(rng, 4)
    lag = 3

    def factory():
        return chunk_reads(iter([(fastx.encode_seq(s), 0) for s in seqs]),
                           lag, batch_size=2)

    mp = count_multipass(factory, lags=[lag], passes=2)
    path = str(tmp_path / "state")
    mp.save_state(path)
    fresh = MultiPassTransitionCounter(lags=[lag], passes=2)
    fresh.load_state(path + ".npz")
    rows = mp.nonzero_rows(lag)
    np.testing.assert_array_equal(fresh.counts_for_rows(lag, rows),
                                  mp.counts_for_rows(lag, rows))


def test_summarize_cli_passes(tmp_path):
    # --passes N writes byte-identical TSVs to the single-pass CLI.
    from bear_tpu.counting.summarize import build_parser, main as summarize_main

    rng = np.random.default_rng(35)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i in range(20):
            f.write(f">r{i}\n" + "".join(rng.choice(list("ACGT"), 35)) + "\n")
    csv = tmp_path / "in.csv"
    csv.write_text(f"{fa},0,fa\n")
    a1 = build_parser().parse_args([str(csv), str(tmp_path / "one"), "-l", "3"])
    a3 = build_parser().parse_args(
        [str(csv), str(tmp_path / "three"), "-l", "3", "--passes", "3"]
    )
    summarize_main(a1)
    summarize_main(a3)
    for l in (1, 2, 3):
        assert ((tmp_path / f"one_lag_{l}_file_0.tsv").read_bytes()
                == (tmp_path / f"three_lag_{l}_file_0.tsv").read_bytes())


def test_run_counting_passes_guards(tmp_path):
    from bear_tpu.counting.summarize import run_counting

    fa = tmp_path / "r.fa"
    fa.write_text(">a\nACGT\n")
    csv = tmp_path / "in.csv"
    csv.write_text(f"{fa},0,fa\n")
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_counting(str(csv), lags=[2], passes=2, kmer_shards=2)
    with pytest.raises(ValueError, match="checkpoint"):
        run_counting(str(csv), lags=[2], passes=2, checkpoint=str(tmp_path / "c"))


@pytest.mark.slow
def test_multipass_lag15_row_codes_int32_edge():
    # The 4^15 row-code edge (VERDICT r2 task 4): the all-T lag-15 context
    # sits at the table's last row, (4^15-1)/3 + 4^15 - 1 = 1,431,655,764 —
    # 0.67 * int32 max. Counting a poly-T read at lag 15 must place exact
    # counts there through the multipass kernel's int32 row math, and the
    # '['-padded prefix rows must land in pass 0's range.
    from bear_tpu.counting.engine import ReadChunk, table_rows

    lag, P = 15, 16
    rlen = 40
    codes = np.full((2, rlen), 3, np.int8)  # TTTT...T
    chunk = ReadChunk(
        codes=codes, lengths=np.full(2, rlen, np.int32),
        skip=np.zeros(2, np.int32), stopped=np.ones(2, bool),
        groups=np.zeros(2, np.int32),
    )
    mp = MultiPassTransitionCounter(lags=[lag], n_groups=1, passes=P,
                                    method="scatter")
    # Only the two passes whose row ranges contain the checked rows: each
    # pass allocates and drains a 1/P slice of the 1.43e9-row table, so all
    # 16 would scan 28 GB of host table for rows 14 of them cannot touch.
    for p in (0, P - 1):
        mp.begin_pass(p)
        mp.add_chunk(chunk)
    mp.finish()

    A = 4
    last_row = (A**lag - 1) // (A - 1) + A**lag - 1
    assert last_row == table_rows(lag) - 1 > np.iinfo(np.int32).max // 2
    got = mp.counts_for_rows(lag, np.array([last_row]))[0, 0]
    # all-T context occurs at transitions lag..rlen per read: next T for
    # j < rlen, stop at j = rlen -> per read (rlen - lag) T's and 1 stop.
    np.testing.assert_array_equal(got, [0, 0, 0, 2 * (rlen - lag), 2])
    # '['-padded full-pad prefix row (row 0) counts the first base of each
    # read exactly once.
    got0 = mp.counts_for_rows(lag, np.array([0]))[0, 0]
    np.testing.assert_array_equal(got0, [0, 0, 0, 2, 0])


@pytest.mark.slow
def test_lag15_demo_small_smoke():
    # The demo harness end-to-end at a CPU-friendly lag (same code path the
    # chip run uses: multipass count -> validate -> oracle -> streamed train
    # -> sparse TableCounter serving).
    import tools.lag15_demo as demo

    assert demo.main(["--lag", "5", "--passes", "3", "--bases", "4e4",
                      "--read-len", "50", "--oracle-reads", "1000"]) == 0
