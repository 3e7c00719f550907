"""Counting-engine oracle: brute-force in-memory Python recount of every
k-mer transition for every lag, forward and reverse-complement, exactly the
oracle of the reference's tests/test_summarize.py:90-159 — plus TSV export
round-trip, long-sequence segmentation, in-memory dataset handoff, and the
native C++ parser against the Python one."""

import os
from collections import defaultdict

import jax.numpy as jnp
import numpy as np
import pytest

from bear_tpu.counting import (
    TransitionCounter,
    chunk_reads,
    context_to_row,
    row_to_context,
    table_rows,
)
from bear_tpu.counting import engine, fastx
from bear_tpu.counting.summarize import main as summarize_main, build_parser

ALPHABET = {"A": 0, "C": 1, "G": 2, "T": 3, "]": 4}
RC = str.maketrans("ACGT", "TGCA")


def revcomp(s):
    return s.translate(RC)[::-1]


def brute_force_counts(seqs_groups, max_lag, n_groups, reverse=False):
    """The reference's oracle (test_summarize.py:90-114)."""
    out = [defaultdict(lambda: np.zeros((n_groups, 5), dtype=np.int64)) for _ in range(max_lag)]
    for seq, group in seqs_groups:
        variants = [seq, revcomp(seq)] if reverse else [seq]
        for s in variants:
            for li in range(max_lag):
                lag = li + 1
                full = "[" * lag + s + "]"
                for j in range(lag, len(full)):
                    out[li][full[j - lag : j]][group][ALPHABET[full[j]]] += 1
    return out


def random_seqs(rng, n, lo=14, hi=18):
    return ["".join(rng.choice(list("ACGT"), rng.integers(lo, hi))) for _ in range(n)]


def assert_tables_match(counter, oracle, max_lag, n_groups):
    for li in range(max_lag):
        lag = li + 1
        table = counter.tables[lag]
        # Every oracle kmer matches; no extra nonzero rows.
        seen_rows = set()
        for kmer, mat in oracle[li].items():
            row = context_to_row(kmer, lag)
            seen_rows.add(row)
            np.testing.assert_array_equal(
                table[:, row, :], mat, err_msg=f"lag {lag} kmer {kmer}"
            )
        nz = set(int(r) for r in counter.nonzero_rows(lag))
        assert nz == {r for r in seen_rows if oracle[li][row_to_context(r, lag)].sum() > 0}


def test_row_codec_roundtrip():
    for lag in (1, 3, 5):
        for row in range(table_rows(lag)):
            assert context_to_row(row_to_context(row, lag), lag) == row


def test_counting_matches_oracle():
    rng = np.random.default_rng(1)
    max_lag, n_groups = 6, 3
    seqs = random_seqs(rng, 12)
    groups = [int(g) for g in rng.integers(0, n_groups, len(seqs))]
    counter = TransitionCounter(lags=range(1, max_lag + 1), n_groups=n_groups)
    enc = ((fastx.encode_seq(s), g) for s, g in zip(seqs, groups))
    for chunk in chunk_reads(enc, max_lag, batch_size=5):
        counter.add_chunk(chunk)
    oracle = brute_force_counts(list(zip(seqs, groups)), max_lag, n_groups)
    assert_tables_match(counter, oracle, max_lag, n_groups)


def test_counting_reverse_matches_oracle():
    rng = np.random.default_rng(2)
    max_lag, n_groups = 4, 2
    seqs = random_seqs(rng, 8)
    groups = [int(g) for g in rng.integers(0, n_groups, len(seqs))]
    counter = TransitionCounter(lags=range(1, max_lag + 1), n_groups=n_groups, reverse=True)
    enc = ((fastx.encode_seq(s), g) for s, g in zip(seqs, groups))
    for chunk in chunk_reads(enc, max_lag, batch_size=3):
        counter.add_chunk(chunk)
    oracle = brute_force_counts(list(zip(seqs, groups)), max_lag, n_groups, reverse=True)
    assert_tables_match(counter, oracle, max_lag, n_groups)


def test_long_sequence_reverse_via_stream():
    # Regression: reverse counting of a contig longer than segment_len used
    # to crash (continuation segments cannot be RC'd chunk-wise). The stream
    # now emits whole-sequence RCs before segmentation.
    rng = np.random.default_rng(7)
    seq = "".join(rng.choice(list("ACGT"), 3000))
    max_lag = 4
    counter = TransitionCounter(lags=[max_lag], n_groups=1)
    for chunk in chunk_reads(
        [(fastx.encode_seq(seq), 0)], max_lag, segment_len=512, reverse=True
    ):
        counter.add_chunk(chunk)
    oracle = brute_force_counts([(seq, 0)], max_lag, 1, reverse=True)
    for kmer, mat in oracle[max_lag - 1].items():
        row = context_to_row(kmer, max_lag)
        np.testing.assert_array_equal(counter.tables[max_lag][:, row, :], mat)


def test_long_sequence_segmentation():
    # A genome-scale sequence split into segments must count identically to
    # the unsegmented oracle (constant-memory streaming).
    rng = np.random.default_rng(3)
    seq = "".join(rng.choice(list("ACGT"), 5000))
    max_lag = 5
    counter = TransitionCounter(lags=range(1, max_lag + 1), n_groups=1)
    for chunk in chunk_reads([(fastx.encode_seq(seq), 0)], max_lag, segment_len=512):
        counter.add_chunk(chunk)
    oracle = brute_force_counts([(seq, 0)], max_lag, 1)
    assert_tables_match(counter, oracle, max_lag, 1)


def test_seq_shorter_than_lag():
    # Sequence shorter than the lag: all contexts are '['-padded.
    seq = "AC"
    counter = TransitionCounter(lags=[5], n_groups=1)
    for chunk in chunk_reads([(fastx.encode_seq(seq), 0)], 5):
        counter.add_chunk(chunk)
    oracle = brute_force_counts([(seq, 0)], 5, 1)
    for kmer, mat in oracle[4].items():
        row = context_to_row(kmer, 5)
        np.testing.assert_array_equal(counter.tables[5][:, row, :], mat)


def test_to_dataset_handoff():
    seqs = ["ACGTACGT", "TTTT"]
    counter = TransitionCounter(lags=[3], n_groups=2)
    enc = [(fastx.encode_seq(s), g) for s, g in zip(seqs, [0, 1])]
    for chunk in chunk_reads(iter(enc), 3):
        counter.add_chunk(chunk)
    ds = counter.to_dataset(3)
    assert ds.counts.shape[1] == 2
    oracle = brute_force_counts(list(zip(seqs, [0, 1])), 3, 2)
    for i, kmer in enumerate(ds.kmers):
        np.testing.assert_array_equal(ds.counts[i], oracle[2][kmer])


def test_summarize_cli_end_to_end(tmp_path):
    # Full CLI: write fasta/fastq inputs, run forward + reverse passes, parse
    # the TSVs back, compare with the oracle (reference test_summarize.py
    # test_main shape).
    rng = np.random.default_rng(4)
    n_files = 4
    groups = [0, 0, 1, 2]
    ftypes = ["fa", "fq", "fq", "fa"]
    all_seqs = []
    csv_lines = []
    for fi in range(n_files):
        seqs = random_seqs(rng, int(rng.integers(2, 5)))
        all_seqs += [(s, groups[fi]) for s in seqs]
        path = tmp_path / f"in_{fi}.{ftypes[fi]}"
        with open(path, "w") as fh:
            for si, s in enumerate(seqs):
                if ftypes[fi] == "fa":
                    fh.write(f">s{fi}_{si}\n{s}\n")
                else:
                    fh.write(f"@s{fi}_{si}\n{s}\n+\n{'F'*len(s)}\n")
        csv_lines.append(f"{path},{groups[fi]},{ftypes[fi]}")
    csv = tmp_path / "infiles.csv"
    csv.write_text("\n".join(csv_lines) + "\n")

    max_lag = 5
    out_prefix = str(tmp_path / "out")
    args = build_parser().parse_args([str(csv), out_prefix, "-l", str(max_lag), "-r"])
    n_bins, n_bins_rev = summarize_main(args)
    assert n_bins >= 1 and n_bins_rev >= 1

    def parse_outputs(prefix, nbins):
        import csv as csvmod
        import json

        found = [dict() for _ in range(max_lag)]
        for li in range(max_lag):
            for b in range(nbins):
                path = f"{prefix}_lag_{li+1}_file_{b}.tsv"
                if not os.path.exists(path):
                    continue
                with open(path, newline="") as fh:
                    for kmer, mat in csvmod.reader(fh, delimiter="\t"):
                        assert kmer not in found[li], "duplicate kmer across shards"
                        found[li][kmer] = np.array(json.loads(mat))
        return found

    fwd = parse_outputs(out_prefix, n_bins)
    rev = parse_outputs(out_prefix + "_rev", n_bins_rev)
    oracle_fwd = brute_force_counts(all_seqs, max_lag, 3)
    oracle_rev = brute_force_counts(all_seqs, max_lag, 3, reverse=True)
    for li in range(max_lag):
        assert set(fwd[li]) == set(k for k, m in oracle_fwd[li].items() if m.sum() > 0)
        for kmer, mat in fwd[li].items():
            np.testing.assert_array_equal(mat, oracle_fwd[li][kmer])
        assert set(rev[li]) == set(k for k, m in oracle_rev[li].items() if m.sum() > 0)
        for kmer, mat in rev[li].items():
            np.testing.assert_array_equal(mat, oracle_rev[li][kmer])


def test_chunks_from_packed_matches_chunk_reads():
    # The vectorized packed-buffer path must count identically to the
    # generator path, including long-read segmentation and reverse.
    from bear_tpu.counting.engine import chunks_from_packed

    rng = np.random.default_rng(12)
    seqs = random_seqs(rng, 10, lo=5, hi=40) + ["".join(rng.choice(list("ACGT"), 700))]
    groups = [int(g) for g in rng.integers(0, 2, len(seqs))]
    max_lag = 4
    codes_list = [fastx.encode_seq(s) for s in seqs]
    codes_flat = np.concatenate(codes_list)
    offsets = np.concatenate([[0], np.cumsum([len(c) for c in codes_list])])

    for reverse in (False, True):
        via_gen = TransitionCounter(lags=[max_lag], n_groups=2)
        for chunk in chunk_reads(
            iter(zip(codes_list, groups)), max_lag, batch_size=4,
            segment_len=128, reverse=reverse,
        ):
            via_gen.add_chunk(chunk)
        via_packed = TransitionCounter(lags=[max_lag], n_groups=2)
        for chunk in chunks_from_packed(
            codes_flat, offsets, np.array(groups), max_lag, batch_size=4,
            segment_len=128, reverse=reverse,
        ):
            via_packed.add_chunk(chunk)
        np.testing.assert_array_equal(
            via_gen.tables[max_lag], via_packed.tables[max_lag],
            err_msg=f"reverse={reverse}",
        )


def test_export_shuffle_preserves_counts(tmp_path):
    import csv as csvmod
    import json

    rng = np.random.default_rng(8)
    seqs = random_seqs(rng, 6)
    tc = TransitionCounter(lags=[3], n_groups=1)
    for chunk in chunk_reads(((fastx.encode_seq(s), 0) for s in seqs), 3):
        tc.add_chunk(chunk)
    p_plain = tc.export_tsv(str(tmp_path / "a"), 3)[0]
    p_shuf = tc.export_tsv(str(tmp_path / "b"), 3, shuffle=True)[0]

    def rows(p):
        with open(p, newline="") as fh:
            return [(k, tuple(map(tuple, json.loads(m)))) for k, m in csvmod.reader(fh, delimiter="\t")]

    a, b = rows(p_plain), rows(p_shuf)
    assert a != b  # order differs
    assert sorted(a) == sorted(b)  # contents identical


def test_packed_empty_and_degenerate_inputs():
    from bear_tpu.counting.engine import chunks_from_packed

    # zero reads: yields nothing (matches the generator path)
    assert list(chunks_from_packed(np.zeros(0, np.int8), np.array([0]), 0, 3)) == []
    # segment_len < max_lag would read the previous read's tail as context
    with pytest.raises(ValueError, match="segment_len"):
        list(chunks_from_packed(np.zeros(9, np.int8), np.array([0, 9]), 0, 5, segment_len=3))
    with pytest.raises(ValueError, match="segment_len"):
        list(chunk_reads([(np.zeros(9, np.int8), 0)], 5, segment_len=3))


def test_state_checkpoint_and_validate(tmp_path):
    rng = np.random.default_rng(5)
    seqs = random_seqs(rng, 6)
    tc = TransitionCounter(lags=[1, 3], n_groups=1)
    enc = [(fastx.encode_seq(s), 0) for s in seqs]
    for chunk in chunk_reads(iter(enc), 3, batch_size=4):
        tc.add_chunk(chunk)
    n_transitions = sum(len(s) + 1 for s in seqs)
    totals = tc.validate(expected_transitions=n_transitions)
    assert set(totals.values()) == {n_transitions}

    path = str(tmp_path / "counts.npz")
    tc.save_state(path)
    tc2 = TransitionCounter.load_state(path)
    for l in (1, 3):
        np.testing.assert_array_equal(tc.tables[l], tc2.tables[l])
    # resume: counting more after load accumulates correctly
    for chunk in chunk_reads(iter([(fastx.encode_seq("ACGT"), 0)]), 3, batch_size=4):
        tc2.add_chunk(chunk)
    tc2.validate(expected_transitions=n_transitions + 5)

    with pytest.raises(AssertionError, match="count conservation"):
        tc.validate(expected_transitions=n_transitions + 1)


def test_tsv_roundtrip_to_training(tmp_path):
    # summarize TSV output loads through the dense dataloader and matches the
    # in-memory dataset handoff exactly (the full data-contract loop).
    from bear_tpu.data import load_dense

    rng = np.random.default_rng(6)
    seqs = random_seqs(rng, 8)
    groups = [int(g) for g in rng.integers(0, 2, len(seqs))]
    tc = TransitionCounter(lags=[4], n_groups=2)
    enc = [(fastx.encode_seq(s), g) for s, g in zip(seqs, groups)]
    for chunk in chunk_reads(iter(enc), 4, batch_size=4):
        tc.add_chunk(chunk)
    paths = tc.export_tsv(str(tmp_path / "out"), 4, n_bin_bits=1)
    ds_mem = tc.to_dataset(4)
    parts = [load_dense(p, "dna", 2) for p in paths if os.path.getsize(p)]
    ds_tsv = parts[0]
    for p in parts[1:]:
        ds_tsv = ds_tsv.concat(p)
    assert set(ds_tsv.kmers) == set(ds_mem.kmers)
    idx_mem = {k: i for i, k in enumerate(ds_mem.kmers)}
    for i, k in enumerate(ds_tsv.kmers):
        np.testing.assert_array_equal(ds_tsv.counts[i], ds_mem.counts[idx_mem[k]])


def test_check_summarize_cli(tmp_path):
    # The standalone oracle checker passes on real output and fails on
    # corrupted output.
    from bear_tpu.counting import check_summarize

    rng = np.random.default_rng(9)
    seqs = random_seqs(rng, 3)
    fa = tmp_path / "in.fa"
    fa.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))
    csv_path = tmp_path / "infiles.csv"
    csv_path.write_text(f"{fa},0,fa\n")
    out_prefix = str(tmp_path / "out")
    args = build_parser().parse_args([str(csv_path), out_prefix, "-l", "3", "-r"])
    summarize_main(args)
    args = build_parser().parse_args([str(csv_path), out_prefix, "-l", "3", "-r"])
    assert check_summarize.main(args) == 0

    # Corrupt one count and expect the checker to catch it.
    path = f"{out_prefix}_lag_1_file_0.tsv"
    lines = open(path).read().splitlines()
    kmer, mat = lines[0].split("\t")
    import json as _json

    m = _json.loads(mat)
    m[0][0] += 1
    lines[0] = kmer + "\t" + _json.dumps(m, separators=(",", ":"))
    open(path, "w").write("\n".join(lines) + "\n")
    with pytest.raises(AssertionError):
        check_summarize.main(args)


def test_native_parser_matches_python(tmp_path):
    from bear_tpu.counting import _native_build

    native = _native_build.load()
    if native is None:
        pytest.skip("native encoder unavailable (no compiler)")
    fa = tmp_path / "x.fa"
    fa.write_text(">a desc\nACGTNacgt\nGGG\n>b\nTTTT\n")
    fq = tmp_path / "x.fq"
    fq.write_text("@a\nACGT\n+\nFFFF\n@b\nGG\n+\nFF\n")
    # CRLF (Windows-edited inputs) and gzip variants of the same records.
    fa_crlf = tmp_path / "crlf.fa"
    fa_crlf.write_bytes(fa.read_text().replace("\n", "\r\n").encode())
    import gzip as _gzip

    fq_gz = tmp_path / "x.fq.gz"
    with _gzip.open(fq_gz, "wt") as fh:
        fh.write(fq.read_text())
    gz_cases = (
        [(fq_gz, "fq")]
        if getattr(native, "supports_gzip", False)
        else []
    )
    for path, ftype in [(fa, "fa"), (fq, "fq"), (fa_crlf, "fa")] + gz_cases:
        via_native = list(native.stream_encoded(str(path), ftype, 7))
        via_python = [
            (fastx.encode_seq(seq), 7) for _, seq in fastx.iter_seqs(str(path), ftype)
        ]
        assert len(via_native) == len(via_python)
        for (a, ga), (b, gb) in zip(via_native, via_python):
            np.testing.assert_array_equal(a, b)
            assert ga == gb == 7


def test_packed_native_fill_matches_numpy_fallback(monkeypatch):
    # The C++ bear_fill_chunks row copy and the NumPy gather fallback must
    # produce identical chunks (incl. reverse-complement rows), and wide
    # segments must shrink the row count under the element budget.
    from bear_tpu.counting import engine, fastx as fastx_mod
    from bear_tpu.counting.engine import chunks_from_packed

    rng = np.random.default_rng(21)
    lens = [7, 300, 33, 900, 12]
    codes_list = [rng.integers(0, 4, n).astype(np.int8) for n in lens]
    codes_flat = np.concatenate(codes_list)
    offsets = np.concatenate([[0], np.cumsum(lens)])

    kwargs = dict(groups=0, max_lag=4, batch_size=4, segment_len=128,
                  reverse=True, max_chunk_elems=512)
    native_chunks = list(chunks_from_packed(codes_flat, offsets, **kwargs))
    monkeypatch.setattr(fastx_mod, "_native", lambda: None)
    numpy_chunks = list(chunks_from_packed(codes_flat, offsets, **kwargs))

    assert len(native_chunks) == len(numpy_chunks)
    for a, b in zip(native_chunks, numpy_chunks):
        np.testing.assert_array_equal(a.codes, b.codes)
        np.testing.assert_array_equal(a.lengths, b.lengths)
        np.testing.assert_array_equal(a.skip, b.skip)
        np.testing.assert_array_equal(a.stopped, b.stopped)
        # budget: 128-wide (padded) segments allow at most 4 rows of 128
        assert a.codes.size <= 512


def test_chunk_reads_all_zero_length_rows():
    # A pending batch of only empty reads must emit a (B, 0) chunk, not
    # divide by zero (regression: element-budget emit()).
    chunks = list(chunk_reads([(np.zeros(0, np.int8), 0)], max_lag=3))
    assert len(chunks) == 1 and chunks[0].codes.shape[1] == 0
    tc = TransitionCounter(lags=[3])
    tc.add_chunk(chunks[0])
    assert tc.validate(expected_transitions=1)[3] == 1  # one '$' transition


def test_packed_mixed_reads_and_contig_padding_bounded():
    # Short reads queued ahead of a long contig must pack at their own width,
    # not the contig's (regression: lookahead-width inflation).
    from bear_tpu.counting.engine import chunks_from_packed

    rng = np.random.default_rng(31)
    lens = [150] * 1023 + [300_000]
    codes_flat = rng.integers(0, 4, sum(lens)).astype(np.int8)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    budget = 1 << 25
    chunks = list(chunks_from_packed(codes_flat, offsets, 0, 13,
                                     batch_size=1024, segment_len=1 << 16,
                                     max_chunk_elems=budget))
    assert chunks[0].codes.shape[1] == 192  # 150 -> 64-aligned pad, not 65536
    for ch in chunks:
        assert ch.codes.size <= budget
    assert sum(int(c.lengths.sum()) for c in chunks) >= sum(lens)  # overlaps add


def test_export_tsv_native_matches_python_fallback(tmp_path, monkeypatch):
    # The native bear_format_tsv rows must be byte-identical to the per-row
    # Python fallback (including multi-group matrices and multi-digit counts).
    from bear_tpu.counting import fastx as fastx_mod

    rng = np.random.default_rng(12)
    seqs = random_seqs(rng, 10)
    groups = [int(g) for g in rng.integers(0, 3, len(seqs))]
    tc = TransitionCounter(lags=[3], n_groups=3)
    enc = [(fastx.encode_seq(s), g) for s, g in zip(seqs, groups)]
    for chunk in chunk_reads(iter(enc), 3, batch_size=4):
        tc.add_chunk(chunk)
    # force a count wide enough to exercise multi-digit formatting
    tc._host[3][0] += 123456789012
    p_native = tc.export_tsv(str(tmp_path / "nat"), 3, n_bin_bits=1)
    monkeypatch.setattr(fastx_mod, "_NATIVE", False)  # _native() -> None
    p_py = tc.export_tsv(str(tmp_path / "py"), 3, n_bin_bits=1)
    for a, b in zip(p_native, p_py):
        assert open(a, "rb").read() == open(b, "rb").read()


def test_decode_rows_matches_host_codec():
    # Device row->codes decode equals rows_to_contexts + encode_kmers for
    # every row of small tables and random rows of a lag-13 table.
    from bear_tpu.counting.engine import decode_rows, rows_to_contexts, table_rows
    from bear_tpu.ops import alphabets

    for lag in (1, 2, 4):
        rows = np.arange(table_rows(lag))
        want = alphabets.encode_kmers(rows_to_contexts(rows, lag), "dna")
        got = np.asarray(decode_rows(jnp.asarray(rows, jnp.int32), lag))
        np.testing.assert_array_equal(got, want)
    rng = np.random.default_rng(0)
    rows = rng.integers(0, table_rows(13), size=1000)
    want = alphabets.encode_kmers(rows_to_contexts(rows, 13), "dna")
    got = np.asarray(decode_rows(jnp.asarray(rows, jnp.int32), 13))
    np.testing.assert_array_equal(got, want)


def test_to_device_dataset_matches_host_handoff():
    # The on-device handoff (no strings, no host round trip) must produce the
    # same dataset as to_dataset, both from the resident device buffer and
    # from the host accumulator after a flush.
    rng = np.random.default_rng(21)
    seqs = random_seqs(rng, 12)
    groups = [int(g) for g in rng.integers(0, 2, len(seqs))]
    tc = TransitionCounter(lags=[4], n_groups=2)
    enc = [(fastx.encode_seq(s), g) for s, g in zip(seqs, groups)]
    for chunk in chunk_reads(iter(enc), 4, batch_size=4):
        tc.add_chunk(chunk)

    # device-resident path (host accumulator still empty)
    codes_d, counts_d = tc.to_device_dataset(4, dtype=jnp.float64)
    ds = tc.to_dataset(4)  # flushes
    np.testing.assert_array_equal(np.asarray(codes_d), ds.codes)
    np.testing.assert_array_equal(np.asarray(counts_d), ds.counts)

    # host-accumulator fallback path (after the flush above)
    codes_h, counts_h = tc.to_device_dataset(4, dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(codes_h), ds.codes)
    np.testing.assert_array_equal(np.asarray(counts_h), ds.counts)


@pytest.mark.slow
def test_train_on_device_dataset_matches_host():
    # Training on the device handoff gives bit-identical losses/params to
    # training on the host dataset.
    from bear_tpu.models import bear_net, get_ar_func

    rng = np.random.default_rng(22)
    seqs = random_seqs(rng, 12)
    tc = TransitionCounter(lags=[3], n_groups=1)
    for chunk in chunk_reads(((fastx.encode_seq(s), 0) for s in seqs), 3):
        tc.add_chunk(chunk)
    codes_d, counts_d = tc.to_device_dataset(3, dtype=jnp.float64)
    ds = tc.to_dataset(3)
    ar = get_ar_func("linear", 3, 4, dtype=jnp.float64)
    kw = dict(num_kmers=ds.num_kmers, ar_func=ar, batch_size=8, epochs=3,
              learning_rate=0.01, seed=0, dtype=jnp.float64)
    res_d = bear_net.train(codes_d, counts_d[:, 0], **kw)
    res_h = bear_net.train(ds.codes, ds.counts[:, 0].astype(np.float64), **kw)
    np.testing.assert_allclose(res_d.losses, res_h.losses, rtol=0, atol=0)
    for a, b in zip(res_d.params_list, res_h.params_list):
        np.testing.assert_array_equal(a, b)
    # evaluation also accepts device arrays
    out_d = bear_net.evaluation(codes_d, counts_d, 0, 0, "dna", res_d.h, ar,
                                res_d.params["ar"], [1.0], dtype=jnp.float64)
    out_h = bear_net.evaluation(ds.codes, ds.counts, 0, 0, "dna", res_h.h, ar,
                                res_h.params["ar"], [1.0], dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(out_d[3]), np.asarray(out_h[3]))


def test_to_device_dataset_guards(monkeypatch):
    # (a) float64 without x64 must refuse big counts (astype would silently
    # produce float32); (b) an alphabet with a different residue count than
    # the table base must be rejected by both handoffs.
    import jax as _jax

    tc = TransitionCounter(lags=[2], n_groups=1)
    for ch in chunk_reads(iter([(fastx.encode_seq("ACGTACG"), 0)]), 2):
        tc.add_chunk(ch)
    tc.flush()
    tc._host[2][0] += (1 << 24) + 3
    _jax.config.update("jax_enable_x64", False)
    try:
        with pytest.raises(ValueError, match="x64"):
            tc.to_device_dataset(2, dtype=jnp.float64)
    finally:
        _jax.config.update("jax_enable_x64", True)
    codes, counts = tc.to_device_dataset(2, dtype=jnp.float64)
    assert int(np.asarray(counts).max()) == int(tc.tables[2].max())

    with pytest.raises(ValueError, match="base-4"):
        tc.to_dataset(2, alphabet="prot")
    with pytest.raises(ValueError, match="base-4"):
        tc.to_device_dataset(2, alphabet="prot")


def test_stale_shard_files_removed(tmp_path):
    # A re-run with fewer shards must remove the previous run's higher-
    # numbered shard files (glob consumers would silently merge them).
    rng = np.random.default_rng(3)
    seqs = random_seqs(rng, 20)
    tc = TransitionCounter(lags=[3], n_groups=1)
    for ch in chunk_reads(((fastx.encode_seq(s), 0) for s in seqs), 3):
        tc.add_chunk(ch)
    tc.export_tsv(str(tmp_path / "o"), 3, n_bin_bits=2)  # files 0-3
    assert (tmp_path / "o_lag_3_file_3.tsv").exists()
    tc.export_tsv(str(tmp_path / "o"), 3, n_bin_bits=0)  # file 0 only
    assert (tmp_path / "o_lag_3_file_0.tsv").exists()
    assert not (tmp_path / "o_lag_3_file_1.tsv").exists()
    assert not (tmp_path / "o_lag_3_file_3.tsv").exists()


def test_save_state_extension_symmetry(tmp_path):
    tc = TransitionCounter(lags=[2], n_groups=1)
    for ch in chunk_reads(iter([(fastx.encode_seq("ACGTT"), 0)]), 2):
        tc.add_chunk(ch)
    tc.save_state(str(tmp_path / "ckpt"))  # no .npz given
    tc2 = TransitionCounter.load_state(str(tmp_path / "ckpt"))  # still loads
    np.testing.assert_array_equal(tc.tables[2], tc2.tables[2])


def test_reverse_segmented_chunk_rejected_before_add():
    tc = TransitionCounter(lags=[2], n_groups=1, reverse=True)
    bad = engine.ReadChunk(
        codes=np.zeros((1, 8), np.int8),
        lengths=np.array([8], np.int32),
        skip=np.array([2], np.int32),  # continuation segment
        stopped=np.array([True]),
        groups=np.array([0], np.int32),
    )
    with pytest.raises(ValueError, match="whole-read"):
        tc.add_chunk(bad)
    tc.validate(expected_transitions=0)  # nothing was counted


def test_negative_group_rejected(tmp_path):
    fa = tmp_path / "r.fa"
    fa.write_text(">a\nACGT\n")
    csv_p = tmp_path / "in.csv"
    csv_p.write_text(f"{fa},-1,fa\n")
    with pytest.raises(ValueError, match="negative group"):
        fastx.read_input_csv(str(csv_p))


def test_exact_count_limit_guard_dtypes():
    from bear_tpu.counting.engine import _exact_count_limit

    assert _exact_count_limit(jnp.float32) == 1 << 24
    assert _exact_count_limit(jnp.bfloat16) == 1 << 8
    assert _exact_count_limit(jnp.int32) == (1 << 31) - 1
    tc = TransitionCounter(lags=[2], n_groups=1)
    for ch in chunk_reads(iter([(fastx.encode_seq("ACGTACG"), 0)]), 2):
        tc.add_chunk(ch)
    tc.flush()
    tc._host[2][0] += 300  # beyond bf16's 2^8 exact range
    with pytest.raises(ValueError, match="bfloat16"):
        tc.to_device_dataset(2, dtype=jnp.bfloat16)


def test_check_summarize_protein_and_nf(tmp_path):
    from bear_tpu.counting.check_summarize import check
    from bear_tpu.counting.summarize import build_parser, main as summarize_main
    from bear_tpu.ops import alphabets as _alpha

    rng = np.random.default_rng(9)
    res = _alpha.residues("prot")
    fa = tmp_path / "p.fa"
    with open(fa, "w") as f:
        for i in range(10):
            f.write(f">p{i}\n" + "".join(rng.choice(list(res), 12)) + "\n")
    csv_p = tmp_path / "in.csv"
    csv_p.write_text(f"{fa},0,fa\n")
    summarize_main(build_parser().parse_args(
        [str(csv_p), str(tmp_path / "o"), "-l", "2", "--alphabet", "prot"]
    ))
    assert check(str(csv_p), str(tmp_path / "o"), 2, reverse=False,
                 alphabet="prot") == 0
    with pytest.raises(ValueError, match="nothing to check"):
        check(str(csv_p), str(tmp_path / "o"), 2, reverse=False,
              alphabet="prot", skip_forward=True)


def test_gzip_inputs_match_plain(tmp_path, monkeypatch):
    # Transparent gzip input (new capability: the reference's stage 1 opens
    # inputs with plain open(), summarize.py:201). Exercises all three
    # routes: native+zlib, native-without-zlib (gz file falls back to the
    # Python reader), and pure-Python.
    import gzip

    rng = np.random.default_rng(11)
    fa_txt = "".join(f">s{i}\n{s}\n" for i, s in enumerate(random_seqs(rng, 4)))
    fq_txt = "".join(
        f"@q{i}\n{s}\n+\n{'F' * len(s)}\n" for i, s in enumerate(random_seqs(rng, 3))
    )
    (tmp_path / "a.fa").write_text(fa_txt)
    (tmp_path / "b.fq").write_text(fq_txt)
    with gzip.open(tmp_path / "a.fa.gz", "wt") as fh:
        fh.write(fa_txt)
    with gzip.open(tmp_path / "b.fq.gz", "wt") as fh:
        fh.write(fq_txt)

    assert fastx.is_gzip(str(tmp_path / "a.fa.gz"))
    assert not fastx.is_gzip(str(tmp_path / "a.fa"))
    assert list(fastx.iter_fasta(str(tmp_path / "a.fa.gz"))) == list(
        fastx.iter_fasta(str(tmp_path / "a.fa"))
    )
    assert list(fastx.iter_fastq(str(tmp_path / "b.fq.gz"))) == list(
        fastx.iter_fastq(str(tmp_path / "b.fq"))
    )

    def write_csv(name, files):
        p = tmp_path / name
        p.write_text("\n".join(f"{tmp_path / f},{g},{t}" for f, g, t in files) + "\n")
        return str(p)

    csv_plain = write_csv("plain.csv", [("a.fa", 0, "fa"), ("b.fq", 1, "fq")])
    csv_gz = write_csv("gz.csv", [("a.fa.gz", 0, "fa"), ("b.fq.gz", 1, "fq")])

    from bear_tpu.counting.summarize import run_counting

    max_lag = 4
    ref_tables = run_counting(csv_plain, lags=range(1, max_lag + 1)).tables

    def assert_same(counter):
        for l in range(1, max_lag + 1):
            np.testing.assert_array_equal(counter.tables[l], ref_tables[l])

    assert_same(run_counting(csv_gz, lags=range(1, max_lag + 1)))

    native = fastx._native()
    if native is not None:
        # Simulate a zlib-less native build: gz files must fall back to the
        # Python reader while plain files keep the native path.
        monkeypatch.setattr(native, "supports_gzip", False)
        assert_same(run_counting(csv_gz, lags=range(1, max_lag + 1)))
        monkeypatch.undo()

    monkeypatch.setattr(fastx, "_NATIVE", False)  # pure-Python route
    assert_same(run_counting(csv_gz, lags=range(1, max_lag + 1)))


def test_gzip_truncated_raises(tmp_path):
    # A truncated .gz must fail loudly on every route, not parse as a
    # silently shorter file.
    import gzip

    rng = np.random.default_rng(5)
    fq_txt = "".join(
        f"@q{i}\n{s}\n+\n{'F' * len(s)}\n" for i, s in enumerate(random_seqs(rng, 200))
    )
    blob = gzip.compress(fq_txt.encode())
    bad = tmp_path / "trunc.fq.gz"
    bad.write_bytes(blob[: len(blob) // 2])

    native = fastx._native()
    if native is not None and native.supports_gzip:
        with pytest.raises(OSError, match="truncated or corrupt"):
            native.parse(str(bad), "fq")
    with pytest.raises(EOFError):
        list(fastx.iter_fastq(str(bad)))


def test_counting_checkpoint_resume(tmp_path):
    # --checkpoint: a job killed between files resumes from the last
    # completed file and ends with exactly the full-run tables.
    from bear_tpu.counting.summarize import run_counting

    rng = np.random.default_rng(13)
    csv_lines = []
    all_seqs = []
    for fi in range(3):
        seqs = random_seqs(rng, 3)
        all_seqs += [(s, fi % 2) for s in seqs]
        p = tmp_path / f"f{fi}.fa"
        p.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))
        csv_lines.append(f"{p},{fi % 2},fa")
    full_csv = tmp_path / "all.csv"
    full_csv.write_text("\n".join(csv_lines) + "\n")
    part_csv = tmp_path / "part.csv"
    part_csv.write_text("\n".join(csv_lines[:2]) + "\n")

    lag = 3
    ckpt = str(tmp_path / "count.ckpt")
    # "crash" after two files (simulated by only feeding two)...
    run_counting(str(part_csv), lags=range(1, lag + 1), checkpoint=ckpt)
    # ...then resume with the full file list: only f2 is recounted.
    resumed = run_counting(str(full_csv), lags=range(1, lag + 1), checkpoint=ckpt)
    oracle = brute_force_counts(all_seqs, lag, 2)
    assert_tables_match(resumed, oracle, lag, 2)

    # a second identical invocation is a no-op (all files done)
    again = run_counting(str(full_csv), lags=range(1, lag + 1), checkpoint=ckpt)
    assert_tables_match(again, oracle, lag, 2)

    # mismatched parameters are refused
    with pytest.raises(ValueError, match="different counting parameters"):
        run_counting(str(full_csv), lags=range(1, lag + 1), reverse=True,
                     checkpoint=ckpt)


def test_counting_fuzz_configurations(tmp_path):
    # Randomized end-to-end sweep over configuration space: file formats
    # (fa/fq, gz/plain), groups, non-contiguous lag sets, reverse, and
    # segmentation — every combination must match the brute-force oracle.
    import gzip

    from bear_tpu.counting.summarize import run_counting

    rng = np.random.default_rng(42)
    for trial in range(3):
        n_files = int(rng.integers(2, 5))
        n_groups = int(rng.integers(1, 4))
        lags = sorted(set(int(l) for l in rng.integers(1, 7, size=3)))
        reverse = bool(rng.integers(0, 2))
        seg = int(rng.choice([64, 1 << 16]))
        d = tmp_path / f"t{trial}"
        d.mkdir()
        csv_lines, all_seqs = [], []
        for fi in range(n_files):
            seqs = random_seqs(rng, int(rng.integers(1, 5)), lo=3, hi=120)
            g = int(rng.integers(0, n_groups))
            all_seqs += [(s, g) for s in seqs]
            ftype = rng.choice(["fa", "fq"])
            use_gz = bool(rng.integers(0, 2))
            name = f"f{fi}.{ftype}" + (".gz" if use_gz else "")
            body = (
                "".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs))
                if ftype == "fa"
                else "".join(f"@s{i}\n{s}\n+\n{'F'*len(s)}\n" for i, s in enumerate(seqs))
            )
            p = d / name
            if use_gz:
                with gzip.open(p, "wt") as fh:
                    fh.write(body)
            else:
                p.write_text(body)
            csv_lines.append(f"{p},{g},{ftype}")
        csv = d / "in.csv"
        csv.write_text("\n".join(csv_lines) + "\n")
        counter = run_counting(str(csv), lags=lags, reverse=reverse,
                               segment_len=seg)
        max_lag = max(lags)
        oracle = brute_force_counts(all_seqs, max_lag, counter.n_groups,
                                    reverse=reverse)
        for lag in lags:
            table = counter.tables[lag]
            for kmer, mat in oracle[lag - 1].items():
                row = context_to_row(kmer, lag)
                np.testing.assert_array_equal(
                    table[:, row, :], mat,
                    err_msg=f"trial {trial} lag {lag} kmer {kmer}",
                )
            assert int(table.sum()) == sum(
                m.sum() for m in oracle[lag - 1].values()
            )


def test_check_groups_guard_all_counters():
    # Out-of-range group ids would land IN-BOUNDS inside another lag's
    # table region (no guard rows between lags) and silently corrupt
    # counts; every counter's add_chunk must reject them up front.
    import jax
    import pytest
    from jax.sharding import Mesh

    from bear_tpu.counting.engine import ReadChunk, TransitionCounter
    from bear_tpu.counting.multipass import MultiPassTransitionCounter
    from bear_tpu.counting.sparse import SparseTransitionCounter
    from bear_tpu.parallel.counting import (
        KmerShardedTransitionCounter,
        ShardedTransitionCounter,
    )

    rng = np.random.default_rng(0)
    B = 4
    chunk = ReadChunk(
        codes=rng.integers(0, 4, (B, 10)).astype(np.int8),
        lengths=np.full(B, 10, np.int32),
        skip=np.zeros(B, np.int32),
        stopped=np.ones(B, bool),
        groups=np.array([0, 1, 2, 0], np.int32),  # id 2 >= n_groups=2
    )
    mesh = Mesh(np.array(jax.devices()[:2]), ("x",))
    counters = [
        TransitionCounter(lags=[2, 3], n_groups=2),
        ShardedTransitionCounter(mesh, lags=[2, 3], n_groups=2, axis="x"),
        KmerShardedTransitionCounter(mesh, lags=[2, 3], n_groups=2, axis="x"),
        MultiPassTransitionCounter(lags=[2, 3], n_groups=2, passes=2),
        SparseTransitionCounter(lags=[2, 3], n_groups=2),
    ]
    for tc in counters:
        with pytest.raises(ValueError, match="group ids"):
            tc.add_chunk(chunk)


def test_write_tsv_shards_fallback_matches_native(tmp_path, monkeypatch):
    # The pure-Python shard writer (used when the native formatter is
    # absent) must produce byte-identical shards via its per-bin passes
    # (it must NOT open all 2^n_bin_bits handles at once — fd limits).
    from bear_tpu.counting import engine, fastx

    rng = np.random.default_rng(3)
    lag = 3
    rows = np.unique(rng.integers(0, engine.table_rows(lag), 50))
    counts = rng.integers(0, 100, (len(rows), 2, 5)).astype(np.int64)

    native_dir = tmp_path / "native"
    native_dir.mkdir()
    p_native = engine.write_tsv_shards(
        str(native_dir / "x"), lag, rows, counts, n_bin_bits=2, seed=7)

    monkeypatch.setattr(fastx, "_native", lambda: None)
    fb_dir = tmp_path / "fb"
    fb_dir.mkdir()
    p_fb = engine.write_tsv_shards(
        str(fb_dir / "x"), lag, rows, counts, n_bin_bits=2, seed=7)
    assert len(p_native) == len(p_fb) == 4
    for a, b in zip(p_native, p_fb):
        assert open(a, "rb").read() == open(b, "rb").read()
