"""Sharded counting: N-device result == 1-device result, exactly."""

import jax
import numpy as np
import pytest

from bear_tpu.counting import TransitionCounter, chunk_reads
from bear_tpu.counting import fastx
from bear_tpu.parallel import data_parallel_mesh
from bear_tpu.parallel.counting import ShardedTransitionCounter

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@needs_8
def test_sharded_matches_single_device():
    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("ACGT"), rng.integers(20, 60))) for _ in range(37)]
    groups = [int(g) for g in rng.integers(0, 2, len(seqs))]
    lags = [1, 2, 4]

    single = TransitionCounter(lags=lags, n_groups=2)
    mesh = data_parallel_mesh(8)
    sharded = ShardedTransitionCounter(mesh, lags=lags, n_groups=2)
    for tc in (single, sharded):
        enc = ((fastx.encode_seq(s), g) for s, g in zip(seqs, groups))
        for chunk in chunk_reads(enc, max(lags), batch_size=16):
            tc.add_chunk(chunk)

    t1, t8 = single.tables, sharded.tables
    for l in lags:
        np.testing.assert_array_equal(t1[l], t8[l])


@needs_8
def test_sharded_long_contig_reverse_stream():
    # Long-contig reverse counting via the stream path, sharded == single.
    rng = np.random.default_rng(3)
    seq = "".join(rng.choice(list("ACGT"), 2000))
    single = TransitionCounter(lags=[3], n_groups=1)
    sharded = ShardedTransitionCounter(data_parallel_mesh(8), lags=[3], n_groups=1)
    for tc in (single, sharded):
        for chunk in chunk_reads(
            [(fastx.encode_seq(seq), 0)], 3, segment_len=256, reverse=True
        ):
            tc.add_chunk(chunk)
    np.testing.assert_array_equal(single.tables[3], sharded.tables[3])


@needs_8
def test_sharded_reverse_and_small_batches():
    # Batches smaller than the device count must pad and still count exactly.
    seqs = ["ACGTACG", "TT"]
    single = TransitionCounter(lags=[3], n_groups=1, reverse=True)
    sharded = ShardedTransitionCounter(
        data_parallel_mesh(8), lags=[3], n_groups=1, reverse=True
    )
    for tc in (single, sharded):
        enc = ((fastx.encode_seq(s), 0) for s in seqs)
        for chunk in chunk_reads(enc, 3, batch_size=4):
            tc.add_chunk(chunk)
    np.testing.assert_array_equal(single.tables[3], sharded.tables[3])


@needs_8
def test_kmer_sharded_matches_single_device():
    # Tensor-parallel counting (table rows range-split over the mesh) must
    # reproduce the single-device tables exactly, including multi-group,
    # '['-prefix and '$'-stop rows.
    from jax.sharding import Mesh
    from bear_tpu.parallel.counting import KmerShardedTransitionCounter

    rng = np.random.default_rng(11)
    seqs = ["".join(rng.choice(list("ACGT"), rng.integers(15, 50))) for _ in range(41)]
    groups = [int(g) for g in rng.integers(0, 2, len(seqs))]
    lags = [1, 3, 5]

    single = TransitionCounter(lags=lags, n_groups=2)
    mesh = Mesh(np.array(jax.devices()[:8]), ("kmer",))
    sharded = KmerShardedTransitionCounter(mesh, lags=lags, n_groups=2)
    n_transitions = 0
    for tc in (single, sharded):
        enc = ((fastx.encode_seq(s), g) for s, g in zip(seqs, groups))
        for chunk in chunk_reads(enc, max(lags), batch_size=16):
            tc.add_chunk(chunk)
    n_transitions = sum(len(s) + 1 for s in seqs)

    sharded.validate(expected_transitions=n_transitions)
    for l in lags:
        rows1 = single.nonzero_rows(l)
        rows8 = sharded.nonzero_rows(l)
        np.testing.assert_array_equal(rows1, rows8)
        want = single.tables[l][:, rows1, :].transpose(1, 0, 2)
        got = sharded.counts_for_rows(l, rows8)
        np.testing.assert_array_equal(got, want)
    # dataset handoff parity
    ds1 = single.to_dataset(5)
    ds8 = sharded.to_dataset(5)
    np.testing.assert_array_equal(ds1.codes, ds8.codes)
    np.testing.assert_array_equal(ds1.counts, ds8.counts)


@needs_8
def test_kmer_sharded_2d_mesh_replicas_not_double_counted():
    # On a mesh with an axis beyond the kmer axis, each row slice is
    # replicated across the extra axis; flush must drain ONE replica per
    # slice or every count doubles (the count-conservation invariant).
    from jax.sharding import Mesh
    from bear_tpu.parallel.counting import KmerShardedTransitionCounter

    rng = np.random.default_rng(17)
    seqs = ["".join(rng.choice(list("ACGT"), 25)) for _ in range(12)]
    single = TransitionCounter(lags=[3], n_groups=1)
    mesh2d = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                  ("data", "kmer"))
    sharded = KmerShardedTransitionCounter(mesh2d, lags=[3], n_groups=1)
    for tc in (single, sharded):
        enc = ((fastx.encode_seq(s), 0) for s in seqs)
        for chunk in chunk_reads(enc, 3, batch_size=8):
            tc.add_chunk(chunk)
    sharded.validate(expected_transitions=sum(len(s) + 1 for s in seqs))
    rows = single.nonzero_rows(3)
    np.testing.assert_array_equal(rows, sharded.nonzero_rows(3))
    np.testing.assert_array_equal(
        sharded.counts_for_rows(3, rows),
        single.tables[3][:, rows, :].transpose(1, 0, 2))


@needs_8
def test_counts_for_rows_duplicate_rows():
    # Duplicate entries in the rows query must each get the row's counts
    # (searchsorted previously hit only the first occurrence).
    from jax.sharding import Mesh
    from bear_tpu.parallel.counting import KmerShardedTransitionCounter

    rng = np.random.default_rng(19)
    seqs = ["".join(rng.choice(list("ACGT"), 20)) for _ in range(6)]
    mesh = Mesh(np.array(jax.devices()[:8]), ("kmer",))
    sharded = KmerShardedTransitionCounter(mesh, lags=[2], n_groups=1)
    enc = ((fastx.encode_seq(s), 0) for s in seqs)
    for chunk in chunk_reads(enc, 2, batch_size=8):
        sharded.add_chunk(chunk)
    rows = sharded.nonzero_rows(2)
    r0 = rows[0]
    dup = np.array([r0, rows[-1], r0, r0])
    got = sharded.counts_for_rows(2, dup)
    base = sharded.counts_for_rows(2, rows)
    np.testing.assert_array_equal(got[0], base[0])
    np.testing.assert_array_equal(got[2], base[0])
    np.testing.assert_array_equal(got[3], base[0])
    np.testing.assert_array_equal(got[1], base[-1])


@needs_8
@pytest.mark.slow
def test_kmer_sharded_multiple_flushes():
    # Sparse host accumulation across flush boundaries stays exact.
    from jax.sharding import Mesh
    from bear_tpu.parallel.counting import KmerShardedTransitionCounter

    rng = np.random.default_rng(13)
    seqs = ["".join(rng.choice(list("ACGT"), 30)) for _ in range(20)]
    single = TransitionCounter(lags=[4], n_groups=1)
    mesh = Mesh(np.array(jax.devices()[:8]), ("kmer",))
    sharded = KmerShardedTransitionCounter(mesh, lags=[4], n_groups=1)
    for tc in (single, sharded):
        for i, s in enumerate(seqs):
            for chunk in chunk_reads(iter([(fastx.encode_seq(s), 0)]), 4):
                tc.add_chunk(chunk)
            if isinstance(tc, KmerShardedTransitionCounter) and i % 7 == 3:
                tc.flush()  # force mid-stream flushes
    rows = single.nonzero_rows(4)
    np.testing.assert_array_equal(rows, sharded.nonzero_rows(4))
    np.testing.assert_array_equal(
        sharded.counts_for_rows(4, rows),
        single.tables[4][:, rows, :].transpose(1, 0, 2),
    )


@needs_8
@pytest.mark.slow
def test_summarize_cli_kmer_shards(tmp_path):
    # The summarize CLI's --kmer-shards path writes the same TSVs as the
    # single-device counter.
    from bear_tpu.counting.summarize import build_parser, main as summarize_main

    rng = np.random.default_rng(17)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i in range(30):
            f.write(f">r{i}\n" + "".join(rng.choice(list("ACGT"), 40)) + "\n")
    csv = tmp_path / "in.csv"
    csv.write_text(f"{fa},0,fa\n")
    a1 = build_parser().parse_args([str(csv), str(tmp_path / "one"), "-l", "3"])
    a8 = build_parser().parse_args(
        [str(csv), str(tmp_path / "eight"), "-l", "3", "--kmer-shards", "8"]
    )
    summarize_main(a1)
    summarize_main(a8)
    for l in (1, 2, 3):
        one = (tmp_path / f"one_lag_{l}_file_0.tsv").read_bytes()
        eight = (tmp_path / f"eight_lag_{l}_file_0.tsv").read_bytes()
        assert one == eight


@pytest.mark.slow
def test_summarize_checkpoint_resume_kmer_shards(tmp_path):
    # --checkpoint with --kmer-shards > 1 (sharded save_state/load_state is
    # wired into run_counting): a job killed between files resumes from the
    # last completed file and ends with exactly the full-run counts.
    from bear_tpu.counting.summarize import run_counting

    rng = np.random.default_rng(29)
    csv_lines = []
    all_seqs = []
    for fi in range(3):
        seqs = ["".join(rng.choice(list("ACGT"), 30)) for _ in range(4)]
        all_seqs += seqs
        p = tmp_path / f"f{fi}.fa"
        p.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))
        csv_lines.append(f"{p},0,fa")
    full_csv = tmp_path / "all.csv"
    full_csv.write_text("\n".join(csv_lines) + "\n")
    part_csv = tmp_path / "part.csv"
    part_csv.write_text("\n".join(csv_lines[:2]) + "\n")

    lag = 3
    ckpt = str(tmp_path / "count.ckpt")
    run_counting(str(part_csv), lags=range(1, lag + 1), checkpoint=ckpt,
                 kmer_shards=2)
    resumed = run_counting(str(full_csv), lags=range(1, lag + 1),
                           checkpoint=ckpt, kmer_shards=2)
    # Oracle: fresh single-device full count.
    oracle = run_counting(str(full_csv), lags=range(1, lag + 1))
    for l in range(1, lag + 1):
        rows = oracle.nonzero_rows(l)
        np.testing.assert_array_equal(
            resumed.counts_for_rows(l, rows),  # [R, n_groups, A+1]
            oracle.tables[l][:, rows, :].transpose(1, 0, 2))
        np.testing.assert_array_equal(np.sort(resumed.nonzero_rows(l)),
                                      np.sort(rows))

    # mismatched parameters are refused on resume
    with pytest.raises(ValueError, match="do not match"):
        run_counting(str(full_csv), lags=range(1, lag + 1),
                     checkpoint=ckpt, kmer_shards=2, alphabet="rna")


@needs_8
@pytest.mark.slow
def test_kmer_sharded_state_roundtrip_and_merge(tmp_path):
    from jax.sharding import Mesh
    from bear_tpu.parallel.counting import KmerShardedTransitionCounter

    rng = np.random.default_rng(23)
    seqs = ["".join(rng.choice(list("ACGT"), 25)) for _ in range(16)]
    mesh = Mesh(np.array(jax.devices()[:8]), ("kmer",))

    a = KmerShardedTransitionCounter(mesh, lags=[3], n_groups=1)
    b = KmerShardedTransitionCounter(mesh, lags=[3], n_groups=1)
    single = TransitionCounter(lags=[3], n_groups=1)
    for s in seqs[:8]:
        for ch in chunk_reads(iter([(fastx.encode_seq(s), 0)]), 3):
            a.add_chunk(ch)
    for s in seqs[8:]:
        for ch in chunk_reads(iter([(fastx.encode_seq(s), 0)]), 3):
            b.add_chunk(ch)
    for s in seqs:
        for ch in chunk_reads(iter([(fastx.encode_seq(s), 0)]), 3):
            single.add_chunk(ch)

    # save/load round trip preserves counts exactly
    p = str(tmp_path / "a_state.npz")
    a.save_state(p)
    a2 = KmerShardedTransitionCounter(mesh, lags=[3], n_groups=1)
    a2.load_state(p)
    # merge: a2 + b == single (dense .tables for small lags)
    a2.merge_from(b)
    np.testing.assert_array_equal(a2.tables[3], single.tables[3])


def test_to_device_dataset_float32_range_guard():
    # Counts beyond 2^24 must refuse a float32 handoff instead of rounding.
    import jax.numpy as jnp
    import pytest as _pytest

    tc = TransitionCounter(lags=[2], n_groups=1)
    for ch in chunk_reads(iter([(fastx.encode_seq("ACGTACG"), 0)]), 2):
        tc.add_chunk(ch)
    tc.flush()
    tc._host[2][0] += (1 << 24) + 3
    with _pytest.raises(ValueError, match="float32"):
        tc.to_device_dataset(2, dtype=jnp.float32)
    codes, counts = tc.to_device_dataset(2, dtype=jnp.float64)
    assert int(np.asarray(counts).max()) >= (1 << 24)


@needs_8
@pytest.mark.slow
def test_kmer_sharded_protein_matches_single_device():
    # Protein (base-20) tensor-parallel counting: exact parity with the
    # single-device protein counter. (At lag 6 with multiple groups the
    # dense protein table exceeds one device's int32 range — the sharded
    # counter is the only way to count it; parity is checked at a small lag.)
    from jax.sharding import Mesh
    from bear_tpu.counting.engine import ReadChunk
    from bear_tpu.parallel.counting import KmerShardedTransitionCounter

    rng = np.random.default_rng(41)
    B, L = 40, 18
    mat = rng.integers(0, 20, (B, L)).astype(np.int8)
    groups = rng.integers(0, 2, B).astype(np.int32)
    chunk = ReadChunk(mat, np.full(B, L, np.int32), np.zeros(B, np.int32),
                      np.ones(B, bool), groups)

    single = TransitionCounter(lags=[2], n_groups=2, alphabet="prot")
    mesh = Mesh(np.array(jax.devices()[:8]), ("kmer",))
    sharded = KmerShardedTransitionCounter(mesh, lags=[2], n_groups=2,
                                           alphabet="prot")
    single.add_chunk(chunk)
    sharded.add_chunk(chunk)
    sharded.validate(expected_transitions=B * (L + 1))
    rows = single.nonzero_rows(2)
    np.testing.assert_array_equal(rows, sharded.nonzero_rows(2))
    np.testing.assert_array_equal(
        sharded.counts_for_rows(2, rows),
        single.tables[2][:, rows, :].transpose(1, 0, 2),
    )
    ds1, ds8 = single.to_dataset(2), sharded.to_dataset(2)
    assert ds1.alphabet == ds8.alphabet == "prot"
    np.testing.assert_array_equal(ds1.counts, ds8.counts)
    np.testing.assert_array_equal(ds1.codes, ds8.codes)


@needs_8
def test_kmer_sharded_guards_and_empty_rows(tmp_path):
    from jax.sharding import Mesh
    from bear_tpu.parallel.counting import KmerShardedTransitionCounter

    mesh = Mesh(np.array(jax.devices()[:8]), ("kmer",))
    tc = KmerShardedTransitionCounter(mesh, lags=[2], n_groups=1,
                                      alphabet="prot")
    rng = np.random.default_rng(3)
    from bear_tpu.counting.engine import ReadChunk
    mat = rng.integers(0, 20, (8, 10)).astype(np.int8)
    tc.add_chunk(ReadChunk(mat, np.full(8, 10, np.int32),
                           np.zeros(8, np.int32), np.ones(8, bool),
                           np.zeros(8, np.int32)))
    # empty rows query returns an empty result, not IndexError
    out = tc.counts_for_rows(2, np.array([], dtype=np.int64))
    assert out.shape == (0, 1, 21)
    # checkpoint alphabet mismatch is rejected
    p = str(tmp_path / "prot_state.npz")
    tc.save_state(p)
    dna = KmerShardedTransitionCounter(mesh, lags=[2], n_groups=1)
    with pytest.raises(ValueError, match="alphabet"):
        dna.load_state(p)
    # wrong-alphabet dataset handoff is rejected
    with pytest.raises(ValueError, match="base-20"):
        tc.to_dataset(2, alphabet="dna")


@needs_8
@pytest.mark.slow
def test_table_counter_over_kmer_sharded():
    # Scoring-path random access against a row-sharded counter must equal
    # the dense-table path exactly — including '['-padded prefix contexts
    # and DUPLICATE k-mers in one query (lag 14-15 scale scoring never
    # materializes the dense table).
    from bear_tpu.inference.scoring import TableCounter
    from bear_tpu.parallel.counting import KmerShardedTransitionCounter

    rng = np.random.default_rng(9)
    seqs = ["".join(rng.choice(list("ACGT"), rng.integers(15, 40))) for _ in range(23)]
    lag = 4

    single = TransitionCounter(lags=[lag], n_groups=2)
    mesh = data_parallel_mesh(8, axis_name="kmer")
    sharded = KmerShardedTransitionCounter(mesh, lags=[lag], n_groups=2)
    for tc in (single, sharded):
        enc = ((fastx.encode_seq(s), i % 2) for i, s in enumerate(seqs))
        for chunk in chunk_reads(enc, lag, batch_size=8):
            tc.add_chunk(chunk)

    queries = np.array(
        ["ACGT", "TTTT", "ACGT",          # duplicate full contexts
         "A", "GC", "CGT",                 # short (prefix-padded) contexts
         "GGGG", "A"]                      # more duplicates / unseen rows
    )
    for group in (0, 1):
        dense = TableCounter(single, lag, group=group)
        sparse = TableCounter(sharded, lag, group=group)
        np.testing.assert_array_equal(dense(queries), sparse(queries))
    # no_end zeroes the stop column in both paths
    np.testing.assert_array_equal(
        TableCounter(single, lag, no_end=True)(queries),
        TableCounter(sharded, lag, no_end=True)(queries),
    )
