"""Assembly: generated sequences follow the count-table transition structure,
per-sequence model draws are reused on context revisit, determinism by seed,
BMM and BEAR modes, and entropy/fasta outputs."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from bear_tpu.counting import TransitionCounter, chunk_reads
from bear_tpu.counting import fastx
from bear_tpu.inference import assemble_no_ends


def _table_from(seqs, lag, reverse=False):
    tc = TransitionCounter(lags=[lag], n_groups=1, reverse=reverse)
    enc = [(fastx.encode_seq(s), 0) for s in seqs]
    for chunk in chunk_reads(iter(enc), lag):
        tc.add_chunk(chunk)
    return tc.tables[lag][0]


def test_deterministic_structure_follows_counts():
    # Training data is a pure repeat: ACGACGACG... — generation from the
    # count table must continue the cycle exactly (van prior tiny).
    lag = 3
    seqs = ["ACG" * 30]
    table = _table_from(seqs, lag)
    gen, ent = assemble_no_ends(
        ["ACG"], [[0, 12]], 3, lag=lag, counter_table=table, van=1e-6,
    )
    assert gen.shape == (1, 3)
    for s in gen[0]:
        assert s == ("ACG" * 5)[:15], s
    # Zero entropy everywhere (all replicas identical).
    np.testing.assert_allclose(ent[0], 0.0, atol=1e-12)


def test_left_extension_revcomp():
    # Left flank extends the reverse complement; with a cyclic table the
    # stitched sequence must remain on-cycle.
    lag = 3
    seqs = ["ACG" * 30]
    table = _table_from(seqs, lag, reverse=True)
    gen, _ = assemble_no_ends(
        ["CGA"], [[6, 6]], 2, lag=lag, counter_table=table, van=1e-6,
    )
    for s in gen[0]:
        assert len(s) == 15
        assert s in ("ACGACGACGACGACG", "CGACGACGACGACGA", "GACGACGACGACGAC"), s


def test_seed_determinism_and_variation():
    lag = 2
    rng = np.random.default_rng(0)
    data = ["".join(rng.choice(list("ACGT"), 200)) for _ in range(3)]
    table = _table_from(data, lag)
    g1, _ = assemble_no_ends(["AC"], [[0, 20]], 4, lag=lag, counter_table=table, van=1.0, seed=7)
    g2, _ = assemble_no_ends(["AC"], [[0, 20]], 4, lag=lag, counter_table=table, van=1.0, seed=7)
    g3, _ = assemble_no_ends(["AC"], [[0, 20]], 4, lag=lag, counter_table=table, van=1.0, seed=8)
    np.testing.assert_array_equal(g1, g2)
    assert np.any(g1 != g3)
    # Different replicas differ (independent sampled models).
    assert len(set(g1[0])) > 1


def test_bear_mode_and_map(tmp_path):
    lag = 3
    rng = np.random.default_rng(1)
    data = ["".join(rng.choice(list("ACGT"), 300))]
    table = _table_from(data, lag)

    def ar_apply(oh):
        return jnp.full(oh.shape[:-2] + (5,), 0.2, dtype=oh.dtype)

    gen, ent = assemble_no_ends(
        ["ACGT", "TTTT"], [[3, 5], [2, 2]], 2, lag=lag, counter_table=table,
        h=0.5, ar_apply=ar_apply, save_folder=str(tmp_path),
    )
    assert gen.shape == (2, 2)
    assert all(len(s) == 4 + 3 + 5 for s in gen[0])
    assert all(len(s) == 4 + 2 + 2 for s in gen[1])
    assert os.path.exists(tmp_path / "seqs.fa")
    assert os.path.exists(tmp_path / "entropy.png")

    gen_map, _ = assemble_no_ends(
        ["ACGT"], [[0, 8]], 3, lag=lag, counter_table=table,
        h=0.5, ar_apply=ar_apply, get_map=True,
    )
    # MAP mode: all replicas may still differ via Gumbel sampling of the same
    # MAP distribution, but sequences are valid ACGT strings of right length.
    assert all(len(s) == 12 and set(s) <= set("ACGT") for s in gen_map[0])


def test_assemble_cli_end_to_end(tmp_path):
    # CLI: count a toy read set (reverse=True), BMM-extend seeds, write
    # fasta + entropy outputs.
    import os

    from bear_tpu.inference.assemble_cli import main as cli_main

    reads = tmp_path / "reads.fa"
    reads.write_text(">r0\nACGTACGTACGT\n>r1\nTTGACCGTAACG\n")
    (tmp_path / "in.csv").write_text(f"{reads},0,fa\n")
    seeds = tmp_path / "seeds.fa"
    seeds.write_text(">s0\nACGT\n")
    out = tmp_path / "gen"
    rc = cli_main([str(seeds), "--counts-csv", str(tmp_path / "in.csv"),
                   "--van", "0.5", "--lag", "2", "--right", "15",
                   "--num", "3", "--out", str(out)])
    assert rc == 0
    fastas = [f for f in os.listdir(out) if f.endswith((".fa", ".fasta"))]
    assert fastas, os.listdir(out)
    from bear_tpu.counting import fastx

    gen = list(fastx.iter_fasta(os.path.join(out, fastas[0])))
    assert len(gen) == 3
    assert all(s.startswith("ACGT") and len(s) == 4 + 15 for _, s in gen)


@pytest.mark.slow
def test_assemble_cli_with_model_dir(tmp_path):
    # CLI --model-dir route: train the TEST config model, then extend seeds
    # under its BEAR posterior (exercises load_bear -> assemble end to end).
    import configparser
    import os

    from bear_tpu.models import train_bear_net

    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bear_tpu", "models", "config_files", "bear_test.cfg",
    )
    config = configparser.ConfigParser()
    config.read(cfg_path)
    config["general"]["out_folder"] = str(tmp_path / "model") + "*"
    train_bear_net.main(config)
    model_dir = config["results"]["out_folder"]

    from bear_tpu.inference.assemble_cli import main as cli_main

    reads = tmp_path / "reads.fa"
    reads.write_text(">r0\nACGTACGTACGTACGT\n>r1\nTTGACCGTAACGGTCA\n")
    (tmp_path / "in.csv").write_text(f"{reads},0,fa\n")
    seeds = tmp_path / "seeds.fa"
    seeds.write_text(">s0\nACGTACG\n")
    out = tmp_path / "gen"
    rc = cli_main([str(seeds), "--counts-csv", str(tmp_path / "in.csv"),
                   "--model-dir", model_dir, "--right", "10",
                   "--num", "2", "--out", str(out)])
    assert rc == 0
    fastas = [f for f in os.listdir(out) if f.endswith((".fa", ".fasta"))]
    assert fastas
    # --lag mismatch is refused upfront
    with pytest.raises(SystemExit, match="model lag"):
        cli_main([str(seeds), "--counts-csv", str(tmp_path / "in.csv"),
                  "--model-dir", model_dir, "--lag", "2",
                  "--out", str(tmp_path / "x")])


def test_assemble_sparse_table_matches_dense():
    # A SparseTableIndex over the same counts generates BIT-IDENTICAL
    # sequences to the dense table at dense-range lags (same rows, same
    # draws, same Gumbel streams), in both MAP and sampled modes.
    from bear_tpu.counting.engine import ReadChunk, TransitionCounter
    from bear_tpu.counting.sparse import SparseTransitionCounter
    from bear_tpu.inference.scoring import SparseTableIndex

    rng = np.random.default_rng(31)
    lag = 8
    B, L = 200, 60
    chunk = ReadChunk(
        rng.integers(0, 4, (B, L)).astype(np.int8),
        np.full(B, L, np.int32), np.zeros(B, np.int32),
        np.ones(B, bool), np.zeros(B, np.int32),
    )
    dense = TransitionCounter(lags=[lag], n_groups=1, method="scatter")
    sp = SparseTransitionCounter(lags=[lag], n_groups=1)
    dense.add_chunk(chunk)
    sp.add_chunk(chunk)
    idx = SparseTableIndex(sp, lag)
    seeds = ["ACGTACGT", "TTTTGGGG"]
    lengths = np.full((2, 2), 40)
    for get_map in (False, True):
        gen_d, ent_d = assemble_no_ends(
            seeds, lengths, 4, lag=lag, counter_table=dense.tables[lag][0],
            van=0.3, get_map=get_map, seed=7)
        gen_s, ent_s = assemble_no_ends(
            seeds, lengths, 4, lag=lag, counter_table=idx,
            van=0.3, get_map=get_map, seed=7)
        np.testing.assert_array_equal(gen_d, gen_s)
        for a, b in zip(ent_d, ent_s):
            np.testing.assert_array_equal(a, b)


def test_assemble_lag17_from_sparse_counter():
    # The capability the dense path cannot reach: generation at lag 17
    # straight off a SparseTransitionCounter (no dense table anywhere;
    # int64 row arithmetic + split-fold draw keys). A deterministic
    # single-path corpus (one repeated read) must be reproduced verbatim by
    # MAP generation seeded inside it.
    from bear_tpu.counting.engine import ReadChunk
    from bear_tpu.counting.sparse import SparseTransitionCounter
    from bear_tpu.inference.scoring import SparseTableIndex

    rng = np.random.default_rng(32)
    lag = 17
    genome = "".join(rng.choice(list("ACGT"), 400))
    # overlapping windows of one genome at coverage ~4
    starts = rng.integers(0, len(genome) - 80, 40)
    reads = np.stack([
        np.frombuffer(genome[s:s + 80].encode(), np.uint8) for s in starts])
    codes = np.zeros(reads.shape, np.int8)
    for i, ch in enumerate(b"ACGT"):
        codes[reads == ch] = i
    chunk = ReadChunk(codes, np.full(40, 80, np.int32),
                      np.zeros(40, np.int32), np.zeros(40, bool),
                      np.zeros(40, np.int32))
    sp = SparseTransitionCounter(lags=[lag], n_groups=1)
    sp.add_chunk(chunk)
    idx = SparseTableIndex(sp, lag)
    assert idx.rows.dtype == np.int64 and idx.rows.max() > np.iinfo(np.int32).max

    # Seed with a window of the genome whose continuation is unique in the
    # corpus; MAP generation must follow the genome exactly.
    s0 = int(starts[0])
    seed_str = genome[s0:s0 + lag + 3]
    n_gen = 20
    gen, _ = assemble_no_ends(
        [seed_str], np.array([[0, n_gen]]), 2, lag=lag, counter_table=idx,
        van=1e-9, get_map=True, seed=3)
    want = genome[s0:s0 + lag + 3 + n_gen]
    for g in gen[0]:
        assert g == want, (g, want)

    # sampled mode runs and emits valid letters
    gen_s, ent = assemble_no_ends(
        [seed_str], np.array([[5, 10]]), 3, lag=lag, counter_table=idx,
        van=0.5, seed=4)
    assert all(set(g) <= set("ACGT") and len(g) == len(seed_str) + 15
               for g in gen_s[0])
    assert ent[0].shape == (len(seed_str) + 15,)
