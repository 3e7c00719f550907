"""Sparse-first counting (lag >= 16): oracle exactness, dense-counter
parity, chunk-semantics parity, and the end-to-end count -> train -> serve
path the dense engine cannot reach (role of the reference's KMC at k > 15,
reference summarize.py:322-328 passes -k up to KMC's 256)."""

import os
from collections import Counter as PyCounter

import numpy as np
import pytest

from bear_tpu.counting.engine import (
    ReadChunk,
    TransitionCounter,
    chunk_reads,
    context_to_row,
    rows_to_contexts,
)
from bear_tpu.counting import fastx
from bear_tpu.counting.sparse import (
    SparseTransitionCounter,
    max_sparse_lag,
)

LETTERS = "ACGT"


def _rand_chunk(rng, B, L, n_groups=2, stop_p=0.8):
    lengths = rng.integers(0, L + 1, B).astype(np.int32)
    codes = rng.integers(0, 4, (B, L)).astype(np.int8)
    groups = rng.integers(0, n_groups, B).astype(np.int32)
    stopped = rng.random(B) < stop_p
    return ReadChunk(codes, lengths, np.zeros(B, np.int32), stopped, groups)


def _dense_from_sparse(sp, lag, like):
    out = np.zeros_like(like)
    rows = sp.nonzero_rows(lag)
    out[:, rows, :] = sp.counts_for_rows(lag, rows).transpose(1, 0, 2)
    return out


def _brute_force_lag(chunk, lag):
    """(context string, next symbol) -> count, per group, straight from the
    ReadChunk definition."""
    oracle = PyCounter()
    total = 0
    B = chunk.codes.shape[0]
    for b in range(B):
        n = int(chunk.lengths[b])
        g = int(chunk.groups[b])
        s = "".join(LETTERS[c] for c in chunk.codes[b, :n])
        padded = "[" * lag + s
        for j in range(n + (1 if chunk.stopped[b] else 0)):
            nxt = s[j] if j < n else "]"
            oracle[(g, padded[j : j + lag], nxt)] += 1
            total += 1
    return oracle, total


def _sparse_as_oracle_dict(sp, lag):
    rows = sp.nonzero_rows(lag)
    cnts = sp.counts_for_rows(lag, rows)
    ctxs = rows_to_contexts(rows, lag)
    got = {}
    for i, c in enumerate(ctxs):
        for g in range(cnts.shape[1]):
            for k, sym in enumerate("ACGT]"):
                if cnts[i, g, k]:
                    got[(g, c, sym)] = int(cnts[i, g, k])
    return got


def test_caps():
    assert max_sparse_lag(4) == 30
    assert max_sparse_lag(20) == 13
    with pytest.raises(ValueError, match="sparse counter's cap"):
        SparseTransitionCounter(lags=[31])
    # dense guards point at the sparse mode
    with pytest.raises(ValueError, match="SparseTransitionCounter"):
        TransitionCounter(lags=[16])


def test_consolidation_pending_resets_to_zero(monkeypatch):
    # After a threshold-triggered consolidation, the un-merged counter must
    # reset to 0, NOT to the consolidated store size: once the corpus holds
    # more distinct keys than CONSOLIDATE_PENDING, the latter re-triggers a
    # full concatenate+unique of the whole accumulator on EVERY push —
    # quadratic host cost at genome scale. Counts must stay oracle-exact
    # either way.
    import bear_tpu.counting.sparse as sparse_mod

    monkeypatch.setattr(sparse_mod, "CONSOLIDATE_PENDING", 4)
    rng = np.random.default_rng(5)
    lags = [1, 3]
    dense = TransitionCounter(lags=lags, n_groups=1, method="scatter")
    sp = SparseTransitionCounter(lags=lags, n_groups=1)
    for _ in range(3):
        ch = _rand_chunk(rng, 32, 16, n_groups=1)
        dense.add_chunk(ch)
        sp.add_chunk(ch)
    # The distinct-key count far exceeds the tiny threshold, so the last
    # push consolidated: pending tracks un-merged entries only.
    assert sp._pending == 0
    for l in lags:
        np.testing.assert_array_equal(
            _dense_from_sparse(sp, l, dense.tables[l]), dense.tables[l]
        )


def test_sparse_matches_dense_small_lags():
    rng = np.random.default_rng(0)
    lags = [1, 3, 5]
    dense = TransitionCounter(lags=lags, n_groups=2, method="scatter")
    sp = SparseTransitionCounter(lags=lags, n_groups=2)
    for _ in range(3):
        ch = _rand_chunk(rng, 64, 20)
        dense.add_chunk(ch)
        sp.add_chunk(ch)
    for l in lags:
        np.testing.assert_array_equal(
            _dense_from_sparse(sp, l, dense.tables[l]), dense.tables[l]
        )


def test_sparse_reverse_matches_dense():
    rng = np.random.default_rng(1)
    dense = TransitionCounter(lags=[2, 4], n_groups=1, reverse=True,
                              method="scatter")
    sp = SparseTransitionCounter(lags=[2, 4], n_groups=1, reverse=True)
    ch = _rand_chunk(rng, 48, 14, n_groups=1)
    dense.add_chunk(ch)
    sp.add_chunk(ch)
    for l in (2, 4):
        np.testing.assert_array_equal(
            _dense_from_sparse(sp, l, dense.tables[l]), dense.tables[l]
        )


def test_sparse_fresh_flags_match_dense():
    # Ambig-piece semantics: non-fresh rows drop positions j < lag (window
    # crosses the ambiguous base) — exactly the dense kernel's fresh mask.
    rng = np.random.default_rng(2)
    B, L = 40, 16
    ch = _rand_chunk(rng, B, L, n_groups=1)
    ch = ReadChunk(ch.codes, ch.lengths, ch.skip, ch.stopped, ch.groups,
                   fresh=rng.random(B) < 0.5)
    dense = TransitionCounter(lags=[1, 3], n_groups=1, method="scatter")
    sp = SparseTransitionCounter(lags=[1, 3], n_groups=1)
    dense.add_chunk(ch)
    sp.add_chunk(ch)
    for l in (1, 3):
        np.testing.assert_array_equal(
            _dense_from_sparse(sp, l, dense.tables[l]), dense.tables[l]
        )


def test_sparse_lag17_oracle_exact():
    # The capability the dense engine lacks: exact lag-17 DNA counts,
    # verified against a brute-force recount (reference oracle style,
    # test_summarize.py:90-114).
    rng = np.random.default_rng(3)
    lag = 17
    ch = _rand_chunk(rng, 200, 60, n_groups=2)
    sp = SparseTransitionCounter(lags=[lag], n_groups=2)
    sp.add_chunk(ch)
    oracle, total = _brute_force_lag(ch, lag)
    sp.validate(expected_transitions=total)
    assert _sparse_as_oracle_dict(sp, lag) == dict(oracle)


def test_sparse_lag17_segmented_contig():
    # Long-contig streaming (segment overlap carried as skip-context) at a
    # lag the dense counters cannot represent.
    rng = np.random.default_rng(4)
    lag = 17
    seq = "".join(rng.choice(list(LETTERS), 3000))
    sp = SparseTransitionCounter(lags=[lag], n_groups=1)
    for chunk in chunk_reads([(fastx.encode_seq(seq), 0)], lag,
                             segment_len=512):
        sp.add_chunk(chunk)
    sp.validate(expected_transitions=len(seq) + 1)
    padded = "[" * lag + seq + "]"
    oracle = PyCounter()
    for j in range(lag, len(padded)):
        oracle[(0, padded[j - lag : j], padded[j])] += 1
    assert _sparse_as_oracle_dict(sp, lag) == dict(oracle)


def test_sparse_protein_lag9():
    # Protein lag >= 8 (dense caps at 7): conservation + spot row check.
    rng = np.random.default_rng(5)
    B = 60
    codes = rng.integers(0, 20, (B, 25)).astype(np.int8)
    lengths = rng.integers(0, 26, B).astype(np.int32)
    ch = ReadChunk(codes, lengths, np.zeros(B, np.int32), np.ones(B, bool),
                   np.zeros(B, np.int32))
    sp = SparseTransitionCounter(lags=[9], n_groups=1, alphabet="prot")
    sp.add_chunk(ch)
    sp.validate(expected_transitions=int(lengths.sum()) + B)
    # spot-check one full-context row against a recount
    rows = sp.nonzero_rows(9)
    assert len(rows) > 0
    cnts = sp.counts_for_rows(9, rows[:1])[0, 0]
    ctx = rows_to_contexts(rows[:1], 9, "prot")[0]
    assert cnts.sum() > 0 and len(ctx) == 9


def test_sparse_save_load_merge(tmp_path):
    rng = np.random.default_rng(6)
    lag = 16
    ch1 = _rand_chunk(rng, 50, 40, n_groups=1)
    ch2 = _rand_chunk(rng, 50, 40, n_groups=1)
    a = SparseTransitionCounter(lags=[lag], n_groups=1)
    a.add_chunk(ch1)
    p = str(tmp_path / "ck")
    a.save_state(p)
    b = SparseTransitionCounter(lags=[lag], n_groups=1)
    b.load_state(p + ".npz")
    b.add_chunk(ch2)
    both = SparseTransitionCounter(lags=[lag], n_groups=1)
    both.add_chunk(ch1)
    both.add_chunk(ch2)
    rows = both.nonzero_rows(lag)
    np.testing.assert_array_equal(b.nonzero_rows(lag), rows)
    np.testing.assert_array_equal(
        b.counts_for_rows(lag, rows), both.counts_for_rows(lag, rows)
    )
    # merge_from path
    c = SparseTransitionCounter(lags=[lag], n_groups=1)
    c.add_chunk(ch2)
    a.merge_from(c)
    np.testing.assert_array_equal(a.nonzero_rows(lag), rows)


def test_sparse_export_and_dataset_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    lag = 16
    ch = _rand_chunk(rng, 60, 30, n_groups=1)
    sp = SparseTransitionCounter(lags=[lag], n_groups=1)
    sp.add_chunk(ch)
    ds = sp.to_dataset(lag)
    rows = sp.nonzero_rows(lag)
    assert len(ds.kmers) == len(rows)
    # row codec round-trips at lag 16 (int64 row indices)
    back = np.array([context_to_row(k, lag) for k in ds.kmers[:20]])
    np.testing.assert_array_equal(back, rows[:20])
    paths = sp.export_tsv(str(tmp_path / "out"), lag, n_bin_bits=1)
    n_lines = sum(1 for p in paths for _ in open(p))
    assert n_lines == len(rows)


@pytest.mark.slow
def test_sparse_end_to_end_train_and_serve():
    # The VERDICT round-3 'done' bar: lag-17 count on synthetic reads ->
    # streamed training -> sparse random-access serving, all on the sparse
    # accumulator (no dense table anywhere).
    import jax.numpy as jnp

    from bear_tpu.inference.scoring import TableCounter
    from bear_tpu.models import bear_net, get_ar_func

    rng = np.random.default_rng(8)
    lag = 17
    ch = _rand_chunk(rng, 300, 80, n_groups=1, stop_p=1.0)
    sp = SparseTransitionCounter(lags=[lag], n_groups=1)
    sp.add_chunk(ch)
    ds = sp.to_dataset(lag)
    n = len(ds.kmers)
    assert n > 1000

    def shards():
        for s in range(0, n, 512):
            yield ds.codes[s : s + 512], ds.counts[s : s + 512, 0]

    ar = get_ar_func("linear", lag, 4, dtype=jnp.float64)
    res = bear_net.train_streaming(
        shards, n, ar, batch_size=256, epochs=1, learning_rate=0.01,
        train_ar=False, seed=0, dtype=jnp.float64,
    )
    assert np.isfinite(res.h)

    # Serving: TableCounter random access off the sparse accumulator (the
    # py_kmc_api role) returns the exact brute-force counts.
    tc = TableCounter(sp, lag)
    oracle, _ = _brute_force_lag(ch, lag)
    some = list(oracle.items())[:50]
    kmers = np.array([key[1] for key, _ in some])
    got = tc(kmers)
    for i, ((g, ctx, sym), want) in enumerate(some):
        k = "ACGT]".index(sym)
        assert got[i, k] == want, (ctx, sym)


def test_summarize_auto_selects_sparse(tmp_path):
    # run_counting beyond the dense range routes to the sparse counter
    # automatically; counts stay oracle-exact through the CLI layer.
    from bear_tpu.counting.summarize import run_counting

    rng = np.random.default_rng(9)
    seqs = ["".join(rng.choice(list(LETTERS), 40)) for _ in range(20)]
    fa = tmp_path / "in.fa"
    fa.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs)))
    csv = tmp_path / "files.csv"
    csv.write_text(f"{fa},0,fa\n")
    counter = run_counting(str(csv), lags=[16])
    assert isinstance(counter, SparseTransitionCounter)
    counter.validate(expected_transitions=sum(len(s) + 1 for s in seqs))
    # spot-check a full window against the input
    s = seqs[0]
    ctx, nxt = s[:16], s[16]
    row = context_to_row(ctx, 16)
    cnt = counter.counts_for_rows(16, np.array([row]))[0, 0]
    assert cnt["ACGT]".index(nxt)] >= 1


def test_sparse_tiny_buffer_windows_and_row_slicing():
    # Force the windowed drain machinery through every edge: multiple
    # drains mid-stream, a chunk larger than the whole buffer (row
    # slicing), and a final partial window at flush. Counts must equal the
    # default-buffer counter's bit for bit.
    rng = np.random.default_rng(10)
    lag = 16
    chunks = [_rand_chunk(rng, 40, 30, n_groups=2) for _ in range(4)]
    big = SparseTransitionCounter(lags=[lag], n_groups=2)
    tiny = SparseTransitionCounter(lags=[lag], n_groups=2,
                                   device_buffer=64)  # < one chunk row set
    for ch in chunks:
        big.add_chunk(ch)
        tiny.add_chunk(ch)
    rows = big.nonzero_rows(lag)
    np.testing.assert_array_equal(tiny.nonzero_rows(lag), rows)
    np.testing.assert_array_equal(
        tiny.counts_for_rows(lag, rows), big.counts_for_rows(lag, rows)
    )
    total = sum(
        int(c.lengths.sum()) + int(np.asarray(c.stopped).sum())
        for c in chunks
    )
    tiny.validate(expected_transitions=total)


def test_sparse_mesh_matches_single_device():
    # SparseTransitionCounter(mesh=): chunk rows shard over the data axis,
    # per-device windows sort/drain independently — consolidated counts
    # must be bit-equal to the 1-device counter (VERDICT r4 task 2).
    import jax
    import pytest as _pytest

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    rng = np.random.default_rng(12)
    lag = 17
    chunks = [_rand_chunk(rng, 52, 24, n_groups=2) for _ in range(3)]
    one = SparseTransitionCounter(lags=[lag], n_groups=2)
    dp = SparseTransitionCounter(lags=[lag], n_groups=2, mesh=mesh)
    # Also a fresh-flagged chunk (ambig-piece semantics through shard_map)
    B = 36
    ch = _rand_chunk(rng, B, 24, n_groups=2)
    ch = ReadChunk(ch.codes, ch.lengths, ch.skip, ch.stopped, ch.groups,
                   fresh=rng.random(B) < 0.5)
    for c in chunks + [ch]:
        one.add_chunk(c)
        dp.add_chunk(c)
    rows = one.nonzero_rows(lag)
    np.testing.assert_array_equal(dp.nonzero_rows(lag), rows)
    np.testing.assert_array_equal(
        dp.counts_for_rows(lag, rows), one.counts_for_rows(lag, rows)
    )
    one.validate()
    dp.validate()


def test_sparse_mesh_tiny_buffer_and_reverse():
    # mesh= composed with small windows (multi-drain) and the reverse-
    # complement ingest path.
    import jax
    import pytest as _pytest

    if len(jax.devices()) < 4:
        _pytest.skip("needs 4 virtual devices")
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    rng = np.random.default_rng(13)
    lag = 16
    chunks = [_rand_chunk(rng, 24, 20, n_groups=1) for _ in range(3)]
    one = SparseTransitionCounter(lags=[lag], n_groups=1, reverse=True)
    dp = SparseTransitionCounter(lags=[lag], n_groups=1, reverse=True,
                                 mesh=mesh, device_buffer=128)
    for c in chunks:
        one.add_chunk(c)
        dp.add_chunk(c)
    rows = one.nonzero_rows(lag)
    np.testing.assert_array_equal(dp.nonzero_rows(lag), rows)
    np.testing.assert_array_equal(
        dp.counts_for_rows(lag, rows), one.counts_for_rows(lag, rows)
    )


def test_summarize_data_shards_routes_sparse_mesh(tmp_path):
    # run_counting(data_shards=N) shards the sparse counter's rows over N
    # devices; counts equal the 1-device CLI path. Dense-range lags reject
    # data_shards with a pointer to --kmer-shards/--passes.
    import jax
    import pytest as _pytest

    from bear_tpu.counting.summarize import run_counting

    if len(jax.devices()) < 4:
        _pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(14)
    seqs = ["".join(rng.choice(list(LETTERS), 35)) for _ in range(12)]
    fa = tmp_path / "in.fa"
    fa.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs)))
    csv = tmp_path / "files.csv"
    csv.write_text(f"{fa},0,fa\n")
    one = run_counting(str(csv), lags=[17])
    dp = run_counting(str(csv), lags=[17], data_shards=4)
    assert isinstance(dp, SparseTransitionCounter) and dp.mesh is not None
    rows = one.nonzero_rows(17)
    np.testing.assert_array_equal(dp.nonzero_rows(17), rows)
    np.testing.assert_array_equal(
        dp.counts_for_rows(17, rows), one.counts_for_rows(17, rows)
    )
    with pytest.raises(ValueError, match="kmer-shards"):
        run_counting(str(csv), lags=[5], data_shards=4)
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_counting(str(csv), lags=[17], data_shards=4, passes=2)


@pytest.mark.slow
def test_lag17_demo_pipeline_toy():
    # The flagship lag-17 end-to-end demo (count -> validate -> train ->
    # serve -> assemble off the sparse table) at toy scale — the script the
    # single-chip proof runs (tools/lag17_demo.py).
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "lag17_demo",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "lag17_demo.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main(["--bases", "6e4", "--read-len", "60", "--cov", "5",
                     "--oracle-reads", "10"]) == 0


def test_sparse_cap_ratchets_up_for_bigger_chunks():
    # A small first chunk must not pin the window capacity: a later bigger
    # chunk ratchets the cap up (draining once) instead of collapsing into
    # one-row window slices (code-review r5 finding). Counts stay exact.
    rng = np.random.default_rng(15)
    lag = 16
    small = _rand_chunk(rng, 4, 10, n_groups=1)
    big = _rand_chunk(rng, 200, 50, n_groups=1)
    sp = SparseTransitionCounter(lags=[lag], n_groups=1)
    sp.add_chunk(small)
    cap_small = sp._cap
    sp.add_chunk(big)
    assert sp._cap > cap_small
    # the big chunk fits one window (no row slicing at default budget)
    assert sp._cap >= 200 * 51
    # exactness against the brute-force recount (an independent oracle —
    # a same-code-path reference counter would be vacuous)
    o1, t1 = _brute_force_lag(small, lag)
    o2, t2 = _brute_force_lag(big, lag)
    oracle = PyCounter(o1)
    oracle.update(o2)
    sp.validate(expected_transitions=t1 + t2)
    assert _sparse_as_oracle_dict(sp, lag) == dict(oracle)


@pytest.mark.parametrize("seed", [101, 102, 103])
def test_sparse_fuzz_random_geometry_vs_oracle(seed):
    # Randomized chunk geometries, buffer budgets, group counts, and fresh
    # flags against the brute-force oracle: insurance over the windowed
    # drain's edge interactions (partial windows, row slicing, ratchets,
    # fresh-masked positions) beyond the targeted tests.
    rng = np.random.default_rng(seed)
    lag = int(rng.integers(16, 19))
    n_groups = int(rng.integers(1, 3))
    sp = SparseTransitionCounter(
        lags=[lag], n_groups=n_groups,
        device_buffer=int(rng.integers(40, 4000)))
    oracle = PyCounter()
    total = 0
    for _ in range(4):
        B = int(rng.integers(1, 60))
        L = int(rng.integers(1, 48))
        ch = _rand_chunk(rng, B, L, n_groups=n_groups)
        if rng.random() < 0.5:
            ch = ReadChunk(ch.codes, ch.lengths, ch.skip, ch.stopped,
                           ch.groups, fresh=rng.random(B) < 0.5)
        sp.add_chunk(ch)
        # oracle incl. fresh semantics: non-fresh rows drop positions j<lag
        for b in range(ch.codes.shape[0]):
            n = int(ch.lengths[b])
            g = int(ch.groups[b])
            fresh = True if ch.fresh is None else bool(ch.fresh[b])
            s = "".join(LETTERS[c] for c in ch.codes[b, :n])
            padded = "[" * lag + s
            for j in range(n + (1 if ch.stopped[b] else 0)):
                if not fresh and j < lag:
                    continue
                nxt = s[j] if j < n else "]"
                oracle[(g, padded[j:j + lag], nxt)] += 1
                total += 1
    got = _sparse_as_oracle_dict(sp, lag)
    assert got == dict(oracle), (lag, n_groups, sp._cap)
    sp.validate(expected_transitions=total)


def test_sparse_at_envelope_caps_dna30_prot13():
    # The documented envelope EDGES work, not just the claim: exact counts
    # at DNA lag 30 and protein lag 13 (the int32 digit-half / int64
    # global-key boundaries), verified against the brute-force oracle.
    rng = np.random.default_rng(77)
    # DNA lag 30: rows reach (4^31-1)/3 ~ 1.5e18 — near the int64 cap.
    lag = 30
    ch = _rand_chunk(rng, 20, 40, n_groups=1)
    sp = SparseTransitionCounter(lags=[lag], n_groups=1)
    sp.add_chunk(ch)
    oracle, total = _brute_force_lag(ch, lag)
    sp.validate(expected_transitions=total)
    assert _sparse_as_oracle_dict(sp, lag) == dict(oracle)
    rows = sp.nonzero_rows(lag)
    assert rows.max() < np.iinfo(np.int64).max // 5

    # protein lag 13 (cap): base-20 digit halves + int64 key boundary.
    from bear_tpu.counting.engine import rows_to_contexts

    codes = rng.integers(0, 20, (15, 20)).astype(np.int8)
    lengths = rng.integers(5, 21, 15).astype(np.int32)
    chp = ReadChunk(codes, lengths, np.zeros(15, np.int32),
                    np.ones(15, bool), np.zeros(15, np.int32))
    spp = SparseTransitionCounter(lags=[13], n_groups=1, alphabet="prot")
    spp.add_chunk(chp)
    spp.validate(expected_transitions=int(lengths.sum()) + 15)
    # row codec round-trips at the cap (decode -> re-encode)
    prows = spp.nonzero_rows(13)
    ctxs = rows_to_contexts(prows[:10], 13, "prot")
    from bear_tpu.inference.serving import contexts_to_rows
    np.testing.assert_array_equal(
        contexts_to_rows(ctxs, 13, "prot"), prows[:10])


def test_sparse_counting_checkpoint_resume(tmp_path):
    # --checkpoint at lag >= 16 rides the sparse counter's save/load_state
    # (the windowed device buffer must fully drain into each checkpoint):
    # a run killed between files resumes from the last completed file and
    # ends exactly equal to a fresh full run.
    from bear_tpu.counting.summarize import run_counting

    rng = np.random.default_rng(19)
    csv_lines = []
    for fi in range(3):
        seqs = ["".join(rng.choice(list(LETTERS), 40)) for _ in range(5)]
        p = tmp_path / f"f{fi}.fa"
        p.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))
        csv_lines.append(f"{p},0,fa")
    full_csv = tmp_path / "all.csv"
    full_csv.write_text("\n".join(csv_lines) + "\n")
    part_csv = tmp_path / "part.csv"
    part_csv.write_text("\n".join(csv_lines[:2]) + "\n")

    lag = 17
    ckpt = str(tmp_path / "count.ckpt")
    run_counting(str(part_csv), lags=[lag], checkpoint=ckpt)  # "crash"
    resumed = run_counting(str(full_csv), lags=[lag], checkpoint=ckpt)
    assert isinstance(resumed, SparseTransitionCounter)
    fresh = run_counting(str(full_csv), lags=[lag])
    rows = fresh.nonzero_rows(lag)
    np.testing.assert_array_equal(resumed.nonzero_rows(lag), rows)
    np.testing.assert_array_equal(
        resumed.counts_for_rows(lag, rows), fresh.counts_for_rows(lag, rows)
    )
