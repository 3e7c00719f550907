"""Lag-17 single-chip end-to-end demo: the lag ceiling is really gone.

A dense lag-17 DNA table would be ``table_rows(17) = (4^18-1)/3 = 2.29e10``
rows x 5 x 4 B = 458 GB — beyond ANY dense scheme (the dense engine's int32
row codes stop at lag 15). The sparse-first counter
(bear_tpu.counting.sparse) never densifies: chunks append packed key
triples into a device-resident buffer, windows sort + run-length
consolidate, and the host accumulates only DISTINCT (context, next) pairs —
the KMC design (reference summarize.py:322-340, arbitrary k <= 256) as one
TPU kernel pipeline.

Steps (each timed, each exactness-checked):
1. synthesize a genome + coverage-``--cov`` reads (deterministic seed);
2. count lag 17 on one chip with SparseTransitionCounter (optionally
   ``--data-shards N`` to shard rows over N devices);
3. validate: exact count conservation + brute-force oracle equality over a
   subsampled region;
4. train a streamed linear BEAR straight from the sparse accumulator
   (bear_net.train_streaming);
5. serve: MAP sequence scores + a variant Δ-scoring pass through the
   persistent sparse random-access index (TableCounter — the py_kmc_api
   role, reference get_var_probs.py:210-289);
6. assemble: MAP generation off the SPARSE table (in-scan binary search,
   int64 rows) must reproduce a unique genome continuation verbatim.

Run on the chip:  python tools/lag17_demo.py
Small smoke test: python tools/lag17_demo.py --bases 2e5 --read-len 80
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--lag", type=int, default=17)
    ap.add_argument("--bases", type=float, default=2e6,
                    help="genome length (reads total ~cov x this)")
    ap.add_argument("--cov", type=float, default=10.0)
    ap.add_argument("--read-len", type=int, default=200)
    ap.add_argument("--batch-reads", type=int, default=1 << 14)
    ap.add_argument("--data-shards", type=int, default=1)
    ap.add_argument("--oracle-reads", type=int, default=20)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_enable_x64", True)  # int64 rows beyond lag 15

    from bear_tpu.counting.engine import ReadChunk, table_rows
    from bear_tpu.counting.sparse import SparseTransitionCounter
    from bear_tpu.inference.assemble import assemble_no_ends
    from bear_tpu.inference.scoring import (
        SparseTableIndex,
        TableCounter,
        get_bear_probs_seqs,
    )
    from bear_tpu.models import bear_net, get_ar_func

    lag = args.lag
    print(f"device: {jax.devices()[0]}", flush=True)
    print(f"lag {lag}: dense table would be {table_rows(lag):,} rows "
          f"({table_rows(lag) * 5 * 4 / 1e9:.0f} GB) — sparse-first instead",
          flush=True)

    rng = np.random.default_rng(0)
    G = int(args.bases)
    genome = rng.integers(0, 4, G).astype(np.int8)
    rlen = args.read_len
    n_reads = max(1, int(G * args.cov / rlen))
    starts = rng.integers(0, G - rlen, n_reads)
    codes = np.stack([genome[s:s + rlen] for s in starts])
    total_transitions = n_reads * (rlen + 1)
    print(f"{n_reads:,} reads x {rlen} bp = coverage "
          f"{n_reads * rlen / G:.1f}x of a {G / 1e6:.1f} Mb genome", flush=True)

    mesh = None
    if args.data_shards > 1:
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:args.data_shards]), ("data",))

    def chunks():
        for s in range(0, n_reads, args.batch_reads):
            c = codes[s:s + args.batch_reads]
            n = len(c)
            yield ReadChunk(
                codes=c, lengths=np.full(n, rlen, np.int32),
                skip=np.zeros(n, np.int32), stopped=np.ones(n, bool),
                groups=np.zeros(n, np.int32),
            )

    # ---- count -----------------------------------------------------------
    t0 = time.time()
    counter = SparseTransitionCounter(lags=[lag], n_groups=1, mesh=mesh)
    for ch in chunks():
        counter.add_chunk(ch)
    counter.flush()
    count_s = time.time() - t0
    print(f"counted in {count_s:.1f}s "
          f"({total_transitions / count_s / 1e6:.1f}M transitions/s incl. "
          "windowed drains)", flush=True)

    # ---- validate --------------------------------------------------------
    totals = counter.validate(expected_transitions=total_transitions)
    print(f"count conservation exact: {totals[lag]:,} transitions", flush=True)

    from collections import defaultdict

    oracle = defaultdict(lambda: np.zeros(5, np.int64))
    A = 4
    for read in codes[:args.oracle_reads]:
        padded = [A] * lag + list(read)
        for j in range(len(read) + 1):
            ctx = tuple(padded[j:j + lag])
            nxt = int(read[j]) if j < len(read) else 4
            oracle[ctx][nxt] += 1
    ctxs = np.array(sorted(oracle.keys()), np.int64)
    is_pad = ctxs == A
    n_pad = is_pad.sum(1)
    powA = A ** np.arange(lag - 1, -1, -1, dtype=np.int64)
    rows = (A ** (lag - n_pad) - 1) // (A - 1) + np.where(is_pad, 0, ctxs) @ powA
    got = counter.counts_for_rows(lag, rows)[:, 0, :]
    want = np.stack([oracle[tuple(c)] for c in ctxs])
    assert np.all(got >= want), "oracle mismatch (missing counts)"
    if args.oracle_reads >= n_reads:
        assert np.array_equal(got, want), "oracle mismatch"
    print(f"oracle spot-check: {len(rows):,} distinct contexts of "
          f"{args.oracle_reads} reads all covered", flush=True)

    # ---- train (streamed straight from the sparse accumulator) -----------
    ds = counter.to_dataset(lag)
    n = len(ds.codes)
    print(f"{n:,} distinct k-mer contexts -> streamed training", flush=True)
    shard_rows = 1 << 19

    def shards():
        for s in range(0, n, shard_rows):
            yield (ds.codes[s:s + shard_rows],
                   ds.counts[s:s + shard_rows, 0].astype(np.float32))

    t0 = time.time()
    ar = get_ar_func("linear", lag, 4)
    res = bear_net.train_streaming(
        shards, n, ar, batch_size=1 << 14, epochs=1, learning_rate=0.01,
        block_steps=16,
    )
    train_s = time.time() - t0
    print(f"trained {len(res.losses)} applies in {train_s:.1f}s; "
          f"h={res.h:.4f}; final ELBO {res.elbos[-1]:.4g}", flush=True)

    # ---- serve (persistent sparse random-access index) --------------------
    t0 = time.time()
    tc = TableCounter(counter, lag)  # builds the SparseTableIndex once
    build_s = time.time() - t0
    seqs = ["".join("ACGT"[b] for b in codes[i]) for i in range(4)]
    t0 = time.time()
    scores = get_bear_probs_seqs(
        None, seqs, 0, get_map=True, vans=[0.5], lag=lag,
        alphabet_name="dna", h=res.h, counter=tc,
    )
    print(f"served {len(seqs)} x {rlen} bp reads (MAP, persistent sparse "
          f"index: built {build_s:.1f}s, query {time.time() - t0:.1f}s); "
          f"scores[0]={np.asarray(scores)[0]}", flush=True)

    # variant Δ-scoring through the same index
    from bear_tpu.inference.scoring import get_bear_probs

    wt = seqs[0]
    ps = [len(wt) // 5, 2 * len(wt) // 5, 3 * len(wt) // 5, 4 * len(wt) // 5]
    vars_ = [f"{wt[p]}{p}{a}" for p, a in zip(ps, "ACGT") if wt[p] != a]
    t0 = time.time()
    vscores = get_bear_probs(
        None, wt, vars_, 0, vans=[0.5], get_map=True, counter=tc, lag=lag,
        alphabet_name="dna", h=res.h,
    )
    print(f"scored {len(vars_)} variants (MAP Δ) in {time.time() - t0:.1f}s; "
          f"first={float(vscores[0, 0]):.3f}", flush=True)

    # ---- assemble off the sparse table ------------------------------------
    idx = SparseTableIndex(counter, lag)
    s0 = int(starts[0])
    seed_str = "".join("ACGT"[b] for b in genome[s0:s0 + lag + 3])
    n_gen = 30
    t0 = time.time()
    gen, _ = assemble_no_ends(
        [seed_str], np.array([[0, n_gen]]), 4, lag=lag, counter_table=idx,
        van=1e-9, get_map=True, seed=3)
    want = "".join("ACGT"[b] for b in genome[s0:s0 + lag + 3 + n_gen])
    ok = sum(g == want for g in gen[0])
    assert ok == len(gen[0]), (gen[0][0], want)
    print(f"assembled {len(gen[0])} x {n_gen} letters off the sparse table "
          f"in {time.time() - t0:.1f}s; all reproduce the genome "
          "continuation verbatim", flush=True)
    print("LAG17 DEMO OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
