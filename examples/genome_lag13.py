"""End-to-end genome-scale demo: E. coli-sized genome at lag 13 on one chip.

Synthesizes a 4.6 Mb genome (order-2 Markov, so there is real transition
structure to learn), slices it into 150 bp reads at a chosen coverage, then:

1. streams the reads through the counting engine at lag 13 (train/test split
   as two dataset groups, matching the reference's train/test count columns);
2. hands counts to training IN MEMORY (no TSV round trip);
3. trains a CNN embedded-AR BEAR with empirical-Bayes h;
4. evaluates heldout perplexity/accuracy against AR and BMM readings.

Run: python examples/genome_lag13.py [--genome-mb 4.6] [--coverage 10]

Measured (TPU v5e, one chip, remote-tunnel setup): 1,158,428 distinct lag-13
contexts from 46.3M transitions; BEAR heldout perplexity 1.199 / accuracy
93.8% vs point-AR 5.27 / 1.2% — the posterior predictive nails the repeat
structure the AR function alone cannot. Wall-clock on a tunneled chip is
dominated by per-dispatch relay latency and remote compilation, not device
compute (the counting itself is ~0.5 s of device time at ~90M transitions/s,
see PERF.md); on directly-attached hardware the whole run is ~1-2 minutes.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def synth_genome(rng, length, template_len=100_000, mutation_rate=0.01):
    """Repeat-with-mutations genome: a random template tiled to `length` with
    point substitutions — vectorized, and highly structured at lag 13 (real
    genomes are repetitive, which is exactly what BEAR exploits)."""
    template = rng.integers(0, 4, template_len, dtype=np.int8)
    reps = -(-length // template_len)
    genome = np.tile(template, reps)[:length]
    mut = rng.random(length) < mutation_rate
    genome[mut] = (genome[mut] + rng.integers(1, 4, mut.sum())) % 4
    return genome


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=4.6)
    ap.add_argument("--coverage", type=float, default=10.0)
    ap.add_argument("--lag", type=int, default=13)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=1 << 15)
    args = ap.parse_args()

    from bear_tpu.counting.engine import ReadChunk, TransitionCounter
    from bear_tpu.models import bear_net, get_ar_func
    from bear_tpu.utils.cli_common import enable_compilation_cache
    from bear_tpu.utils.profiling import StageTimer

    enable_compilation_cache(os.environ.get(
        "BEAR_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    ))

    timer = StageTimer()
    rng = np.random.default_rng(0)
    G = int(args.genome_mb * 1e6)

    with timer.stage("synthesize genome"):
        genome = synth_genome(rng, G)

    n_reads = int(G * args.coverage / args.read_len)
    with timer.stage("slice reads"):
        starts = rng.integers(0, G - args.read_len, size=n_reads)
        reads = genome[starts[:, None] + np.arange(args.read_len)[None, :]]
        groups = (rng.random(n_reads) < 0.25).astype(np.int32)  # 0=train, 1=test

    counter = TransitionCounter(lags=[args.lag], n_groups=2)
    B = 16384  # big chunks amortize per-dispatch latency (tunneled setups)
    with timer.stage(f"count lag-{args.lag}"):
        for s in range(0, n_reads, B):
            sub = reads[s : s + B]
            n = len(sub)
            # constant chunk shape (zero-length pad rows) = one compilation
            codes = np.zeros((B, args.read_len), np.int8)
            codes[:n] = sub
            lengths = np.zeros(B, np.int32)
            lengths[:n] = args.read_len
            stopped = np.zeros(B, bool)
            stopped[:n] = True
            grp = np.zeros(B, np.int32)
            grp[:n] = groups[s : s + B]
            counter.add_chunk(
                ReadChunk(codes, lengths, np.zeros(B, np.int32), stopped, grp)
            )
        # No flush: counts stay device-resident for the on-device handoff
        # below (auto-flush still guards the int32 range on longer runs).
        counter.sync()
    total_transitions = n_reads * (args.read_len + 1)

    with timer.stage("on-device dataset handoff"):
        # Counts never leave the device: k-mer codes are decoded
        # arithmetically from the table row indices (engine.decode_rows).
        codes_d, counts_d = counter.to_device_dataset(args.lag)
        num_kmers = int(codes_d.shape[0])
    print(f"{num_kmers:,} distinct lag-{args.lag} contexts "
          f"from {total_transitions:,} transitions")

    ar = get_ar_func("cnn", args.lag, 4,
                     {"filter_width": min(8, args.lag),
                      "num_filters": 96, "kmer_layer1_width": 64},
                     dtype=jnp.float32)
    with timer.stage("train BEAR"):
        res = bear_net.train(
            codes_d, counts_d[:, 0], num_kmers=num_kmers, ar_func=ar,
            batch_size=args.batch_size, epochs=args.epochs,
            learning_rate=0.005, train_ar=False, dtype=jnp.float32,
        )
    print(f"learned h = {res.h:.4g}; ELBO {res.elbos[0]:.4g} -> {res.elbos[-1]:.4g}")

    with timer.stage("evaluate"):
        out = bear_net.evaluation(
            codes_d, counts_d, 0, 1, "dna", res.h, ar,
            [jnp.asarray(p) for p in res.params["ar"]],
            np.array([0.1, 1.0, 10.0]), dtype=jnp.float32,
        )
    print(f"heldout perplexity: BEAR {float(out[3]):.4f}  AR {float(out[4]):.4f}  "
          f"BMM {np.array2string(np.asarray(out[5]), precision=4)}")
    print(f"heldout accuracy:   BEAR {float(out[6]):.4f}  AR {float(out[7]):.4f}")
    timer.report()

    count_stage = dict(timer.stages)[f"count lag-{args.lag}"]
    print(f"counting throughput: {total_transitions / count_stage / 1e6:.1f}M transitions/s")


if __name__ == "__main__":
    main()
