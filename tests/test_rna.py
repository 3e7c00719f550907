"""RNA-alphabet coverage: counting (forward + reverse complement, A<->U),
training/evaluation and scoring over ACGU (reference alphabets include 'rna',
core.py:142-147; its KMC pipeline itself was DNA-only)."""

from collections import defaultdict

import jax.numpy as jnp
import numpy as np

from bear_tpu.counting import TransitionCounter, chunk_reads, fastx
from bear_tpu.counting.engine import context_to_row
from bear_tpu.models import bear_net, get_ar_func
from bear_tpu.ops import alphabets

RNA = "ACGU"
COMP = str.maketrans("ACGU", "UGCA")
OUT_IDX = {ch: i for i, ch in enumerate(list(RNA) + ["]"])}


def _revcomp(s):
    return s.translate(COMP)[::-1]


def _oracle(seqs_groups, lag, n_groups, reverse):
    out = defaultdict(lambda: np.zeros((n_groups, 5), np.int64))
    for seq, group in seqs_groups:
        for s in [seq, _revcomp(seq)] if reverse else [seq]:
            full = "[" * lag + s + "]"
            for j in range(lag, len(full)):
                out[full[j - lag : j]][group][OUT_IDX[full[j]]] += 1
    return out


def test_rna_counting_matches_oracle():
    rng = np.random.default_rng(41)
    seqs = ["".join(rng.choice(list(RNA), rng.integers(10, 30))) for _ in range(25)]
    groups = [int(g) for g in rng.integers(0, 2, len(seqs))]
    for lag in (1, 3):
        for reverse in (False, True):
            tc = TransitionCounter(lags=[lag], n_groups=2, alphabet="rna",
                                   reverse=reverse)
            enc = ((fastx.encode_seq(s, alphabet="rna"), g)
                   for s, g in zip(seqs, groups))
            for chunk in chunk_reads(enc, lag, batch_size=7):
                tc.add_chunk(chunk)
            oracle = _oracle(zip(seqs, groups), lag, 2, reverse)
            tab = tc.tables[lag]
            for ctx, want in oracle.items():
                r = context_to_row(ctx, lag, "rna")
                np.testing.assert_array_equal(
                    tab[:, r, :], want, err_msg=f"lag {lag} rc={reverse} {ctx}"
                )
            total = tab.sum()
            assert total == sum(
                (len(s) + 1) * (2 if reverse else 1) for s in seqs
            )


def test_rna_counts_to_training_and_scoring():
    from bear_tpu.inference import get_bear_probs_seqs

    rng = np.random.default_rng(42)
    lag = 3
    # Biased base composition so there is structure for the AR to learn.
    seqs = ["".join(rng.choice(list(RNA), rng.integers(12, 25),
                               p=[0.55, 0.2, 0.15, 0.1]))
            for _ in range(40)]
    tc = TransitionCounter(lags=[lag], n_groups=1, alphabet="rna")
    enc = ((fastx.encode_seq(s, alphabet="rna"), 0) for s in seqs)
    for chunk in chunk_reads(enc, lag, batch_size=16):
        tc.add_chunk(chunk)
    ds = tc.to_dataset(lag)
    assert all(set(k) <= set(RNA + "[") for k in ds.kmers)

    ar = get_ar_func("linear", lag, 4, dtype=jnp.float64)
    res = bear_net.train(
        ds.codes, ds.counts[:, 0], num_kmers=ds.num_kmers, ar_func=ar,
        alphabet="rna", batch_size=32, epochs=30, learning_rate=0.02,
        train_ar=True, dtype=jnp.float64,
    )
    assert np.isfinite(res.losses).all()
    assert res.losses[-1] < res.losses[0]

    scores = get_bear_probs_seqs(
        None, ["ACGUA", "UUUUU"], 0, get_map=True, vans=[1.0], lag=lag,
        alphabet_name="rna", data=ds,
    )
    assert scores.shape[0] == 2
    assert np.all(np.isfinite(scores))
