"""Protein-alphabet coverage: the reference trains protein models from
externally-prepared count files (alphabets include 'prot', core.py:142-153);
verify the full train/eval/scoring stack handles the 21-letter alphabet."""

import jax
import jax.numpy as jnp
import numpy as np

from bear_tpu.models import bear_net, get_ar_func
from bear_tpu.ops import alphabets


def _protein_data(n=120, lag=3, seed=0):
    rng = np.random.default_rng(seed)
    A1 = alphabets.alphabet_size("prot") + 1  # 21
    codes = rng.integers(0, 20, size=(n, lag)).astype(np.int8)
    counts = rng.poisson(2.0, size=(n, 2, A1)).astype(np.float64)
    return codes, counts, A1


def test_protein_train_eval():
    codes, counts, A1 = _protein_data()
    ar = get_ar_func("linear", 3, 20, dtype=jnp.float64)
    res = bear_net.train(
        codes, counts[:, 0], num_kmers=len(codes), ar_func=ar,
        alphabet="prot", batch_size=64, epochs=30, learning_rate=0.02,
        train_ar=False, dtype=jnp.float64,
    )
    assert np.isfinite(res.losses).all()
    assert res.losses[-1] < res.losses[0]
    out = bear_net.evaluation(
        codes, counts, 0, 1, "prot", res.h, ar, res.params["ar"],
        np.array([0.1, 1.0]), dtype=jnp.float64,
    )
    assert np.isfinite(out[0]) and out[5].shape == (2,)


def test_protein_cnn_and_attention():
    codes, counts, A1 = _protein_data(lag=5)
    for name, kwargs in [
        ("cnn", {"filter_width": 3, "num_filters": 8, "kmer_layer1_width": 8}),
        ("attention", {"d_model": 32, "num_heads": 2, "mlp_width": 32}),
    ]:
        ar = get_ar_func(name, 5, 20, kwargs, dtype=jnp.float64)
        probs = ar.apply(
            ar.init(jax.random.key(0)), alphabets.one_hot(codes, 21, jnp.float64)
        )
        assert probs.shape == (len(codes), 21)
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-6)


def test_protein_scoring():
    from bear_tpu.data import CountDataset
    from bear_tpu.inference import get_bear_probs_seqs

    rng = np.random.default_rng(1)
    lag = 2
    letters = alphabets.input_letters("prot")[:-1]
    kmer_strings = np.array(
        ["".join(rng.choice(letters, lag)) for _ in range(40)]
    )
    kmer_strings = np.unique(kmer_strings)
    ds = CountDataset(
        kmers=kmer_strings,
        codes=alphabets.encode_kmers(kmer_strings, "prot"),
        counts=rng.poisson(3.0, (len(kmer_strings), 1, 21)).astype(np.float64),
        alphabet="prot",
    )
    seqs = ["".join(rng.choice(letters, 6)) for _ in range(3)]
    scores = get_bear_probs_seqs(
        None, seqs, 0, vans=[1.0], lag=lag, alphabet_name="prot",
        data=ds, mc_samples=16,
    )
    assert scores.shape == (3, 1, 16)
    assert np.isfinite(scores).all()
