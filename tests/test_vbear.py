"""vBEAR: variational h posterior concentrates near the empirical-Bayes point
estimate on the bundled YSD1 data, and the posterior tightens with data."""

import jax.numpy as jnp
import numpy as np
import pytest

from bear_tpu.models import bear_net
from bear_tpu.models.ar_funcs import make_ar_func_stop, make_ar_func_linear
from bear_tpu.models.vbear import train_variational_h


def _uniform_ar(lag, A1):
    from bear_tpu.models.ar_funcs import ARFunc

    return ARFunc(
        init=lambda key: [],
        apply=lambda params, oh: jnp.full(oh.shape[:-2] + (A1,), 1.0 / A1, oh.dtype),
        name="uniform",
    )


def test_vbear_matches_point_h_identifiable():
    # Generate counts from the model itself: v_k ~ Dirichlet(f/h_true) with
    # f uniform, so h is identifiable and the variational posterior must
    # concentrate at the empirical-Bayes point estimate.
    rng = np.random.default_rng(0)
    n, A1 = 512, 5
    h_true = 0.5
    p = rng.dirichlet(np.full(A1, (1.0 / A1) / h_true), size=n)
    counts = np.stack([rng.multinomial(40, pi) for pi in p]).astype(np.float64)
    codes = rng.integers(0, 4, (n, 3)).astype(np.int8)
    ar = _uniform_ar(3, A1)

    point = bear_net.train(
        codes, counts, num_kmers=n, ar_func=ar,
        batch_size=n, epochs=600, learning_rate=0.05, train_ar=False,
        dtype=jnp.float64,
    )
    vb = train_variational_h(
        codes, counts, num_kmers=n, ar_func=ar,
        batch_size=n, epochs=600, learning_rate=0.05, dtype=jnp.float64,
    )
    mu, sigma = vb.h_posterior
    assert abs(np.log(point.h) - np.log(h_true)) < 0.2  # EB recovers h_true
    assert abs(mu - np.log(point.h)) < 3 * sigma + 0.05
    assert sigma < 0.2
    assert np.isfinite(vb.losses).all()
    assert vb.h_samples(__import__("jax").random.key(0), 10).shape == (10,)


def test_vbear_ysd1():
    from bear_tpu.data import load_dense
    from bear_tpu.utils.config import bundled_ysd1_path

    ds = load_dense(bundled_ysd1_path(), "dna", 3)
    vb = train_variational_h(
        ds.codes, ds.counts[:, 0], num_kmers=ds.num_kmers,
        ar_func=make_ar_func_linear(5, 4, dtype=jnp.float64),
        batch_size=1500, epochs=3000, learning_rate=0.01, dtype=jnp.float64,
        seed=10,
    )
    mu, sigma = vb.h_posterior
    # Published EB point estimate: h = 0.0433 (docs table).
    assert abs(vb.h - 0.0433) / 0.0433 < 0.25, (vb.h, sigma)
    assert sigma < 0.25


def test_vbear_shard_invariance():
    # 8-device data-parallel mesh must reproduce the single-device run
    # (same seed, same reparameterized draws; only reduction order differs).
    from bear_tpu.parallel.mesh import data_parallel_mesh

    rng = np.random.default_rng(3)
    n, A1 = 256, 5
    p = rng.dirichlet(np.full(A1, 0.4), size=n)
    counts = np.stack([rng.multinomial(25, pi) for pi in p]).astype(np.float64)
    codes = rng.integers(0, 4, (n, 3)).astype(np.int8)
    ar = _uniform_ar(3, A1)
    kwargs = dict(
        num_kmers=n, ar_func=ar, batch_size=64, epochs=40,
        learning_rate=0.05, dtype=jnp.float64, seed=5,
    )
    single = train_variational_h(codes, counts, **kwargs)
    sharded = train_variational_h(codes, counts, mesh=data_parallel_mesh(8), **kwargs)
    np.testing.assert_allclose(
        sharded.h_posterior, single.h_posterior, rtol=1e-8
    )
    np.testing.assert_allclose(sharded.losses, single.losses, rtol=1e-8)
