"""vBEAR: variational h posterior concentrates near the empirical-Bayes point
estimate on the bundled YSD1 data, and the posterior tightens with data."""

import jax.numpy as jnp
import numpy as np
import pytest

from bear_tpu.models import bear_net
from bear_tpu.models.ar_funcs import make_ar_func_stop, make_ar_func_linear
from bear_tpu.models.vbear import train_variational_h
from tests.conftest import reference_data_available


def test_vbear_matches_point_h_toy():
    rng = np.random.default_rng(0)
    n = 256
    codes = rng.integers(0, 4, (n, 3)).astype(np.int8)
    counts = rng.poisson(8.0, (n, 5)).astype(np.float64)

    point = bear_net.train(
        codes, counts, num_kmers=n, ar_func=make_ar_func_stop(3, 4),
        batch_size=n, epochs=400, learning_rate=0.05, train_ar=False,
        dtype=jnp.float64,
    )
    vb = train_variational_h(
        codes, counts, num_kmers=n, ar_func=make_ar_func_stop(3, 4),
        batch_size=n, epochs=400, learning_rate=0.05, dtype=jnp.float64,
    )
    mu, sigma = vb.h_posterior
    # Posterior mode close to the EB point estimate; tight posterior with
    # this much data.
    assert abs(mu - np.log(point.h)) < 3 * sigma + 0.05
    assert sigma < 0.2
    assert np.isfinite(vb.losses).all()
    assert vb.h_samples(__import__("jax").random.key(0), 10).shape == (10,)


@pytest.mark.skipif(not reference_data_available(), reason="needs reference data")
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
