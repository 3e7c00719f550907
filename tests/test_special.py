"""Pallas-lowerable lgamma/digamma vs scipy over the concentration range."""

import numpy as np
import pytest
import scipy.special as ss

import jax.numpy as jnp

from bear_tpu.ops.special import digamma_pos, lgamma_pos


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_lgamma_matches_scipy(dtype):
    x = np.concatenate([
        np.logspace(-8, 9, 400),
        np.linspace(0.1, 20, 200),
        np.array([1.0, 2.0, 0.5]),
    ]).astype(dtype)
    got = np.asarray(lgamma_pos(jnp.asarray(x)))
    want = ss.gammaln(x.astype(np.float64))
    tol = 5e-6 if dtype == np.float32 else 1e-12
    denom = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / denom) < tol


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_digamma_matches_scipy(dtype):
    x = np.concatenate([
        np.logspace(-8, 9, 400),
        np.linspace(0.1, 20, 200),
    ]).astype(dtype)
    got = np.asarray(digamma_pos(jnp.asarray(x)))
    want = ss.digamma(x.astype(np.float64))
    tol = 5e-6 if dtype == np.float32 else 1e-12
    denom = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / denom) < tol


def test_lgamma_difference_form():
    # The DM likelihood consumes lgamma(c + n) - lgamma(c); check the
    # difference (the quantity that matters) at small c / large n.
    c = np.array([1e-7, 1e-4, 0.1, 2.0], np.float32)
    n = np.array([74000.0, 3.0, 100.0, 0.0], np.float32)
    got = np.asarray(lgamma_pos(jnp.asarray(c + n)) - lgamma_pos(jnp.asarray(c)))
    want = ss.gammaln((c + n).astype(np.float64)) - ss.gammaln(c.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=3e-6, atol=2e-3)
