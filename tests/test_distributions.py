"""Probability-core contracts vs closed-form scipy formulas.

Mirrors the oracle style of the reference's tests/test_core.py: the
distribution functions must equal the explicit lgamma expressions
(test_core.py:23-26, 59-60) and ml_output must tie-break randomly
(test_core.py:29-39, 63-73).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import stats as st
from scipy.special import loggamma

from bear_tpu.ops import (
    bmm_marginal_logpmf,
    dirichlet_multinomial_perm_logpmf,
    log_combinations,
    ml_output_dm,
    ml_output_mult,
    multinomial_perm_logpmf,
)


def test_dirichlet_multinomial_perm_matches_lgamma_formula():
    rng = np.random.default_rng(0)
    shape = (3, 5)
    B = 5
    counts = rng.poisson(3.0, size=shape + (B,)).astype(np.float32)
    conc = rng.exponential(size=(shape[1], B)).astype(np.float32)
    total = counts.sum(-1)
    sum_conc = conc.sum(-1)

    got = dirichlet_multinomial_perm_logpmf(counts, conc)
    want = np.sum(loggamma(conc + counts) - loggamma(conc), axis=-1) - (
        loggamma(sum_conc + total) - loggamma(sum_conc)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_multinomial_perm_matches_nlogp():
    rng = np.random.default_rng(1)
    shape = (3, 5)
    B = 5
    counts = rng.poisson(3.0, size=shape + (B,)).astype(np.float32)
    probs = rng.exponential(size=(shape[1], B)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)

    got = multinomial_perm_logpmf(counts, probs)
    want = np.sum(counts * np.log(probs), axis=-1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_multinomial_perm_zero_counts_zero_probs():
    # xlogy: a zero count against a zero prob contributes 0, not nan.
    counts = jnp.array([2.0, 0.0])
    probs = jnp.array([1.0, 0.0])
    assert np.isfinite(float(multinomial_perm_logpmf(counts, probs)))


def test_log_combinations():
    counts = np.array([3.0, 1.0, 2.0])
    total = counts.sum()
    got = float(log_combinations(jnp.asarray(total), jnp.asarray(counts)))
    want = loggamma(7.0) - (loggamma(4.0) + loggamma(2.0) + loggamma(3.0))
    assert abs(got - want) < 1e-5


@pytest.mark.parametrize("ml_fn", [ml_output_dm, ml_output_mult])
def test_ml_output_tie_breaking(ml_fn):
    # Ties between buckets 0 and 2 must be resolved randomly
    # (z-test as in reference test_core.py:29-39).
    scores = jnp.array([1.0, 0.5, 1.0])
    n_trials = 1000
    keys = jax.random.split(jax.random.key(0), n_trials)
    outs = np.asarray(jax.vmap(ml_fn, in_axes=(None, 0))(scores, keys))
    assert set(np.unique(outs)) <= {0.0, 2.0}
    assert abs(np.sum(outs - 1.0) / np.sqrt(n_trials)) < st.norm.ppf(0.9995)


def test_ml_output_no_tie_deterministic():
    conc = np.random.default_rng(2).exponential(size=(5, 5)).astype(np.float32)
    got = ml_output_dm(jnp.asarray(conc), jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(got), np.argmax(conc, -1).astype(np.float32))


def test_bmm_marginal_matches_numpy():
    # Oracle from reference tests/test_dataloader.py:42-47.
    rng = np.random.default_rng(4)
    counts = rng.poisson(5.0, size=(13, 3, 5)).astype(np.float32)
    alpha = np.array([0.1, 1.0, 10.0], dtype=np.float32)
    want = np.sum(
        (
            np.sum(loggamma(counts[:, :, None, :] + alpha[:, None]), axis=-1)
            - loggamma(np.sum(counts[:, :, None, :] + alpha[:, None], axis=-1))
        )
        - (
            np.sum(loggamma(0 * counts[:, :, None, :] + alpha[:, None]), axis=-1)
            - loggamma(np.sum(0 * counts[:, :, None, :] + alpha[:, None], axis=-1))
        ),
        axis=0,
    )
    got = bmm_marginal_logpmf(jnp.asarray(counts), jnp.asarray(alpha))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)
