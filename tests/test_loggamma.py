"""KS-test the log-gamma sampler against scipy's gamma, across the
concentration range of the reference's test (tests/test_log_gamma.py:9-19),
including the tiny-h regime where naive log(gamma) underflows.
"""

import numpy as np
import jax
import pytest
from scipy import stats as st

from bear_tpu.ops import log_gamma, sample_dirichlet_log


def test_loggamma_ks():
    concs = np.array([0.01, 0.1, 0.5, 0.99, 1.0, 5.0, 100.0])
    n = 100000
    key = jax.random.key(0)
    tiled = np.tile(concs[:, None], (1, n))
    samples = np.asarray(log_gamma(key, tiled.astype(np.float32)))
    for i, conc in enumerate(concs):
        pvalue = st.kstest(np.exp(samples[i].astype(np.float64)), cdf="gamma", args=[conc]).pvalue
        assert pvalue > 0.1 / 6, (conc, pvalue)


def test_loggamma_tiny_conc_no_underflow():
    # conc = 1e-4: log X is around -1e4-scale; the naive sampler would emit -inf.
    key = jax.random.key(1)
    samples = np.asarray(log_gamma(key, np.full(1000, 1e-4, np.float32)))
    assert np.all(np.isfinite(samples))
    # E[log Gamma(c)] = digamma(c) ~ -1/c for tiny c.
    from scipy.special import digamma

    assert abs(np.mean(samples) - digamma(1e-4)) / abs(digamma(1e-4)) < 0.1


def test_loggamma_size_arg():
    key = jax.random.key(2)
    concs = np.ones((3, 5), np.float32)
    out = log_gamma(key, concs, size=(7,))
    assert out.shape == (7, 3, 5)


def test_dirichlet_log_moments():
    # Beta-moment oracle as in reference test_var_prob.py: for Dirichlet with
    # concentration (a, b_total-a), E[log p_0] = digamma(a) - digamma(b_total).
    from scipy.special import digamma

    key = jax.random.key(3)
    concs = np.array([4.1, 1.0, 1.0, 2.0, 0.9], np.float32)
    draws = np.asarray(sample_dirichlet_log(key, concs, size=(200000,)))
    want = digamma(concs) - digamma(concs.sum())
    got = draws.mean(0)
    np.testing.assert_allclose(got, want, rtol=0.02)


def test_log_gamma_pdf_matches_change_of_variables():
    # f_Y(y) for Y = log X, X ~ Gamma(c): gamma.pdf(e^y, c) * e^y.
    from scipy.stats import gamma as sp_gamma

    from bear_tpu.ops.loggamma import log_gamma_pdf

    ys = np.linspace(-8.0, 3.0, 200)
    for c in (0.01, 0.3, 1.0, 7.5):
        want = sp_gamma.pdf(np.exp(ys), c) * np.exp(ys)
        np.testing.assert_allclose(
            np.asarray(log_gamma_pdf(c, ys)), want, rtol=1e-5, atol=1e-12
        )


def _serving_n_iter():
    # Pin the production sampled-serving setting so the 3-proposal
    # fallback-contamination claim stays tested (ADVICE r3).
    from bear_tpu.inference.serving import SAMPLE_PROPOSALS

    return SAMPLE_PROPOSALS


@pytest.mark.parametrize("n_iter", [3, 6])
def test_log_dirichlet_draw_keyed_ks_and_determinism(n_iter):
    # The fixed-iteration batched sampler behind fast posterior-SAMPLED
    # serving: distributionally Gamma (KS, incl. the tiny-conc h-regime) and
    # deterministic per (key, row) — the stateless revisit semantics.
    # n_iter=3 is the production serving setting (serving.SAMPLE_PROPOSALS);
    # 6 is the library default.
    import jax
    import jax.numpy as jnp
    from scipy import stats
    from scipy.special import gammainc

    from bear_tpu.ops.loggamma import fold_in_many, log_dirichlet_draw_keyed

    assert _serving_n_iter() in (3, 6)
    key = jax.random.key(0)
    N = 60_000
    keys = fold_in_many(key, jnp.arange(N))
    concs = [0.01, 0.1, 1.0, 30.0]
    conc_mat = jnp.broadcast_to(jnp.asarray(concs, jnp.float32), (N, 4))
    lg = np.asarray(
        log_dirichlet_draw_keyed(keys, conc_mat, n_iter=n_iter), np.float64)
    for j, c in enumerate(concs):
        u = gammainc(c, np.exp(np.clip(lg[:, j], -700.0, 700.0)))
        p = stats.kstest(u, "uniform").pvalue
        assert p > 0.1 / len(concs), (c, p)
    # determinism: same keys + concs -> bit-identical draws
    lg2 = np.asarray(
        log_dirichlet_draw_keyed(keys, conc_mat, n_iter=n_iter), np.float64)
    np.testing.assert_array_equal(lg, lg2)
    # different rows -> different draws
    keys_b = fold_in_many(key, jnp.arange(N) + N)
    lg3 = np.asarray(log_dirichlet_draw_keyed(keys_b, conc_mat, n_iter=n_iter))
    assert not np.array_equal(lg, lg3)
    # zero concentration -> excluded category
    lgz = np.asarray(log_dirichlet_draw_keyed(
        keys[:8], jnp.asarray([[0.0, 1.0, 2.0, 0.5]] * 8, jnp.float32),
        n_iter=n_iter))
    assert np.all(np.isneginf(lgz[:, 0])) and np.all(np.isfinite(lgz[:, 1:]))


@pytest.mark.parametrize("n_iter", [3, 6])
def test_log_dirichlet_draw_keyed_dirichlet_moments(n_iter):
    import jax
    import jax.numpy as jnp
    from scipy.special import logsumexp

    from bear_tpu.ops.loggamma import fold_in_many, log_dirichlet_draw_keyed

    key = jax.random.key(3)
    N = 120_000
    crow = np.array([0.3, 2.0, 0.0, 5.0, 0.05], np.float32)
    keys = fold_in_many(key, jnp.arange(N))
    lg = np.asarray(log_dirichlet_draw_keyed(
        keys, jnp.broadcast_to(crow, (N, 5)), n_iter=n_iter), np.float64)
    p = np.exp(lg - logsumexp(lg, axis=1, keepdims=True))
    want = crow / crow.sum()
    np.testing.assert_allclose(p.mean(0), want, atol=3e-3)
    var_want = want * (1 - want) / (crow.sum() + 1)
    np.testing.assert_allclose(p.var(0), var_want, rtol=0.05, atol=1e-5)
