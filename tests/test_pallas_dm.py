"""Pallas fused DM-likelihood kernel vs the XLA reference implementation,
forward and backward, in interpret mode on CPU (compiled-mode parity is
exercised on real TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bear_tpu.ops.distributions import dirichlet_multinomial_perm_logpmf

pltpu_interpret = pytest.fixture


@pytest.fixture(autouse=True)
def _interpret_mode():
    # CPU tests run the kernel through the Pallas interpreter.
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def _data(B=300, seed=0):
    rng = np.random.default_rng(seed)
    counts = rng.poisson(4.0, (B, 5)).astype(np.float32)
    conc = rng.exponential(1.0, (B, 5)).astype(np.float32) + 0.01
    return jnp.asarray(counts), jnp.asarray(conc)


def test_forward_matches_xla():
    from bear_tpu.ops.pallas_dm import dm_perm_logpmf_pallas

    counts, conc = _data()
    got = dm_perm_logpmf_pallas(counts, conc, 128)
    want = dirichlet_multinomial_perm_logpmf(counts, conc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_forward_unaligned_batch():
    from bear_tpu.ops.pallas_dm import dm_perm_logpmf_pallas

    counts, conc = _data(B=77)
    got = dm_perm_logpmf_pallas(counts, conc, 128)
    want = dirichlet_multinomial_perm_logpmf(counts, conc)
    assert got.shape == (77,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_backward_matches_xla():
    from bear_tpu.ops.pallas_dm import dm_perm_logpmf_pallas

    counts, conc = _data(B=130, seed=1)

    def loss_pallas(a):
        return jnp.sum(dm_perm_logpmf_pallas(counts, a, 128) * 1.7)

    def loss_xla(a):
        return jnp.sum(dirichlet_multinomial_perm_logpmf(counts, a) * 1.7)

    g_pallas = jax.grad(loss_pallas)(conc)
    g_xla = jax.grad(loss_xla)(conc)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla), rtol=2e-4, atol=2e-4)


def test_zero_rows_contribute_zero():
    from bear_tpu.ops.pallas_dm import dm_perm_logpmf_pallas

    counts = jnp.zeros((8, 5), jnp.float32)
    conc = jnp.ones((8, 5), jnp.float32)
    got = dm_perm_logpmf_pallas(counts, conc, 128)
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)
