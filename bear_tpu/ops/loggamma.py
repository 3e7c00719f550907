"""Rejection-free log-gamma sampling, stable for tiny concentrations.

The reference samples ``log Gamma(c)`` with a NumPy rejection sampler
(bear_model/log_gamma.py:17-76, ~1e6 samples/s on CPU) because for c ~ h-scale
(1e-2 .. 1e-4) a plain ``log(standard_gamma(c))`` underflows to -inf.

TPU-natively we avoid rejection entirely via the boost identity

    G ~ Gamma(c+1), U ~ Uniform(0,1)  =>  G * U^{1/c} ~ Gamma(c)
    log Gamma(c)  =d=  log G + log(U) / c

which is exact for every c > 0, fully vectorized, branch-free, and therefore
jittable with static shapes. ``log G`` never underflows (c+1 >= 1) and
``log(U)/c`` is computed in log space, so the tiny-c regime is exact where the
naive sampler loses all precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_gamma(key, concs, size=(), dtype=None):
    """Sample log(Gamma(conc, 1)) for each concentration.

    Parameters
    ----------
    key : jax PRNG key
    concs : array of positive concentrations
    size : tuple of leading sample dimensions (reference log_gamma.py:17's
        ``size``); the result has shape ``size + concs.shape``.

    Returns
    -------
    samples of shape size + concs.shape, same dtype as concs (or `dtype`).
    """
    concs = jnp.asarray(concs, dtype=dtype)
    shape = tuple(size) + concs.shape
    k_gamma, k_unif = jax.random.split(key)
    boosted = jax.random.gamma(k_gamma, concs + 1.0, shape=shape, dtype=concs.dtype)
    # log(U) as -Exponential(1): exact and avoids U==0.
    log_u = -jax.random.exponential(k_unif, shape=shape, dtype=concs.dtype)
    return jnp.log(boosted) + log_u / concs


def log_dirichlet_draw(key, conc):
    """log of an unnormalized Dirichlet draw for one concentration vector:
    log Gamma(c_b) per bucket via the boost identity, with zero
    concentrations mapped to -inf (excluded categories). Normalizing with
    logsumexp over the last axis yields log Dirichlet probabilities. The
    single shared implementation for the generation/serving samplers."""
    lg = log_gamma(key, jnp.maximum(conc, 1e-30))
    return jnp.where(conc > 0, lg, -jnp.inf)


def sample_dirichlet_log(key, concs, size=()):
    """Sample log of a Dirichlet(concs) via normalized log-gamma draws.

    Returns log-probabilities of shape size + concs.shape, normalized over the
    last axis with logsumexp (the reference normalizes this way at
    get_var_probs.py:174-175).
    """
    lg = log_gamma(key, concs, size=size)
    return lg - jax.scipy.special.logsumexp(lg, axis=-1, keepdims=True)


def log_gamma_pdf(conc, xs):
    """Density of log(Gamma(conc, 1)) at xs:
    f(y) = exp(conc*y - e^y - lgamma(conc)) (reference log_gamma.py:14-15)."""
    conc = jnp.asarray(conc)
    xs = jnp.asarray(xs)
    return jnp.exp(conc * xs - jnp.exp(xs) - jax.scipy.special.gammaln(conc))
