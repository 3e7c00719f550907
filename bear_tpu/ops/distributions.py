"""Probability core: pure-function distributions over k-mer transition counts.

The reference wraps TFP distribution objects (bear_model/core.py:11-139,
tfpDirichletMultinomialPerm / tfpMultinomialPerm). On TPU those reduce to a
handful of fused lgamma-ratio expressions, so here they are plain jittable
functions on arrays — XLA fuses the whole likelihood into one kernel and
differentiates it for free.

Semantics contract (verified against the reference's own unit tests,
bear_model/tests/test_core.py:23-26 and 59-60):

- ``dirichlet_multinomial_perm_logpmf(counts, conc)`` equals
  ``sum_b [lgamma(conc_b + n_b) - lgamma(conc_b)]
   - [lgamma(sum_conc + N) - lgamma(sum_conc)]``
  i.e. the Dirichlet-multinomial marginal likelihood of an *ordered* sequence
  of transitions (the multinomial coefficient divided out) — the per-k-mer
  term of the BEAR marginal likelihood.

- ``multinomial_perm_logpmf(counts, probs)`` equals ``sum_b n_b log p_b`` —
  the ordered-observation AR likelihood.

- ``ml_output`` is argmax over the last axis with random tie-breaking noise
  (reference core.py:69-71 and 134-136).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The reference adds tf.keras.backend.epsilon() = 1e-7 to concentrations/probs
# (bear_net.py:43, 68); reproduced here for numeric parity.
EPSILON = 1e-7


def log_combinations(total_count, counts):
    """log multinomial coefficient: log(N! / prod_b n_b!)."""
    return jax.lax.lgamma(total_count + 1.0) - jnp.sum(
        jax.lax.lgamma(counts + 1.0), axis=-1
    )


def dirichlet_multinomial_perm_logpmf(counts, concentration):
    """Ordered Dirichlet-multinomial log-likelihood of transition counts.

    Parameters
    ----------
    counts : [..., B] nonnegative counts (float dtype).
    concentration : broadcastable to counts' shape; positive.

    Returns
    -------
    [...] log-likelihoods (batch shape is the broadcast of both inputs minus
    the last axis).
    """
    counts = jnp.asarray(counts)
    concentration = jnp.asarray(concentration)
    total = jnp.sum(counts, axis=-1)
    sum_conc = jnp.sum(concentration, axis=-1)
    per_bucket = jnp.sum(
        jax.lax.lgamma(concentration + counts) - jax.lax.lgamma(concentration),
        axis=-1,
    )
    normalizer = jax.lax.lgamma(sum_conc + total) - jax.lax.lgamma(sum_conc)
    return per_bucket - normalizer


def multinomial_perm_logpmf(counts, probs):
    """Ordered multinomial log-likelihood: sum_b n_b log p_b (xlogy for 0*log 0)."""
    counts = jnp.asarray(counts)
    probs = jnp.asarray(probs)
    return jnp.sum(jax.scipy.special.xlogy(counts, probs), axis=-1)


def ml_output(scores, key):
    """Most-likely transition: argmax over the last axis, exact ties resolved
    uniformly at random, as a float of scores.dtype.

    The reference perturbs scores with tiny Gaussian noise before argmax
    (core.py:69-71 and 134-136) — which silently stops breaking ties in
    float32, where 1e-7 noise on O(1) scores rounds away. Here ties are broken
    exactly: Gumbel noise is only consulted among entries equal to the row
    maximum, which is dtype-robust and preserves deterministic argmax for
    non-ties.
    """
    scores = jnp.asarray(scores)
    top = jnp.max(scores, axis=-1, keepdims=True)
    gumbel = jax.random.gumbel(key, jnp.shape(scores), dtype=jnp.float32)
    masked = jnp.where(scores == top, gumbel, -jnp.inf)
    return jnp.argmax(masked, axis=-1).astype(scores.dtype)


def ml_output_dm(concentration, key):
    """ml_output for the Dirichlet-multinomial (reference core.py:69-71)."""
    return ml_output(concentration, key)


def ml_output_mult(probs, key):
    """ml_output for the multinomial (reference core.py:134-136)."""
    return ml_output(probs, key)


def bmm_marginal_logpmf(counts, alpha):
    """Vanilla-BEAR (BMM) marginal likelihood term for one batch of counts.

    Equals ``lbeta(counts + alpha) - lbeta(alpha)`` summed over the batch for a
    symmetric Dirichlet prior with concentration alpha per bucket — the
    reference's dataloader._marginal_step (dataloader.py:111-113).

    Parameters
    ----------
    counts : [batch, ..., B]
    alpha : [num_alpha] vector of symmetric prior concentrations.

    Returns
    -------
    [..., num_alpha]: summed over the leading batch axis.
    """
    counts = jnp.asarray(counts)
    alpha = jnp.asarray(alpha)
    # lbeta(v) = sum lgamma(v_b) - lgamma(sum v_b), applied at counts+alpha and alpha.
    expanded = counts[..., None, :] + alpha[:, None]
    zeros = jnp.zeros_like(counts)[..., None, :] + alpha[:, None]

    def lbeta(v):
        return jnp.sum(jax.lax.lgamma(v), axis=-1) - jax.lax.lgamma(
            jnp.sum(v, axis=-1)
        )

    return jnp.sum(lbeta(expanded), axis=0) - jnp.sum(lbeta(zeros), axis=0)
