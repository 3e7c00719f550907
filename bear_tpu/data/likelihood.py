"""Whole-dataset BMM (vanilla-BEAR) marginal likelihood.

Replaces the reference's MirroredStrategy-distributed reduction
(bear_model/dataloader.py:111-147) with a single jitted scan over count
batches; multi-device execution shards the k-mer axis and psums, see
bear_tpu.parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bear_tpu.ops.distributions import bmm_marginal_logpmf


def bmm_likelihood(counts, alpha, batch_size: int = 1 << 16):
    """Exact BMM marginal likelihood of a dataset for a vector of priors.

    Parameters
    ----------
    counts : [num_kmers, num_ds, alphabet_size+1] array (host or device).
    alpha : [num_alpha] symmetric Dirichlet concentrations.

    Returns
    -------
    [num_ds, num_alpha] log-likelihoods (matches reference
    dataloader.bmm_likelihood's output shape).
    """
    if not isinstance(counts, jax.Array):
        counts = np.asarray(counts)
    alpha_j = jnp.asarray(alpha)

    @jax.jit
    def step(batch):
        return bmm_marginal_logpmf(batch, alpha_j)

    # Host-side batching keeps memory bounded for genome-scale datasets; the
    # cross-batch accumulation is float64 on the host so evidence totals stay
    # exact even when device compute is float32 (x64 off). The tail batch is
    # zero-padded to batch_size (zero count rows contribute exactly 0) so the
    # whole call uses ONE compilation.
    total = np.zeros((counts.shape[1], np.shape(alpha)[0]), dtype=np.float64)
    n = counts.shape[0]
    for start in range(0, n, batch_size):
        batch = counts[start : start + batch_size]
        if batch.shape[0] < batch_size and n > batch_size:
            pad = batch_size - batch.shape[0]
            batch = (
                jnp.pad(batch, ((0, pad), (0, 0), (0, 0)))
                if isinstance(batch, jax.Array)
                else np.pad(batch, ((0, pad), (0, 0), (0, 0)))
            )
        total += np.asarray(step(jnp.asarray(batch)), dtype=np.float64)
    return total
