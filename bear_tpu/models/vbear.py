"""vBEAR: variational posterior over the concentration parameter h.

The reference fits a single empirical-Bayes point estimate of h
(bear_net.py: h_signed trained by gradient ascent on the marginal
likelihood). vBEAR upgrades that to a mean-field Gaussian posterior over
log h:

    q(log h) = Normal(mu, sigma^2),   p(log h) = Normal(mu0, sigma0^2)

    ELBO = E_q [ sum_kmers log DM(counts | f(kmer)/h) ] - KL(q || p)

optimized by the reparameterization trick (one log h draw per step) jointly
with the AR parameters. The posterior over h is itself a diagnostic: its
spread quantifies how identifiable the misspecification scale is, not just
its point value. Setting sigma -> 0 recovers the reference's point-h
training exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bear_tpu.models.ar_funcs import ARFunc
from bear_tpu.models.bear_net import (
    _stack_batches,
    bear_log_prob,
    make_optimizer,
)
from bear_tpu.ops import alphabets


@dataclass
class VBearResult:
    params: dict  # {"h_mu", "h_log_sigma", "ar": [...]}
    losses: np.ndarray

    @property
    def h_posterior(self) -> tuple[float, float]:
        """(mu, sigma) of q(log h)."""
        return (
            float(np.asarray(self.params["h_mu"])),
            float(np.exp(np.asarray(self.params["h_log_sigma"]))),
        )

    @property
    def h(self) -> float:
        """Posterior-median h = exp(mu)."""
        return float(np.exp(np.asarray(self.params["h_mu"])))

    def h_samples(self, key, n: int) -> np.ndarray:
        mu, sigma = self.h_posterior
        return np.exp(mu + sigma * np.asarray(jax.random.normal(key, (n,))))


def train_variational_h(
    codes,
    counts,
    num_kmers,
    ar_func: ARFunc,
    *,
    alphabet: str = "dna",
    batch_size: int,
    epochs: int = 1,
    learning_rate: float = 0.01,
    optimizer_name: str = "Adam",
    prior_mu: float = 0.0,
    prior_sigma: float = 10.0,
    init_sigma: float = 0.1,
    seed: int = 0,
    dtype=jnp.float32,
    mesh=None,
) -> VBearResult:
    """Fit AR params + Gaussian variational posterior over log h."""
    A1 = alphabets.alphabet_size(alphabet) + 1
    key = jax.random.key(seed)
    params = {
        "h_mu": jnp.zeros((), dtype=dtype),
        "h_log_sigma": jnp.asarray(np.log(init_sigma), dtype=dtype),
        "ar": [jnp.asarray(p, dtype=dtype) for p in ar_func.init(key)],
    }
    optimizer = make_optimizer(optimizer_name, learning_rate)
    opt_state = optimizer.init(params)

    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
    codes_s, counts_s, sizes = _stack_batches(
        np.asarray(codes), np.asarray(counts, dtype=np.dtype(dtype)), batch_size, n_dev
    )
    steps_per_epoch = codes_s.shape[0]
    total_steps = steps_per_epoch * int(epochs)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from bear_tpu.parallel.mesh import put_global

        sh = NamedSharding(mesh, P(None, "data"))
        codes_s = put_global(codes_s, sh)
        counts_s = put_global(counts_s, sh)
    else:
        codes_s = jnp.asarray(codes_s)
        counts_s = jnp.asarray(counts_s)
    sizes = jnp.asarray(sizes)
    num_kmers = jnp.asarray(num_kmers, dtype=dtype)
    prior_mu = jnp.asarray(prior_mu, dtype=dtype)
    prior_sigma = jnp.asarray(prior_sigma, dtype=dtype)

    def loss_fn(p, codes_b, counts_b, actual_size, eps):
        sigma = jnp.exp(p["h_log_sigma"])
        log_h = p["h_mu"] + sigma * eps  # reparameterized q draw
        oh = alphabets.one_hot(codes_b, A1, dtype)
        probs = ar_func.apply(p["ar"], oh)
        ll = jnp.sum(bear_log_prob(counts_b, probs, jnp.exp(log_h)))
        expected_ll = (num_kmers / actual_size) * ll
        kl = (
            jnp.log(prior_sigma / sigma)
            + (sigma**2 + (p["h_mu"] - prior_mu) ** 2) / (2.0 * prior_sigma**2)
            - 0.5
        )
        return -(expected_ll - kl)

    grad_fn = jax.value_and_grad(loss_fn)
    base_key = jax.random.key(seed + 1)

    # Data stacks enter as jit ARGUMENTS (multi-process global arrays may not
    # be closed over; see bear_net.train).
    def run(p, o, codes_s, counts_s, sizes):
        def step(carry, t):
            p, o = carry
            idx = t % steps_per_epoch
            eps = jax.random.normal(
                jax.random.fold_in(base_key, t), (), dtype=dtype
            )
            loss, grads = grad_fn(
                p,
                jax.lax.dynamic_index_in_dim(codes_s, idx, keepdims=False),
                jax.lax.dynamic_index_in_dim(counts_s, idx, keepdims=False),
                sizes[idx],
                eps,
            )
            updates, o = optimizer.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        return jax.lax.scan(step, (p, o), jnp.arange(total_steps))

    run = jax.jit(run)
    (params, _), losses = run(params, opt_state, codes_s, counts_s, sizes)
    return VBearResult(
        params=jax.tree.map(lambda x: np.asarray(x), params),
        losses=np.asarray(losses),
    )
