"""Pallas-lowerable special functions: lgamma / digamma from primitives.

Mosaic (Pallas TPU) cannot lower jax.lax.lgamma/digamma (KernelType.TC
NotImplementedError); any kernel needing in-VMEM likelihood math (e.g.
Dirichlet-multinomial terms) can use these. Only +,*,/,log are used — all
lowerable — via the classic shift-then-Stirling scheme:

  lgamma(x)  = lgamma(x + K) - sum_{i<K} log(x + i)     (recurrence)
  digamma(x) = digamma(x + K) - sum_{i<K} 1 / (x + i)

with K chosen per element so the shifted argument is >= 8, where the
Stirling/asymptotic series converges to float32 accuracy:

  lgamma(z)  ~ (z - 1/2) log z - z + log(2 pi)/2
               + 1/(12 z) - 1/(360 z^3) + 1/(1260 z^5)
  digamma(z) ~ log z - 1/(2 z) - 1/(12 z^2) + 1/(120 z^4) - 1/(252 z^6)

Positive arguments only (concentrations and counts are positive by
construction). Accuracy (tested vs scipy over [1e-8, 1e9]): lgamma max
rel err ~1e-6 in float32 — on par with XLA's own f32 lgamma.
"""

from __future__ import annotations

import jax.numpy as jnp

_HALF_LOG_2PI = 0.9189385332046727  # log(2*pi)/2
_SHIFT = 8  # unrolled recurrence steps; argument after shift is >= 8


def lgamma_pos(x):
    """log Gamma(x) for x > 0, from +,*,/,log only (Pallas-lowerable)."""
    dt = x.dtype
    z = x
    acc = jnp.zeros_like(x)
    for _ in range(_SHIFT):
        shift = z < _SHIFT
        # max() keeps log's argument positive on lanes that do not shift.
        acc = acc + jnp.where(shift, jnp.log(jnp.maximum(z, 1e-30)), 0.0)
        z = z + jnp.where(shift, jnp.ones((), dt), jnp.zeros((), dt))
    inv = 1.0 / z
    inv2 = inv * inv
    series = inv * (1.0 / 12.0 + inv2 * (-1.0 / 360.0 + inv2 * (
        1.0 / 1260.0 + inv2 * (-1.0 / 1680.0 + inv2 * (1.0 / 1188.0)))))
    return (z - 0.5) * jnp.log(z) - z + _HALF_LOG_2PI + series - acc


def digamma_pos(x):
    """digamma(x) for x > 0, from +,*,/,log only (Pallas-lowerable)."""
    dt = x.dtype
    z = x
    acc = jnp.zeros_like(x)
    for _ in range(_SHIFT):
        shift = z < _SHIFT
        acc = acc + jnp.where(shift, 1.0 / jnp.maximum(z, 1e-30), 0.0)
        z = z + jnp.where(shift, jnp.ones((), dt), jnp.zeros((), dt))
    inv = 1.0 / z
    inv2 = inv * inv
    series = inv2 * (-1.0 / 12.0 + inv2 * (1.0 / 120.0 + inv2 * (
        -1.0 / 252.0 + inv2 * (1.0 / 240.0 - inv2 * (1.0 / 132.0)))))
    return jnp.log(z) - 0.5 * inv + series - acc
