"""Pallas TPU kernel: fused Dirichlet-multinomial ordered log-likelihood.

The training hot op (reference core.py:73-74 inner math) evaluates, per k-mer,

    ll = sum_b [lgamma(c_b + n_b) - lgamma(c_b)]
         - [lgamma(C + N) - lgamma(C)],   C = sum_b c_b, N = sum_b n_b

over arrays of shape [B, A+1] with A+1 = 5. On TPU a 5-wide minor dimension
occupies 5 of 128 lanes — every transcendental runs at <4% lane utilization
in that layout. This kernel computes in the transposed [A+1, B] layout (B on
lanes) with both lgamma passes, the bucket reductions, and the normalizer
fused in VMEM, and a custom VJP (digamma in the same layout) for the backward
pass.

forward:  dm_perm_logpmf_pallas(counts, conc) -> [B] log-likelihoods
backward: d ll / d conc_b = digamma(c_b + n_b) - digamma(c_b)
                            - digamma(C + N) + digamma(C)
counts are sufficient statistics (data): zero cotangent.

STATUS (measured, TPU v5e, B=1M): forward 0.72x vs the XLA-fused
dirichlet_multinomial_perm_logpmf (XLA's native lgamma beats the in-kernel
Stirling implementation Mosaic forces on us), backward 1.39x, and the
backward shows cancellation-amplified error from the VPU's approximate
reciprocal. The op is also <10%% of a lag-13 train step (the CNN dominates).
The XLA path therefore remains the default; this kernel is the documented
experimental alternative and the template for future fused likelihood ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_TILE = 2048

# Mosaic has no lgamma/digamma lowering; implement both with the shift-up
# recurrence into the Stirling regime (z >= 8), using only log/div — VPU ops.
_SHIFT = 8
_HALF_LOG_2PI = 0.9189385332046727


def _stirling_lgamma(z):
    zinv = 1.0 / z
    zinv2 = zinv * zinv
    series = zinv * (1.0 / 12.0 + zinv2 * (-1.0 / 360.0 + zinv2 * (1.0 / 1260.0)))
    return (z - 0.5) * jnp.log(z) - z + _HALF_LOG_2PI + series


def _lgamma(x):
    """lgamma for x > 0, float32-accurate. x < 8: shift-up recurrence
    lgamma(x) = lgamma(x + 8) - sum_{i<8} log(x + i); else Stirling directly
    (the shift product would overflow f32 for large counts)."""
    small = x < _SHIFT
    xs = jnp.where(small, x, 1.0)  # keep the discarded branch's product finite
    shift_prod = xs
    for i in range(1, _SHIFT):
        shift_prod = shift_prod * (xs + i)
    shifted = _stirling_lgamma(xs + _SHIFT) - jnp.log(shift_prod)
    direct = _stirling_lgamma(jnp.maximum(x, _SHIFT))
    return jnp.where(small, shifted, direct)


def _digamma(x):
    """digamma for x > 0, same shift-up scheme."""
    small = x < _SHIFT
    xs = jnp.where(small, x, 1.0)
    rec = 1.0 / xs
    for i in range(1, _SHIFT):
        rec = rec + 1.0 / (xs + i)
    z = jnp.where(small, xs + _SHIFT, jnp.maximum(x, _SHIFT))
    zinv = 1.0 / z
    zinv2 = zinv * zinv
    series = zinv2 * (1.0 / 12.0 + zinv2 * (-1.0 / 120.0 + zinv2 * (1.0 / 252.0)))
    psi_z = jnp.log(z) - 0.5 * zinv - series
    return jnp.where(small, psi_z - rec, psi_z)


def _fwd_kernel(counts_ref, conc_ref, out_ref):
    c = conc_ref[:]          # [A1, T]
    n = counts_ref[:]        # [A1, T]
    per = jnp.sum(_lgamma(c + n) - _lgamma(c), axis=0, keepdims=True)
    csum = jnp.sum(c, axis=0, keepdims=True)
    nsum = jnp.sum(n, axis=0, keepdims=True)
    out_ref[:] = per - (_lgamma(csum + nsum) - _lgamma(csum))


def _bwd_kernel(counts_ref, conc_ref, g_ref, dconc_ref):
    c = conc_ref[:]
    n = counts_ref[:]
    csum = jnp.sum(c, axis=0, keepdims=True)
    nsum = jnp.sum(n, axis=0, keepdims=True)
    grad = (
        _digamma(c + n)
        - _digamma(c)
        - _digamma(csum + nsum)
        + _digamma(csum)
    )
    dconc_ref[:] = grad * g_ref[:]


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=1.0)  # pad conc with 1: lgamma(1)=0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dm_perm_logpmf_pallas(counts, conc, tile: int = DEFAULT_TILE):
    """Fused DM ordered log-likelihood on TPU: counts, conc [B, A+1] -> [B].

    conc must already have counts' full shape (broadcast at the call site).
    Zero-count rows yield exactly 0.
    """
    return _forward(counts, conc, tile)


def _forward(counts, conc, tile):
    assert counts.shape == conc.shape, "broadcast conc to counts' shape first"
    B, A1 = counts.shape
    Bp = -(-B // tile) * tile
    cT = _pad_to(counts.T, Bp, 1)
    aT = _pad_to(conc.T, Bp, 1)
    # pad counts with 0 (the _pad_to constant 1 is for conc); redo for counts:
    if Bp != B:
        cT = cT.at[:, B:].set(0.0)
    grid = (Bp // tile,)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((A1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((A1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Bp), counts.dtype),
    )(cT, aT)
    return out[0, :B]


def _fwd_rule(counts, conc, tile):
    out = _forward(counts, conc, tile)
    return out, (counts, conc)


def _bwd_rule(tile, residuals, g):
    counts, conc = residuals
    B, A1 = counts.shape
    Bp = -(-B // tile) * tile
    cT = _pad_to(counts.T, Bp, 1)
    aT = _pad_to(conc.T, Bp, 1)
    if Bp != B:
        cT = cT.at[:, B:].set(0.0)
    gT = jnp.pad(g[None, :], ((0, 0), (0, Bp - B)))
    grid = (Bp // tile,)
    dconc_T = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((A1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((A1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((A1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A1, Bp), counts.dtype),
    )(cT, aT, gT)
    return jnp.zeros_like(counts), dconc_T[:, :B].T


dm_perm_logpmf_pallas.defvjp(_fwd_rule, _bwd_rule)
