"""Embedded autoregressive functions as pure (init, apply) pairs.

The reference builds closures over tf.Variables (bear_model/ar_funcs.py). Here
each AR function is a pair of pure functions — ``init(key) -> params`` and
``apply(params, one_hot_kmers) -> probs`` — so they compose with jit/grad/vmap
and shard_map. ``params`` is a *list* of arrays in the exact order the
reference stores them (ar_funcs.py:46, 98-99, 127), preserving the
checkpoint contract ([h_signed] + ar_params, bear_net.py:73-100).

Shapes: apply maps [..., lag, alphabet_size+1] one-hot k-mers to
[..., alphabet_size+1] transition probabilities.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ARFunc:
    """A pure AR function: params list + apply(params, one_hot) -> probs.

    apply_codes, when set, computes the same probabilities directly from
    integer-coded k-mers [..., lag]. On TPU this is the fast path: it builds
    a FLAT [..., lag*(A+1)] one-hot (65 -> 128 lane pad, ~2x waste) instead
    of the [..., lag, A+1] layout whose 5-wide minor dim tiles to 128 (25x
    padded HBM traffic). Measured on v5e at lag 13, B=32K: linear BEAR step
    637 -> 1044 steps/s. Bit-compatible contract: apply_codes(params, codes)
    must equal apply(params, one_hot(codes)) up to float reassociation."""

    init: Callable[[jax.Array], List[jax.Array]]
    apply: Callable[[List[jax.Array], jax.Array], jax.Array]
    name: str
    apply_codes: Callable[[List[jax.Array], jax.Array], jax.Array] | None = None


def flat_one_hot(codes, alphabet_size_1, dtype):
    """[..., lag] int codes -> flat [..., lag * A1] one-hot where slot
    k = position * A1 + letter. Lane-efficient on TPU (single minor dim)."""
    lag = codes.shape[-1]
    A1 = alphabet_size_1
    pos_of_k = jnp.asarray(np.repeat(np.arange(lag), A1).astype(np.int32))
    letter_of_k = jnp.asarray(np.tile(np.arange(A1), lag).astype(np.int32))
    g = jnp.take(codes.astype(jnp.int32), pos_of_k, axis=-1)
    return (g == letter_of_k).astype(dtype)


def _l2_normalize(x, axis):
    return x / jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=True), 1e-24))


def _normalize_layer(layer, axis=-1):
    """Scale-free layer normalization (reference ar_funcs.py:5-20).

    Statistics are computed in at least float32 (mean/variance of a bfloat16
    activation would lose most of its bits to cancellation); the result is
    cast back to the activation dtype."""
    ct = jnp.promote_types(layer.dtype, jnp.float32)
    x = layer.astype(ct)
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.var(x, axis=axis, keepdims=True)
    return ((x - mean) / jnp.sqrt(var + 1e-5)).astype(layer.dtype)


def _cast_params(params, compute_dtype):
    """Mixed precision: parameters stay in their stored (master) dtype and are
    cast once at the start of the forward pass; gradients flow back through
    the cast to full-precision master weights (the optimizer never sees the
    compute dtype)."""
    if compute_dtype is None:
        return params
    return [p.astype(compute_dtype) for p in params]


def make_ar_func_linear(lag, alphabet_size, dtype=jnp.float32, compute_dtype=None) -> ARFunc:
    """Linear AR function: softmax of a per-position linear map
    (reference ar_funcs.py:23-46; init 0.05 * l2-normalized normal over the
    input-letter axis).

    compute_dtype (e.g. jnp.bfloat16) runs the matmul in that dtype; logits
    are cast back to the parameter dtype before the softmax."""
    A1 = alphabet_size + 1

    def init(key):
        mat = jax.random.normal(key, (lag, A1, A1), dtype=dtype)
        return [0.05 * _l2_normalize(mat, axis=1)]

    def apply(params, kmers_oh):
        out_dt = params[0].dtype
        (mat,) = _cast_params(params, compute_dtype)
        logits = jnp.einsum("...jk,jkl->...l", kmers_oh.astype(mat.dtype), mat)
        return jax.nn.softmax(logits.astype(out_dt))

    def apply_codes(params, codes):
        out_dt = params[0].dtype
        (mat,) = _cast_params(params, compute_dtype)
        oh = flat_one_hot(codes, A1, mat.dtype)
        logits = oh @ mat.reshape(lag * A1, A1)
        return jax.nn.softmax(logits.astype(out_dt))

    return ARFunc(init=init, apply=apply, name="linear", apply_codes=apply_codes)


def make_ar_func_cnn(
    lag,
    alphabet_size,
    filter_width=8,
    num_filters=30,
    kmer_layer1_width=16,
    dtype=jnp.float32,
    compute_dtype=None,
) -> ARFunc:
    """CNN AR function (reference ar_funcs.py:49-99): conv over the lag axis,
    two normalized dense layers with elu, softmax head. Param order matches
    the reference's list (ar_funcs.py:98-99): [filters, intercept0, weights1,
    intercept1, weights2, intercept2, scale0, scale1].

    compute_dtype (e.g. jnp.bfloat16) runs the conv/dense activations in that
    dtype (normalization statistics stay float32, see _normalize_layer);
    final logits are cast back to the parameter dtype before the softmax."""
    filter_width = int(filter_width)
    num_filters = int(num_filters)
    kmer_layer1_width = int(kmer_layer1_width)
    A1 = alphabet_size + 1
    conv_len = lag - filter_width + 1
    if conv_len < 1:
        # Silent failure mode otherwise: a negative conv length surfaces
        # later as an opaque broadcast error from init().
        raise ValueError(
            f"filter_width {filter_width} exceeds lag {lag}: the VALID conv "
            f"needs filter_width <= lag (reference ar_funcs.py:60)"
        )
    small_start = 0.05

    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        filters = _l2_normalize(
            jax.random.normal(k1, (filter_width, A1, num_filters), dtype=dtype),
            axis=(0, 1),
        )
        intercept0 = jnp.ones((conv_len, num_filters), dtype=dtype)
        scale0 = jnp.ones((conv_len, num_filters), dtype=dtype)
        weights1 = _l2_normalize(
            jax.random.normal(
                k2, (conv_len, num_filters, kmer_layer1_width), dtype=dtype
            ),
            axis=0,
        )
        intercept1 = jnp.ones((kmer_layer1_width,), dtype=dtype)
        scale1 = jnp.ones((kmer_layer1_width,), dtype=dtype)
        weights2 = small_start * _l2_normalize(
            jax.random.normal(k3, (kmer_layer1_width, A1), dtype=dtype), axis=0
        )
        intercept2 = jnp.zeros((A1,), dtype=dtype)
        return [
            filters,
            intercept0,
            weights1,
            intercept1,
            weights2,
            intercept2,
            scale0,
            scale1,
        ]

    def _head(params, conv, lead, out_dt):
        (_, intercept0, weights1, intercept1, weights2, intercept2,
         scale0, scale1) = params
        nn0 = scale0 * _normalize_layer(conv) + intercept0
        nn1 = (
            scale1
            * _normalize_layer(
                jnp.tensordot(jax.nn.elu(nn0), weights1, axes=[[-2, -1], [0, 1]])
            )
            + intercept1
        )
        nn2 = jnp.tensordot(jax.nn.elu(nn1), weights2, axes=[[-1], [0]]) + intercept2
        return jax.nn.softmax(nn2.astype(out_dt)).reshape(lead + (A1,))

    def apply(params, kmers_oh):
        out_dt = params[0].dtype
        params = _cast_params(params, compute_dtype)
        filters = params[0]
        lead = kmers_oh.shape[:-2]
        x = kmers_oh.astype(filters.dtype).reshape((-1, lag, A1))
        # VALID conv over the lag axis ('NWC' x 'WIO' -> 'NWC'); batched over
        # k-mers — XLA maps this onto the MXU as a batched matmul.
        conv = jax.lax.conv_general_dilated(
            x,
            filters,
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return _head(params, conv, lead, out_dt)

    def apply_codes(params, codes):
        out_dt = params[0].dtype
        params = _cast_params(params, compute_dtype)
        filters = params[0]
        lead = codes.shape[:-1]
        oh = flat_one_hot(codes.reshape((-1, lag)), A1, filters.dtype)
        # The VALID conv as ONE flat matmul: band the filters into
        # [lag*A1, conv_len*nf] (conv output j reads one-hot slots
        # j*A1 .. (j+fw)*A1). pad/stack keeps the construction scatter-free
        # and differentiable.
        f2 = filters.reshape(filter_width * A1, num_filters)
        wconv = jnp.stack(
            [
                jnp.pad(f2, ((j * A1, (lag - filter_width - j) * A1), (0, 0)))
                for j in range(conv_len)
            ],
            axis=1,
        ).reshape(lag * A1, conv_len * num_filters)
        conv = (oh @ wconv).reshape(-1, conv_len, num_filters)
        return _head(params, conv, lead, out_dt)

    return ARFunc(init=init, apply=apply, name="cnn", apply_codes=apply_codes)


def make_ar_func_stop(lag, alphabet_size, dtype=jnp.float32, compute_dtype=None) -> ARFunc:
    """Constant stop-predicting AR function — the ``g`` of the reference
    model (reference ar_funcs.py:102-127). No parameters (compute_dtype is
    accepted for interface uniformity; there is nothing to compute)."""
    stop = np.zeros(alphabet_size + 1)
    stop[-1] = 1.0
    stop_const = jnp.asarray(stop, dtype=dtype)

    def init(key):
        return []

    def apply(params, kmers_oh):
        return jnp.broadcast_to(stop_const, kmers_oh.shape[:-2] + stop_const.shape)

    def apply_codes(params, codes):
        return jnp.broadcast_to(stop_const, codes.shape[:-1] + stop_const.shape)

    return ARFunc(init=init, apply=apply, name="stop", apply_codes=apply_codes)


def make_ar_func_attention(
    lag,
    alphabet_size,
    d_model=64,
    num_heads=4,
    mlp_width=128,
    dtype=jnp.float32,
    compute_dtype=None,
) -> ARFunc:
    """Single-block self-attention AR function (bear_tpu extension — the
    reference ships linear/cnn/stop only). Embeds the one-hot context with a
    learned positional encoding, runs one multi-head self-attention + MLP
    block, and reads out transition logits from the final position. All
    matmuls are MXU-shaped (d_model x d_model), making this the
    throughput-friendly choice at large lag."""
    A1 = alphabet_size + 1
    assert d_model % num_heads == 0
    d_head = d_model // num_heads

    def init(key):
        ks = jax.random.split(key, 6)
        scale = float(1.0 / np.sqrt(d_model))  # weak type: no x64 promotion
        embed = 0.05 * _l2_normalize(jax.random.normal(ks[0], (A1, d_model), dtype=dtype), axis=0)
        pos = jnp.zeros((lag, d_model), dtype=dtype)
        wqkv = scale * jax.random.normal(ks[1], (3, d_model, d_model), dtype=dtype)
        wo = scale * jax.random.normal(ks[2], (d_model, d_model), dtype=dtype)
        w1 = scale * jax.random.normal(ks[3], (d_model, mlp_width), dtype=dtype)
        b1 = jnp.zeros((mlp_width,), dtype=dtype)
        w2 = 0.05 * _l2_normalize(jax.random.normal(ks[4], (mlp_width, d_model), dtype=dtype), axis=0)
        b2 = jnp.zeros((d_model,), dtype=dtype)
        w_out = 0.05 * _l2_normalize(jax.random.normal(ks[5], (d_model, A1), dtype=dtype), axis=0)
        b_out = jnp.zeros((A1,), dtype=dtype)
        return [embed, pos, wqkv, wo, w1, b1, w2, b2, w_out, b_out]

    def _block(params, x, lead, out_dt):
        embed, pos, wqkv, wo, w1, b1, w2, b2, w_out, b_out = params
        h = _normalize_layer(x)
        q, k, v = (jnp.einsum("nld,de->nle", h, wqkv[i]) for i in range(3))

        def split(t):
            return t.reshape(t.shape[0], lag, num_heads, d_head).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        att = jax.nn.softmax(
            jnp.einsum("nhqd,nhkd->nhqk", qh, kh) * float(1.0 / np.sqrt(d_head)),
            axis=-1,
        )
        ctx = jnp.einsum("nhqk,nhkd->nhqd", att, vh)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(-1, lag, d_model)
        x = x + ctx @ wo
        y = _normalize_layer(x)
        x = x + jax.nn.gelu(y @ w1 + b1) @ w2 + b2
        logits = x[:, -1, :] @ w_out + b_out
        return jax.nn.softmax(logits.astype(out_dt)).reshape(lead + (A1,))

    def apply(params, kmers_oh):
        out_dt = params[0].dtype
        params = _cast_params(params, compute_dtype)
        embed, pos = params[0], params[1]
        lead = kmers_oh.shape[:-2]
        x = kmers_oh.astype(embed.dtype).reshape((-1, lag, A1)) @ embed + pos
        return _block(params, x, lead, out_dt)

    def apply_codes(params, codes):
        out_dt = params[0].dtype
        params = _cast_params(params, compute_dtype)
        embed, pos = params[0], params[1]
        lead = codes.shape[:-1]
        oh = flat_one_hot(codes.reshape((-1, lag)), A1, embed.dtype)
        # Per-position embedding as ONE flat matmul: block-diagonal
        # kron(I_lag, embed) maps slot (j, letter) to output block j.
        w = jnp.kron(jnp.eye(lag, dtype=embed.dtype), embed)  # [lag*A1, lag*D]
        x = (oh @ w).reshape(-1, lag, d_model) + pos
        return _block(params, x, lead, out_dt)

    return ARFunc(init=init, apply=apply, name="attention",
                  apply_codes=apply_codes)


AR_FUNCS = {
    "linear": make_ar_func_linear,
    "cnn": make_ar_func_cnn,
    "stop": make_ar_func_stop,
    "attention": make_ar_func_attention,
}


def get_ar_func(
    name: str,
    lag: int,
    alphabet_size: int,
    af_kwargs=None,
    dtype=jnp.float32,
    compute_dtype=None,
) -> ARFunc:
    """AR function by config name (reference train_bear_net.py:103).

    compute_dtype=jnp.bfloat16 selects mixed precision: master weights and
    the likelihood stay in ``dtype``; the AR network's matmuls/activations run
    in bfloat16 (MXU-native) with float32 normalization statistics and a
    float32 softmax."""
    return AR_FUNCS[name](
        lag, alphabet_size, **(af_kwargs or {}), dtype=dtype, compute_dtype=compute_dtype
    )
