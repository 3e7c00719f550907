"""Reference-guided BEAR: the embedded AR function mixes a learned net with
Jukes-Cantor-smoothed reference-genome transition counts.

Mirror of the reference's bear_model/bear_ref.py as pure functions:

- ``counts_to_probs`` (reference bear_ref.py:9-33): l1-normalize reference
  counts, apply Jukes-Cantor error smoothing
  ``e^{-tau} * norm + (1 - e^{-tau})/|B|`` on residues, zero stop probability.
- ``make_ref_ar_func`` (reference bear_ref.py:36-69): learnable
  ``tau_signed`` (init log(1/30)) and ``net_weight_signed`` (init -log 100);
  ``f = (nu * g(kmers) + JC(ref)) / (nu + 1)``.
- Training/evaluation reuse bear_net's scan machinery via its ``ref_counts``
  pass-through; the stop column of the reference counts is stripped and an
  epsilon added exactly as the reference's data map does
  (bear_ref.py:332-337).

Derived diagnostics (reference models/train_bear_ref.py:143-147):
error rate = 1 - e^{-tau}; stop rate = nu/(1+nu) contribution.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from bear_tpu.models import bear_net
from bear_tpu.models.ar_funcs import ARFunc
from bear_tpu.ops.distributions import EPSILON


def counts_to_probs(ref_counts, tau, alphabet_size):
    """Jukes-Cantor smoothing of reference transition counts
    (reference bear_ref.py:9-33). ref_counts must already have stops zeroed
    and epsilon added on residues (see prepare_ref_counts).

    The l1-normalization guards against all-zero rows (zero-padded batch
    slots): 0/0 would poison gradients (xlogy's d/dy = x/y) and evaluation
    likelihoods with NaN; such rows fall back to the JC-uniform and contribute
    exactly zero likelihood and gradient because their counts are zero."""
    total = jnp.sum(jnp.abs(ref_counts), axis=-1, keepdims=True)
    # Floor with float32's tiny, NOT the dtype's own: TPU float64 is emulated
    # as a double-float32 pair whose exponent range is float32's, so
    # finfo(float64).tiny (2.2e-308) silently underflows to 0 there and the
    # zero-padded batch rows become 0/0 = NaN — the step-0 NaN that killed
    # every f64 reference-BEAR run on TPU. Real rows carry >= 4*EPSILON
    # (prepare_ref_counts), so any floor below ~1e-8 is semantically inert.
    tiny = jnp.asarray(np.finfo(np.float32).tiny, ref_counts.dtype)
    norm = ref_counts / jnp.maximum(total, tiny)
    shape = jnp.concatenate(
        [jnp.ones(alphabet_size, dtype=ref_counts.dtype),
         jnp.zeros(1, dtype=ref_counts.dtype)]
    )
    base = (1.0 / alphabet_size) * shape
    return base + jnp.exp(-tau) * (norm - base)


def prepare_ref_counts(ref_column, alphabet_size, dtype):
    """(ref + eps) * not_stop — strip stops, add epsilon so normalization is
    well-defined (reference bear_ref.py:332-337)."""
    ref = jnp.asarray(np.asarray(ref_column), dtype=dtype)
    not_stop = 1.0 - jax.nn.one_hot(alphabet_size, alphabet_size + 1, dtype=dtype)
    return (ref + EPSILON) * not_stop


def make_ref_ar_func(lag, alphabet_size, make_net_func, af_kwargs=None,
                     dtype=jnp.float32, compute_dtype=None) -> ARFunc:
    """Wrap a net AR function with the reference-guided mixture.

    Params order matches the reference checkpoint layout
    (bear_ref.py:69): [tau_signed, net_weight_signed] + net_params.
    apply takes (params, one_hot_kmers, ref_counts).

    compute_dtype applies to the inner ``g`` net only (mixed precision); the
    JC mixture itself is a handful of elementwise ops and stays in dtype."""
    net = make_net_func(lag, alphabet_size, **(af_kwargs or {}), dtype=dtype,
                        compute_dtype=compute_dtype)

    def init(key) -> List[jax.Array]:
        return [
            jnp.asarray(np.log(1 / 30), dtype=dtype),   # tau_signed
            jnp.asarray(-np.log(100), dtype=dtype),     # net_weight_signed
        ] + net.init(key)

    def apply(params, kmers_oh, ref_counts):
        # Clamp the signed exponents to ±40 (e^40 ≈ 2e17): exp overflow of
        # tau/nu turns the mixture into inf/inf = NaN. Converged values sit
        # near log(1/30) and -log(100), so the clamp is inert in any sane
        # region — it only stops a parameter that imprecise arithmetic (e.g.
        # TPU-emulated float64) has already sent running from exploding.
        tau = jnp.exp(jnp.clip(params[0], -40.0, 40.0))
        nw = jnp.exp(jnp.clip(params[1], -40.0, 40.0))
        g = net.apply(params[2:], kmers_oh)
        return (nw * g + counts_to_probs(ref_counts, tau, alphabet_size)) / (nw + 1.0)

    return ARFunc(init=init, apply=apply, name=f"ref[{net.name}]")


def train(
    codes,
    counts,
    ref_column,
    num_kmers,
    net_func_factory,
    af_kwargs=None,
    *,
    alphabet="dna",
    lag=None,
    dtype=jnp.float32,
    compute_dtype=None,
    **kwargs,
) -> bear_net.TrainResult:
    """Train a reference-guided BEAR/AR model (reference bear_ref.py:262-389).

    Parameters mirror bear_net.train, plus:
    ref_column : [N, alphabet_size+1] raw reference counts column.
    net_func_factory : e.g. ar_funcs.make_ar_func_stop — the ``g`` net.
    compute_dtype : mixed precision for the inner ``g`` net (see
        make_ref_ar_func).
    """
    from bear_tpu.ops import alphabets as _alph

    A = _alph.alphabet_size(alphabet)
    lag = lag if lag is not None else np.asarray(codes).shape[-1]
    ar_func = make_ref_ar_func(lag, A, net_func_factory, af_kwargs, dtype=dtype,
                               compute_dtype=compute_dtype)
    ref_counts = np.asarray(prepare_ref_counts(ref_column, A, dtype))
    return bear_net.train(
        codes,
        counts,
        num_kmers,
        ar_func,
        alphabet=alphabet,
        dtype=dtype,
        ref_counts=ref_counts,
        **kwargs,
    )


def train_streaming(
    shards,
    num_kmers,
    net_func_factory,
    af_kwargs=None,
    *,
    alphabet="dna",
    lag: int,
    dtype=jnp.float32,
    compute_dtype=None,
    **kwargs,
) -> bear_net.TrainResult:
    """Shard-streamed reference-guided training (memory bounded by one
    shard; see bear_net.train_streaming). ``shards`` yields
    (codes, counts, raw_ref_column) triples — the stop-strip + epsilon
    preparation (reference bear_ref.py:332-337) is applied per shard here."""
    from bear_tpu.ops import alphabets as _alph

    A = _alph.alphabet_size(alphabet)
    ar_func = make_ref_ar_func(lag, A, net_func_factory, af_kwargs,
                               dtype=dtype, compute_dtype=compute_dtype)

    takes_epoch = bear_net._shards_takes_epoch(shards)

    def prepared(epoch=0):
        it = shards(epoch) if takes_epoch else shards()
        for codes, counts, ref_col in it:
            yield codes, counts, np.asarray(
                prepare_ref_counts(ref_col, A, dtype))

    return bear_net.train_streaming(
        prepared, num_kmers, ar_func, alphabet=alphabet, dtype=dtype,
        **kwargs,
    )


def evaluation(
    codes,
    counts,
    ds_loc_train,
    ds_loc_test,
    ds_loc_ref,
    alphabet,
    h,
    ar_func: ARFunc,
    ar_params,
    van_reg,
    **kwargs,
):
    """Evaluate a reference-guided model (reference bear_ref.py:453-539).
    Strips stops from the reference column exactly as the reference's map."""
    from bear_tpu.ops import alphabets as _alph

    A = _alph.alphabet_size(alphabet)
    dtype = kwargs.get("dtype", jnp.float32)
    ref_counts = np.asarray(
        prepare_ref_counts(np.asarray(counts)[:, ds_loc_ref, :], A, dtype)
    )
    return bear_net.evaluation(
        codes,
        counts,
        ds_loc_train,
        ds_loc_test,
        alphabet,
        h,
        ar_func,
        ar_params,
        van_reg,
        ref_counts=ref_counts,
        **kwargs,
    )


def evaluation_streaming(
    shards,
    ds_loc_train,
    ds_loc_test,
    ds_loc_ref,
    alphabet,
    h,
    ar_func: ARFunc,
    ar_params,
    van_reg,
    **kwargs,
):
    """Shard-streamed reference-guided evaluation: memory bounded by one
    shard (see bear_net.evaluation_streaming). ``shards`` yields
    (codes, counts[N, num_ds, A+1]) pairs; the reference column's stop-strip
    + epsilon preparation (reference bear_ref.py:497, 504-512) is applied
    per shard here."""
    from bear_tpu.ops import alphabets as _alph

    A = _alph.alphabet_size(alphabet)
    dtype = kwargs.get("dtype", jnp.float32)

    def prepared():
        for codes, counts in shards():
            ref = np.asarray(prepare_ref_counts(
                np.asarray(counts)[:, ds_loc_ref, :], A, dtype))
            yield codes, counts, ref

    return bear_net.evaluation_streaming(
        prepared, ds_loc_train, ds_loc_test, alphabet, h, ar_func,
        ar_params, van_reg, **kwargs,
    )


def error_rate(params) -> float:
    """1 - e^{-tau} (reference train_bear_ref.py:144-145)."""
    return float(1.0 - np.exp(-np.exp(np.asarray(params["ar"][0]))))


def stop_rate_inverse(params) -> float:
    """nu^{-1} estimate: with g = stop net, expected stop probability is
    nu/(1+nu) per step, so 1/nu ~ read length (reference train_bear_ref.py:146-147,
    docs/usage.rst:289-291)."""
    nu = np.exp(np.asarray(params["ar"][1]))
    return float((1.0 + nu) / nu)
