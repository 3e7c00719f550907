"""Loop-free log-gamma sampling, stable for tiny concentrations.

The reference samples ``log Gamma(c)`` with a NumPy rejection sampler
(bear_model/log_gamma.py:17-76, ~1e6 samples/s on CPU) because for c ~ h-scale
(1e-2 .. 1e-4) a plain ``log(standard_gamma(c))`` underflows to -inf.

TPU-natively, two ideas compose:

1. the boost identity

    G ~ Gamma(c+1), U ~ Uniform(0,1)  =>  G * U^{1/c} ~ Gamma(c)
    log Gamma(c)  =d=  log G + log(U) / c

   exact for every c > 0: ``log G`` never underflows (c+1 >= 1) and
   ``log(U)/c`` is computed in log space, so the tiny-c regime is exact
   where the naive sampler loses all precision; and

2. FIXED-proposal Marsaglia-Tsang for the boosted Gamma(c+1): with shape
   >= 1 each proposal accepts with probability >= 0.95, so ``n_iter``
   proposals computed in one vectorized pass (first acceptance selected
   with a gather-free survival mask) replace any rejection ``while_loop``
   — fully branch-free, static shapes, a handful of fused elementwise
   kernels. The 0.04^n_iter residual falls back to the clamped last
   proposal cube (the Wilson-Hilferty approximation, i.e. the proposal
   distribution itself) — bias orders below the MC noise floor of every
   consumer, held to KS + moment oracles in tests/test_loggamma.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mt_boosted_log_gamma_t(x, neg_log_u, safe_conc_t):
    """Marsaglia-Tsang core: log Gamma(safe_conc + 1) draws from pre-drawn
    standard normals ``x`` and exponentials ``neg_log_u``, with the proposal
    axis FIRST ([F, ...]; safe_conc_t is the trailing shape). Fixed
    proposals, first acceptance selected with a gather-free cumprod survival
    mask (argmax + take_along_axis over a minor proposal axis lower to
    serial gathers on TPU — measured 18x the cost of the draws; PERF.md).
    The 0.04^n_iter residual that misses every proposal falls back to the
    clamped last proposal cube — the Wilson-Hilferty approximation, i.e.
    the proposal distribution itself.

    Proposal-axis-FIRST is a layout contract, not a convenience: callers
    keep the big flat element axis in the TPU lane (minor) dimension, so no
    intermediate pays the ~68x (8, 128)-tile padding a trailing
    [.., A=5, F=3] layout costs when materialized — that layout was the
    entire round-3 sampled-serving gap (PERF.md round 4)."""
    dtype = x.dtype
    d = (safe_conc_t + (1.0 - 1.0 / 3.0))[None]  # [1, ...]
    cc = 1.0 / jnp.sqrt(9.0 * d)
    t = 1.0 + cc * x
    v = t * t * t
    pos = v > 0
    vs = jnp.where(pos, v, 1.0)
    ok = (pos & (-neg_log_u < 0.5 * x * x + d - d * vs + d * jnp.log(vs))
          ).astype(dtype)
    not_prior = jnp.cumprod(1.0 - ok, axis=0)
    prior_none = jnp.concatenate(
        [jnp.ones_like(not_prior[:1]), not_prior[:-1]], axis=0)
    v_sel = jnp.sum(vs * (ok * prior_none), axis=0)
    v_fb = jnp.maximum(v[-1], jnp.asarray(1e-3, dtype))
    v_fin = v_sel + not_prior[-1] * v_fb
    return jnp.log(d[0]) + jnp.log(v_fin)


def log_gamma(key, concs, size=(), dtype=None, n_iter: int = 4):
    """Sample log(Gamma(conc, 1)) for each concentration.

    Fixed-proposal Marsaglia-Tsang on the boosted shape conc+1 (always
    >= 1, acceptance >= 95% per proposal), then the boost identity brings
    it back down — no rejection while_loop anywhere, so the sampler is a
    handful of fused elementwise kernels (the earlier
    ``jax.random.gamma``-based version paid a vmapped per-element rejection
    loop: every iteration re-samples EVERY lane until the whole batch
    accepts).

    Parameters
    ----------
    key : jax PRNG key
    concs : array of positive concentrations
    size : tuple of leading sample dimensions (reference log_gamma.py:17's
        ``size``); the result has shape ``size + concs.shape``.
    n_iter : fixed proposal count (residual miss 0.04^n_iter falls back to
        the Wilson-Hilferty cube — see _mt_boosted_log_gamma_t).

    Returns
    -------
    samples of shape size + concs.shape, same dtype as concs (or `dtype`).
    """
    concs = jnp.asarray(concs, dtype=dtype)
    shape = tuple(size) + concs.shape
    F = int(n_iter)
    kn, ku, kb = jax.random.split(key, 3)
    # All per-proposal intermediates run FLAT with the proposal axis first
    # ([F, T]): a trailing (.., A, F) layout tiles the last two dims to
    # (8, 128) on TPU at up to ~68x padding when materialized — the same
    # trap the keyed serving sampler hit (PERF.md round 4). Only the final
    # reshape restores the caller's shape.
    total = 1
    for d in shape:
        total *= d
    x = jax.random.normal(kn, (F, total), concs.dtype)
    neg_log_u = jax.random.exponential(ku, (F, total), concs.dtype)
    boost_e = jax.random.exponential(kb, (total,), concs.dtype)
    safe = jnp.broadcast_to(concs, shape).reshape(total)
    log_g1 = _mt_boosted_log_gamma_t(x, neg_log_u, safe)
    # Boost identity: log G(c) = log G(c+1) + log(U)/c, log U = -Exp(1).
    return (log_g1 - boost_e / safe).reshape(shape)


def log_dirichlet_draw(key, conc, n_iter: int = 4):
    """log of an unnormalized Dirichlet draw for one concentration vector:
    log Gamma(c_b) per bucket via the boost identity, with zero
    concentrations mapped to -inf (excluded categories). Normalizing with
    logsumexp over the last axis yields log Dirichlet probabilities. The
    single shared implementation for the generation/analysis samplers
    (serving uses the batched row-keyed variant below)."""
    lg = log_gamma(key, jnp.maximum(conc, 1e-30), n_iter=n_iter)
    return jnp.where(conc > 0, lg, -jnp.inf)


def sample_dirichlet_log(key, concs, size=()):
    """Sample log of a Dirichlet(concs) via normalized log-gamma draws.

    Returns log-probabilities of shape size + concs.shape, normalized over the
    last axis with logsumexp (the reference normalizes this way at
    get_var_probs.py:174-175).
    """
    lg = log_gamma(key, concs, size=size)
    return lg - jax.scipy.special.logsumexp(lg, axis=-1, keepdims=True)


def fold_in_many(key, data):
    """Vectorized fold_in: one derived key per element of ``data`` (int32
    array). The counter-based key derivation for row-keyed sampling."""
    flat = jnp.ravel(data)
    keys = jax.vmap(lambda d: jax.random.fold_in(key, d))(flat)
    return keys.reshape(jnp.shape(data))


def log_dirichlet_draw_keyed_t(keys, conc_t, n_iter: int = 6):
    """Element-minor variant of :func:`log_dirichlet_draw_keyed`:
    ``conc_t`` is [A, N] (categories major, elements minor) and the result
    is [A, N] unnormalized log-Dirichlet draws. Every intermediate keeps the
    big element axis in the TPU lane dimension — use this form when N is
    large (serving); the [N, A] wrapper below transposes at the boundary."""
    conc_t = jnp.asarray(conc_t)
    dtype = conc_t.dtype
    A, N = conc_t.shape
    F = int(n_iter)
    kn = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
    ku = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
    kb = jax.vmap(lambda k: jax.random.fold_in(k, 2))(keys)
    # out_axes puts the element axis LAST so no [N, A, F] tensor ever
    # exists; XLA fuses the transposed RNG into the elementwise chain.
    x = jax.vmap(lambda k: jax.random.normal(k, (F, A), dtype),
                 out_axes=2)(kn)
    # log U as -Exponential: exact, avoids U == 0 in both uses below.
    neg_log_u = jax.vmap(lambda k: jax.random.exponential(k, (F, A), dtype),
                         out_axes=2)(ku)
    boost_e = jax.vmap(lambda k: jax.random.exponential(k, (A,), dtype),
                       out_axes=1)(kb)

    safe = jnp.maximum(conc_t, jnp.asarray(1e-30, dtype))
    log_g1 = _mt_boosted_log_gamma_t(x, neg_log_u, safe)
    lg = log_g1 - boost_e / safe
    return jnp.where(conc_t > 0, lg, -jnp.inf)


def log_dirichlet_draw_keyed(keys, conc, n_iter: int = 6):
    """Batched log-Dirichlet draws, ONE per leading element, keyed by
    ``keys``: the fast path behind posterior-SAMPLED serving.

    Parameters
    ----------
    keys : [N] PRNG keys, one per concentration ROW (derive them from table
        rows with :func:`fold_in_many` for stateless same-draw-on-revisit
        semantics — the role of the reference's per-k-mer sampled pdf,
        get_var_probs.py:174-175).
    conc : [N, A] concentrations; zero entries yield -inf (excluded
        categories).
    n_iter : fixed Marsaglia-Tsang proposal count.

    Returns [N, A] UNNORMALIZED log-Dirichlet draws (normalize with
    logsumexp over the last axis), equal in distribution to
    ``log_dirichlet_draw`` applied per row.

    Why not ``log_dirichlet_draw`` under vmap: ``jax.random.gamma`` lowers
    to a per-element rejection ``while_loop``; vmapped over millions of
    rows every iteration re-samples EVERY lane until the whole batch
    accepts (~log(N)/log(1/0.04) rounds), and each round pays the full
    normal+uniform+test cost. Here the boost identity
    ``log G(c) = log G(c+1) + log(U)/c`` (see module docstring) needs only
    Gamma(c+1 >= 1) draws, for which Marsaglia-Tsang accepts >= 96% per
    proposal: ``n_iter`` fixed proposals all computed in ONE vectorized
    pass, first acceptance selected per lane. Residual miss probability is
    0.04^n_iter (~4e-9 at 6); missed lanes fall back to the clamped last
    proposal (the Wilson-Hilferty cube), a bias orders of magnitude below
    the MC noise floor of any downstream use. Fully branch-free: no
    while_loop, no cross-lane sync, XLA fuses it into a handful of
    elementwise kernels.

    Internals run element-minor (see log_dirichlet_draw_keyed_t); this
    wrapper transposes only at the API boundary."""
    conc = jnp.asarray(conc)
    return log_dirichlet_draw_keyed_t(keys, conc.T, n_iter=n_iter).T


def log_gamma_pdf(conc, xs):
    """Density of log(Gamma(conc, 1)) at xs:
    f(y) = exp(conc*y - e^y - lgamma(conc)) (reference log_gamma.py:14-15)."""
    conc = jnp.asarray(conc)
    xs = jnp.asarray(xs)
    return jnp.exp(conc * xs - jnp.exp(xs) - jax.scipy.special.gammaln(conc))
