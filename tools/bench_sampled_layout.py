"""A/B: element-minor (transposed) sampled-serving layout vs the previous
[N, A, F]-minor layout (VERDICT round-3 task 4).

The sampled-vs-MAP serving gap (167K vs 653K seqs/s, BENCH_r03) was
attributed to "draws + one reduce". The real suspect is LAYOUT: the
sampler's per-element intermediates were [.., A+1=5, F=3]-shaped, which
tile to (8, 128) on TPU at ~68x padding — at the bench protocol's ~1M
positions/batch that is ~4.3 GB of padded HBM traffic per materialized
tensor. The rewrite keeps the element axis in the LANE dimension end to
end (ops/loggamma.log_dirichlet_draw_keyed_t + serving._sampled_logp_picked).

This script times, in one process on the real chip (fetch barriers,
best-of-3, same protocol as bench.py serving benches):
  map       MAP scoring (the reference point)
  sampled   the shipped sampled path (element-minor after this round)
  old       an inline copy of the round-3 [N, A, F]-layout sampler
and asserts the new path's draws remain deterministic and finite.

Usage: python tools/bench_sampled_layout.py [--reps 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bear_tpu.counting.engine import table_rows
from bear_tpu.inference import serving as srv
from bear_tpu.inference.serving import SAMPLE_PROPOSALS, BearServer
from bear_tpu.ops.loggamma import fold_in_many


def _mt_boosted_log_gamma(x, neg_log_u, safe_conc):
    """The round-3 Marsaglia-Tsang core with the proposal axis MINOR
    (x/neg_log_u shaped conc.shape + (F,)). Kept inline here ONLY for the
    A/B; the package core is the element-minor _mt_boosted_log_gamma_t."""
    dtype = x.dtype
    d = (safe_conc + (1.0 - 1.0 / 3.0))[..., None]
    cc = 1.0 / jnp.sqrt(9.0 * d)
    t = 1.0 + cc * x
    v = t * t * t
    pos = v > 0
    vs = jnp.where(pos, v, 1.0)
    ok = (pos & (-neg_log_u < 0.5 * x * x + d - d * vs + d * jnp.log(vs))
          ).astype(dtype)
    not_prior = jnp.cumprod(1.0 - ok, axis=-1)
    prior_none = jnp.concatenate(
        [jnp.ones_like(not_prior[..., :1]), not_prior[..., :-1]], axis=-1)
    v_sel = jnp.sum(vs * (ok * prior_none), axis=-1)
    v_fb = jnp.maximum(v[..., -1], jnp.asarray(1e-3, dtype))
    v_fin = v_sel + not_prior[..., -1] * v_fb
    return jnp.log(d[..., 0]) + jnp.log(v_fin)


def _old_sampled_logp(keys, conc, n_iter):
    """Round-3 layout: per-element intermediates [N, A, F] (proposal axis
    minor). Kept inline here ONLY for the A/B."""
    shp = conc.shape
    keys = keys.reshape(-1)
    conc2 = conc.reshape(-1, shp[-1])
    dtype = conc2.dtype
    N, A = conc2.shape
    F = int(n_iter)
    kn = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
    ku = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
    kb = jax.vmap(lambda k: jax.random.fold_in(k, 2))(keys)
    x = jax.vmap(lambda k: jax.random.normal(k, (A, F), dtype))(kn)
    neg_log_u = jax.vmap(
        lambda k: jax.random.exponential(k, (A, F), dtype))(ku)
    boost_e = jax.vmap(lambda k: jax.random.exponential(k, (A,), dtype))(kb)
    safe = jnp.maximum(conc2, jnp.asarray(1e-30, dtype))
    lg = _mt_boosted_log_gamma(x, neg_log_u, safe) - boost_e / safe
    lg = jnp.where(conc2 > 0, lg, -jnp.inf)
    lg = lg - jax.scipy.special.logsumexp(lg, axis=-1, keepdims=True)
    return lg.reshape(shp)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})", flush=True)

    lag, B, L = 10, 4096, 256
    rng = np.random.default_rng(0)
    table = rng.poisson(0.05, size=(table_rows(lag), 5)).astype(np.float32)
    server = BearServer(table, lag, van=0.5, dtype=jnp.float32)
    codes = jnp.asarray(rng.integers(0, 4, (B, L)).astype(np.int8))
    lengths = jnp.full((B,), L, jnp.int32)
    key = jax.random.key(0)
    REPS = args.reps

    def scan_many(inner):
        @jax.jit
        def f(table_arr, codes, lengths, key):
            def body(acc, i):
                return acc + jnp.sum(
                    inner(table_arr, codes, lengths,
                          jax.random.fold_in(key, i))), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
            return acc
        return f

    def old_sampled(table_arr, codes, lengths, k):
        rows, nxt, mask = srv._context_rows_and_next(codes, lengths, lag, 4)
        # same closure structure as round 3 (serving.py r3:241-264); the
        # BMM van=0.5 concentrations of this protocol are counts + van.
        conc = table_arr[rows] + 0.5
        seq_keys = jax.vmap(lambda i: jax.random.fold_in(k, i))(
            jnp.arange(rows.shape[0]))
        elem_keys = jax.vmap(fold_in_many, in_axes=(0, 0))(seq_keys, rows)
        logp = _old_sampled_logp(elem_keys, conc, SAMPLE_PROPOSALS)
        picked = jnp.take_along_axis(logp, nxt[..., None], axis=-1)[..., 0]
        return jnp.sum(jnp.where(mask, picked, 0.0), axis=-1)

    cases = {
        "map    ": scan_many(lambda t, c, l, k: server._map_fn(t, c, l)),
        "sampled": scan_many(
            lambda t, c, l, k: server._sample_fn(t, c, l, k)),
        "old    ": scan_many(old_sampled),
    }
    for name, f in cases.items():
        acc = f(server._table, codes, lengths, key)
        a0 = float(acc)  # compile + fetch barrier
        assert np.isfinite(a0), (name, a0)
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = f(server._table, codes, lengths, key)
            _ = float(acc)
            dt = min(dt, time.perf_counter() - t0)
        # determinism across calls (stateless draws)
        assert float(f(server._table, codes, lengths, key)) == float(acc)
        print(f"{name}: {dt/REPS*1e3:7.2f} ms/rep "
              f"({REPS*B/dt:,.0f} seqs/s)", flush=True)


if __name__ == "__main__":
    main()
