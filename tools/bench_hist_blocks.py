"""A/B sweep: multi-window grid blocks + window/group geometry + sort cost
for the sorted-window histogram kernel (counting/pallas_hist.py).

Round-4 experiment (VERDICT task 3): the counting pipeline is sort+kernel
bound (~21.8 ms + ~23 ms per 16.8M keys). The kernel's fixed costs scale
with grid steps (13654 windows at window=32768), so `blocks` streams many
windows per grid step; the sort side measures whether XLA's lax.sort gets
cheaper when batched into independent segments (the first step of a
partition-instead-of-sort design: segment-sorted keys only need a merged
bounds pass, not a global merge).

All timings use fetch barriers (PERF.md "Tunnel-environment caveats") and
same-process A/B. Usage: python tools/bench_hist_blocks.py [--reps 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bear_tpu.counting import pallas_hist as ph
from bear_tpu.counting.engine import table_rows

LAG = 13
A1 = 5
ROWS = table_rows(LAG, 4)
TOTAL = ROWS * A1
N_KEYS = 16_800_000  # the PERF.md per-pass protocol size


def make_keys(rng, n=N_KEYS):
    rows = rng.integers(0, ROWS, size=n)
    return (rows * A1 + rng.integers(0, A1, size=n)).astype(np.int32)


def bench_pipeline(keys, window, group, blocks, reps):
    padded = ph.padded_size(TOTAL, window, blocks)
    table = jnp.zeros(padded, jnp.int32)
    k = jnp.asarray(keys)
    table = ph.sorted_window_update(table, k, group=group, window=window,
                                    blocks=blocks)
    np.asarray(table[:8])  # compile + fetch barrier
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            table = ph.sorted_window_update(table, k, group=group,
                                            window=window, blocks=blocks)
        np.asarray(table[:8])
        best = min(best, (time.perf_counter() - t0) / reps)
    # exactness spot check: total count conservation per run
    total = int(np.asarray(table.astype(jnp.int64).sum()))
    nruns = 1 + 3 * reps
    assert total == nruns * keys.size, (total, nruns * keys.size)
    del table
    return best, padded


def bench_sort(keys, segments, reps):
    n = keys.size - keys.size % segments
    k = jnp.asarray(keys[:n].reshape(segments, -1))

    @jax.jit
    def f(x):
        u = jax.lax.bitcast_convert_type(x, jnp.uint32)
        s = jax.lax.sort(u, dimension=1, is_stable=False)
        return jax.lax.bitcast_convert_type(s, jnp.int32)

    out = f(k)
    np.asarray(out[:, :8])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(k)
        np.asarray(out[:, :8])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})", flush=True)
    rng = np.random.default_rng(0)
    keys = make_keys(rng)

    print("\n-- sort cost (16.8M keys, uint32 unstable) --", flush=True)
    for segments in (1, 2, 4, 8):
        dt = bench_sort(keys, segments, args.reps)
        print(f"segments={segments}: {dt*1e3:7.2f} ms "
              f"({keys.size/dt/1e6:.0f} Mkeys/s)", flush=True)

    print("\n-- pipeline (sort + kernel), window/group/blocks sweep --",
          flush=True)
    configs = [
        (32768, 2048, 1),   # round-3 shipped baseline
        (32768, 2048, 4),
        (32768, 2048, 8),
        (32768, 2048, 16),
        (16384, 1024, 8),
        (8192, 512, 16),
    ]
    for window, group, blocks in configs:
        dt, padded = bench_pipeline(keys, window, group, blocks, args.reps)
        nwin = padded // window
        print(f"w={window:6d} g={group:5d} blocks={blocks:3d} "
              f"({nwin:6d} windows, {nwin // max(1, blocks):5d} grid steps): "
              f"{dt*1e3:7.2f} ms ({keys.size/dt/1e6:.0f} Mkeys/s)",
              flush=True)


if __name__ == "__main__":
    main()
