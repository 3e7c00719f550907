"""Stage ablation for the counting pipeline (VERDICT round-3 task 3).

Breaks the per-pass budget (sort + aux + histogram kernel) into measured
components on the real chip, and A/Bs the one remaining MXU lever never
tried: int8 one-hot matmuls (v5e int8 MXU peak is 2x bf16; the kernel
already carries the int32-accumulation wiring).

Stages measured (lag-13 protocol, 16.8M keys/pass, fetch barriers,
best-of-3, same process — PERF.md "Tunnel-environment caveats"):
  sort      rank-1 unstable uint32 lax.sort alone
  aux       searchsorted bounds + touched-block win_map prep alone
  update    full sorted_window_update (sort + aux + pallas kernel)
  kernel    update - sort - aux (derived)
for oh_dtype in (bfloat16, int8), blocks in (1, 8).

Exactness is asserted on-device for every configuration (count
conservation + spot oracle), because the pytest suite exercises the kernel
in interpreter mode only.

Usage: python tools/bench_hist_ablate.py [--reps 8]
"""

import argparse
import functools
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
N_KEYS = 16_800_000


def timeit(fn, fetch, reps):
    fetch(fn())  # compile + warm
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


@jax.jit
def _sort(k):
    u = jax.lax.bitcast_convert_type(k, jnp.uint32)
    s = jax.lax.sort(u, is_stable=False)
    return jax.lax.bitcast_convert_type(s, jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_windows", "window", "blocks"))
def _aux(s, n_windows, window, blocks):
    # Mirrors sorted_window_update's prep: bounds searchsorted + touched-block
    # compaction sort (pallas_hist.py:206-231).
    bounds = jnp.searchsorted(
        s, jnp.arange(n_windows + 1, dtype=jnp.int32) * window
    ).astype(jnp.int32)
    n_blocks = n_windows // blocks
    blk_bounds = bounds[::blocks]
    touched = (blk_bounds[1:] - blk_bounds[:-1]) > 0
    u0 = jnp.argmin(touched).astype(jnp.int32)
    win_map = jax.lax.sort(
        jnp.where(touched, jnp.arange(n_blocks, dtype=jnp.int32), u0),
        is_stable=False,
    )
    return bounds, win_map


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})", flush=True)
    rng = np.random.default_rng(0)
    rows = rng.integers(0, ROWS, size=N_KEYS)
    keys = (rows * A1 + rng.integers(0, A1, size=N_KEYS)).astype(np.int32)
    k = jnp.asarray(keys)

    dt_sort = timeit(lambda: _sort(k), lambda o: np.asarray(o[:8]), args.reps)
    print(f"sort   : {dt_sort*1e3:7.2f} ms ({N_KEYS/dt_sort/1e6:.0f} Mkeys/s)",
          flush=True)

    s = _sort(k)
    aux_by_blocks = {}
    for blocks in (1, 8):
        padded = ph.padded_size(TOTAL, ph.WINDOW, blocks)
        n_windows = padded // ph.WINDOW
        while n_windows % blocks:
            blocks //= 2
        aux_by_blocks[blocks] = timeit(
            lambda: _aux(s, n_windows, ph.WINDOW, blocks),
            lambda o: np.asarray(o[1][:8]), args.reps,
        )
        print(f"aux(blocks={blocks}): {aux_by_blocks[blocks]*1e3:7.2f} ms",
              flush=True)

    for oh_name, oh_dtype in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
        for blocks in (1, 8):
            padded = ph.padded_size(TOTAL, ph.WINDOW, blocks)
            n_windows = padded // ph.WINDOW
            state = {"t": jnp.zeros(padded, jnp.int32), "n": 0}

            def step():
                state["t"] = ph.sorted_window_update(
                    state["t"], k, oh_dtype=oh_dtype, blocks=blocks)
                state["n"] += 1
                return state["t"]

            dt = timeit(step, lambda o: np.asarray(o[:8]), args.reps)
            # exactness: conservation + spot oracle on the first 4 windows
            tbl = np.asarray(state["t"])
            assert tbl.astype(np.int64).sum() == state["n"] * N_KEYS, (
                oh_name, blocks, tbl.astype(np.int64).sum(), state["n"])
            lim = 4 * ph.WINDOW
            oracle = np.bincount(keys[keys < lim], minlength=lim) * state["n"]
            np.testing.assert_array_equal(tbl[:lim], oracle)
            # Subtract THIS blocks setting's aux cost (the compaction sort
            # length differs with blocks).
            kern = dt - dt_sort - aux_by_blocks[blocks]
            print(f"update oh={oh_name} blocks={blocks}: {dt*1e3:7.2f} ms "
                  f"({N_KEYS/dt/1e6:.0f} Mkeys/s)  "
                  f"[derived kernel ~{kern*1e3:.2f} ms]  exact", flush=True)
            del state


if __name__ == "__main__":
    main()
