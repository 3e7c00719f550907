"""A/B benchmark: touched-window skip vs full-table stream in pallas_hist.

Measures sorted_window_update(skip_empty=True/False) on the real device for
three workload profiles against a lag-13 DNA table (~89M int32 entries):

1. dense   — E. coli-profile chunk: 4.6M keys uniform over the full-context
             row region (75% of windows touched; PERF.md round-2 analysis).
2. contig  — continuation-segment chunk: same keys, but the structural
             '['-prefix row region (first (4^13-1)/3 rows) is untouched —
             the static case PERF.md flagged as a future ~1.15x.
3. sparse  — 20k keys clustered into 64 windows (interactive updates).

Usage: python tools/bench_touched_skip.py
"""

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
A, A1, GROUPS = 4, 5, 1
ROWS = table_rows(LAG, A)            # (4^(L+1)-1)/3 all-lags row count
PREFIX_ROWS = table_rows(LAG - 1, A)  # rows with context shorter than LAG
TOTAL = ROWS * A1 * GROUPS
PADDED = ph.padded_size(TOTAL)
N_KEYS = 4_600_000


def make_keys(profile: str, rng) -> np.ndarray:
    if profile == "dense":
        rows = rng.integers(0, ROWS, size=N_KEYS)
    elif profile == "contig":
        rows = rng.integers(PREFIX_ROWS, ROWS, size=N_KEYS)
    elif profile == "sparse":
        wins = rng.choice(PADDED // ph.WINDOW, size=64, replace=False)
        base = wins[rng.integers(0, 64, size=20_000)] * ph.WINDOW
        return (base + rng.integers(0, ph.WINDOW, size=20_000)).astype(np.int32)
    else:
        raise ValueError(profile)
    return (rows * A1 + rng.integers(0, A1, size=rows.size)).astype(np.int32)


def bench(keys: np.ndarray, skip_empty: bool, reps: int = 8) -> float:
    table = jnp.zeros(PADDED, jnp.int32)
    k = jnp.asarray(keys)
    # donate_argnums=(0,) — thread the table through so each rep is a real
    # update. Barrier by FETCHING a value: block_until_ready does not flush
    # through the dev tunnel (PERF.md "Tunnel-environment caveats").
    table = ph.sorted_window_update(table, k, skip_empty=skip_empty)
    np.asarray(table[:8])  # warmup/compile + fetch barrier
    t0 = time.perf_counter()
    for _ in range(reps):
        table = ph.sorted_window_update(table, k, skip_empty=skip_empty)
    np.asarray(table[:8])
    dt = (time.perf_counter() - t0) / reps
    del table
    return dt


def main():
    print(f"device: {jax.devices()[0].platform}, table {PADDED/1e6:.1f}M "
          f"int32 ({PADDED*4/2**30:.2f} GiB), {PADDED // ph.WINDOW} windows")
    rng = np.random.default_rng(0)
    for profile in ("dense", "contig", "sparse"):
        keys = make_keys(profile, rng)
        touched = np.unique(keys // ph.WINDOW).size
        full = bench(keys, skip_empty=False)
        skip = bench(keys, skip_empty=True)
        print(f"{profile:7s} keys={keys.size/1e6:6.2f}M "
              f"touched={touched}/{PADDED // ph.WINDOW} "
              f"full={full*1e3:7.2f}ms skip={skip*1e3:7.2f}ms "
              f"speedup={full/skip:5.2f}x "
              f"({keys.size/skip/1e6:.0f} Mkeys/s skip)")


if __name__ == "__main__":
    main()
