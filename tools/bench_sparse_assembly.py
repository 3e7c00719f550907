"""Throughput of assembly OFF A SPARSE TABLE (lag 17, int64 rows, in-scan
binary search, x64) vs the dense-table rollout — quantifies the cost of
the lag >= 16 generation capability. Synthetic sorted index (the lookup
cost depends on n and dtypes, not on how counts were produced)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

from bear_tpu.counting.engine import table_rows
from bear_tpu.inference.assemble import assemble_no_ends


class FakeIndex:
    def __init__(self, rows, counts):
        self.rows = rows
        self.counts = counts


lag = 17
n = 4_000_000  # distinct contexts in the sparse table
rng = np.random.default_rng(0)
rows = np.sort(rng.choice(np.int64(table_rows(lag)), size=n, replace=False))
counts = rng.poisson(1.0, size=(n, 5)).astype(np.int64)
idx = FakeIndex(rows, counts)
letters = "ACGT"
seeds = ["".join(rng.choice(list(letters), lag)) for _ in range(8)]
steps, n_gen = 2000, 256
lengths = np.full((len(seeds), 2), steps)

assemble_no_ends(seeds, lengths, n_gen, lag=lag, counter_table=idx,
                 van=0.1, seed=1)  # compile
dt = float("inf")
for trial in (2, 3):
    t0 = time.perf_counter()
    gen, _ = assemble_no_ends(seeds, lengths, n_gen, lag=lag,
                              counter_table=idx, van=0.1, seed=trial)
    dt = min(dt, time.perf_counter() - t0)
total = len(seeds) * n_gen * steps * 2
assert all(len(s) == lag + 2 * steps for s in gen.ravel())
print(f"sparse lag-17 assembly: {total/dt:.0f} letters/s "
      f"({total} letters, best {dt:.1f}s, n={n} index rows)")
