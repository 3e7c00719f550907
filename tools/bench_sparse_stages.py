"""Per-stage anatomy of the windowed sparse counter on the real chip:
appends (async dispatch), window sort, compact+fetch, host push. Same
geometry as bench.py's sparse protocol. A/B-valid within this process."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from bear_tpu.counting.engine import ReadChunk
from bear_tpu.counting import sparse as sp

lag = 20
B, L, reps = 1 << 15, 200, 10
rng = np.random.default_rng(0)
genome = rng.integers(0, 4, 800_000).astype(np.int8)
starts = rng.integers(0, len(genome) - L, B)
codes = np.stack([genome[s:s + L] for s in starts]).astype(np.int8)
chunk = ReadChunk(codes, np.full(B, L, np.int32), np.zeros(B, np.int32),
                  np.ones(B, bool), np.zeros(B, np.int32))
c = sp.SparseTransitionCounter(lags=[lag], n_groups=1)
# warm full protocol
for _ in range(reps):
    c.add_chunk(chunk)
c.flush()
n = reps * B * (L + 1)

for trial in range(2):
    t0 = time.perf_counter()
    for _ in range(reps):
        c.add_chunk(chunk)
    c.sync()
    t_append = time.perf_counter() - t0

    # window sort alone (fetch barrier on a scalar of the sorted output)
    bt, bh, bl = c._buf[lag]
    t0 = time.perf_counter()
    ts, hs, ls, n_runs, n_valid = sp._window_sort_jit(bt, bh, bl)
    U = int(n_runs); nv = int(n_valid)
    t_sort = time.perf_counter() - t0

    u_pad = 1 << (U - 1).bit_length()
    t0 = time.perf_counter()
    pos, t_g, h_g, l_g = sp._compact_runs_jit(ts, hs, ls, u_pad)
    pos_np = np.asarray(pos[:U], np.int64)
    tg = np.asarray(t_g[:U]); hg = np.asarray(h_g[:U]); lg = np.asarray(l_g[:U])
    t_compact = time.perf_counter() - t0

    t0 = time.perf_counter()
    counts = np.diff(np.append(pos_np, nv)).astype(np.int64)
    c._push(lag, tg, hg, lg, counts)
    c._buf = None; c._fill = 0
    t_push = time.perf_counter() - t0
    print(f"trial{trial}: append {t_append:.2f}s sort+scalars {t_sort:.2f}s "
          f"compact+fetch {t_compact:.2f}s ({U} runs, u_pad {u_pad}) "
          f"push {t_push:.2f}s total {(t_append+t_sort+t_compact+t_push):.2f}s "
          f"-> {n/(t_append+t_sort+t_compact+t_push)/1e6:.1f}M trans/s")
