"""Pallas TPU kernel: sorted-key histogram accumulation into a dense table.

This replaces the counting engine's scatter-add — the throughput limiter of
the whole preprocessing pipeline (XLA lowers scatter-add on TPU to a ~10 ns
per-element serial apply loop; measured on v5e). The reference's equivalent
stage is the KMC count/sort/dump + Python heap-merge (summarize.py:317-338,
512-591), i.e. it ALSO solves counting by sorting — this kernel is that idea
expressed for the MXU.

Pipeline (all on device):

  1. sort the chunk's flat table indices — unstable uint32 ``lax.sort``,
     1.3 ns/key measured, 8x cheaper than scatter; invalid/masked positions
     carry a sentinel that sorts to the end, and negative indices are
     clamped to the sentinel first (the uint32 bitcast would otherwise send
     them past it).
  2. ``searchsorted`` the window boundaries -> per-window key ranges (the
     scalar-prefetch operand). In-pipeline this costs ~1-2 ms at 13.7K
     boundaries / 16.8M keys; a recursive-histogram replacement measured
     SLOWER (PERF.md round-4 graveyard) — do not retry.
  3. This kernel walks the table in (window/256, 256)-entry windows. For
     each window it streams the window's sorted keys in groups of G and
     accumulates the window histogram ON THE MXU via the rank-1 one-hot
     factorization of the 16-bit within-window offset:

         local = key - window_base          in [0, window)
         hist[hi, lo] += sum_g 1[hi_g = hi] * 1[lo_g = lo]
                       = one_hot(hi)^T  @  one_hot(lo)    (int8 matmul)

     Keys past the window's range (they belong to later windows, or are
     sentinels) give hi >= 256, a zero one-hot row — masking is free.
  4. The window block is read, incremented, and written back through VMEM
     (input/output aliased), so the table is updated in place in one
     streamed pass.

A group of G keys costs one (window/256, G) x (G, 256) int8 matmul on the
MXU instead of G serial scatter applies; per-key MAC cost = window size, so
smaller windows mean less arithmetic but more per-window fixed cost (the
defaults balance the two for genome-scale tables). int8 one-hots accumulate
on the MXU in int32 (exact at any group size, and 2x bf16 peak on v5e; the
bf16 variant is exact too — per-group partials are <= G < 2^24 in f32);
the running window histogram is int32, so totals are exact up to 2^31 per
flush window (the engine's host accumulator is int64 beyond that).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW = 32768  # histogram window = (WINDOW // 256) x 256 table entries
GROUP = 2048    # keys per MXU matmul
BLOCKS = 8      # table windows streamed per grid step
OH_DTYPE = jnp.int8  # one-hot operand dtype (int8 MXU = 2x bf16 peak on v5e)
# Defaults tuned on v5e (lag-13 table, 16.8M keys/pass): the round-4
# ablation (tools/bench_hist_ablate.py) measured the kernel at 18.1 ms
# (bf16, blocks=1) -> 14.3 ms (int8 one-hots with exact int32 MXU
# accumulation + 8-window grid blocks); the swept geometry alternatives
# (w/g = 32768/1024, 16384/512, 16384/1024, 65536/2048) all measured 7-20%
# slower in rounds 2-3. BLOCKS > 1 keeps the per-key MAC cost at WINDOW
# (each window is histogrammed separately into its slice of one block-wide
# scratch) while dividing the per-grid-step pipeline bookkeeping by BLOCKS.

# Tests flip this to run the kernel in interpreter mode on CPU. Read at trace
# time: set it before the first sorted-path call in the process.
INTERPRET = False



def padded_size(total: int, window: int = WINDOW, blocks: int = BLOCKS) -> int:
    """Table size padded up to a whole number of grid blocks (= ``blocks``
    histogram windows; the pad tail is never indexed by valid keys)."""
    blk = window * blocks
    return -(-total // blk) * blk


def _hist_kernel(win_map_ref, bounds_ref, keys_ref, tbl_ref, out_ref,
                 keys_vmem, hist, sem,
                 *, group: int, window: int, blocks: int,
                 oh_dtype=jnp.bfloat16):
    # The grid walks win_map, not the table: touched blocks (of ``blocks``
    # consecutive windows) appear exactly once (ascending); every UNTOUCHED
    # block is mapped to the first untouched index, so its table slice is
    # fetched at most once (consecutive equal block indices elide the DMA)
    # and its zero-key visits write the slice back unchanged. Untouched
    # blocks other than that one are never streamed at all — the dynamic
    # "touched-window skip" with a static grid.
    i_grid = pl.program_id(0)
    b = win_map_ref[i_grid]
    rows256 = window // 256
    # A REVISIT (same block index as the previous grid step) keeps the block
    # resident in VMEM — tbl_ref/out_ref still hold the previous step's
    # correct content, so a zero-key revisit may skip the whole body (its
    # hist zero + VMEM add is the per-block fixed cost that dominates sparse
    # chunks). A NEW block must always write out_ref, even with zero keys,
    # or uninitialized VMEM would be flushed back to HBM.
    is_new = (i_grid == 0) | (b != win_map_ref[jnp.maximum(i_grid - 1, 0)])
    blk_n = bounds_ref[(b + 1) * blocks] - bounds_ref[b * blocks]

    @pl.when((blk_n > 0) | is_new)
    def _run():
        hist[...] = jnp.zeros_like(hist)

        def sub(s):
            # One histogram window inside the block: its keys are the
            # contiguous sorted range bounds[w]..bounds[w+1], its counts land
            # in rows [s*rows256, (s+1)*rows256) of the block-wide scratch.
            # Keeping the one-hot factorization per WINDOW (not per block)
            # holds the per-key MAC cost at ``window`` while the grid pays
            # its per-step fixed costs only once per ``blocks`` windows.
            w = b * blocks + s
            # DMA offsets into HBM must be 128-lane aligned: align the
            # window's key range DOWN to 128. The <=127 extra leading keys
            # belong to earlier windows, so local < 0 and the
            # arithmetic-shift hi never matches the row iota — masked for
            # free, like the trailing foreign keys.
            start = pl.multiple_of((bounds_ref[w] >> 7) << 7, 128)
            n = bounds_ref[w + 1] - start
            base = w * window
            nchunks = pl.cdiv(n, jnp.int32(group))

            def get_dma(i):
                i = jnp.asarray(i, jnp.int32)
                slot = jax.lax.rem(i, jnp.int32(2))
                return pltpu.make_async_copy(
                    keys_ref.at[:, pl.ds(start + i * jnp.int32(group), group)],
                    keys_vmem.at[slot],
                    sem.at[slot],
                )

            @pl.when(nchunks > 0)
            def _():
                get_dma(0).start()

            def body(i, carry):
                # Double-buffered: next group streams while this one matmuls.
                @pl.when(i + 1 < nchunks)
                def _():
                    get_dma(i + 1).start()

                get_dma(i).wait()
                slot = jax.lax.rem(jnp.asarray(i, jnp.int32), jnp.int32(2))
                local = keys_vmem[slot] - base  # (1, G); outside [0, window)
                hi = local >> 8                 # if foreign — masked for free
                lo = local & 255
                oh_hi = (
                    jax.lax.broadcasted_iota(jnp.int32, (rows256, group), 0)
                    == hi
                ).astype(oh_dtype)  # zero column if hi out of [0, rows256)
                oh_lo = (
                    jax.lax.broadcasted_iota(jnp.int32, (256, group), 0) == lo
                ).astype(oh_dtype)
                acc_dtype = jnp.int32 if oh_dtype == jnp.int8 else jnp.float32
                part = jax.lax.dot_general(
                    oh_hi, oh_lo,
                    dimension_numbers=(((1,), (1,)), ((), ())),  # contract G
                    preferred_element_type=acc_dtype,
                )
                hist[s * rows256:(s + 1) * rows256, :] += part.astype(
                    jnp.int32
                )
                return carry

            jax.lax.fori_loop(0, nchunks, body, 0)

        for s in range(blocks):  # static unroll: static hist slices
            sub(s)
        out_ref[...] = tbl_ref[...] + hist[...]


@functools.partial(
    jax.jit,
    static_argnames=("group", "window", "oh_dtype", "skip_empty", "blocks"),
    donate_argnums=(0,),
)
def sorted_window_update(table_flat, flat_idx, group: int = GROUP,
                         window: int = WINDOW, oh_dtype=OH_DTYPE,
                         skip_empty: bool = True, blocks: int = BLOCKS):
    """Add one count at each index of ``flat_idx`` into ``table_flat``.

    table_flat : (n_windows * WINDOW,) int32 — dense table, padded to whole
        grid blocks (see padded_size).
    flat_idx : (N,) int32 — table indices; entries >= table_flat.size are
        sentinels and are not counted. Any duplication, any order.
    blocks : histogram windows streamed per grid step (amortizes per-step
        pipeline fixed costs; silently halved until it divides the window
        count, so any whole-window table is accepted).
    Returns the updated table (same shape; buffer donated).
    """
    total_padded = table_flat.size
    assert window % 256 == 0 and window >= 4096, "window = 256 * sublanes"
    assert total_padded % window == 0, "pad the table with padded_size()"
    n_windows = total_padded // window
    if blocks < 1:
        raise ValueError(f"blocks must be >= 1, got {blocks}")
    while n_windows % blocks:
        blocks //= 2
    n_blocks = n_windows // blocks
    rows256 = window // 256

    # Sorting the uint32 bitcast unstably is 2x faster than stable int32
    # jnp.sort on TPU (21.8 vs 43.0 ms for 16.8M keys, v5e), but it sends
    # NEGATIVE keys past the sentinel (silently losing counts) — clamp them
    # to the sentinel first; valid indices and the sentinel are >= 0.
    clamped = jnp.where(flat_idx < 0, total_padded, flat_idx.astype(jnp.int32))
    s = jax.lax.sort(
        jax.lax.bitcast_convert_type(clamped, jnp.uint32),
        is_stable=False,
    )
    s = jax.lax.bitcast_convert_type(s, jnp.int32)
    # Tail pad so the kernel's fixed-size group loads never run off the end
    # (the last aligned-down load can reach group + 128 past the final key).
    s = jnp.concatenate([s, jnp.full((group + 128,), total_padded, jnp.int32)])
    bounds = jnp.searchsorted(
        s, jnp.arange(n_windows + 1, dtype=jnp.int32) * window
    ).astype(jnp.int32)

    # Touched-block compaction: blocks of ``blocks`` windows with zero keys
    # are skipped (their table slices are never DMA'd). Sorting
    # `where(touched, idx, u0)` with u0 = the FIRST untouched block keeps
    # every touched block exactly once in ascending order and clusters all
    # skip slots on u0, whose key range is empty by construction — its
    # repeated visits add nothing and rewrite identical bytes, so they are
    # safe under any pipeline fetch/elide behavior. Empty chunks (nothing
    # touched) degenerate to n_blocks no-op visits of block 0.
    if skip_empty:
        blk_bounds = bounds[::blocks]  # n_blocks + 1 entries
        touched = (blk_bounds[1:] - blk_bounds[:-1]) > 0
        u0 = jnp.argmin(touched).astype(jnp.int32)  # first False (0 if none)
        win_map = jax.lax.sort(
            jnp.where(touched, jnp.arange(n_blocks, dtype=jnp.int32), u0),
            is_stable=False,
        )
    else:  # A/B baseline: stream every block (the round-1 behavior)
        win_map = jnp.arange(n_blocks, dtype=jnp.int32)

    tbl2d = table_flat.reshape(n_windows * rows256, 256)
    keys2d = s.reshape(1, -1)
    n_keys = flat_idx.size

    out = pl.pallas_call(
        functools.partial(_hist_kernel, group=group, window=window,
                          blocks=blocks, oh_dtype=oh_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # win_map, bounds
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # keys stay in HBM
                pl.BlockSpec((blocks * rows256, 256),
                             lambda i, win_map, bounds: (win_map[i], 0)),
            ],
            out_specs=pl.BlockSpec((blocks * rows256, 256),
                                   lambda i, win_map, bounds: (win_map[i], 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 1, group), jnp.int32),  # double-buffered keys
                pltpu.VMEM((blocks * rows256, 256), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_windows * rows256, 256), jnp.int32),
        input_output_aliases={3: 0},  # win_map, bounds, keys, TABLE -> out
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * window * (n_keys + n_windows * group),
            bytes_accessed=2 * 4 * total_padded + 4 * n_keys,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(win_map, bounds, keys2d, tbl2d)
    return out.reshape(-1)
