"""Tests for the sorted-window histogram kernel (counting/pallas_hist.py).

Runs the Pallas kernel in interpreter mode on CPU; the oracle is
``np.add.at`` (and the scatter counting method for the engine-level tests).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bear_tpu.counting import pallas_hist as ph
from bear_tpu.counting.engine import ReadChunk, TransitionCounter


@pytest.fixture
def interpret():
    old = ph.INTERPRET
    ph.INTERPRET = True
    yield
    ph.INTERPRET = old


def test_kernel_matches_add_at(interpret):
    rng = np.random.default_rng(0)
    total = 3 * ph.WINDOW - 1234  # unpadded logical size, non-window-aligned
    padded = ph.padded_size(total)
    N = 5000
    idx = rng.integers(0, total, size=N).astype(np.int32)
    idx[:100] = idx[0]                 # heavy duplication
    idx[100:110] = ph.WINDOW           # window-boundary keys
    idx[110:120] = ph.WINDOW - 1
    masked = rng.random(N) < 0.1       # sentinel (dropped) entries
    flat = np.where(masked, padded, idx).astype(np.int32)

    out = np.asarray(
        ph.sorted_window_update(jnp.zeros(padded, jnp.int32), jnp.asarray(flat),
                                group=256)
    )
    oracle = np.zeros(padded, np.int64)
    np.add.at(oracle, idx[~masked], 1)
    np.testing.assert_array_equal(out, oracle)
    assert out[total:].sum() == 0  # pad tail untouched


def test_kernel_accumulates_into_existing(interpret):
    rng = np.random.default_rng(1)
    padded = ph.padded_size(2 * ph.WINDOW)
    base = rng.integers(0, 5, size=padded).astype(np.int32)
    idx = rng.integers(0, padded, size=1000).astype(np.int32)
    out = np.asarray(
        ph.sorted_window_update(jnp.asarray(base), jnp.asarray(idx), group=256)
    )
    oracle = base.astype(np.int64)
    np.add.at(oracle, idx, 1)
    np.testing.assert_array_equal(out, oracle)


def test_kernel_empty_and_all_sentinel(interpret):
    padded = ph.padded_size(ph.WINDOW)
    flat = np.full(512, padded, np.int32)  # all sentinels
    out = np.asarray(
        ph.sorted_window_update(jnp.zeros(padded, jnp.int32), jnp.asarray(flat),
                                group=256)
    )
    assert out.sum() == 0


def _random_chunk(rng, B=32, L=40):
    lens = rng.integers(1, L + 1, size=B).astype(np.int32)
    codes = rng.integers(0, 4, size=(B, L)).astype(np.int8)
    return ReadChunk(
        codes=codes,
        lengths=lens,
        skip=np.zeros(B, np.int32),
        stopped=np.ones(B, bool),
        groups=rng.integers(0, 2, size=B).astype(np.int32),
    )


def test_sorted_method_matches_scatter(interpret):
    rng = np.random.default_rng(2)
    chunks = [_random_chunk(rng) for _ in range(3)]
    a = TransitionCounter(lags=(1, 2, 5), n_groups=2, method="scatter")
    b = TransitionCounter(lags=(1, 2, 5), n_groups=2, method="sorted")
    for c in chunks:
        a.add_chunk(c)
        b.add_chunk(c)
    for l in a.lags:
        np.testing.assert_array_equal(a.tables[l], b.tables[l])
    a.validate()
    b.validate()


def test_sorted_method_reverse(interpret):
    rng = np.random.default_rng(3)
    chunk = _random_chunk(rng, B=16, L=20)
    # n_groups=2 matches _random_chunk's group ids {0,1} — the counter now
    # REJECTS out-of-range ids instead of silently corrupting (engine
    # check_groups), which this test previously relied on identically in
    # both arms.
    a = TransitionCounter(lags=(3,), n_groups=2, reverse=True,
                          method="scatter")
    b = TransitionCounter(lags=(3,), n_groups=2, reverse=True,
                          method="sorted")
    a.add_chunk(chunk)
    b.add_chunk(chunk)
    np.testing.assert_array_equal(a.tables[3], b.tables[3])


def test_auto_method_is_scatter_on_cpu():
    tc = TransitionCounter(lags=(3,), method="auto")
    assert tc._resolve_method(1 << 30) == "scatter"  # cpu backend in tests


def test_bad_method_rejected():
    with pytest.raises(ValueError, match="method"):
        TransitionCounter(lags=(3,), method="nope")


def test_kernel_negative_keys_dropped(interpret):
    # Negative indices (a masked-index convention some callers use) must be
    # dropped, not wrapped past the sentinel by the uint32 sort.
    padded = ph.padded_size(ph.WINDOW)
    idx = np.concatenate([np.arange(6, dtype=np.int32),
                          np.full(1000, -1, np.int32)])
    out = np.asarray(
        ph.sorted_window_update(jnp.zeros(padded, jnp.int32), jnp.asarray(idx),
                                group=256)
    )
    assert out.sum() == 6 and (out[:6] == 1).all()


@pytest.mark.parametrize("n_touched", [0, 1, 2, 7])
def test_skip_empty_matches_full_stream(interpret, n_touched):
    # Touched-window compaction must be exact for any sparsity pattern,
    # including the all-empty chunk (degenerates to repeated visits of
    # window 0) and a single touched window.
    rng = np.random.default_rng(10 + n_touched)
    n_windows = 8
    padded = n_windows * ph.WINDOW
    touched = rng.choice(n_windows, size=n_touched, replace=False)
    idx_parts = [rng.integers(w * ph.WINDOW, (w + 1) * ph.WINDOW,
                              size=rng.integers(1, 400)).astype(np.int32)
                 for w in touched]
    idx_parts.append(np.full(64, padded, np.int32))  # sentinels
    idx = np.concatenate(idx_parts)
    base = rng.integers(0, 3, size=padded).astype(np.int32)

    skip = np.asarray(ph.sorted_window_update(
        jnp.asarray(base), jnp.asarray(idx), group=256, skip_empty=True))
    full = np.asarray(ph.sorted_window_update(
        jnp.asarray(base), jnp.asarray(idx), group=256, skip_empty=False))
    oracle = base.astype(np.int64)
    np.add.at(oracle, idx[idx < padded], 1)
    np.testing.assert_array_equal(skip, oracle)
    np.testing.assert_array_equal(full, oracle)


@pytest.mark.parametrize("blocks", [1, 2, 4, 8])
def test_blocks_variants_match_oracle(interpret, blocks):
    # Multi-window grid blocks must be exact for every blocks setting,
    # including ranges that straddle block boundaries and blocks whose
    # sub-windows are partially empty.
    rng = np.random.default_rng(100 + blocks)
    n_windows = 8
    padded = n_windows * ph.WINDOW
    idx = np.concatenate([
        rng.integers(0, padded, size=3000).astype(np.int32),
        np.arange(ph.WINDOW - 4, ph.WINDOW + 4, dtype=np.int32),  # boundary
        np.full(64, padded, np.int32),                            # sentinels
        np.full(50, -3, np.int32),                                # negatives
    ])
    base = rng.integers(0, 3, size=padded).astype(np.int32)
    out = np.asarray(ph.sorted_window_update(
        jnp.asarray(base), jnp.asarray(idx), group=256, blocks=blocks))
    oracle = base.astype(np.int64)
    valid = idx[(idx >= 0) & (idx < padded)]
    np.add.at(oracle, valid, 1)
    np.testing.assert_array_equal(out, oracle)


def test_blocks_degrades_to_divisor(interpret):
    # A 2-window table with blocks=8 must silently degrade (8 -> 2) rather
    # than fail the grid divisibility assert.
    padded = 2 * ph.WINDOW
    idx = np.arange(100, dtype=np.int32) * 577
    out = np.asarray(ph.sorted_window_update(
        jnp.zeros(padded, jnp.int32), jnp.asarray(idx), group=256, blocks=8))
    oracle = np.zeros(padded, np.int64)
    np.add.at(oracle, idx, 1)
    np.testing.assert_array_equal(out, oracle)


def test_beyond_sentinel_garbage_keys_dropped(interpret):
    # Keys past the sentinel value (arbitrary garbage above table size) must
    # be dropped exactly like the sentinel itself, alongside negatives.
    rng = np.random.default_rng(7)
    n_windows = 24
    padded = n_windows * ph.WINDOW
    idx = np.concatenate([
        rng.integers(0, padded, size=5000).astype(np.int32),
        rng.integers(0, 3 * ph.WINDOW, size=4000).astype(np.int32),
        np.full(64, padded, np.int32),            # sentinels
        np.full(50, -9, np.int32),                # negatives
        np.full(30, padded + 12345, np.int32),    # beyond-sentinel garbage
    ])
    base = rng.integers(0, 3, size=padded).astype(np.int32)
    oracle = base.astype(np.int64)
    valid = idx[(idx >= 0) & (idx < padded)]
    np.add.at(oracle, valid, 1)
    out = np.asarray(ph.sorted_window_update(
        jnp.asarray(base), jnp.asarray(idx), group=256))
    np.testing.assert_array_equal(out, oracle)


def test_sorted_window_update_int8_variant(interpret):
    # int8 one-hot matmul variant (2x MXU peak on v5e) must be exact too.
    import jax.numpy as jnp

    from bear_tpu.counting import pallas_hist as ph

    rng = np.random.default_rng(3)
    total = ph.padded_size(5 * 4**6)
    idx = rng.integers(0, 5 * 4**6, size=50_000).astype(np.int32)
    ref = np.zeros(total, np.int64)
    np.add.at(ref, idx, 1)
    out = ph.sorted_window_update(
        jnp.zeros(total, jnp.int32), jnp.asarray(idx),
        group=512, window=4096, oh_dtype=jnp.int8,
    )
    np.testing.assert_array_equal(np.asarray(out), ref)
