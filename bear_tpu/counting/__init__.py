"""TPU-native k-mer transition counting engine (replaces KMC + summarize.py)."""

from bear_tpu.counting.engine import (
    ReadChunk,
    TransitionCounter,
    chunk_reads,
    chunks_from_packed,
    context_to_row,
    row_to_context,
    rows_to_contexts,
    table_rows,
)
from bear_tpu.counting.summarize import run_counting


def __getattr__(name):
    # Lazy: sparse subclasses parallel.counting's accumulator, and
    # parallel.counting imports counting.engine — an eager import here would
    # cycle whenever bear_tpu.parallel loads first (PEP 562 re-export).
    if name in ("SparseTransitionCounter", "max_sparse_lag"):
        from bear_tpu.counting import sparse

        return getattr(sparse, name)
    raise AttributeError(name)
