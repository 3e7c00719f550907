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
