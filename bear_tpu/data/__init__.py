"""Host-side data layer: count-TSV loaders and whole-dataset likelihoods."""

from bear_tpu.data.loaders import (
    CountDataset,
    count_kmers,
    discover_files,
    load_dense,
    load_files,
    load_files_cached,
    load_sparse,
)
from bear_tpu.data.likelihood import bmm_likelihood
