"""Lag (truncation-level) selection by maximum BMM marginal likelihood.

The reference documents choosing the lag by maximizing the vanilla-BEAR
marginal likelihood across lags (docs/usage.rst:269-271: "lag 13 for YSD1
chosen by max marginal likelihood") but ships no utility for it — the user
re-runs training per lag. Here the counting engine produces every lag in one
pass, so selection is a single sweep over the tables.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np


@dataclass
class LagSelection:
    lags: tuple
    log_marginals: np.ndarray  # [num_lags, num_alpha]
    alphas: np.ndarray

    @property
    def best(self) -> int:
        """Lag maximizing the marginal likelihood (at the best alpha)."""
        return int(self.lags[int(np.argmax(self.log_marginals.max(axis=-1)))])

    def best_alpha(self, lag: int) -> float:
        i = self.lags.index(lag)
        return float(self.alphas[int(np.argmax(self.log_marginals[i]))])


def marginal_from_counts(counts: np.ndarray, alphas: np.ndarray) -> np.ndarray:
    """Exact BMM log marginal likelihood of count rows for each alpha.

    counts : [n, A+1] nonzero-context transition counts.
    Returns [num_alpha] = sum_rows [lbeta(counts + alpha) - lbeta(alpha)]
    (reference dataloader.py:111-113's per-batch term), in float64.
    """
    from scipy.special import gammaln

    counts = np.asarray(counts, dtype=np.float64)
    alphas = np.asarray(alphas, dtype=np.float64)
    c = counts[:, None, :] + alphas[None, :, None]  # [n, A, A+1]
    a = np.broadcast_to(alphas[None, :, None], c.shape)
    return np.sum(
        (gammaln(c).sum(-1) - gammaln(c.sum(-1)))
        - (gammaln(a).sum(-1) - gammaln(a.sum(-1))),
        axis=0,
    )


def select_lag(
    counter,
    alphas: Sequence[float] = (0.01, 0.1, 1.0),
    group: int = 0,
    batch_size: int = 1 << 20,
) -> LagSelection:
    """Score every counted lag by exact BMM marginal likelihood.

    counter : a TransitionCounter (or anything with .lags and .tables).
    alphas : symmetric Dirichlet prior concentrations to scan.

    Computed on the host in float64 unconditionally: evidence gaps between
    adjacent lags near the optimum can be far below float32 resolution at
    genome-scale magnitudes, and model selection is a one-off sweep, not a
    hot path. Only k-mers with nonzero counts contribute (zero-count rows
    have marginal term exactly 0), so the sweep touches num-distinct-kmers
    rows, not 4^lag.
    """
    alphas = np.asarray(list(alphas), dtype=np.float64)
    try:
        tables = counter.tables
    except ValueError:
        # Lag 14-15 scale: the dense host table is infeasible, but the sweep
        # only ever needs nonzero rows — stream them through the sparse
        # accessors (KmerSharded / MultiPass counters).
        return select_lag_sparse(counter, alphas=alphas, group=group,
                                 batch_size=batch_size)
    out = np.zeros((len(counter.lags), len(alphas)))
    for i, lag in enumerate(counter.lags):
        rows = np.nonzero(tables[lag][group].sum(axis=-1))[0]
        for start in range(0, len(rows), batch_size):
            out[i] += marginal_from_counts(
                tables[lag][group][rows[start : start + batch_size]], alphas
            )
    return LagSelection(lags=tuple(counter.lags), log_marginals=out, alphas=alphas)


def select_lag_sparse(
    counter,
    alphas: Sequence[float] = (0.01, 0.1, 1.0),
    group: int = 0,
    batch_size: int = 1 << 20,
) -> LagSelection:
    """select_lag over a SPARSE counter (KmerShardedTransitionCounter /
    MultiPassTransitionCounter): streams nonzero rows through
    counts_for_rows in ``batch_size`` blocks, so lag 14-15 model selection
    — the paper's tool (reference bear_net.py:465-531, docs/usage.rst:269-271)
    — runs without ever materializing a dense table. Rows absent from the
    sparse set contribute exactly 0, so the result equals the dense sweep."""
    alphas = np.asarray(list(alphas), dtype=np.float64)
    out = np.zeros((len(counter.lags), len(alphas)))
    for i, lag in enumerate(counter.lags):
        rows = counter.nonzero_rows(lag)
        for start in range(0, len(rows), batch_size):
            counts = counter.counts_for_rows(
                lag, rows[start : start + batch_size])[:, group]
            out[i] += marginal_from_counts(counts, alphas)
    return LagSelection(lags=tuple(counter.lags), log_marginals=out, alphas=alphas)


def select_lag_from_tsvs(
    prefix: str,
    lags: Sequence[int],
    alphas: Sequence[float] = (0.01, 0.1, 1.0),
    group: int = 0,
    num_ds: int | None = None,
    alphabet: str = "dna",
    batch_size: int = 1 << 20,
) -> LagSelection:
    """Score lags from already-summarized count TSVs.

    Reads ``{prefix}_lag_{l}_file_*.tsv`` (the summarize CLI's output layout,
    reference summarize.py stage-3 naming) for each requested lag; ``group``
    selects the dataset column. num_ds defaults to sniffing the first file's
    column count.
    """
    import glob
    import json

    from bear_tpu.data.loaders import load_dense

    alphas = np.asarray(list(alphas), dtype=np.float64)
    lags = list(lags)
    out = np.zeros((len(lags), len(alphas)))
    for i, lag in enumerate(lags):
        files = sorted(glob.glob(f"{prefix}_lag_{lag}_file_*.tsv"))
        if not files:
            raise FileNotFoundError(f"no {prefix}_lag_{lag}_file_*.tsv files")
        if num_ds is None:
            with open(files[0]) as fh:
                first = fh.readline().split("\t", 1)
                num_ds = len(json.loads(first[1])) if len(first) == 2 else 1
        for f in files:
            counts = load_dense(f, alphabet, num_ds).counts[:, group]
            for start in range(0, len(counts), batch_size):
                out[i] += marginal_from_counts(
                    counts[start : start + batch_size], alphas
                )
    return LagSelection(lags=tuple(lags), log_marginals=out, alphas=alphas)
