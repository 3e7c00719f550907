"""Lag selection: data with genuine order-k structure must select lag >= k,
and iid data must prefer the smallest lag (Bayes factor penalizes complexity)."""

import numpy as np

from bear_tpu.counting import TransitionCounter, chunk_reads
from bear_tpu.counting import fastx
from bear_tpu.models.lag_selection import select_lag


def _count(seqs, lags):
    tc = TransitionCounter(lags=lags, n_groups=1)
    enc = [(fastx.encode_seq(s), 0) for s in seqs]
    for chunk in chunk_reads(iter(enc), max(lags), batch_size=64):
        tc.add_chunk(chunk)
    return tc


def test_structured_data_selects_higher_lag():
    # "AACAAG" repeat: ambiguous at lag 1 ('A'->{A,C,G}) and lag 2
    # ('AA'->{C,G}), deterministic at lag 3 — the marginal likelihood must
    # pick lag 3 (lag 4 fits equally but pays the complexity penalty).
    seqs = ["AACAAG" * 30] * 8
    tc = _count(seqs, [1, 2, 3, 4])
    sel = select_lag(tc)
    assert sel.best == 3
    assert sel.log_marginals.shape == (4, 3)


def test_iid_data_selects_lag_1():
    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("ACGT"), 400)) for _ in range(6)]
    tc = _count(seqs, [1, 3, 5])
    sel = select_lag(tc)
    assert sel.best == 1
    assert sel.best_alpha(1) in (0.01, 0.1, 1.0)
