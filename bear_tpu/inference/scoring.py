"""Posterior-predictive scoring of variants and sequences.

Replaces the reference's bear_model/get_var_probs.py. The structural change:
KMC random-access queries (py_kmc_api C++ bindings, get_var_probs.py:196-289)
become plain gathers into the counting engine's dense transition tables — a
k-mer's counts are table[row(context)] — and the NumPy rejection-sampled
Monte Carlo (log_gamma) becomes the jitted rejection-free JAX sampler.

Model stacking order matches the reference (get_var_probs.py:136-153):
[raw AR (MAP mode only)] + [BEAR at each h] + [BMM at each van].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bear_tpu.ops import alphabets
from bear_tpu.ops.distributions import EPSILON
from bear_tpu.ops.loggamma import sample_dirichlet_log

STOP = "]"


# --- counters: kmer strings -> transition counts --------------------------


class SparseTableIndex:
    """Persistent row -> slot index over a sparse-backed counter's nonzero
    rows: built ONCE (one consolidation pass over the accumulator), then
    every query is an O(q log n) binary search + gather — the random-access
    structure behind TableCounter's sparse backend and sparse-table
    assembly (the py_kmc_api random-access role at lag >= 16, reference
    get_var_probs.py:210-289). The pre-round-5 path re-consolidated and
    rescanned ALL keys per query batch (O(n_keys) per call), which made
    per-step assembly queries over a lag >= 16 table infeasible.

    Queries stay LIVE: each ``gather`` cheaply checks whether the counter
    consolidated new counts since the index was built (an identity probe
    on its consolidated key array — no work while the counter is idle)
    and rebuilds the index if so, preserving the pre-round-5 semantics
    where counts added after construction are visible. The ``rows`` /
    ``counts`` ARRAYS are a snapshot as of the last (re)build — callers
    holding them directly (e.g. assembly's device copies) see that
    snapshot.

    Attributes
    ----------
    rows : sorted [n] int64 nonzero table rows.
    counts : [n, A+1] counts aligned with ``rows`` (one group).
    """

    def __init__(self, counter, lag: int, group: int = 0):
        self.lag = lag
        self._counter = counter
        self._group = group
        self._build()

    def _build(self):
        self.rows = np.asarray(self._counter.nonzero_rows(self.lag),
                               np.int64)
        self.counts = np.ascontiguousarray(
            self._counter.counts_for_rows(self.lag, self.rows)[
                :, self._group, :]
        )
        # Identity probe for staleness: _consolidated returns the SAME key
        # array object until new counts merge; a cheap `is` check detects
        # any post-build counting (flush is a no-op on an idle counter).
        self._keys_probe = self._counter._consolidated(self.lag)[0]

    def gather(self, rows) -> np.ndarray:
        """[len(rows), A+1] counts; rows absent from the table return zeros
        (prior-only scoring, the DatasetCounter convention)."""
        if self._counter._consolidated(self.lag)[0] is not self._keys_probe:
            self._build()  # counter ingested more since the last build
        rows = np.asarray(rows, np.int64)
        out = np.zeros((len(rows), self.counts.shape[1]), self.counts.dtype)
        if len(self.rows) == 0 or len(rows) == 0:
            return out
        pos = np.searchsorted(self.rows, rows)
        posc = np.minimum(pos, len(self.rows) - 1)
        hit = self.rows[posc] == rows
        out[hit] = self.counts[posc[hit]]
        return out


class TableCounter:
    """Random-access transition counts from a TransitionCounter table —
    the TPU-native replacement of make_kmc_genome_counter
    (reference get_var_probs.py:210-289).

    For reverse-strand inclusion (the KMC counter's ``reverse=True``), count
    over {s} ∪ {revcomp(s)} — TransitionCounter(reverse=True) for read-scale
    data, or chunk_reads(reverse=True) for long contigs — which reproduces
    the KMC forward+RC query results exactly (full (k+1)-mer windows,
    prefix-db and suffix-db conventions included).

    no_end=True zeroes the stop column (assembly mode; ends of assemblies are
    unreliable, get_var_probs.py:212-213).

    Accepts either a TransitionCounter (dense host table gathers) or a
    KmerShardedTransitionCounter (lag 14-15 scale: rows are looked up in its
    sparse host accumulator via counts_for_rows — the dense table is never
    materialized).

    Any alphabet works (the row codec is base-A) — a capability the
    reference's DNA-only KMC queries lack; the reverse-strand inclusion
    convention above is a DNA concept and applies only there.
    """

    def __init__(self, counter, lag: int, group: int = 0, no_end: bool = False):
        self._alphabet = getattr(counter, "alphabet", "dna")
        self._A = getattr(counter, "A", 4)
        if hasattr(counter, "counts_for_rows"):  # row-sharded sparse counter
            # Persistent index; per-query cost is O(q log n) binary search
            # instead of a full accumulator rescan (which made per-step
            # queries — e.g. assembly over a lag >= 16 table — infeasible).
            # Queries stay LIVE: the index rebuilds itself when the counter
            # consolidates new counts (SparseTableIndex staleness probe).
            self._index = SparseTableIndex(counter, lag, group)
            self._table = None
            self._width = counter.A1
            self._gather = self._index.gather
        else:
            table = counter.tables[lag][group]
            self._table = table
            self._width = table.shape[-1]
            self._gather = lambda rows: table[rows]
        self._lag = lag
        self._no_end = no_end

    def rows(self, kmers) -> np.ndarray:
        """Vectorized context-string -> table-row computation (no per-k-mer
        Python; same index math as the counting kernel), base-A for the
        counter's alphabet."""
        kmers = np.asarray(kmers).astype(str)
        flat = np.array(
            ["[" * (self._lag - len(k)) + k if len(k) < self._lag else k for k in kmers.reshape(-1)]
        )
        A = self._A
        codes = alphabets.encode_kmers(flat, self._alphabet)  # '[' -> A
        is_pad = codes == A
        n_pad = is_pad.sum(axis=-1)
        powA = A ** np.arange(self._lag - 1, -1, -1, dtype=np.int64)
        digits = np.where(is_pad, 0, codes.astype(np.int64))
        # The suffix occupies the LAST (lag - n_pad) positions, so its base-A
        # value is exactly the dot with descending powers ('[' digits are 0).
        code = (digits * powA[None, :]).sum(axis=-1)
        row = (A ** (self._lag - n_pad) - 1) // (A - 1) + code
        return row.reshape(kmers.shape)

    def __call__(self, kmers) -> np.ndarray:
        kmers = np.asarray(kmers)
        rows = self.rows(kmers).reshape(-1)
        out = self._gather(rows).astype(np.float64)
        if self._no_end:
            out[:, -1] = 0.0
        return out.reshape(kmers.shape + (self._width,))


class DatasetCounter:
    """Transition counts looked up from an in-memory CountDataset (the
    reference's batch-scan branch, get_var_probs.py:429-451, without the
    streaming: counts live in host memory already). Unseen k-mers return
    zeros (prior-only scoring, get_var_probs.py:444-451)."""

    def __init__(self, dataset):
        kmers = np.asarray(dataset.kmers)
        self._order = np.argsort(kmers)
        self._sorted = kmers[self._order]
        self._counts = dataset.counts

    def __call__(self, kmers) -> np.ndarray:
        # Vectorized sorted lookup (a per-k-mer dict .get capped the
        # analysis path at ~10^5 items).
        kmers = np.asarray(kmers)
        flat = kmers.reshape(-1)
        num_ds, A1 = self._counts.shape[1:]
        out = np.zeros((flat.size, num_ds, A1), dtype=self._counts.dtype)
        if len(self._sorted) and flat.size:
            pos = np.searchsorted(self._sorted, flat)
            pos_c = np.minimum(pos, len(self._sorted) - 1)
            hit = self._sorted[pos_c] == flat
            out[hit] = self._counts[self._order[pos_c[hit]]]
        return out.reshape(kmers.shape + (num_ds, A1))


# --- pdf ------------------------------------------------------------------


@dataclass
class Pdf:
    """Transition log-probabilities for a set of k-mers.

    log_probs : [num_kmers, A+1, num_models, mc_samples]
    kmers : the context strings, indexable by (k+1)-mer via lookup.
    """

    kmers: np.ndarray
    log_probs: np.ndarray
    alphabet_name: str

    def __post_init__(self):
        kmers = np.asarray(self.kmers)
        self._order = np.argsort(kmers)
        self._sorted = kmers[self._order]
        letters = np.array(list(alphabets.output_letters(self.alphabet_name)))
        self._letter_order = np.argsort(letters)
        self._letters_sorted = letters[self._letter_order]

    def __contains__(self, kmer: str) -> bool:
        if not len(self._sorted):
            return False
        pos = min(int(np.searchsorted(self._sorted, kmer)),
                  len(self._sorted) - 1)
        return bool(self._sorted[pos] == kmer)

    def _split(self, kp1mers):
        """Vectorized (context, next-letter) split of fixed-width strings."""
        arr = np.asarray(kp1mers)
        W = arr.dtype.itemsize // 4  # U-width
        grid = arr.view("U1").reshape(len(arr), W)
        ctx = np.ascontiguousarray(grid[:, : W - 1]).view(f"U{W - 1}")[:, 0]
        return ctx, grid[:, W - 1]

    def lookup(self, kp1mers: Sequence[str]) -> np.ndarray:
        """[len(kp1mers), num_models, mc_samples] log-probs of transitions.

        Vectorized sorted lookup (the reference indexes a pandas df per
        (k+1)-mer; a per-item dict here capped scoring at ~10^5 windows).
        Raises KeyError on a context or letter outside the pdf, matching
        the dict-based behavior."""
        if len(kp1mers) == 0:
            return np.zeros(self.log_probs.shape[2:])[None][:0]
        if not len(self._sorted):
            raise KeyError(str(np.asarray(kp1mers).reshape(-1)[0]))
        ctx, nxt = self._split(kp1mers)
        pos = np.minimum(np.searchsorted(self._sorted, ctx),
                         len(self._sorted) - 1)
        miss = self._sorted[pos] != ctx
        if miss.any():
            raise KeyError(str(ctx[miss][0]))
        rows = self._order[pos]
        lpos = np.minimum(np.searchsorted(self._letters_sorted, nxt),
                          len(self._letters_sorted) - 1)
        lmiss = self._letters_sorted[lpos] != nxt
        if lmiss.any():
            raise KeyError(str(nxt[lmiss][0]))
        cols = self._letter_order[lpos]
        return self.log_probs[rows, cols]

    def __call__(self, kp1mers: Sequence[str]) -> np.ndarray:
        """Summed [num_models, mc_samples] contribution (the reference's
        summed prob_func, get_var_probs.py:84-89)."""
        if len(kp1mers) == 0:
            return np.zeros(self.log_probs.shape[2:])
        return self.lookup(kp1mers).sum(axis=0)

    def to_dataframe(self):
        """pandas DataFrame indexed by (k+1)-mer with one column per
        (model, sample) — the reference get_pdf's return structure
        (get_var_probs.py:183-194). pandas is imported lazily; the hot
        scoring paths never touch it."""
        import pandas as pd

        letters = alphabets.output_letters(self.alphabet_name)
        idx = [k + ch for k in self.kmers for ch in letters]
        n_models, n_samples = self.log_probs.shape[2:]
        vals = self.log_probs.reshape(len(idx), n_models * n_samples)
        if n_samples > 1:
            cols = [
                f"model{m}_sample{s}"
                for m in range(n_models)
                for s in range(n_samples)
            ]
        else:
            cols = [f"model{m}" for m in range(n_models)]
        return pd.DataFrame(vals, index=idx, columns=cols)


@dataclass
class MargPdf:
    """Exact marginal-likelihood scorer: (kmers, transition count vectors) ->
    per-model log marginal (reference get_var_probs.py:156-170)."""

    kmers: np.ndarray
    concs: np.ndarray  # [num_models, num_kmers, A+1]

    def __post_init__(self):
        self._index = {k: i for i, k in enumerate(self.kmers)}

    def __contains__(self, kmer: str) -> bool:
        return kmer in self._index

    def __call__(self, kmers: Sequence[str], counts: np.ndarray) -> np.ndarray:
        from scipy.special import loggamma

        rows = np.array([self._index[k] for k in kmers])
        concs = self.concs[:, rows, :]  # [M, n, A+1]
        counts = np.asarray(counts, dtype=np.float64)[None]
        lp = (
            loggamma(concs.sum(-1))
            - loggamma(concs).sum(-1)
            - loggamma((concs + counts).sum(-1))
            + loggamma(concs + counts).sum(-1)
        )
        return lp.sum(axis=-1)  # [num_models]


def get_pdf(
    kmers,
    counts,
    h,
    ar_apply: Optional[Callable],
    mc_samples: int,
    vans,
    train_col: int,
    alphabet_name: str,
    get_map: bool = False,
    get_marg: bool = False,
    key=None,
    dtype=jnp.float64,
):
    """Build transition log-probabilities for all (k+1)-mer transitions
    (reference get_var_probs.py:91-194).

    Parameters
    ----------
    kmers : array of context strings.
    counts : [n, num_ds, A+1] transition counts (train_col selects the column).
    h : array of BEAR h values (or None/empty without an AR model).
    ar_apply : one_hot -> probs closure (already including any load-time
        softmax), or None for BMM-only.
    vans : BMM symmetric prior values.
    get_map : MAP point estimates (prepends a raw-AR model row).
    get_marg : exact marginal scorer instead of sampling.

    Returns Pdf (MC/MAP) or MargPdf (get_marg).
    """
    assert not (get_marg and get_map), "pick marg or map"
    A1 = alphabets.alphabet_size(alphabet_name) + 1
    kmers = np.asarray(kmers).astype(str)
    counts = np.asarray(counts, dtype=np.float64)
    counts_train = counts[:, train_col, :]
    vans = np.asarray(list(vans), dtype=np.float64)
    if get_map or get_marg:
        mc_samples = 1

    model_concs = []
    ar_vals = None
    if ar_apply is not None:
        h = np.atleast_1d(np.asarray(h, dtype=np.float64))
        oh = alphabets.one_hot_kmers(kmers, alphabet_name, dtype)
        ar_vals = np.asarray(ar_apply(oh), dtype=np.float64)
        model_concs.append(ar_vals[None] / h[:, None, None])
    if len(vans) > 0:
        model_concs.append(
            vans[:, None, None] * np.ones((1, len(kmers), A1))
        )
    alpha = np.concatenate(model_concs, axis=0)
    concs = alpha + counts_train[None]

    if get_marg:
        return MargPdf(kmers=kmers, concs=concs)

    if get_map:
        if ar_vals is not None:
            concs = np.concatenate([ar_vals[None], concs], axis=0)
        log_probs = np.log(concs / concs.sum(-1, keepdims=True))
        log_probs = log_probs[..., None]  # mc axis
    else:
        if key is None:
            key = jax.random.key(0)
        if dtype == jnp.float64 and not jax.config.jax_enable_x64:
            import warnings

            warnings.warn(
                "get_pdf: float64 sampling requested but jax_enable_x64 is "
                "off — Monte Carlo draws will run in float32. Enable x64 "
                "(or use precision=float64 in a run config) for the "
                "reference's float64 sampling precision.",
                stacklevel=2,
            )
        draws = sample_dirichlet_log(
            key, jnp.asarray(concs, dtype=dtype), size=(mc_samples,)
        )
        log_probs = np.moveaxis(np.asarray(draws), 0, -1)  # [M, n, A+1, S]

    # -> [num_kmers, A+1, num_models, mc_samples]
    log_probs = np.moveaxis(log_probs, 0, 2)
    return Pdf(kmers=kmers, log_probs=log_probs, alphabet_name=alphabet_name)


# --- model loading --------------------------------------------------------


def model_column_names(vans, get_map: bool = False, n_h: int = 1):
    """Names of the stacked model columns in get_pdf/get_bear_probs outputs,
    in the stacking order (get_var_probs.py:136-153): raw AR first when
    get_map, then one BEAR column per h, then one BMM column per van prior.
    The single source of truth for CLI/report headers."""
    names = ["AR"] if get_map else []
    names += ["BEAR"] if n_h == 1 else [f"BEAR(h{i})" for i in range(n_h)]
    names += [f"BMM(van={v})" for v in vans]
    return names


def load_bear(path: str, double_softmax: bool = True):
    """Load a trained model directory (config.cfg + results.pickle) into a
    scoring-ready ar_apply closure (reference get_var_probs.py:59-82).

    double_softmax reproduces the reference's load-time quirk
    (get_var_probs.py:79-82): scoring uses softmax(ar_func(.)) + eps even
    though ar_func already returns probabilities, so scoring-path
    probabilities differ from training-path ones. Pass False for the
    mathematically-intended probabilities.
    """
    import configparser
    import json
    import os

    from bear_tpu.models import bear_net, get_ar_func
    from bear_tpu.utils.checkpoint import load_params_list

    config = configparser.ConfigParser()
    config.read(os.path.join(path, "config.cfg"))
    lag = int(config["hyperp"]["lag"])
    alphabet_name = config["data"]["alphabet"]
    A = alphabets.alphabet_size(alphabet_name)
    dtype = jnp.float64 if config["general"]["precision"] == "float64" else jnp.float32
    ar_func = get_ar_func(
        config["model"]["ar_func_name"],
        lag,
        A,
        json.loads(config["model"]["af_kwargs"]),
        dtype=dtype,
    )
    params_list = load_params_list(path)
    expected = 1 + len(ar_func.init(jax.random.key(0)))
    if len(params_list) != expected:
        raise ValueError(
            f"checkpoint at {path!r} holds {len(params_list)} parameter "
            f"arrays but ar_func {config['model']['ar_func_name']!r} expects "
            f"{expected} ([h_signed] + net params). Reference-guided "
            "(train_bear_ref) model dirs carry [tau, nu] + net params and "
            "cannot be scored via load_bear (the reference implementation "
            "has the same limitation, get_var_probs.py:59-82); evaluate "
            "them with bear_tpu.models.bear_ref instead"
        )
    params = bear_net.params_from_list(params_list, dtype=dtype)
    h = float(np.exp(np.asarray(params["h_signed"])))

    @jax.jit
    def ar_apply(oh):
        probs = ar_func.apply(params["ar"], oh)
        if double_softmax:
            probs = jax.nn.softmax(probs)
        return probs + EPSILON

    info = {
        "config": config,
        "params": params,
        "files_path": config["data"]["files_path"],
        "start_token": config["data"]["start_token"],
        "sparse": config["data"]["sparse"] == "True",
        "num_ds": int(config["data"]["num_ds"]),
    }
    return lag, alphabet_name, h, ar_apply, info


def load_bear_dataset(info):
    """Load the count dataset a trained model was fit on (reference
    get_var_probs.py:35-57)."""
    from bear_tpu.data import discover_files, load_files
    from bear_tpu.utils.config import bundled_ysd1_path

    if info["files_path"] == "TEST":
        files = [bundled_ysd1_path()]
    else:
        files = discover_files(info["files_path"], info["start_token"])
    return load_files(files, info["config"]["data"]["alphabet"], info["num_ds"], sparse=info["sparse"])


# --- variant scoring ------------------------------------------------------


def parse_var(var: str):
    """'AAG23CC' -> ('AAG', 'CC', 23); accepts insertions and deletions
    (reference get_var_probs.py:336-341)."""
    is_int = [ch.isnumeric() for ch in var]
    pos_num = int(np.min(np.argwhere(is_int)))
    len_num = int(np.sum(is_int))
    return var[:pos_num], var[pos_num + len_num :], int(var[pos_num : pos_num + len_num])


def _variant_windows(wt_seq: str, var, lag: int):
    """Wild-type and mutant (k+1)-mer windows around a variant
    (reference get_var_probs.py:293-334)."""
    wt_aa, mt_aa, pos = var
    pos = pos + lag
    assert wt_aa == wt_seq[pos : pos + len(wt_aa)], (
        f"variant {var} does not match wild-type sequence at position {pos - lag}"
    )
    wt_win = wt_seq[pos - lag : pos + lag + len(wt_aa)]
    mt_win = wt_seq[pos - lag : pos] + mt_aa + wt_seq[pos + len(wt_aa) : pos + lag + len(wt_aa)]
    wt_kmers = [wt_win[i : i + lag + 1] for i in range(len(wt_win) - lag)]
    mt_kmers = [mt_win[i : i + lag + 1] for i in range(len(mt_win) - lag)]
    return wt_kmers, mt_kmers


def get_bear_probs(
    bear_path: Optional[str],
    wt_seq: str,
    vars_,
    train_col: int,
    mc_samples: int = 41,
    vans=(0.1, 1, 10),
    get_map: bool = False,
    lag: Optional[int] = None,
    alphabet_name: Optional[str] = None,
    h=None,
    data=None,
    counter: Optional[Callable] = None,
    seed: int = 0,
):
    """Score variants against a wild-type sequence via Δ log-probability of
    the covering (k+1)-mers (reference get_var_probs.py:343-454).

    counter : optional callable kmers -> [n, A+1] counts (e.g. TableCounter),
        replacing the reference's kmc_path branch; otherwise ``data``
        (a CountDataset) is queried.

    Returns scores [num_variants, num_models, mc_samples]
    (mc axis dropped when get_map).
    """
    ar_apply = None
    if bear_path is not None:
        lag, alphabet_name, h_bear, ar_apply, info = load_bear(bear_path)
        if data is None and counter is None:
            data = load_bear_dataset(info)
        if h is None:
            h = np.array([h_bear])
    else:
        assert lag is not None and alphabet_name is not None
        assert (data is not None or counter is not None) and len(vans) > 0

    wt_seq = lag * "[" + wt_seq + STOP
    vars_parsed = [parse_var(v) for v in np.asarray(vars_)]

    all_kmers = []
    for var in vars_parsed:
        wt_k, mt_k = _variant_windows(wt_seq, var, lag)
        all_kmers += [k[:-1] for k in wt_k] + [k[:-1] for k in mt_k]
    all_kmers = np.array(sorted(set(all_kmers)))

    if counter is not None:
        counts = np.asarray(counter(all_kmers))
        if counts.ndim == 2:
            # Single-column counter (e.g. TableCounter): train_col has no
            # meaning here — reject nonzero rather than silently ignore it
            # (the reference asserted train_col == 0 on its KMC path,
            # get_var_probs.py:398-399).
            if train_col != 0:
                raise ValueError(
                    "train_col must be 0 for a single-column counter"
                )
            counts = counts[:, None, :]
            train_col_eff = 0
        else:
            train_col_eff = train_col
    else:
        counts = DatasetCounter(data)(all_kmers)
        train_col_eff = train_col

    pdf = get_pdf(
        all_kmers,
        counts,
        h,
        ar_apply,
        mc_samples,
        vans,
        train_col_eff,
        alphabet_name,
        get_map,
        key=jax.random.key(seed),
    )

    num_models = pdf.log_probs.shape[2]
    eff_samples = 1 if get_map else mc_samples
    scores = np.zeros((len(vars_parsed), num_models, eff_samples))
    for i, var in enumerate(vars_parsed):
        wt_k, mt_k = _variant_windows(wt_seq, var, lag)
        scores[i] += pdf(mt_k) - pdf(wt_k)
    if get_map:
        scores = scores[..., 0]
    return scores


# --- whole-sequence scoring ----------------------------------------------


def _seq_kmers(seq: str, lag: int):
    return [seq[i : i + lag] for i in range(len(seq) - lag)]


def get_bear_probs_seqs(
    bear_path: Optional[str],
    seqs,
    train_col: int,
    mc_samples: int = 41,
    vans=(0.1, 1, 10),
    get_map: bool = False,
    get_marg: bool = False,
    lag: Optional[int] = None,
    alphabet_name: Optional[str] = None,
    h=None,
    data=None,
    counter: Optional[Callable] = None,
    no_ends: bool = False,
    seed: int = 0,
):
    """Score whole sequences under BEAR posterior predictive / BMM
    (reference get_var_probs.py:510-631).

    Returns scores [num_seqs, num_models, mc_samples] (mc axis dropped for
    get_map/get_marg).
    """
    ar_apply = None
    if bear_path is not None:
        lag, alphabet_name, h_bear, ar_apply, info = load_bear(bear_path)
        if data is None and counter is None:
            data = load_bear_dataset(info)
        if h is None:
            h = np.array([h_bear])
    else:
        assert lag is not None and alphabet_name is not None
        assert (data is not None or counter is not None) and len(vans) > 0

    if not no_ends:
        seqs = [lag * "[" + s + STOP for s in seqs]
    for s in seqs:
        assert len(s.replace("[", "").replace(STOP, "")) >= lag, (
            "sequences shorter than the lag cannot be scored"
        )

    all_kmers = np.array(sorted(set(k for s in seqs for k in _seq_kmers(s, lag))))

    if counter is not None:
        counts = np.asarray(counter(all_kmers))
        if counts.ndim == 2:
            # Single-column counter (e.g. TableCounter): train_col has no
            # meaning here — reject nonzero rather than silently ignore it
            # (the reference asserted train_col == 0 on its KMC path,
            # get_var_probs.py:398-399).
            if train_col != 0:
                raise ValueError(
                    "train_col must be 0 for a single-column counter"
                )
            counts = counts[:, None, :]
            train_col_eff = 0
        else:
            train_col_eff = train_col
    else:
        counts = DatasetCounter(data)(all_kmers)
        train_col_eff = train_col

    pdf = get_pdf(
        all_kmers,
        counts,
        h,
        ar_apply,
        mc_samples,
        vans,
        train_col_eff,
        alphabet_name,
        get_map,
        get_marg,
        key=jax.random.key(seed),
    )

    out_letters = alphabets.output_letters(alphabet_name)
    if get_marg:
        num_models = pdf.concs.shape[0]
        scores = np.zeros((len(seqs), num_models, 1))
        for i, seq in enumerate(seqs):
            # aggregate per-kmer transition-count vectors for this sequence
            kmer_counts = {}
            for l in range(len(seq) - lag):
                k = seq[l : l + lag]
                vec = kmer_counts.setdefault(k, np.zeros(len(out_letters)))
                # out-of-alphabet next letters (e.g. 'N') add an all-zero
                # count vector, like the reference's alphabet==seq[l+lag]
                # comparison (get_var_probs.py) — np.argmax on an all-False
                # match would silently count the first letter.
                vec += (out_letters == seq[l + lag]).astype(vec.dtype)
            ks = list(kmer_counts)
            scores[i, :, 0] = pdf(ks, np.stack([kmer_counts[k] for k in ks]))
        return scores[..., 0]

    num_models = pdf.log_probs.shape[2]
    eff_samples = 1 if get_map else mc_samples
    scores = np.zeros((len(seqs), num_models, eff_samples))
    # One vectorized lookup over every sequence's windows, summed per
    # sequence with reduceat (the per-sequence Python loop was the last
    # host hot spot on this path; reference get_var_probs.py:458-484).
    kp1_all = [seq[l : l + lag + 1] for seq in seqs
               for l in range(len(seq) - lag)]
    if kp1_all:
        n_win = np.array([len(s) - lag for s in seqs])
        vals = pdf.lookup(kp1_all)
        offsets = np.concatenate([[0], np.cumsum(n_win)[:-1]])
        nz = n_win > 0
        sums = np.add.reduceat(vals, offsets[nz], axis=0)
        scores[nz] = sums
    if get_map:
        scores = scores[..., 0]
    return scores
