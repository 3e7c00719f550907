"""Host-side loaders for k-mer transition-count datasets.

Replaces the reference's tf.data + tensorflow-io JSON-decoding pipeline
(bear_model/dataloader.py:6-109) with plain NumPy parsing on the host: the
formats are tiny structured TSVs, and the expensive part of training is the
device math, not decoding — so we parse once, encode k-mers to integer codes,
and hand the device dense arrays. Files format-compatible with the reference:

Dense (the output of summarize): rows ``kmer\t[[c00,...],[c10,...],...]``
with one inner list per dataset group, counts ordered A,C,G,T,$
(reference summarize.py:59-64).

Sparse: ``kmer; [[ds,letter],...]; [vals...]`` with a header row
(reference dataloader.py:52-109; example data/ex_seqs_kmap_for_var_pred.csv).
"""

from __future__ import annotations

import contextlib
import json
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np

from bear_tpu.ops import alphabets

# Bytes rewritten to spaces before the one-pass numeric parse: NUL padding,
# CR, and the JSON-ish list punctuation. A 256-entry LUT gather — np.isin on
# a large uint8 array takes numpy's sort-based path (measured 19.8 s on a
# 40 MB shard vs ~0.05 s for the gather).
_STRIP_TO_SPACE = np.zeros(256, dtype=bool)
_STRIP_TO_SPACE[[0, 13, ord("["), ord("]"), ord(",")]] = True


@dataclass
class CountDataset:
    """An in-memory transition-count dataset.

    Attributes
    ----------
    kmers : [num_kmers] numpy array of k-mer strings (contexts; may contain '[').
    codes : [num_kmers, lag] int8 integer-coded k-mers.
    counts : [num_kmers, num_ds, alphabet_size+1] float array, column order
        A,...,stop matching the reference.
    alphabet : alphabet name.
    """

    kmers: np.ndarray
    codes: np.ndarray
    counts: np.ndarray
    alphabet: str

    @property
    def num_kmers(self) -> int:
        return len(self.kmers)

    @property
    def lag(self) -> int:
        return self.codes.shape[-1]

    @property
    def num_ds(self) -> int:
        return self.counts.shape[1]

    def batches(
        self, batch_size: int, *, epochs: int = 1, drop_remainder: bool = False
    ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Yield (codes, counts) minibatches, sequentially per epoch (the
        reference does not shuffle; files are pre-shuffled by summarize's
        random binning)."""
        n = self.num_kmers
        for _ in range(epochs):
            for start in range(0, n, batch_size):
                end = min(start + batch_size, n)
                if drop_remainder and end - start < batch_size:
                    break
                yield self.codes[start:end], self.counts[start:end]

    def concat(self, other: "CountDataset") -> "CountDataset":
        assert self.alphabet == other.alphabet
        return CountDataset(
            kmers=np.concatenate([self.kmers, other.kmers]),
            codes=np.concatenate([self.codes, other.codes]),
            counts=np.concatenate([self.counts, other.counts]),
            alphabet=self.alphabet,
        )


def load_dense(
    file: str, alphabet: str, num_ds: int, dtype=np.float64,
    header: bool = False, native: bool | None = None,
) -> CountDataset:
    """Load a dense count TSV (reference dataloader.dataloader's format).

    Three parsers, fastest first: the C++ one-pass parser from the native
    counting library (~50x the vectorized NumPy path; also reads .tsv.gz
    when built with zlib), the vectorized NumPy path (fixed-offset row
    split + one ``fromstring`` pass), and a tolerant per-line fallback that
    '['-pads ragged contexts. ``native=None`` auto-selects; False forces
    the NumPy paths (used by the parity tests)."""
    A1 = alphabets.alphabet_size(alphabet) + 1
    if native is None or native:
        try:
            from bear_tpu.counting.fastx import _native

            lib = _native()
        except Exception:
            lib = None
        if lib is None and native:
            raise RuntimeError("native TSV parser unavailable (no compiler?)")
        parsed = (
            lib.parse_tsv(file, header, num_ds, A1) if lib is not None else None
        )
        if parsed is not None:
            kmers_b, counts64 = parsed
            # encode from the raw bytes (a str round-trip would re-encode)
            codes = alphabets.encode_kmers(kmers_b, alphabet)
            kmers = np.char.decode(kmers_b, "ascii")
            counts = counts64.astype(dtype, copy=False)
            return CountDataset(
                kmers=kmers, codes=codes, counts=counts, alphabet=alphabet
            )
    with open(file, "rb") as fh:
        data = fh.read()
    lines = np.array(data.split(b"\n"))
    if header and len(lines):
        lines = lines[1:]
    lines = lines[(lines != b"") & (lines != b"\r")]  # blank incl. CRLF-blank
    if len(lines) == 0:
        kmers = np.array([], dtype=str)
        counts = np.zeros((0, num_ds, A1), dtype=dtype)
        return CountDataset(
            kmers=kmers, codes=np.zeros((0, 0), np.int8), counts=counts,
            alphabet=alphabet,
        )
    try:
        lag = lines[0].index(b"\t")
    except ValueError:
        lag = -1
    W = lines.dtype.itemsize
    m8 = lines.view(np.uint8).reshape(len(lines), W)
    if lag + 1 < W and (m8[:, lag] == ord("\t")).all():
        kmers_b = lines.astype(f"S{lag}")
        tail = m8[:, lag + 1 :].copy()
        # brackets/commas/NUL padding -> spaces; one whitespace-separated parse
        tail[_STRIP_TO_SPACE[tail]] = ord(" ")  # incl. CR
        # Per-row field-count integrity: a short row must not silently steal
        # fields from the next one (token starts = nonspace after space).
        nonspace = tail != ord(" ")
        prev = np.zeros_like(nonspace)
        prev[:, 1:] = nonspace[:, :-1]
        fields_per_row = (nonspace & ~prev).sum(axis=1)
        import warnings

        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")  # np.fromstring deprecation
                flat = np.fromstring(
                    tail.tobytes().decode("ascii"), dtype=dtype, sep=" "
                )
        except Exception:  # text-mode fromstring removed: use the fallback
            flat = np.zeros(0, dtype=dtype)
        if (
            flat.size == len(lines) * num_ds * A1
            and (fields_per_row == num_ds * A1).all()
        ):
            kmers = np.char.decode(kmers_b, "ascii")
            counts = flat.reshape(len(lines), num_ds, A1)
            codes = alphabets.encode_kmers(kmers, alphabet)
            return CountDataset(
                kmers=kmers, codes=codes, counts=counts, alphabet=alphabet
            )
    # Fallback: irregular rows (varying context length etc.) — per line.
    # Shorter contexts are '['-padded to the longest (the canonical table
    # form; encode_kmers rejects ragged input).
    kmers = []
    rows = []
    for raw in lines:
        kmer, mat = raw.decode("ascii").split("\t")
        kmers.append(kmer)
        rows.append(mat.replace("[", "").replace("]", "").split(","))
    maxlen = max(len(k) for k in kmers)
    kmers = np.array(["[" * (maxlen - len(k)) + k for k in kmers])
    counts = np.array(rows, dtype=dtype).reshape(len(kmers), num_ds, A1)
    codes = alphabets.encode_kmers(kmers, alphabet)
    return CountDataset(kmers=kmers, codes=codes, counts=counts, alphabet=alphabet)


def load_sparse(
    file: str, alphabet: str, num_ds: int, dtype=np.float64, header: bool = True
) -> CountDataset:
    """Load a sparse count file: ``kmer; [[ds,letter],...]; [vals...]``."""
    A1 = alphabets.alphabet_size(alphabet) + 1
    kmers = []
    all_pos = []
    all_val = []
    with open(file, "r") as fh:
        for i, line in enumerate(fh):
            if header and i == 0:
                continue
            line = line.strip()
            if not line:
                continue
            kmer, pos_str, val_str = [part.strip() for part in line.split(";")]
            kmers.append(kmer)
            all_pos.append(np.array(json.loads(pos_str), dtype=np.int64).reshape(-1, 2))
            all_val.append(np.array(json.loads(val_str), dtype=dtype))
    kmers = np.array(kmers)
    counts = np.zeros((len(kmers), num_ds, A1), dtype=dtype)
    for i, (pos, val) in enumerate(zip(all_pos, all_val)):
        # Duplicate (ds, letter) entries accumulate, matching tf.sparse semantics
        # only for unique indices; the reference's data has unique entries.
        counts[i, pos[:, 0], pos[:, 1]] += val
    codes = alphabets.encode_kmers(kmers, alphabet)
    return CountDataset(kmers=kmers, codes=codes, counts=counts, alphabet=alphabet)


def load_files(
    files: Sequence[str],
    alphabet: str,
    num_ds: int,
    sparse: bool = False,
    dtype=np.float64,
) -> CountDataset:
    """Load and concatenate multiple count files (the reference interleaves
    with tf.data at train_bear_net.py:79-86; order within an epoch does not
    affect the objective)."""
    if not files:
        raise ValueError(
            "no count files to load — check files_path/start_token "
            "(discover_files matched nothing)"
        )
    loader = load_sparse if sparse else load_dense
    parts = [loader(f, alphabet, num_ds, dtype=dtype) for f in files]
    ds = parts[0]
    for part in parts[1:]:
        ds = ds.concat(part)
    return ds


def load_files_cached(
    files: Sequence[str],
    alphabet: str,
    num_ds: int,
    sparse: bool = False,
    dtype=np.float64,
    cache_dir: str | None = None,
) -> CountDataset:
    """``load_files`` with an on-disk parsed-shard cache.

    The streaming CLIs re-ingest every shard file EVERY epoch (per-epoch
    file-order shuffle), so a multi-epoch run pays the TSV parse (~1 Mrows/s,
    PERF.md "Host data loading") once per shard per epoch. The first access
    here parses and writes one ``.npz`` per source file (codes int8, counts,
    kmers); later epochs load it at disk/numpy speed. The cache key hashes
    the source path, size, and mtime plus the parse parameters, so an edited
    or regenerated shard reparses automatically. Writes are per-process
    tmp + atomic rename (multi-rank CLI runs share the out_folder).

    ``cache_dir=None`` disables caching (plain load_files).
    """
    if cache_dir is None:
        return load_files(files, alphabet, num_ds, sparse=sparse, dtype=dtype)
    import hashlib

    os.makedirs(cache_dir, exist_ok=True)
    loader = load_sparse if sparse else load_dense
    parts = []
    for f in files:
        st = os.stat(f)
        tag = hashlib.sha1(
            f"{os.path.abspath(f)}|{st.st_size}|{st.st_mtime_ns}|{alphabet}|"
            f"{num_ds}|{np.dtype(dtype).name}|{sparse}".encode()
        ).hexdigest()[:16]
        cpath = os.path.join(
            cache_dir, f"{os.path.basename(f)}.{tag}.npz")
        if os.path.exists(cpath):
            try:
                with np.load(cpath, allow_pickle=False) as z:
                    parts.append(CountDataset(
                        kmers=z["kmers"], codes=z["codes"],
                        counts=z["counts"], alphabet=alphabet,
                    ))
                continue
            except Exception:
                pass  # truncated/corrupt cache entry: fall through, reparse
        ds = loader(f, alphabet, num_ds, dtype=dtype)
        tmp = f"{cpath}.{os.getpid()}.tmp"
        try:
            with open(tmp, "wb") as fh:
                np.savez(fh, kmers=ds.kmers, codes=ds.codes, counts=ds.counts)
            os.replace(tmp, cpath)
        except OSError:
            pass  # cache write is best-effort; the parsed data is in hand
        finally:
            if os.path.exists(tmp):
                with contextlib.suppress(FileNotFoundError):
                    os.remove(tmp)
        parts.append(ds)
    out = parts[0]
    for part in parts[1:]:
        out = out.concat(part)
    return out


def discover_files(files_path: str, start_token: str) -> list[str]:
    """File discovery by filename prefix (reference train_bear_net.py:52-53)."""
    return sorted(
        os.path.join(files_path, f)
        for f in os.listdir(files_path)
        if f.startswith(start_token)
    )


def count_kmers(files: Sequence[str], header: bool = False) -> int:
    """Total number of k-mer rows (the reference shells out to ``wc -l``,
    train_bear_net.py:54-55)."""
    total = 0
    for f in files:
        with open(f, "rb") as fh:
            n = sum(buf.count(b"\n") for buf in iter(lambda: fh.read(1 << 20), b""))
        total += n - (1 if header else 0)
    return total
