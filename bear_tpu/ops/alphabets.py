"""Alphabets and k-mer integer codecs.

The reference keeps k-mers as strings all the way onto the accelerator
(reference: bear_model/core.py:142-174, tf_one_hot splits byte strings on
device). TPU-natively, strings never leave the host: k-mers are encoded once
into small integer code arrays and all device code operates on integers.

Conventions (matching the reference's column order exactly):

- *Input* (context) alphabet: the ``alphabet_size`` residues followed by the
  start symbol ``[`` in the LAST column (reference core.py:142-147).
- *Output* (transition) alphabet: the residues followed by the stop symbol
  ``]``/``$`` in the last column (reference core.py:149-153; counts are ordered
  ``A,C,G,T,$`` per summarize.py:59-64).

Integer codes: residue i -> i, ``[`` -> alphabet_size (input side),
``]`` -> alphabet_size (output side).
"""

from __future__ import annotations

import numpy as np

_RESIDUES = {
    "dna": "ACGT",
    "rna": "ACGU",
    "prot": "ARNDCEQGHILKMFPSTWYV",
}

START = "["
STOP = "]"


def residues(alphabet: str) -> str:
    return _RESIDUES[alphabet]


def alphabet_size(alphabet: str) -> int:
    """Number of residues (the reference's ``alphabet_size``); inputs/outputs
    both have ``alphabet_size + 1`` columns."""
    return len(_RESIDUES[alphabet])


def input_letters(alphabet: str) -> np.ndarray:
    """Residues + '[' (start) — the one-hot input column order."""
    return np.array(list(_RESIDUES[alphabet]) + [START])


def output_letters(alphabet: str) -> np.ndarray:
    """Residues + ']' (stop) — the transition-count column order."""
    return np.array(list(_RESIDUES[alphabet]) + [STOP])


def _lookup_table(alphabet: str, last: str) -> np.ndarray:
    """256-entry byte -> code table; unknown bytes map to -1."""
    table = np.full(256, -1, dtype=np.int8)
    for i, ch in enumerate(_RESIDUES[alphabet]):
        table[ord(ch)] = i
    table[ord(last)] = len(_RESIDUES[alphabet])
    return table


_INPUT_TABLES = {a: _lookup_table(a, START) for a in _RESIDUES}
_OUTPUT_TABLES = {a: _lookup_table(a, STOP) for a in _RESIDUES}


def encode_kmers(kmers, alphabet: str) -> np.ndarray:
    """Encode equal-length k-mer strings into int8 codes.

    Parameters
    ----------
    kmers : sequence of str/bytes, or numpy array of such
    alphabet : one of 'dna', 'rna', 'prot'

    Returns
    -------
    codes : int8 array of shape [len(kmers), lag]; residues 0..A-1, '[' -> A.
    """
    arr = np.asarray(kmers)
    if arr.dtype.kind == "U":
        arr = np.char.encode(arr, "ascii")
    flat = arr.ravel()
    if flat.size == 0:
        return np.zeros(arr.shape + (0,), dtype=np.int8)
    # Fixed-width byte view over the FULL itemsize: taking the first k-mer's
    # length would silently truncate longer k-mers; ragged inputs show up as
    # NUL padding and are rejected explicitly (left-pad with '[' upstream).
    byte_view = flat.view(np.uint8).reshape(flat.size, -1)
    lag = byte_view.shape[1]
    if np.any(byte_view == 0):
        bad = flat[np.any(byte_view == 0, axis=-1)][0]
        raise ValueError(
            f"k-mers must all have the same length; {bad!r} is shorter — "
            "left-pad short contexts with '['"
        )
    codes = _INPUT_TABLES[alphabet][byte_view]
    if np.any(codes < 0):
        bad = flat[np.any(codes < 0, axis=-1)][0]
        raise ValueError(f"k-mer {bad!r} contains letters outside alphabet {alphabet!r}")
    return codes.reshape(arr.shape + (lag,))


def encode_string(s: str, alphabet: str) -> np.ndarray:
    """Encode ONE string (typically a join of many variant/context pieces)
    to int8 codes via the byte LUT — the no-per-item path behind ragged
    batch encoding ('[' carries the input-side code A). One ascii encode +
    one 256-entry gather regardless of how many pieces were joined."""
    flat = np.frombuffer(s.encode("ascii"), np.uint8)
    codes = _INPUT_TABLES[alphabet][flat]
    if codes.size and codes.min() < 0:
        bad = s[int(np.argmin(codes))]
        raise ValueError(f"letter {bad!r} outside alphabet {alphabet!r}")
    return codes


def encode_output_symbols(symbols, alphabet: str) -> np.ndarray:
    """Encode transition symbols (residues or ']') to 0..A codes."""
    arr = np.asarray(symbols)
    if arr.dtype.kind == "U":
        arr = np.char.encode(arr, "ascii")
    flat = arr.ravel()
    byte_view = flat.view(np.uint8).reshape(flat.size, -1)[:, 0]
    codes = _OUTPUT_TABLES[alphabet][byte_view]
    if np.any(codes < 0):
        raise ValueError("symbol outside alphabet")
    return codes.reshape(arr.shape)


def decode_kmers(codes: np.ndarray, alphabet: str) -> np.ndarray:
    """Inverse of :func:`encode_kmers`: int codes -> k-mer strings."""
    letters = input_letters(alphabet)
    codes = np.asarray(codes)
    joined = letters[codes.reshape(-1, codes.shape[-1])]
    out = np.array(["".join(row) for row in joined])
    return out.reshape(codes.shape[:-1])


def one_hot(codes, num_classes: int, dtype):
    """One-hot encode integer codes on device: [..., lag] -> [..., lag, num_classes].

    Device-side analogue of the reference's tf_one_hot (core.py:156-174),
    with the string->int conversion already done on the host by encode_kmers.
    """
    import jax.numpy as jnp

    codes = jnp.asarray(codes)
    return (codes[..., None] == jnp.arange(num_classes, dtype=codes.dtype)).astype(dtype)


def one_hot_kmers(kmers, alphabet: str, dtype=np.float32):
    """String k-mers -> one-hot [n, lag, alphabet_size+1] (host encode + device one-hot)."""
    codes = encode_kmers(kmers, alphabet)
    return one_hot(codes, alphabet_size(alphabet) + 1, dtype)
