"""Streaming FASTA/FASTQ parsing and base encoding on the host.

Replaces the reference's Biopython iteration + fastq rewriting (stage 1 of
summarize.py:96-286): reads stream directly into 2-bit base codes with no
intermediate files. A C++ fast path (bear_tpu/counting/_fastx.cpp, loaded via
ctypes) accelerates bulk encoding when built; the NumPy path is always
available and semantically identical.
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator, Tuple

import numpy as np

_ENCODE_TABLE = np.zeros(256, dtype=np.int8)
for _i, _ch in enumerate("ACGT"):
    _ENCODE_TABLE[ord(_ch)] = _i
    _ENCODE_TABLE[ord(_ch.lower())] = _i
# Bases outside ACGT (e.g. N) map to A — the reference pipeline is documented
# as not handling N carefully either (summarize.py:69-70).

_ENCODE_TABLES = {("dna", False): _ENCODE_TABLE}


def _encode_table(alphabet: str, ambig: bool = False) -> np.ndarray:
    """Residue -> code lookup for any supported alphabet. By default unknown
    letters map to residue 0, mirroring the reference's N handling
    (summarize.py:69-70); with ambig=True they map to the alphabet-size code
    (4 for dna/rna) so the counting engine's ambig="skip" mode can drop
    transitions whose window crosses them."""
    tab = _ENCODE_TABLES.get((alphabet, ambig))
    if tab is None:
        from bear_tpu.ops import alphabets as _alpha

        res = _alpha.residues(alphabet)
        fill = len(res) if ambig else 0
        tab = np.full(256, fill, dtype=np.int8)
        for _j, _c in enumerate(res):
            tab[ord(_c)] = _j
            tab[ord(_c.lower())] = _j
        _ENCODE_TABLES[(alphabet, ambig)] = tab
    return tab

_NATIVE = None


def _native():
    """ctypes handle to the C++ encoder, or None."""
    global _NATIVE
    if _NATIVE is None:
        from bear_tpu.counting import _native_build

        _NATIVE = _native_build.load() or False
    return _NATIVE or None


def encode_seq(seq: str, alphabet: str = "dna", ambig: bool = False) -> np.ndarray:
    """ASCII sequence -> int8 residue codes. ambig=True marks unknown
    letters with the alphabet-size code instead of folding them to 0."""
    buf = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    return _encode_table(alphabet, ambig)[buf]


def is_gzip(path: str) -> bool:
    """True for gzip inputs, detected by magic bytes (suffix-independent)."""
    try:
        with open(path, "rb") as fh:
            return fh.read(2) == b"\x1f\x8b"
    except OSError:
        return False


def _open_text(path: str):
    """Open a possibly-gzipped text file for reading (new capability: the
    reference's stage 1 requires uncompressed input — summarize.py:201)."""
    if is_gzip(path):
        import gzip

        return gzip.open(path, "rt")
    return open(path, "r")


def iter_fasta(path: str) -> Iterator[Tuple[str, str]]:
    name, parts = None, []
    with _open_text(path) as fh:
        for line in fh:
            line = line.rstrip("\r\n")  # CRLF-safe: '\r' would encode as 'A'
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(parts)
                name, parts = line[1:].split(" ")[0], []
            else:
                parts.append(line)
        if name is not None:
            yield name, "".join(parts)


def iter_fastq(path: str) -> Iterator[Tuple[str, str]]:
    with _open_text(path) as fh:
        while True:
            header = fh.readline()
            if not header:
                return
            if not header.strip():  # tolerate blank lines between records
                continue
            seq = fh.readline().rstrip("\r\n")
            fh.readline()  # '+'
            fh.readline()  # quality
            yield header[1:].rstrip("\r\n").split(" ")[0], seq


def iter_seqs(path: str, file_type: str) -> Iterator[Tuple[str, str]]:
    if file_type == "fa":
        return iter_fasta(path)
    if file_type == "fq":
        return iter_fastq(path)
    raise ValueError(f"unknown file type {file_type!r} (expected 'fa' or 'fq')")


def read_input_csv(path: str) -> list[tuple[str, int, str]]:
    """Parse the reference's input CSV: rows FILE,GROUP,TYPE
    (summarize.py:12-18)."""
    entries = []
    base = os.path.dirname(os.path.abspath(path))
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            f, group, ftype = [part.strip() for part in line.split(",")]
            if ftype not in ("fa", "fq"):
                raise ValueError(
                    f"unknown file type {ftype!r} for {f!r} (expected 'fa' or 'fq')"
                )
            if not os.path.isabs(f):
                f = os.path.join(base, f)
            g = int(group)
            if g < 0:
                raise ValueError(
                    f"negative group id {g} for {f!r}: group ids must be "
                    ">= 0 (negative rows would be silently dropped by the "
                    "counting scatter)"
                )
            entries.append((f, g, ftype))
    return entries


def stream_encoded(
    entries: Iterable[tuple[str, int, str]], alphabet: str = "dna",
    ambig: bool = False,
) -> Iterator[Tuple[np.ndarray, int]]:
    """Stream (code_array, group) over all input files. The C++ fast path
    encodes DNA only; other alphabets use the NumPy LUT encoder. ambig=True
    marks unknown letters with the alphabet-size code (see _encode_table)."""
    native = _native() if alphabet == "dna" else None
    if native is not None and ambig and not getattr(native, "_has_parse2", False):
        native = None  # stale .so without the ambiguity-marking encoder
    for path, group, ftype in entries:
        if native is not None and (native.supports_gzip or not is_gzip(path)):
            yield from native.stream_encoded(path, ftype, group, ambig=ambig)
        else:
            for _, seq in iter_seqs(path, ftype):
                yield encode_seq(seq, alphabet, ambig=ambig), group
