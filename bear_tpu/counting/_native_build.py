"""Build + ctypes-load the native FASTA/FASTQ encoder (_fastx.cpp).

Compiled on first use into the package directory (or $BEAR_TPU_CACHE);
falls back silently to the pure-NumPy parser if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_loaded = None


class NativeFastx:
    def __init__(self, lib: ctypes.CDLL):
        self.lib = lib
        lib.bear_fastx_parse.restype = ctypes.c_void_p
        lib.bear_fastx_parse.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.bear_fastx_num_seqs.restype = ctypes.c_int64
        lib.bear_fastx_num_seqs.argtypes = [ctypes.c_void_p]
        lib.bear_fastx_total_bases.restype = ctypes.c_int64
        lib.bear_fastx_total_bases.argtypes = [ctypes.c_void_p]
        lib.bear_fastx_codes.restype = ctypes.POINTER(ctypes.c_int8)
        lib.bear_fastx_codes.argtypes = [ctypes.c_void_p]
        lib.bear_fastx_offsets.restype = ctypes.POINTER(ctypes.c_int64)
        lib.bear_fastx_offsets.argtypes = [ctypes.c_void_p]
        lib.bear_fastx_free.argtypes = [ctypes.c_void_p]
        self._has_format = hasattr(lib, "bear_format_tsv")
        if self._has_format:
            lib.bear_format_tsv.restype = ctypes.c_int64
            lib.bear_format_tsv.argtypes = [
                ctypes.c_char_p,                 # kmers (fixed-width bytes)
                ctypes.c_int64,                  # kmer_len
                ctypes.POINTER(ctypes.c_int64),  # counts [n, G, C]
                ctypes.c_int64,                  # n_rows
                ctypes.c_int64,                  # n_groups
                ctypes.c_int64,                  # n_cols
                ctypes.c_char_p,                 # out buffer
            ]
        self.supports_gzip = bool(
            hasattr(lib, "bear_fastx_supports_gzip")
            and lib.bear_fastx_supports_gzip()
        )
        if hasattr(lib, "bear_fastx_last_error"):
            lib.bear_fastx_last_error.restype = ctypes.c_int
            lib.bear_fastx_last_error.argtypes = []
        self._has_parse2 = hasattr(lib, "bear_fastx_parse2")
        if self._has_parse2:
            lib.bear_fastx_parse2.restype = ctypes.c_void_p
            lib.bear_fastx_parse2.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ]
        self._has_tsv = hasattr(lib, "bear_tsv_parse")
        if self._has_tsv:
            lib.bear_tsv_parse.restype = ctypes.c_void_p
            lib.bear_tsv_parse.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
            ]
            lib.bear_tsv_num_rows.restype = ctypes.c_int64
            lib.bear_tsv_num_rows.argtypes = [ctypes.c_void_p]
            lib.bear_tsv_kmer_len.restype = ctypes.c_int64
            lib.bear_tsv_kmer_len.argtypes = [ctypes.c_void_p]
            lib.bear_tsv_kmers.restype = ctypes.POINTER(ctypes.c_char)
            lib.bear_tsv_kmers.argtypes = [ctypes.c_void_p]
            lib.bear_tsv_counts.restype = ctypes.POINTER(ctypes.c_double)
            lib.bear_tsv_counts.argtypes = [ctypes.c_void_p]
            lib.bear_tsv_free.argtypes = [ctypes.c_void_p]
        self._has_fill = hasattr(lib, "bear_fill_chunks")
        if self._has_fill:
            lib.bear_fill_chunks.restype = None
            lib.bear_fill_chunks.argtypes = [
                ctypes.POINTER(ctypes.c_int8),   # codes
                ctypes.POINTER(ctypes.c_int64),  # starts
                ctypes.POINTER(ctypes.c_int32),  # lens
                ctypes.POINTER(ctypes.c_uint8),  # rc flags
                ctypes.c_int64,                  # n_rows
                ctypes.c_int64,                  # row_stride (L)
                ctypes.POINTER(ctypes.c_int8),   # out [B, L] zeroed
            ]

    def parse(self, path: str, file_type: str, ambig: bool = False):
        """Parse a whole file -> (codes int8 [total], offsets int64 [n+1]).
        ambig=True encodes unknown bases as 4 (ambiguity marker) instead of
        0/A; requires a library built with bear_fastx_parse2."""
        t = 1 if file_type == "fq" else 0
        if ambig:
            if not self._has_parse2:
                raise AttributeError("native library predates bear_fastx_parse2")
            handle = self.lib.bear_fastx_parse2(path.encode(), t, 1)
        else:
            handle = self.lib.bear_fastx_parse(path.encode(), t)
        if not handle:
            err = (self.lib.bear_fastx_last_error()
                   if hasattr(self.lib, "bear_fastx_last_error") else 1)
            if err == 2:
                raise OSError(
                    f"read/decode error in {path!r} (truncated or corrupt "
                    "input — e.g. an incomplete .gz)"
                )
            raise FileNotFoundError(path)
        try:
            n = self.lib.bear_fastx_num_seqs(handle)
            total = self.lib.bear_fastx_total_bases(handle)
            if total == 0:  # empty/header-only file: data ptr may be NULL
                codes = np.zeros(0, dtype=np.int8)
            else:
                codes = np.ctypeslib.as_array(
                    self.lib.bear_fastx_codes(handle), shape=(total,)
                ).copy()
            offsets = np.ctypeslib.as_array(
                self.lib.bear_fastx_offsets(handle), shape=(n + 1,)
            ).copy()
        finally:
            self.lib.bear_fastx_free(handle)
        return codes, offsets

    def fill_chunks(self, codes: np.ndarray, starts: np.ndarray,
                    lens: np.ndarray, rc: np.ndarray, out: np.ndarray):
        """out[b, :lens[b]] = codes[starts[b] ...] (rc rows walk backward
        emitting complements). out must be a zeroed C-contiguous int8 [B, L];
        only the first len(starts) rows are filled."""
        if not self._has_fill:
            raise AttributeError("native library predates bear_fill_chunks")
        assert out.dtype == np.int8 and out.flags.c_contiguous
        self.lib.bear_fill_chunks(
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            np.ascontiguousarray(starts, np.int64).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int64)),
            np.ascontiguousarray(lens, np.int32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)),
            np.ascontiguousarray(rc, np.uint8).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)),
            len(starts),
            out.shape[1],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        )

    def parse_tsv(self, path: str, header: bool, n_groups: int,
                  n_cols: int):
        """Parse a dense count TSV natively. Returns (kmers_bytes 'S{lag}'
        [n], counts float64 [n, n_groups, n_cols]) or None if the file does
        not fit the regular dense format (caller uses the Python parser)."""
        if not self._has_tsv:
            return None
        handle = self.lib.bear_tsv_parse(
            path.encode(), 1 if header else 0, n_groups, n_cols
        )
        if not handle:
            err = (self.lib.bear_fastx_last_error()
                   if hasattr(self.lib, "bear_fastx_last_error") else 1)
            if err == 1:
                raise FileNotFoundError(path)
            return None  # read error or irregular format: Python fallback
        try:
            n = self.lib.bear_tsv_num_rows(handle)
            lag = self.lib.bear_tsv_kmer_len(handle)
            if n == 0:
                return (np.zeros(0, dtype="S1"),
                        np.zeros((0, n_groups, n_cols), np.float64))
            if lag == 0:  # degenerate zero-width contexts: Python fallback
                return None
            kmers = np.ctypeslib.as_array(
                ctypes.cast(self.lib.bear_tsv_kmers(handle),
                            ctypes.POINTER(ctypes.c_uint8)),
                shape=(n * lag,),
            ).copy().view(f"S{lag}")
            counts = np.ctypeslib.as_array(
                self.lib.bear_tsv_counts(handle),
                shape=(n, n_groups, n_cols),
            ).copy()
        finally:
            self.lib.bear_tsv_free(handle)
        return kmers, counts

    def format_tsv(self, kmers_bytes: np.ndarray, counts: np.ndarray) -> bytes:
        """Format count TSV rows natively: kmers_bytes is an [n] 'S{lag}'
        array, counts an [n, G, C] int64 array. Returns the concatenated
        ``kmer\\t[[...],[...]]\\n`` lines as bytes."""
        if not self._has_format:
            raise AttributeError("native library predates bear_format_tsv")
        n = len(kmers_bytes)
        if n == 0:
            return b""
        kmer_len = kmers_bytes.dtype.itemsize
        counts = np.ascontiguousarray(counts, dtype=np.int64)
        _, G, C = counts.shape
        out = np.empty(n * (kmer_len + 3 + G * (C * 21 + 3)), dtype=np.uint8)
        written = self.lib.bear_format_tsv(
            np.ascontiguousarray(kmers_bytes).ctypes.data_as(ctypes.c_char_p),
            kmer_len,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, G, C, out.ctypes.data_as(ctypes.c_char_p),
        )
        return out[:written].tobytes()

    def stream_encoded(self, path: str, file_type: str, group: int,
                       ambig: bool = False):
        codes, offsets = self.parse(path, file_type, ambig=ambig)
        for i in range(len(offsets) - 1):
            yield codes[offsets[i] : offsets[i + 1]], group


def _so_path() -> str:
    cache = os.environ.get("BEAR_TPU_CACHE", os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(cache, "_fastx.so")


def build(force: bool = False) -> str | None:
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_fastx.cpp")
    so = _so_path()
    if not force and os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    base = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", so, src]
    # Preferred build links zlib for transparent gzip input; fall back to a
    # plain build (gzip files then route through the Python gzip path).
    for cmd in (base + ["-DBEAR_HAS_ZLIB", "-lz"], base):
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return so
        except Exception:
            continue
    return None


def load() -> NativeFastx | None:
    global _loaded
    with _lock:
        if _loaded is not None:
            return _loaded if _loaded else None
        so = build()
        if so is None:
            _loaded = False
            return None
        try:
            _loaded = NativeFastx(ctypes.CDLL(so))
        except OSError:
            _loaded = False
            return None
        return _loaded
