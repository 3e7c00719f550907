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

    def parse(self, path: str, file_type: str):
        """Parse a whole file -> (codes int8 [total], offsets int64 [n+1])."""
        t = 1 if file_type == "fq" else 0
        handle = self.lib.bear_fastx_parse(path.encode(), t)
        if not handle:
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

    def stream_encoded(self, path: str, file_type: str, group: int):
        codes, offsets = self.parse(path, file_type)
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
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", so, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return so
    except Exception:
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
