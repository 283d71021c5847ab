"""ctypes bindings for the native data-layer runtime (fastdata.cpp).

Builds lazily with g++ on first use (cached next to the source); every
entry point has a pure-Python fallback in the data/tree layers, selected
automatically when the toolchain or the build is unavailable, or when
BEAST_MCMC_TPU_NO_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastdata.cpp")
_LIB = os.path.join(_HERE, "_fastdata.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None (use Python fallbacks)."""
    global _lib, _failed
    if _lib is not None:
        return _lib
    if _failed or os.environ.get("BEAST_MCMC_TPU_NO_NATIVE") == "1":
        return None
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        lib.compress_patterns.restype = ctypes.c_int64
        lib.compress_patterns.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.parse_newick.restype = ctypes.c_int64
        lib.parse_newick.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.parse_fasta.restype = ctypes.c_int64
        lib.parse_fasta.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def compress_patterns_native(states: np.ndarray):
    """states uint8[n_taxa, n_sites] -> (patterns uint8[n_taxa, P],
    weights f64[P]) or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    states = np.ascontiguousarray(states, np.uint8)
    n_taxa, n_sites = states.shape
    out_p = np.empty_like(states)
    out_w = np.zeros(n_sites, np.float64)
    n = lib.compress_patterns(
        states.ctypes.data, n_taxa, n_sites, out_p.ctypes.data,
        out_w.ctypes.data,
    )
    return out_p[:, :n].copy(), out_w[:n].copy()


def parse_newick_native(newick: str):
    """Newick -> (parent, children, lengths, tip_names) or None.
    lengths[i] is the branch length above node i (0 at the root); tips
    are numbered 0..N-1 in appearance order, internals N..2N-2."""
    lib = get_lib()
    if lib is None:
        return None
    data = newick.encode()
    # worst case: every other char opens a tip
    max_tips = max(data.count(b",") + 2, 2)
    m = 2 * max_tips - 1
    parent = np.full(m, -1, np.int32)
    children = np.full((m, 2), -1, np.int32)
    lengths = np.zeros(m, np.float64)
    name_buf = ctypes.create_string_buffer(len(data) + max_tips + 16)
    offsets = np.zeros(m, np.int64)
    n_tips = lib.parse_newick(
        data, m, parent.ctypes.data, children.ctypes.data,
        lengths.ctypes.data, name_buf, len(name_buf), offsets.ctypes.data,
    )
    if n_tips < 0:
        return None
    mm = 2 * n_tips - 1
    names = []
    raw = name_buf.raw
    for i in range(n_tips):
        off = int(offsets[i])
        end = raw.index(b"\0", off)
        names.append(raw[off:end].decode())
    return parent[:mm].copy(), children[:mm].copy(), lengths[:mm].copy(), names


def parse_fasta_native(path: str, code_table: np.ndarray):
    """FASTA -> (states uint8[n_taxa, L], names) or None.
    code_table: uint8[256] ASCII -> state code, 0xFF = skip."""
    lib = get_lib()
    if lib is None:
        return None
    table = np.ascontiguousarray(code_table, np.uint8)
    seq_len = ctypes.c_int64(0)
    n_taxa = lib.parse_fasta(
        path.encode(), table.ctypes.data, None,
        ctypes.byref(seq_len), None, 0, None,
    )
    if n_taxa <= 0:
        return None
    length = seq_len.value
    states = np.zeros((n_taxa, length), np.uint8)
    name_buf = ctypes.create_string_buffer(1 << 20)
    offsets = np.zeros(n_taxa, np.int64)
    n2 = lib.parse_fasta(
        path.encode(), table.ctypes.data, states.ctypes.data,
        ctypes.byref(ctypes.c_int64(length)), name_buf, len(name_buf),
        offsets.ctypes.data,
    )
    if n2 != n_taxa:
        return None
    names = []
    raw = name_buf.raw
    for i in range(n_taxa):
        off = int(offsets[i])
        end = raw.index(b"\0", off)
        names.append(raw[off:end].decode())
    return states, names
