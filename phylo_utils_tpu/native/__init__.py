"""ctypes bindings for the native (C++) host data path.

Builds ``_phyloio.so`` on first import if missing (g++ is in the base
image); callers treat ImportError as "use the numpy fallback", so a missing
compiler degrades gracefully. See src/phyloio.cpp for why this exists.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Tuple

import numpy as np

__all__ = [
    "compress_chars_native",
    "read_fasta_matrix_native",
    "native_available",
]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_phyloio.so")
_SRC = os.path.join(_DIR, "src", "phyloio.cpp")

# ASCII uppercase fold LUT (non-letters pass through).
_UPPER = np.arange(256, dtype=np.uint8)
_UPPER[ord("a") : ord("z") + 1] = np.arange(ord("A"), ord("Z") + 1, dtype=np.uint8)


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", _SO, _SRC],
        check=True,
        capture_output=True,
    )


def _load() -> ctypes.CDLL:
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.pu_compress_columns.restype = ctypes.c_int64
    lib.pu_compress_columns.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.pu_map_bytes.restype = None
    lib.pu_map_bytes.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.pu_fasta_scan.restype = ctypes.c_int64
    lib.pu_fasta_scan.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.pu_fasta_parse.restype = ctypes.c_int64
    lib.pu_fasta_parse.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


_LIB = _load()  # raises -> importers fall back to numpy


def native_available() -> bool:
    return _LIB is not None


def _as_u8_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def compress_chars_native(
    seqs: List[str],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Uppercase + column-compress an equal-length sequence list.

    Returns ``(chars, uniq_cols, site_to_pattern, counts)`` matching the
    numpy fallback in io.compress_patterns: ``chars`` (taxa, sites) uint8
    uppercased, ``uniq_cols`` (taxa, n_patterns) uint8.
    """
    n_seqs = len(seqs)
    if n_seqs == 0:
        raise ValueError("empty alignment")
    n_sites = len(seqs[0])
    raw = np.empty((n_seqs, n_sites), dtype=np.uint8)
    for i, s in enumerate(seqs):
        b = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
        if b.shape[0] != n_sites:
            raise ValueError("sequences have unequal lengths")
        raw[i] = b
    chars = np.empty_like(raw)
    _LIB.pu_map_bytes(
        _as_u8_ptr(raw), raw.size, _as_u8_ptr(_UPPER), _as_u8_ptr(chars)
    )
    site_to_pattern = np.empty(n_sites, dtype=np.int32)
    pattern_sites = np.empty(n_sites, dtype=np.int32)
    counts = np.empty(n_sites, dtype=np.int64)
    n_pat = _LIB.pu_compress_columns(
        _as_u8_ptr(chars),
        n_seqs,
        n_sites,
        site_to_pattern.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pattern_sites.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n_pat < 0:
        raise MemoryError("native pattern compression failed")
    uniq_cols = chars[:, pattern_sites[:n_pat]]
    return chars, uniq_cols, site_to_pattern, counts[:n_pat].astype(np.float64)


def compress_matrix_native(
    chars: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Column-compress an already-uppercased (taxa, sites) uint8 matrix.
    Returns (uniq_cols, site_to_pattern, counts)."""
    chars = np.ascontiguousarray(chars, dtype=np.uint8)
    n_seqs, n_sites = chars.shape
    site_to_pattern = np.empty(n_sites, dtype=np.int32)
    pattern_sites = np.empty(n_sites, dtype=np.int32)
    counts = np.empty(n_sites, dtype=np.int64)
    n_pat = _LIB.pu_compress_columns(
        _as_u8_ptr(chars),
        n_seqs,
        n_sites,
        site_to_pattern.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pattern_sites.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n_pat < 0:
        raise MemoryError("native pattern compression failed")
    uniq_cols = chars[:, pattern_sites[:n_pat]]
    return uniq_cols, site_to_pattern, counts[:n_pat].astype(np.float64)


def read_fasta_matrix_native(path: str) -> Tuple[List[str], np.ndarray]:
    """Parse a FASTA file straight into a (taxa, sites) uppercased uint8
    matrix — no per-character Python, no intermediate strings.

    Returns ``(names, matrix)``. Raises ValueError on ragged/empty input.
    """
    buf = np.fromfile(path, dtype=np.uint8)
    seq_len = ctypes.c_int64(0)
    n_seqs = _LIB.pu_fasta_scan(
        _as_u8_ptr(buf), buf.size, ctypes.byref(seq_len)
    )
    if n_seqs == -2:
        raise ValueError(f"{path}: sequences have unequal lengths")
    if n_seqs == -3 or n_seqs <= 0:
        raise ValueError(f"{path}: no FASTA records found")
    matrix = np.empty((n_seqs, seq_len.value), dtype=np.uint8)
    name_ranges = np.empty(2 * n_seqs, dtype=np.int64)
    rc = _LIB.pu_fasta_parse(
        _as_u8_ptr(buf),
        buf.size,
        n_seqs,
        seq_len.value,
        _as_u8_ptr(_UPPER),
        _as_u8_ptr(matrix),
        name_ranges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise ValueError(f"{path}: malformed FASTA")
    raw = buf.tobytes()
    names = []
    for i in range(n_seqs):
        parts = (
            raw[name_ranges[2 * i] : name_ranges[2 * i + 1]]
            .decode("utf-8", "replace")
            .split()
        )
        if not parts:  # '>' with an empty header line
            raise ValueError(f"{path}: record {i + 1} has an empty name")
        names.append(parts[0])
    return names, matrix
