"""ctypes bindings for the native host-side parser (native/ginfast.cpp).

The reference's host hot loop is Python/networkx graph construction
(utils.py:179-295); ours is vectorized NumPy with this optional C++ fast
path for the one part that cannot be vectorized (the multi-stack bracket
scan).  Falls back silently to the NumPy path when the shared library
has not been built (see native/Makefile).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "native", "libginfast.so"),
        os.path.join(os.path.dirname(__file__), "libginfast.so"),
    ):
        if os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.gf_pair_table.restype = ctypes.c_int
            lib.gf_pair_table.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
            ]
            if hasattr(lib, "gf_parse_floats"):  # older .so builds lack it
                lib.gf_parse_floats.restype = ctypes.c_long
                lib.gf_parse_floats.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_long,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_long,
                    ctypes.POINTER(ctypes.c_long),
                ]
            _LIB = lib
            break
    return _LIB


def native_available() -> bool:
    return _load() is not None


def native_pair_table(structure: str) -> np.ndarray | None:
    """C++ pair-table scan. Returns None for invalid structures —
    including any character outside latin-1, which no dot-bracket
    alphabet contains (the NumPy fallback returns None for those too).

    Raises RuntimeError when the library is unavailable; callers must
    gate on :func:`native_available` (graphs/dotbracket.py does).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    n = len(structure)
    out = np.empty(n, dtype=np.int32)
    try:
        raw = structure.encode("latin-1")
    except UnicodeEncodeError:
        return None
    rc = lib.gf_pair_table(
        raw,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return out


def parse_float_matrix(cell: str) -> np.ndarray | None:
    """Fast parse of a JSON 2-D float matrix cell ("[[...],...]").

    The reference serializes per-node embedding matrices as JSON text
    columns (generate_node_embeddings.py:54-63); at MSA family scale
    that is ~10^7 floats per file and ``json.loads`` dominates the host
    tail.  The C scanner (native/ginfast.cpp::gf_parse_floats) strtod's
    every number (bit-identical to the json.loads -> float64 -> float32
    path) and enforces rectangularity while scanning.

    Returns None when the native library is unavailable or the cell is
    not a plain rectangular numeric matrix — callers fall back to
    ``json.loads``.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "gf_parse_floats"):
        return None
    if not isinstance(cell, str):
        return None
    s = cell.strip()
    if len(s) < 4 or s[0] != "[" or s[-1] != "]":
        return None
    try:
        raw = s.encode("ascii")
    except UnicodeEncodeError:
        return None
    cap = len(raw) // 2 + 2  # every float costs >= 2 bytes ("0," ...)
    out = np.empty(cap, dtype=np.float32)
    ncols = ctypes.c_long(0)
    n = lib.gf_parse_floats(
        raw,
        len(raw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap,
        ctypes.byref(ncols),
    )
    if n <= 0 or ncols.value <= 0 or n % ncols.value != 0:
        return None
    return out[:n].reshape(-1, ncols.value)
