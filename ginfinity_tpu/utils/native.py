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
            _LIB = lib
            break
    return _LIB


def native_available() -> bool:
    return _load() is not None


def native_pair_table(structure: str) -> np.ndarray | None:
    """C++ pair-table scan. Returns None for invalid structures.

    Raises ImportError-like failure through the caller's try/except when
    the library is unavailable.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    n = len(structure)
    out = np.empty(n, dtype=np.int32)
    rc = lib.gf_pair_table(
        structure.encode("latin-1"),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return out
