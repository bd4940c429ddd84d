"""Dot-bracket parsing: validation, pair-table extraction, loop metadata.

The reference builds a networkx graph per structure with Python loops
(reference: src/ginfinity/utils.py:144-295).  Here structures are parsed
straight into flat integer/float arrays so that downstream featurization
is pure vectorized NumPy on the host and pure XLA on the device.

Supported notation (same as the reference validator, utils.py:144-177):
``.`` unpaired, ``()``, and pseudoknot annotations ``[]``, ``{}``, ``<>``
plus matching upper/lowercase letter pairs (``A``/``a`` ... ``Z``/``z``).
"""

from __future__ import annotations

import numpy as np

# Opener -> index of its stack; closers map back to openers.
_OPENERS = {"(": 0, "[": 1, "{": 2, "<": 3}
_CLOSERS = {")": "(", "]": "[", "}": "{", ">": "<"}

try:  # optional native fast path (C++, see native/ginfast.cpp)
    from ginfinity_tpu.utils.native import native_available
    from ginfinity_tpu.utils.native import native_pair_table as _native_pair_table

    if not native_available():  # .so not built -> silent NumPy fallback
        _native_pair_table = None
except Exception:  # pragma: no cover - bindings import failure
    _native_pair_table = None


def is_valid_dot_bracket(structure: str) -> bool:
    """Validate an extended dot-bracket string.

    Mirrors the reference semantics (utils.py:144-177): every closer must
    match the most recent unmatched opener of its own bracket family, and
    all stacks must be empty at the end.
    """
    return pair_table(structure, strict=False) is not None


def pair_table(structure: str, strict: bool = True) -> np.ndarray | None:
    """Return the pair table of ``structure``: ``pt[i] = j`` if (i, j) are
    paired, ``-1`` if position ``i`` is unpaired.

    Returns ``None`` (or raises if ``strict``) for malformed input.
    """
    if _native_pair_table is not None:
        pt = _native_pair_table(structure)
        if pt is None:
            if strict:
                raise ValueError(f"Invalid dot-bracket string: {structure!r}")
            return None
        return pt
    return _py_pair_table(structure, strict)


def _py_pair_table(structure: str, strict: bool = True) -> np.ndarray | None:
    n = len(structure)
    pt = np.full(n, -1, dtype=np.int32)
    stacks: dict[str, list[int]] = {}

    def fail():
        if strict:
            raise ValueError(f"Invalid dot-bracket string: {structure!r}")
        return None

    for i, c in enumerate(structure):
        if c == ".":
            continue
        if c in _OPENERS:
            stacks.setdefault(c, []).append(i)
        elif c in _CLOSERS:
            st = stacks.get(_CLOSERS[c])
            if not st:
                return fail()
            j = st.pop()
            pt[i] = j
            pt[j] = i
        elif "A" <= c <= "Z":
            stacks.setdefault(c, []).append(i)
        elif "a" <= c <= "z":
            st = stacks.get(c.upper())
            if not st:
                return fail()
            j = st.pop()
            pt[i] = j
            pt[j] = i
        else:
            return fail()

    if any(stacks.values()):
        return fail()
    return pt


def loop_features(pt: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Normalized loop-membership features for unpaired runs, vectorized.

    For each maximal run of consecutive unpaired positions (a "loop" in the
    reference's sense, utils.py:204-239):

    - ``loop_size_norm[i] = run_length / seq_len``
    - ``loop_pos_norm[i]  = pos_in_run / (run_length - 1)`` (0.5 for
      singleton runs)

    Paired positions get 0.0 for both.
    """
    n = pt.shape[0]
    if n == 0:
        return np.zeros(0, np.float32), np.zeros(0, np.float32)

    unpaired = pt < 0
    if not unpaired.any():
        return np.zeros(n, np.float32), np.zeros(n, np.float32)

    idx = np.arange(n)
    # Run-length encode the unpaired mask.
    starts = unpaired & ~np.concatenate(([False], unpaired[:-1]))
    run_id = np.cumsum(starts) - 1  # run index, valid only where unpaired
    # Start index of the run each position belongs to (forward fill of starts).
    start_idx = np.maximum.accumulate(np.where(starts, idx, 0))
    pos_in_run = idx - start_idx
    run_len = np.bincount(run_id[unpaired])  # [num_runs]
    rl = run_len[np.maximum(run_id, 0)]  # per-position run length

    loop_size_norm = np.where(unpaired, rl / max(1, n), 0.0).astype(np.float32)
    rel = np.where(rl > 1, pos_in_run / np.maximum(rl - 1, 1), 0.5)
    loop_pos_norm = np.where(unpaired, rel, 0.0).astype(np.float32)
    return loop_size_norm, loop_pos_norm


_BASE_LUT = np.zeros((256, 4), dtype=np.float32)
for _c, _k in (("A", 0), ("C", 1), ("G", 2), ("U", 3)):
    _BASE_LUT[ord(_c), _k] = 1.0
    _BASE_LUT[ord(_c.lower()), _k] = 1.0


def one_hot_sequence(sequence: str | None, n: int) -> np.ndarray:
    """Vectorized ACGU one-hot; unknown characters map to all-zeros.

    Mirrors utils.py:367-376 (``_one_hot_base``).
    """
    out = np.zeros((n, 4), dtype=np.float32)
    if sequence:
        m = min(len(sequence), n)
        codes = np.frombuffer(sequence[:m].encode("latin-1"), dtype=np.uint8)
        out[:m] = _BASE_LUT[codes]
    return out
