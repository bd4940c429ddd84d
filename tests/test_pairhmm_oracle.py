"""Brute-force enumeration oracle for the pair-HMM posteriors.

The reference's forward/backward is numerically degenerate (see
ops/pairhmm.py docstring), so it cannot serve as the parity oracle.
Instead, for tiny L we enumerate EVERY alignment in the model's path
space, compute exact posteriors P(i~j) = sum of weights of alignments
matching i with j divided by the total weight, and require the batched
device forward/backward to agree.

Path spaces (must mirror ops/pairhmm.py exactly):

- global: move sequences M/X/Y from (0,0) to (La,Lb); an X-run may
  follow only M (or start), likewise Y (no X<->Y adjacency — the
  forward has no X->Y transition); a gap run of length k costs
  go + ge*(k-1); ends in any state.
- local: paths start AND end at a match cell (any cell); same X/Y
  adjacency rule; every prefix/suffix rule is inherited from choosing
  explicit start/end cells.
"""

import itertools

import numpy as np
import pytest


def _gap_cost(length, go, ge):
    return go + ge * (length - 1)


def _enumerate_global(La, Lb):
    """Yield alignments as lists of moves ('M','X','Y') from (0,0) to
    (La,Lb) with no X-run adjacent to a Y-run."""
    def rec(i, j, prev, path):
        if i == La and j == Lb:
            yield list(path)
            return
        if i < La and j < Lb:
            path.append("M")
            yield from rec(i + 1, j + 1, "M", path)
            path.pop()
        if i < La and prev != "Y":
            path.append("X")
            yield from rec(i + 1, j, "X", path)
            path.pop()
        if j < Lb and prev != "X":
            path.append("Y")
            yield from rec(i, j + 1, "Y", path)
            path.pop()

    yield from rec(0, 0, None, [])


def _path_weight(moves, i0, j0, L, go, ge):
    """Log-weight of a move sequence starting at cell (i0, j0)."""
    w = 0.0
    i, j = i0, j0
    run = None
    run_len = 0
    for mv in moves:
        if mv == "M":
            if run is not None:
                w += _gap_cost(run_len, go, ge)
                run = None
            w += L[i, j]
            i += 1
            j += 1
        else:
            if run == mv:
                run_len += 1
            else:
                if run is not None:
                    w += _gap_cost(run_len, go, ge)
                run, run_len = mv, 1
            if mv == "X":
                i += 1
            else:
                j += 1
    if run is not None:
        w += _gap_cost(run_len, go, ge)
    return w


def _match_cells(moves, i0, j0):
    cells = []
    i, j = i0, j0
    for mv in moves:
        if mv == "M":
            cells.append((i, j))
            i += 1
            j += 1
        elif mv == "X":
            i += 1
        else:
            j += 1
    return cells


def oracle_posteriors_global(L, go, ge):
    La, Lb = L.shape
    num = np.zeros((La, Lb))
    Z = 0.0
    for moves in _enumerate_global(La, Lb):
        w = np.exp(_path_weight(moves, 0, 0, L, go, ge))
        Z += w
        for (i, j) in _match_cells(moves, 0, 0):
            num[i, j] += w
    return num / Z


def _enumerate_local_moves(La, Lb, i0, j0):
    """All move sequences starting with M at (i0,j0) and ending with M,
    staying within bounds, no X<->Y adjacency."""
    def rec(i, j, prev, path):
        if path and path[-1] == "M":
            yield list(path)
        if i < La and j < Lb:
            path.append("M")
            yield from rec(i + 1, j + 1, "M", path)
            path.pop()
        if path:  # gaps only after the initial match
            if i < La and prev != "Y":
                path.append("X")
                yield from rec(i + 1, j, "X", path)
                path.pop()
            if j < Lb and prev != "X":
                path.append("Y")
                yield from rec(i, j + 1, "Y", path)
                path.pop()

    yield from rec(i0, j0, None, [])


def oracle_posteriors_local(L, go, ge):
    La, Lb = L.shape
    num = np.zeros((La, Lb))
    Z = 0.0
    for i0, j0 in itertools.product(range(La), range(Lb)):
        for moves in _enumerate_local_moves(La, Lb, i0, j0):
            w = np.exp(_path_weight(moves, i0, j0, L, go, ge))
            Z += w
            for (i, j) in _match_cells(moves, i0, j0):
                num[i, j] += w
    return num / Z


@pytest.mark.parametrize("mode", ["global", "local"])
@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (4, 4), (5, 3)])
def test_posteriors_match_enumeration(mode, shape):
    from ginfinity_tpu.ops.pairhmm import pairhmm_posteriors

    rng = np.random.default_rng(hash((mode, shape)) % 2**31)
    L = rng.normal(scale=1.5, size=shape).astype(np.float32)
    go, ge = -2.0, -0.5
    oracle = (
        oracle_posteriors_global(L, go, ge)
        if mode == "global"
        else oracle_posteriors_local(L, go, ge)
    )
    got = pairhmm_posteriors([L], go, ge, mode=mode)[0]
    np.testing.assert_allclose(got, oracle, atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("mode", ["global", "local"])
def test_posteriors_batched_mixed_shapes(mode):
    """Batch padding must not change per-pair posteriors."""
    from ginfinity_tpu.ops.pairhmm import pairhmm_posteriors

    rng = np.random.default_rng(11)
    mats = [
        rng.normal(scale=1.5, size=s).astype(np.float32)
        for s in [(2, 2), (4, 3), (3, 5)]
    ]
    go, ge = -3.0, -0.7
    batched = pairhmm_posteriors(mats, go, ge, mode=mode)
    for m, got in zip(mats, batched):
        solo = pairhmm_posteriors([m], go, ge, mode=mode)[0]
        np.testing.assert_allclose(got, solo, atol=1e-5, rtol=1e-5)


def test_local_mode_favors_high_scoring_islands():
    """Local posteriors should concentrate on a strong sub-block and not
    force end-to-end coverage the way global mode does."""
    from ginfinity_tpu.ops.pairhmm import pairhmm_posteriors

    L = np.full((5, 5), -4.0, np.float32)
    for k in (1, 2, 3):
        L[k, k] = 3.0
    P = pairhmm_posteriors([L], -5.0, -1.0, mode="local")[0]
    assert P[2, 2] > 0.9
    assert P[0, 0] < 0.2 and P[4, 4] < 0.2
    assert np.all(P >= 0) and np.all(P <= 1 + 1e-5)
