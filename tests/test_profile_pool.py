"""Device-resident progressive pool (ops/profile_pool.py) parity vs the
host-driven levelized path — identical aligned output strings, including
families whose tree levels mix widths (the two-shape batch padding pads
intermediate levels to Bmax, which must stay aligned with the ops
slicing; a misalignment here produced out-of-bounds replay indices).

Exact string parity holds per backend (these tests run on forced-CPU
JAX); across backends a 1-ulp dot-product difference can flip the
strict-greater traceback to a different CO-OPTIMAL alignment — see the
precision note in ops/profile_pool.py."""

import os

import numpy as np
import pytest

from ginfinity_tpu.pipelines.msa import (
    SequenceRecord,
    _l2_normalize_rows,
    build_guide_tree,
    initial_profiles,
    msa_from_tree,
    profile_to_msa_strings,
)


def _family(rng, n, lmax, d=8, noise=0.2):
    base = rng.normal(size=(lmax, d)).astype(np.float32)
    recs = []
    for k in range(n):
        L = int(rng.integers(int(lmax * 0.7), lmax + 1))
        e = base[:L] + noise * rng.normal(size=(L, d)).astype(np.float32)
        recs.append(SequenceRecord(name=f"s{k}", emb=_l2_normalize_rows(e)))
    return recs


def _run_both(recs, seed, gap_open=-1.0, gap_extend=-0.1, seq_weight=0.0):
    rng = np.random.default_rng(seed)
    n = len(recs)
    profs = initial_profiles(recs)
    D = rng.random((n, n))
    D = (D + D.T) / 2
    np.fill_diagonal(D, 0)
    tree = build_guide_tree(D)
    names = [r.name for r in recs]
    old = os.environ.get("GINFINITY_MSA_POOL")
    try:
        os.environ["GINFINITY_MSA_POOL"] = "0"
        host = msa_from_tree(tree, profs, gap_open, gap_extend, seq_weight)
        os.environ["GINFINITY_MSA_POOL"] = "1"
        pool = msa_from_tree(tree, profs, gap_open, gap_extend, seq_weight)
    finally:
        if old is None:
            os.environ.pop("GINFINITY_MSA_POOL", None)
        else:
            os.environ["GINFINITY_MSA_POOL"] = old
    return (profile_to_msa_strings(host, names),
            profile_to_msa_strings(pool, names))


@pytest.mark.parametrize("n,lmax,seed", [
    (6, 12, 0),
    (10, 25, 1),
    (18, 40, 2),   # mixed level widths: Bmax padding != per-level pow2
    (30, 35, 3),   # wider first level + batch=1 caterpillar tail
])
def test_pool_matches_host_path(n, lmax, seed):
    rng = np.random.default_rng(seed + 100)
    recs = _family(rng, n, lmax)
    host, pool = _run_both(recs, seed)
    assert host == pool


def test_pool_scan_tail_matches_host_path():
    # A left-deep chain tree is ALL batch-1 levels: 20 levels exceed
    # _POOL_SCAN_MIN, so the run dispatches through the lax.scan tail
    # program (one full chunk of _POOL_SCAN_CHUNK=16 plus a padded
    # 4-level remainder chunk) rather than 20 per-level submissions.
    from ginfinity_tpu.ops import profile_pool as pp

    rng = np.random.default_rng(7)
    n = pp._POOL_SCAN_CHUNK + 5  # forces a padded second chunk
    recs = _family(rng, n, 30)
    profs = initial_profiles(recs)
    tree = 0
    for k in range(1, n):
        tree = (tree, k)
    names = [r.name for r in recs]
    internals = []

    def walk(node):
        if isinstance(node, int):
            return
        walk(node[0])
        walk(node[1])
        internals.append(node)

    walk(tree)
    from ginfinity_tpu.pipelines.msa import _msa_from_tree_pool

    old = os.environ.get("GINFINITY_MSA_POOL")
    try:
        os.environ["GINFINITY_MSA_POOL"] = "0"
        host = msa_from_tree(tree, profs, -1.0, -0.1, 0.0)
        # direct pool call: None would mean overflow -> a silent host
        # fallback, which would pass parity without testing the scan
        pool = _msa_from_tree_pool(tree, internals, profs, -1.0, -0.1, 0.0)
    finally:
        if old is None:
            os.environ.pop("GINFINITY_MSA_POOL", None)
        else:
            os.environ["GINFINITY_MSA_POOL"] = old
    assert pool is not None, "pool overflowed — scan path not tested"
    assert (profile_to_msa_strings(host, names)
            == profile_to_msa_strings(pool, names))


def test_pool_matches_host_path_with_base_embeddings():
    rng = np.random.default_rng(11)
    recs = _family(rng, 8, 20)
    for r in recs:
        L = r.emb.shape[0]
        r.base_emb = _l2_normalize_rows(
            rng.normal(size=(L, 6)).astype(np.float32))
    host, pool = _run_both(recs, 11, seq_weight=0.4)
    assert host == pool


def test_pool_padded_len_has_headroom_at_ladder_rungs():
    from ginfinity_tpu.graphs.batching import _round_capacity
    from ginfinity_tpu.ops.profile_pool import pool_padded_len

    # a family whose longest sequence sits exactly on a rung must NOT be
    # padded to that rung — the first gap-containing merge would
    # overflow and waste the entire pool run
    for rung in (32, 64, 128, 256, 384):
        assert pool_padded_len(rung) > rung
    assert pool_padded_len(300) == _round_capacity(300 + 300 // 8)


def test_pool_overflow_falls_back_to_host_path():
    # positive gap scores make every merge all-gap (merged length = sum
    # of child lengths), guaranteeing growth past the padded length; the
    # pool must detect the overflow and the fallback must produce the
    # host result
    from ginfinity_tpu.pipelines.msa import _msa_from_tree_pool

    rng = np.random.default_rng(5)
    recs = [SequenceRecord(name=f"t{k}", emb=_l2_normalize_rows(
        rng.normal(size=(30, 8)).astype(np.float32))) for k in range(8)]
    n = len(recs)
    profs = initial_profiles(recs)
    rng2 = np.random.default_rng(5)
    D = rng2.random((n, n))
    D = (D + D.T) / 2
    np.fill_diagonal(D, 0)
    tree = build_guide_tree(D)
    internals = []

    def walk(node):
        if isinstance(node, int):
            return
        walk(node[0])
        walk(node[1])
        internals.append(node)

    walk(tree)
    assert _msa_from_tree_pool(tree, internals, profs, 2.0, 2.0, 0.0) is None

    host, pool = _run_both(recs, 5, gap_open=2.0, gap_extend=2.0)
    assert host == pool
