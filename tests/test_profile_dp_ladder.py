"""Shape-ladder contract of the progressive-alignment profile DP.

Progressive alignment issues one device program per tree level with a
level-specific batch size; each distinct (B, P1, P2) costs a per-process
executable load (~1.5 s over the remote tunnel), so the padding must
collapse the level shapes to a small, prewarmable set (see
ops/pairhmm._profile_pad_shape).
"""

import numpy as np
import pytest

from ginfinity_tpu.ops.pairhmm import (
    _pow2_batch,
    _profile_pad_shape,
    prewarm_profile_programs,
    profile_align_batch,
    profile_align_batch_ops,
)


def test_pow2_batch():
    assert [_pow2_batch(b) for b in (1, 2, 3, 5, 16, 17)] == [1, 2, 4, 8, 16, 32]


def test_pad_shape_is_square_pow2():
    mats = [np.zeros((290, 292), np.float32)] * 17
    B, P = _profile_pad_shape(mats)
    assert B == 32
    assert P == 384  # both dims share one ladder cap


def test_level_shapes_collapse_to_prewarmable_set():
    # the observed 200x300-family level sequence: 11 distinct raw shapes
    rng = np.random.default_rng(0)
    levels = [(17, 290, 292), (15, 300, 292), (13, 298, 300), (10, 295, 300),
              (9, 299, 300), (6, 296, 300), (5, 299, 300), (4, 282, 300),
              (2, 285, 299), (1, 246, 300), (1, 300, 295)]
    shapes = set()
    for b, l1, l2 in levels:
        mats = [rng.normal(size=(l1, l2)).astype(np.float32)] * b
        shapes.add(_profile_pad_shape(mats))
    assert len(shapes) <= 6
    assert all(p == 384 for _, p in shapes)


def test_non_pow2_batch_matches_solo():
    rng = np.random.default_rng(1)
    mats = [rng.normal(size=(la, lb)).astype(np.float32)
            for la, lb in [(6, 9), (14, 11), (10, 10)]]  # batch of 3 -> pad 4
    got = profile_align_batch_ops(mats, -3.0, -0.5)
    assert len(got) == 3
    for m, ops in zip(mats, got):
        solo = profile_align_batch_ops([m], -3.0, -0.5)[0]
        np.testing.assert_array_equal(ops, solo)


def test_dense_batch_crops_padding_rows():
    rng = np.random.default_rng(2)
    mats = [rng.normal(size=(la, lb)).astype(np.float32)
            for la, lb in [(5, 7), (9, 4), (3, 3)]]
    out = profile_align_batch(mats, -2.0, -0.3)
    assert len(out) == 3
    for m, (M, X, Y) in zip(mats, out):
        assert M.shape == (m.shape[0] + 1, m.shape[1] + 1)
        assert X.shape == M.shape and Y.shape == M.shape


def test_prewarm_thread_runs_to_completion():
    t = prewarm_profile_programs(l_cap=16, b_max=3)
    t.join(timeout=120)
    assert not t.is_alive()
