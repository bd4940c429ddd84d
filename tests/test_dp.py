"""Wavefront DP vs the reference's needleman_wunsch_affine /
smith_waterman_affine (imported read-only; they are pure numpy)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

from ginfinity_tpu.ops.dp import affine_align, affine_align_batch


@pytest.fixture(scope="module")
def ref_aligners():
    from ginfinity.scripts.align_node_embeddings import (
        needleman_wunsch_affine,
        smith_waterman_affine,
    )

    return needleman_wunsch_affine, smith_waterman_affine


def _rand_mats(seed, n=6):
    rng = np.random.default_rng(seed)
    mats = []
    for _ in range(n):
        L1 = int(rng.integers(3, 40))
        L2 = int(rng.integers(3, 40))
        mats.append(rng.normal(scale=1.0, size=(L1, L2)).astype(np.float32))
    return mats


class TestGlobal:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("gaps", [(-1.0, -1.0), (-2.0, -0.5)])
    def test_scores_and_paths_match(self, ref_aligners, seed, gaps):
        nw, _ = ref_aligners
        go, ge = gaps
        mats = _rand_mats(seed)
        ours = affine_align_batch(mats, go, ge, mode="global")
        for m, (score, path) in zip(mats, ours):
            ref_score, ref_path = nw(m, go, ge)
            assert abs(score - ref_score) < 1e-3, (m.shape, score, ref_score)
            assert path == ref_path, (m.shape,)

    def test_rectangular_extremes(self, ref_aligners):
        nw, _ = ref_aligners
        rng = np.random.default_rng(7)
        m = rng.normal(size=(1, 30)).astype(np.float32)
        score, path = affine_align(m, -1.0, -0.5, "global")
        rs, rp = nw(m, -1.0, -0.5)
        assert abs(score - rs) < 1e-3
        assert path == rp


class TestLocal:
    @pytest.mark.parametrize("seed", [3, 4])
    def test_scores_match(self, ref_aligners, seed):
        _, sw = ref_aligners
        mats = _rand_mats(seed)
        ours = affine_align_batch(mats, -1.0, -1.0, mode="local")
        for m, (score, path) in zip(mats, ours):
            ref_score, ref_path = sw(m, -1.0, -1.0)
            assert abs(score - ref_score) < 1e-3
            # endpoints may differ only on exact float ties; with random
            # float matrices the argmax is unique -> paths must match
            assert path == ref_path

    def test_all_negative_scores_empty_path(self):
        m = -np.ones((5, 5), np.float32)
        score, path = affine_align(m, -1.0, -1.0, "local")
        assert score == 0.0
        assert path == []
