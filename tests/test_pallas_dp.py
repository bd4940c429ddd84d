"""Pallas wavefront kernel vs the lax.scan wavefront (interpret mode on
CPU; the compiled TPU path was verified on hardware with identical
scores and paths)."""

import numpy as np
import pytest

from ginfinity_tpu.ops.dp import affine_align_batch
from ginfinity_tpu.ops.pallas_dp import nw_align_batch_pallas


class TestPallasWavefront:
    @pytest.mark.parametrize("seed,gaps", [(0, (-1.0, -1.0)), (1, (-2.0, -0.5))])
    def test_matches_lax_scan(self, seed, gaps):
        rng = np.random.default_rng(seed)
        mats = [
            rng.normal(size=(int(rng.integers(3, 40)), int(rng.integers(3, 40)))).astype(np.float32)
            for _ in range(6)
        ]
        ref = affine_align_batch(mats, *gaps, mode="global", backend="lax")
        got = nw_align_batch_pallas(mats, *gaps, interpret=True)
        for (rs, rp), (gs, gp) in zip(ref, got):
            assert abs(rs - gs) < 1e-3
            assert rp == gp

    def test_rectangular(self):
        rng = np.random.default_rng(2)
        mats = [rng.normal(size=(3, 37)).astype(np.float32),
                rng.normal(size=(31, 4)).astype(np.float32)]
        ref = affine_align_batch(mats, -1.5, -0.25, mode="global", backend="lax")
        got = nw_align_batch_pallas(mats, -1.5, -0.25, interpret=True)
        for (rs, rp), (gs, gp) in zip(ref, got):
            assert abs(rs - gs) < 1e-3
            assert rp == gp

    @pytest.mark.parametrize("seed,gaps", [(3, (-1.0, -1.0)), (4, (-2.0, -0.5))])
    def test_local_mode_matches_lax_scan(self, seed, gaps):
        from ginfinity_tpu.ops.pallas_dp import align_batch_pallas

        rng = np.random.default_rng(seed)
        mats = [
            rng.normal(size=(int(rng.integers(3, 40)), int(rng.integers(3, 40)))).astype(np.float32)
            for _ in range(6)
        ]
        ref = affine_align_batch(mats, *gaps, mode="local", backend="lax")
        got = align_batch_pallas(mats, *gaps, mode="local", interpret=True)
        for (rs, rp), (gs, gp) in zip(ref, got):
            assert abs(rs - gs) < 1e-3
            assert rp == gp

    def test_local_all_negative_scores_empty_path(self):
        from ginfinity_tpu.ops.pallas_dp import align_batch_pallas

        mats = [np.full((8, 11), -2.0, np.float32)]
        (score, path), = align_batch_pallas(mats, -3.0, -1.0, mode="local",
                                            interpret=True)
        assert score == 0.0 and path == []
