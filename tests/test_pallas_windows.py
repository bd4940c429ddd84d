"""Parity of the VMEM-resident Pallas window encoder (interpret mode on
the CPU mesh) against the aligned XLA path, on real structures with the
packaged checkpoint."""

import numpy as np
import pandas as pd
import pytest

CKPT = "/root/reference/src/ginfinity/weights/gin_weights_regression_180925.pth"
SAMPLE = "/root/reference/example_data/sample_dataset.csv"


@pytest.fixture(scope="module")
def model():
    from ginfinity_tpu.models.checkpoint import import_torch_checkpoint
    from ginfinity_tpu.models.gine import GINModel

    cfg, params, state, _ = import_torch_checkpoint(CKPT)
    return GINModel(cfg, params, state)


class TestPallasWindows:
    def test_config_gate(self, model):
        import dataclasses

        from ginfinity_tpu.ops.pallas_windows import pallas_windows_ok

        assert pallas_windows_ok(model.config)  # packaged flagship config
        assert not pallas_windows_ok(
            dataclasses.replace(model.config, norm_type="none")
        )
        assert not pallas_windows_ok(
            dataclasses.replace(model.config, hidden_dims=(64,) * 6)
        )

    @pytest.mark.parametrize("L", [40, 120])
    def test_matches_aligned_xla_path(self, model, L):
        import jax.numpy as jnp

        from ginfinity_tpu.graphs.batching import _round_capacity
        from ginfinity_tpu.graphs.build import standard_node_features
        from ginfinity_tpu.graphs.dotbracket import pair_table
        from ginfinity_tpu.pipelines.fast_windows import (
            _forward_windows_aligned,
        )

        cfg = model.config
        structures = (
            pd.read_csv(SAMPLE)["secondary_structure"].astype(str).head(4).tolist()
        )
        n_cap = _round_capacity(max(len(s) for s in structures))
        S = len(structures)
        feats = np.zeros((S, n_cap, cfg.node_feature_dim), np.float32)
        pts = np.full((S, n_cap), -1, np.int32)
        starts, sidx = [], []
        for k, s in enumerate(structures):
            pt = pair_table(s)
            feats[k, : len(s)] = standard_node_features(
                pt, None, cfg.seq_weight, cfg.node_feature_dim
            )
            pts[k, : len(s)] = pt
            rng = np.random.default_rng(k)
            for st in rng.integers(0, len(s) - L, size=4):
                starts.append(int(st))
                sidx.append(k)
        si = jnp.asarray(np.asarray(sidx, np.int32))
        st = jnp.asarray(np.asarray(starts, np.int32))
        feats_d, pts_d = jnp.asarray(feats), jnp.asarray(pts)

        ref = np.asarray(_forward_windows_aligned(
            cfg, model.params, model.state, feats_d, pts_d, si, st, L,
            True, use_pallas=False,
        ))
        got = np.asarray(_forward_windows_aligned(
            cfg, model.params, model.state, feats_d, pts_d, si, st, L,
            True, use_pallas=True,
        ))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)
