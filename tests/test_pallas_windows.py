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
        # non-uniform multiple-of-128 widths (the flagship alignment-
        # training shape) are in scope since the per-layer-dims kernel
        assert pallas_windows_ok(
            dataclasses.replace(
                model.config, hidden_dims=(256, 512, 512, 512), output_dim=512
            )
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

    def test_matches_xla_path_nonuniform_widths(self):
        """Per-layer-dims kernel: a width-changing stack (256 -> 512x2,
        fc 512 -> 256, residual skipped on the width-change layer) must
        match the XLA aligned path.  Random params, standard encoding."""
        import jax
        import jax.numpy as jnp

        from ginfinity_tpu.graphs.batching import _round_capacity
        from ginfinity_tpu.graphs.build import standard_node_features
        from ginfinity_tpu.graphs.dotbracket import pair_table
        from ginfinity_tpu.models.gine import GINConfig, init_params
        from ginfinity_tpu.pipelines.fast_windows import (
            _forward_windows_aligned,
        )

        cfg = GINConfig(
            hidden_dims=(256, 512, 512),
            output_dim=256,
            pooling_type="global_mean_pool",
            node_embed_norm="zscore_l2",
            normalize_nodes_before_pool=True,
        )
        params, state = init_params(jax.random.PRNGKey(7), cfg)
        state = dict(state)
        rngs = np.random.default_rng(11)
        state["node_mu"] = jnp.asarray(
            rngs.normal(size=512).astype(np.float32) * 0.1
        )
        state["node_sigma"] = jnp.asarray(
            1.0 + 0.1 * rngs.random(512).astype(np.float32)
        )

        structures = (
            pd.read_csv(SAMPLE)["secondary_structure"].astype(str).head(4).tolist()
        )
        L = 48  # 4 structures x 4 starts = 16 windows (C % 8 == 0 gate)
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
            cfg, params, state, feats_d, pts_d, si, st, L,
            True, use_pallas=False,
        ))
        got = np.asarray(_forward_windows_aligned(
            cfg, params, state, feats_d, pts_d, si, st, L,
            True, use_pallas=True,
        ))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_matches_xla_path_nondefault_eps(self):
        """config.eps must thread into the kernel's node-norm (it was
        hardcoded 1e-6): with eps=1e-2 and sigmas of ~1e-3, the zscore
        denominators differ ~10x between the two values, so any
        hardcoding diverges far beyond the parity tolerance."""
        import jax
        import jax.numpy as jnp

        from ginfinity_tpu.graphs.batching import _round_capacity
        from ginfinity_tpu.graphs.build import standard_node_features
        from ginfinity_tpu.graphs.dotbracket import pair_table
        from ginfinity_tpu.models.gine import GINConfig, init_params
        from ginfinity_tpu.pipelines.fast_windows import (
            _forward_windows_aligned,
        )

        cfg = GINConfig(
            hidden_dims=(128, 128),
            output_dim=128,
            pooling_type="global_mean_pool",
            node_embed_norm="zscore_l2",
            normalize_nodes_before_pool=True,
            eps=1e-2,
        )
        params, state = init_params(jax.random.PRNGKey(3), cfg)
        state = dict(state)
        rngs = np.random.default_rng(5)
        state["node_mu"] = jnp.asarray(
            rngs.normal(size=128).astype(np.float32) * 0.1
        )
        state["node_sigma"] = jnp.asarray(
            1e-3 * (1.0 + rngs.random(128).astype(np.float32))
        )

        s = pd.read_csv(SAMPLE)["secondary_structure"].astype(str).iloc[0]
        L = 48
        n_cap = _round_capacity(len(s))
        pt = pair_table(s)
        feats = np.zeros((1, n_cap, cfg.node_feature_dim), np.float32)
        feats[0, : len(s)] = standard_node_features(
            pt, None, cfg.seq_weight, cfg.node_feature_dim
        )
        pts = np.full((1, n_cap), -1, np.int32)
        pts[0, : len(s)] = pt
        starts = np.asarray(
            np.random.default_rng(0).integers(0, len(s) - L, size=8), np.int32
        )
        si = jnp.zeros(8, jnp.int32)
        st = jnp.asarray(starts)
        feats_d, pts_d = jnp.asarray(feats), jnp.asarray(pts)

        ref = np.asarray(_forward_windows_aligned(
            cfg, params, state, feats_d, pts_d, si, st, L,
            True, use_pallas=False,
        ))
        got = np.asarray(_forward_windows_aligned(
            cfg, params, state, feats_d, pts_d, si, st, L,
            True, use_pallas=True,
        ))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_matches_xla_path_forgi(self):
        """Forgi checkpoints (7-dim edge layout, base-only 16-dim window
        features) route into the kernel when their widths qualify; the
        kernel's constant edge rows come from the same
        window_edge_const_rows layout as the XLA aligned path."""
        import jax
        import jax.numpy as jnp

        from ginfinity_tpu.graphs.batching import _round_capacity
        from ginfinity_tpu.graphs.build import window_node_features
        from ginfinity_tpu.graphs.dotbracket import pair_table
        from ginfinity_tpu.models.gine import GINConfig, init_params
        from ginfinity_tpu.pipelines.fast_windows import (
            _forward_windows_aligned,
        )

        cfg = GINConfig(
            hidden_dims=(128, 128),
            output_dim=128,
            graph_encoding="forgi",
            node_feature_dim=16,
            edge_feature_dim=7,
            pooling_type="global_mean_pool",
            node_embed_norm="zscore_l2",
            normalize_nodes_before_pool=True,
        )
        params, state = init_params(jax.random.PRNGKey(5), cfg)

        structures = (
            pd.read_csv(SAMPLE)["secondary_structure"].astype(str).head(4).tolist()
        )
        L = 48
        n_cap = _round_capacity(max(len(s) for s in structures))
        S = len(structures)
        feats = np.zeros((S, n_cap, cfg.node_feature_dim), np.float32)
        pts = np.full((S, n_cap), -1, np.int32)
        starts, sidx = [], []
        for k, s in enumerate(structures):
            pt = pair_table(s)
            feats[k, : len(s)] = window_node_features(
                pt, None, cfg.seq_weight, cfg.graph_encoding,
                cfg.node_feature_dim,
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
            cfg, params, state, feats_d, pts_d, si, st, L,
            True, use_pallas=False,
        ))
        got = np.asarray(_forward_windows_aligned(
            cfg, params, state, feats_d, pts_d, si, st, L,
            True, use_pallas=True,
        ))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_pick_cb_shrinks_with_width(self):
        from ginfinity_tpu.ops.pallas_windows import _pick_cb

        # flagship 6x128 keeps the full 8-window block
        assert _pick_cb(((128, 128),) * 6, 128, 120) == 8
        # the 512-wide training config must still FIT (possibly smaller
        # blocks) rather than fall back
        wide = ((256, 256), (256, 512), (512, 512), (512, 512))
        cb = _pick_cb(wide, 512, 100)
        assert cb in (1, 2, 4)
