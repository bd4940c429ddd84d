"""Numerical parity of the JAX GINE encoder against the packaged
reference checkpoint, verified via an independent torch oracle
(tests/torch_oracle.py) on real structures."""

import numpy as np
import pytest

from ginfinity_tpu.graphs.batching import batch_graphs
from ginfinity_tpu.graphs.build import build_standard
from ginfinity_tpu.models.checkpoint import (
    export_torch_checkpoint,
    import_torch_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from ginfinity_tpu.models.gine import GINConfig, GINModel, init_params

CKPT = "/root/reference/src/ginfinity/weights/gin_weights_regression_180925.pth"


@pytest.fixture(scope="module")
def packaged_model():
    config, params, state, extra = import_torch_checkpoint(CKPT)
    return GINModel(config, params, state), extra


@pytest.fixture(scope="module")
def graphs(sample_structures, packaged_model):
    model, _ = packaged_model
    fd = model.config.node_feature_dim
    return [build_standard(s, seq, feature_dim=fd) for seq, s in sample_structures]


class TestTorchImport:
    def test_metadata(self, packaged_model):
        model, extra = packaged_model
        cfg = model.config
        assert cfg.gin_layers == 6
        assert cfg.hidden_dims == (128,) * 6
        assert cfg.node_feature_dim == 3
        assert cfg.pooling_type == "global_mean_pool"
        assert cfg.node_embed_norm == "zscore_l2"
        assert cfg.normalize_nodes_before_pool
        assert extra["epoch"] == 29

    def test_graph_embeddings_match_oracle(self, packaged_model, graphs):
        from tests.torch_oracle import run_oracle

        model, _ = packaged_model
        ref = run_oracle(
            CKPT,
            [g.node_feat for g in graphs],
            [g.edge_src for g in graphs],
            [g.edge_dst for g in graphs],
            [g.edge_attr for g in graphs],
        )
        batch = batch_graphs(graphs)
        ours = np.asarray(model.forward_once(batch))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_fit_node_stats_matches_torch_streaming_fit(self, packaged_model, graphs):
        """fit_node_stats == the reference's fit_node_stats_from_loader
        math (gin_model.py:206-230): streaming mu/sigma over raw
        (pre-norm) node embeddings, sigma = sqrt(clamp(E[x^2]-mu^2,0)+eps)."""
        import torch

        from tests.torch_oracle import run_oracle

        from ginfinity_tpu.models.gine import fit_node_stats

        model, _ = packaged_model
        half = len(graphs) // 2
        chunks = [graphs[:half], graphs[half:]]

        s = ss = None
        n = 0
        for ch in chunks:  # torch streaming fit, one "loader batch" per chunk
            x = torch.from_numpy(
                run_oracle(
                    CKPT,
                    [g.node_feat for g in ch],
                    [g.edge_src for g in ch],
                    [g.edge_dst for g in ch],
                    [g.edge_attr for g in ch],
                    mode="raw_nodes",
                )
            )
            if s is None:
                s, ss = x.sum(dim=0), (x * x).sum(dim=0)
            else:
                s, ss = s + x.sum(dim=0), ss + (x * x).sum(dim=0)
            n += x.shape[0]
        mu = s / n
        var = torch.clamp(ss / n - mu * mu, min=0.0)
        sigma = torch.clamp(torch.sqrt(var + 1e-6), min=1e-6)

        new_state = fit_node_stats(
            model.config, model.params, model.state,
            [batch_graphs(ch) for ch in chunks],
        )
        np.testing.assert_allclose(
            np.asarray(new_state["node_mu"]), mu.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(new_state["node_sigma"]), sigma.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_node_embeddings_match_oracle(self, packaged_model, graphs):
        from tests.torch_oracle import run_oracle

        model, _ = packaged_model
        ref = run_oracle(
            CKPT,
            [g.node_feat for g in graphs],
            [g.edge_src for g in graphs],
            [g.edge_dst for g in graphs],
            [g.edge_attr for g in graphs],
            mode="nodes",
        )
        batch = batch_graphs(graphs)
        ours = np.asarray(model.get_node_embeddings(batch))
        mask = np.asarray(batch.node_mask) > 0
        # zscore divides by per-dim sigma, amplifying f32 noise on
        # near-zero components; 5e-4 absolute is retrieval-identical.
        np.testing.assert_allclose(ours[mask], ref, rtol=1e-4, atol=5e-4)

    def test_batching_invariance(self, packaged_model, graphs):
        """Embeddings must be identical whether graphs run alone or batched
        (guards padding/segment handling)."""
        model, _ = packaged_model
        batched = np.asarray(model.forward_once(batch_graphs(graphs[:4])))
        for i in range(4):
            solo = np.asarray(model.forward_once(batch_graphs([graphs[i]])))
            np.testing.assert_allclose(batched[i], solo[0], rtol=1e-4, atol=1e-5)


class TestCheckpointRoundtrip:
    def test_native_roundtrip(self, tmp_path, packaged_model, graphs):
        model, _ = packaged_model
        path = str(tmp_path / "model.gin.zip")
        save_checkpoint(path, model.config, model.params, model.state, {"epoch": 29})
        cfg2, params2, state2, extra = load_checkpoint(path)
        assert cfg2 == model.config
        assert extra["epoch"] == 29
        m2 = GINModel(cfg2, params2, state2)
        b = batch_graphs(graphs[:2])
        np.testing.assert_allclose(
            np.asarray(model.forward_once(b)), np.asarray(m2.forward_once(b)), atol=1e-6
        )

    def test_torch_export_roundtrip(self, tmp_path, packaged_model, graphs):
        model, _ = packaged_model
        path = str(tmp_path / "export.pth")
        export_torch_checkpoint(path, model.config, model.params, model.state, epoch=29)
        cfg2, params2, state2, extra = import_torch_checkpoint(path)
        m2 = GINModel(cfg2, params2, state2)
        b = batch_graphs(graphs[:2])
        np.testing.assert_allclose(
            np.asarray(model.forward_once(b)), np.asarray(m2.forward_once(b)), atol=1e-6
        )

    def test_fresh_init_shapes(self):
        import jax

        cfg = GINConfig.create(hidden_dim=[32, 64], output_dim=16, gin_layers=2)
        params, state = init_params(jax.random.PRNGKey(0), cfg)
        assert params["convs"][1]["mlp0"]["kernel"].shape == (32, 64)
        assert params["fc"]["kernel"].shape == (64, 16)
        g = build_standard("((..))")
        m = GINModel(cfg, params, state)
        out = m.forward_once(batch_graphs([g]))
        assert out.shape == (1, 16)
        assert np.isfinite(np.asarray(out)).all()
