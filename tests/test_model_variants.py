"""Coverage of model configuration variants: every norm type, every
pooling (set2set LSTM layout verified against torch), forgi encoding
end-to-end, seq_weight features, and torch-checkpoint round-trips for
each variant."""

import numpy as np
import pytest

from ginfinity_tpu.graphs.batching import batch_graphs
from ginfinity_tpu.graphs.build import build_graph_arrays
from ginfinity_tpu.models.checkpoint import export_torch_checkpoint, import_torch_checkpoint
from ginfinity_tpu.models.gine import GINConfig, GINModel, init_params

STRUCTS = ["((((....))))..", "..((..))..((..))", "(((...)))"]


def _model(**kw):
    import jax

    cfg = GINConfig.create(hidden_dim=24, output_dim=12, gin_layers=2, **kw)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    return GINModel(cfg, params, state)


def _batch(encoding="standard", seq_weight=0.0):
    graphs = [
        build_graph_arrays(s, "ACGU" * 8, seq_weight, encoding) for s in STRUCTS
    ]
    return batch_graphs(graphs), graphs


class TestNormVariants:
    @pytest.mark.parametrize("norm", ["none", "graph", "layer", "instance", "batch"])
    def test_forward_finite_and_batch_invariant(self, norm):
        m = _model(norm_type=norm)
        b, graphs = _batch()
        out = np.asarray(m.forward_once(b))
        assert out.shape == (3, 12) and np.isfinite(out).all()
        # batching invariance (except batch-norm, whose eval stats are
        # running buffers -> also invariant)
        solo = np.asarray(m.forward_once(batch_graphs([graphs[1]])))
        np.testing.assert_allclose(out[1], solo[0], atol=2e-5)

    @pytest.mark.parametrize("norm", ["graph", "layer", "batch"])
    def test_torch_roundtrip(self, norm, tmp_path):
        m = _model(norm_type=norm)
        p = str(tmp_path / "m.pth")
        export_torch_checkpoint(p, m.config, m.params, m.state)
        cfg2, params2, state2, _ = import_torch_checkpoint(p)
        m2 = GINModel(cfg2, params2, state2)
        b, _ = _batch()
        np.testing.assert_allclose(
            np.asarray(m.forward_once(b)), np.asarray(m2.forward_once(b)), atol=1e-6
        )


class TestSet2Set:
    def test_lstm_layout_matches_torch(self):
        """Our manual LSTM must match torch.nn.LSTM given the same
        weights (gate order i,f,g,o; bias split ih/hh)."""
        import torch

        import jax
        import jax.numpy as jnp

        from ginfinity_tpu.models.gine import _set2set

        rng = np.random.default_rng(0)
        d = 6
        params = {
            "set2set": {
                "w_ih": jnp.asarray(rng.normal(size=(4 * d, 2 * d)).astype(np.float32)),
                "w_hh": jnp.asarray(rng.normal(size=(4 * d, d)).astype(np.float32)),
                "b_ih": jnp.asarray(rng.normal(size=(4 * d,)).astype(np.float32)),
                "b_hh": jnp.asarray(rng.normal(size=(4 * d,)).astype(np.float32)),
            }
        }
        x = rng.normal(size=(7, d)).astype(np.float32)
        g = build_graph_arrays("((.))..")  # 7 nodes
        b = batch_graphs([g], node_capacity=7, edge_capacity=g.n_edges, graph_capacity=1)
        ours = np.asarray(_set2set(params, jnp.asarray(x), b, jax.lax.Precision.HIGHEST))[:1]

        lstm = torch.nn.LSTM(2 * d, d, num_layers=1)
        with torch.no_grad():
            lstm.weight_ih_l0.copy_(torch.from_numpy(np.asarray(params["set2set"]["w_ih"])))
            lstm.weight_hh_l0.copy_(torch.from_numpy(np.asarray(params["set2set"]["w_hh"])))
            lstm.bias_ih_l0.copy_(torch.from_numpy(np.asarray(params["set2set"]["b_ih"])))
            lstm.bias_hh_l0.copy_(torch.from_numpy(np.asarray(params["set2set"]["b_hh"])))
            xt = torch.from_numpy(x)
            q_star = torch.zeros(1, 1, 2 * d)
            h = (torch.zeros(1, 1, d), torch.zeros(1, 1, d))
            for _ in range(2):  # processing_steps=2
                q, h = lstm(q_star, h)
                q = q.view(1, d)
                e = (xt * q).sum(-1)
                a = torch.softmax(e, 0)
                r = (a.unsqueeze(-1) * xt).sum(0, keepdim=True)
                q_star = torch.cat([q, r], dim=-1).view(1, 1, 2 * d)
        ref = q_star.view(1, 2 * d).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_set2set_model_roundtrip(self, tmp_path):
        m = _model(pooling_type="set2set")
        b, _ = _batch()
        out = np.asarray(m.forward_once(b))
        assert out.shape == (3, 12) and np.isfinite(out).all()
        p = str(tmp_path / "s2s.pth")
        export_torch_checkpoint(p, m.config, m.params, m.state)
        cfg2, params2, state2, _ = import_torch_checkpoint(p)
        np.testing.assert_allclose(
            out, np.asarray(GINModel(cfg2, params2, state2).forward_once(b)), atol=1e-6
        )


class TestForgiEncoding:
    def test_feature_dims(self):
        g = build_graph_arrays("((((....))))..", graph_encoding="forgi")
        assert g.node_feat.shape[1] == 16
        assert g.edge_attr.shape[1] == 7
        assert g.n_base_nodes == 14
        assert g.n_nodes > g.n_base_nodes  # meta nodes present

    def test_element_decomposition(self):
        from ginfinity_tpu.graphs.dotbracket import pair_table
        from ginfinity_tpu.graphs.forgi_elements import decompose_elements

        # hairpin with 5' and 3' tails: f, s, h, t
        els = decompose_elements(pair_table("..((((....))))..."))
        kinds = sorted(e.kind for e in els)
        assert kinds == ["five_prime", "hairpin", "stem", "three_prime"]
        stem = next(e for e in els if e.kind == "stem")
        assert stem.members == [2, 3, 4, 5, 10, 11, 12, 13]
        hp = next(e for e in els if e.kind == "hairpin")
        assert hp.members == [6, 7, 8, 9]

    def test_internal_and_multiloop(self):
        from ginfinity_tpu.graphs.dotbracket import pair_table
        from ginfinity_tpu.graphs.forgi_elements import decompose_elements

        # internal loop: ((..((...))..))
        els = decompose_elements(pair_table("((..((...))..))"))
        kinds = [e.kind for e in els]
        assert kinds.count("stem") == 2
        assert kinds.count("internal") == 1
        assert kinds.count("hairpin") == 1
        internal = next(e for e in els if e.kind == "internal")
        assert internal.members == [2, 3, 11, 12]  # both strands, one element

        # multiloop: ((..((...))..((...))..))
        els = decompose_elements(pair_table("((..((...))..((...))..))"))
        kinds = [e.kind for e in els]
        assert kinds.count("stem") == 3
        assert kinds.count("multiloop") == 3  # three segments
        assert kinds.count("hairpin") == 2

    def test_forgi_model_end_to_end(self):
        m = _model(graph_encoding="forgi", node_feature_dim=16, edge_feature_dim=7)
        b, _ = _batch(encoding="forgi")
        out = np.asarray(m.forward_once(b))
        assert out.shape == (3, 12) and np.isfinite(out).all()

    def test_pseudoknot_decomposition_robust(self):
        from ginfinity_tpu.graphs.dotbracket import pair_table
        from ginfinity_tpu.graphs.forgi_elements import decompose_elements

        els = decompose_elements(pair_table("((..[[..))..]].."))
        assert len(els) > 0  # classified on the nested core, no crash


class TestSeqWeight:
    def test_seq_features_scaled(self):
        g0 = build_graph_arrays("((..))", "ACGUAC", 0.0)
        g1 = build_graph_arrays("((..))", "ACGUAC", 0.4)
        assert g0.node_feat.shape[1] == 4
        assert g1.node_feat.shape[1] == 8
        np.testing.assert_allclose(g1.node_feat[0, :2], 0.6 * np.array([1.0, 0.0]))
        np.testing.assert_allclose(g1.node_feat[0, 4:], 0.4 * np.array([1, 0, 0, 0]))


class TestPrecisionMode:
    def test_bf16_config_plumbs_through(self, tmp_path):
        """--precision bf16 must flow into GINConfig (a jit-key field) and
        produce valid output; on CPU both precisions are exact f32, so
        equality is expected here (the throughput/recall trade-off is
        measured on TPU and recorded in BASELINE.md)."""
        import numpy as np
        import pandas as pd

        from ginfinity_tpu.models.gine import GINConfig
        from ginfinity_tpu.pipelines.embed import main

        cfg = GINConfig.create(hidden_dim=8, output_dim=4)
        assert cfg.matmul_precision == "highest"
        assert cfg.with_precision("bf16").matmul_precision == "bf16"
        assert "matmul_precision" not in cfg.to_metadata()
        import pytest

        with pytest.raises(ValueError):
            cfg.with_precision("tf32")

        mini = tmp_path / "mini.csv"
        pd.read_csv("/root/reference/example_data/sample_dataset.csv").head(3).to_csv(
            mini, index=False
        )
        outs = {}
        for prec in ("f32", "bf16"):
            out = tmp_path / f"emb_{prec}.tsv"
            main([
                "--input", str(mini), "--id-column", "rnacentral_id",
                "--output", str(out), "--precision", prec, "--quiet",
                "--model-path",
                "/root/reference/src/ginfinity/weights/gin_weights_regression_180925.pth",
            ])
            df = pd.read_csv(out, sep="\t")
            outs[prec] = np.array([
                [float(x) for x in v.split(",")] for v in df["embedding_vector"]
            ])
        np.testing.assert_allclose(outs["f32"], outs["bf16"], atol=1e-6)
