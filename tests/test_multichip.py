"""Multi-chip paths on the 8-device CPU mesh: sharded inference engine,
sharded training step, and the search engine's mesh (covered in
test_search)."""

import numpy as np
import pandas as pd
import pytest

CKPT = "/root/reference/src/ginfinity/weights/gin_weights_regression_180925.pth"
SAMPLE = "/root/reference/example_data/sample_dataset.csv"


class TestShardedInference:
    def test_matches_single_device(self):
        from ginfinity_tpu.graphs.build import build_graph_arrays
        from ginfinity_tpu.models.checkpoint import import_torch_checkpoint
        from ginfinity_tpu.models.gine import GINModel
        from ginfinity_tpu.parallel.mesh import make_data_mesh
        from ginfinity_tpu.pipelines.engine import InferenceEngine, adapt_feature_dim

        cfg, params, state, _ = import_torch_checkpoint(CKPT)
        model = GINModel(cfg, params, state)
        df = pd.read_csv(SAMPLE).head(30)
        graphs = adapt_feature_dim(
            [build_graph_arrays(s) for s in df["secondary_structure"].astype(str)],
            cfg.node_feature_dim,
        )
        # force many small batches so the stacked group shards meaningfully
        single = InferenceEngine(model, max_nodes_per_batch=1024)
        sharded = InferenceEngine(
            model, max_nodes_per_batch=1024, mesh=make_data_mesh()
        )
        e1 = single.embed_graphs(graphs)
        e2 = sharded.embed_graphs(graphs)
        np.testing.assert_allclose(e1, e2, atol=1e-5)


class TestShardedFusedWindows:
    def test_matches_single_device(self):
        from ginfinity_tpu.models.checkpoint import import_torch_checkpoint
        from ginfinity_tpu.models.gine import GINModel
        from ginfinity_tpu.parallel.mesh import make_data_mesh
        from ginfinity_tpu.pipelines.fast_windows import embed_corpus_windows

        cfg, params, state, _ = import_torch_checkpoint(CKPT)
        model = GINModel(cfg, params, state)
        structs = (
            pd.read_csv(SAMPLE)["secondary_structure"].astype(str).head(6).tolist()
        )
        base = embed_corpus_windows(model, structs, 100, True)
        shard = embed_corpus_windows(
            model, structs, 100, True, mesh=make_data_mesh()
        )
        assert sum(s.size for s, _ in base) > 500
        for (s0, e0), (s1, e1) in zip(base, shard):
            np.testing.assert_array_equal(s0, s1)
            np.testing.assert_allclose(e0, e1, atol=1e-5)


class TestShardedMsa:
    @pytest.mark.parametrize("dp_score", ["profile", "library"])
    def test_cli_matches_single_device(self, tmp_path, dp_score):
        """--data-parallel must reproduce the single-device alignment
        exactly: the pairwise posterior batches and the consistency pair
        tiles shard over the mesh with no semantic change."""
        import contextlib
        import io
        import json

        from ginfinity_tpu.pipelines.msa import main as msa_main

        rng = np.random.default_rng(0)
        base = rng.normal(size=(60, 16)).astype(np.float32)
        rows = []
        for k in range(8):
            Lk = int(rng.integers(45, 61))
            emb = base[:Lk] + 0.15 * rng.normal(size=(Lk, 16)).astype(np.float32)
            rows.append(
                {"Name": f"s{k}", "node_embeddings": json.dumps(emb.round(5).tolist())}
            )
        inp = tmp_path / "in.tsv"
        pd.DataFrame(rows).to_csv(inp, sep="\t", index=False)
        with contextlib.redirect_stdout(io.StringIO()):
            msa_main(["--input", str(inp), "--out-prefix", str(tmp_path / "s" / "msa"),
                      "--alpha", "5", "--beta", "0", "--dp-score", dp_score])
            msa_main(["--input", str(inp), "--out-prefix", str(tmp_path / "m" / "msa"),
                      "--alpha", "5", "--beta", "0", "--dp-score", dp_score,
                      "--data-parallel"])
        a = pd.read_csv(tmp_path / "s" / "msa.aln.tsv", sep="\t")
        b = pd.read_csv(tmp_path / "m" / "msa.aln.tsv", sep="\t")
        assert list(a["Aligned"]) == list(b["Aligned"])


class TestShardedBatchAlign:
    def test_wavefront_mesh_matches_single_device(self):
        """mesh= shards the DP batch axis over 'data'; scores AND paths
        must match the single-device wavefront exactly (incl. the
        dummy-pair padding up to a mesh multiple)."""
        from ginfinity_tpu.ops.dp import affine_align_batch
        from ginfinity_tpu.parallel.mesh import make_data_mesh

        rng = np.random.default_rng(0)
        mats = [
            rng.standard_normal(
                (int(rng.integers(5, 40)), int(rng.integers(5, 40)))
            ).astype(np.float32)
            for _ in range(13)  # 13 pairs pad to 16 on the 8-device mesh
        ]
        for mode in ("global", "local"):
            ref = affine_align_batch(mats, -1.0, -0.5, mode, backend="lax")
            got = affine_align_batch(mats, -1.0, -0.5, mode, mesh=make_data_mesh())
            for (rs, rp), (gs, gp) in zip(ref, got):
                assert abs(rs - gs) < 1e-5
                assert rp == gp

    def test_cli_flag(self, tmp_path):
        """--data-parallel on the batch-align CLI reproduces the
        single-device summary scores."""
        from ginfinity_tpu.pipelines.align_batch import main as ab_main
        from ginfinity_tpu.pipelines.node_embed import serialize_matrix

        rng = np.random.default_rng(1)
        rows = [
            {
                "id": f"r{k}",
                "node_embeddings": serialize_matrix(
                    rng.standard_normal((int(rng.integers(10, 25)), 8)).astype(
                        np.float32
                    )
                ),
            }
            for k in range(5)
        ]
        inp = tmp_path / "emb.tsv"
        pd.DataFrame(rows).to_csv(inp, sep="\t", index=False)
        ab_main(["--input", str(inp), "--id-column", "id",
                 "--output-dir", str(tmp_path / "s")])
        ab_main(["--input", str(inp), "--id-column", "id",
                 "--output-dir", str(tmp_path / "m"), "--data-parallel"])
        a = pd.read_csv(tmp_path / "s" / "summary.tsv", sep="\t")
        b = pd.read_csv(tmp_path / "m" / "summary.tsv", sep="\t")
        np.testing.assert_allclose(a["score"], b["score"], atol=1e-5)


class TestShardedTraining:
    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import jax

        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(np.asarray(out)).all()
