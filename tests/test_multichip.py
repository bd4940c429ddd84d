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
