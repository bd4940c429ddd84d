"""Device-side window embedding must match the file-based windows->embed
path exactly (same window semantics, same encoder)."""

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


class TestFastWindows:
    @pytest.mark.parametrize("keep", [True, False])
    def test_matches_file_based_path(self, model, keep):
        from ginfinity_tpu.pipelines.engine import InferenceEngine, adapt_feature_dim
        from ginfinity_tpu.pipelines.fast_windows import embed_structure_windows
        from ginfinity_tpu.pipelines.windows import structure_to_windows

        engine = InferenceEngine(model)
        s = str(pd.read_csv(SAMPLE)["secondary_structure"].iloc[1])
        starts, emb_dev = embed_structure_windows(model, s, 100, keep, 0.1)
        wins = structure_to_windows(s, 100, keep, 0.1)
        assert list(starts) == [st for st, _ in wins]
        graphs = adapt_feature_dim(
            [g for _, g in wins], model.config.node_feature_dim
        )
        emb_host = engine.embed_graphs(graphs)
        np.testing.assert_allclose(emb_dev, emb_host, atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("structure", [
        "((((....))))" * 6,                       # stems only
        "((..[[..))..]].." * 5,                   # pseudoknot brackets
        "." * 80,                                 # unpaired only
        "(" * 30 + "." * 30 + ")" * 30,           # one giant helix
        "(.)" * 30,                               # adjacent-pair quirk rows
    ])
    def test_aligned_path_edge_structures(self, model, structure):
        """The aligned fused path must match the file-based path on
        degenerate shapes (pseudoknots, unpaired, adjacent pairs)."""
        from ginfinity_tpu.pipelines.engine import InferenceEngine, adapt_feature_dim
        from ginfinity_tpu.pipelines.fast_windows import embed_structure_windows
        from ginfinity_tpu.pipelines.windows import structure_to_windows

        L = 40
        starts, emb_dev = embed_structure_windows(model, structure, L, True, 0.0)
        wins = structure_to_windows(structure, L, True, 0.0)
        assert list(starts) == [st for st, _ in wins]
        if not wins:
            return
        graphs = adapt_feature_dim(
            [g for _, g in wins], model.config.node_feature_dim
        )
        emb_host = InferenceEngine(model).embed_graphs(graphs)
        np.testing.assert_allclose(emb_dev, emb_host, atol=2e-4, rtol=1e-4)

    @pytest.mark.parametrize("uniform_h", [True, False])
    def test_forgi_model_matches_file_path(self, uniform_h):
        """Forgi checkpoints on --window-size: the fused path must match
        the file-based windows -> adapt -> engine flow (window graphs
        embed into the forgi feature space base-only: is_base=1, edge
        attrs in the 7-dim layout).  uniform_h=True exercises the Pallas
        gate's config family; False the generic aligned XLA path."""
        import jax

        from ginfinity_tpu.models.gine import GINConfig, GINModel, init_params
        from ginfinity_tpu.pipelines.engine import (
            InferenceEngine,
            adapt_graphs_to_model,
        )
        from ginfinity_tpu.pipelines.fast_windows import embed_structure_windows
        from ginfinity_tpu.pipelines.windows import structure_to_windows

        cfg = GINConfig.create(
            hidden_dim=128 if uniform_h else [64, 96],
            output_dim=128 if uniform_h else 32,
            gin_layers=2,
            graph_encoding="forgi",
            node_feature_dim=16,
            edge_feature_dim=7,
            pooling_type="global_mean_pool",
            norm_type="graph",
            use_residual=True,
            normalize_nodes_before_pool=True,
            node_embed_norm="zscore_l2",
        )
        params, state = init_params(jax.random.PRNGKey(3), cfg)
        m = GINModel(cfg, params, state)
        s = str(pd.read_csv(SAMPLE)["secondary_structure"].iloc[1])
        starts, emb_dev = embed_structure_windows(m, s, 100, True, 0.1)
        wins = structure_to_windows(s, 100, True, 0.1)
        assert list(starts) == [st for st, _ in wins]
        graphs = adapt_graphs_to_model([g for _, g in wins], cfg)
        emb_host = InferenceEngine(m).embed_graphs(graphs)
        np.testing.assert_allclose(emb_dev, emb_host, atol=2e-4, rtol=1e-4)

    def test_max_programs_merge_matches(self, model):
        """Bucket merging (--max-programs) must not change any embedding."""
        from ginfinity_tpu.pipelines.fast_windows import embed_corpus_windows

        structures = (
            pd.read_csv(SAMPLE)["secondary_structure"].astype(str).head(12).tolist()
        )
        base = embed_corpus_windows(model, structures, 100, True)
        merged = embed_corpus_windows(model, structures, 100, True, max_programs=1)
        for (s0, e0), (s1, e1) in zip(base, merged):
            np.testing.assert_array_equal(s0, s1)
            np.testing.assert_allclose(e0, e1, atol=2e-4, rtol=1e-4)

    def test_prewarm_compiles_ladder(self, model):
        """ginfinity-prewarm's lowering path covers every group signature
        without executing anything."""
        from ginfinity_tpu.pipelines.prewarm import prewarm_window_ladder

        structures = (
            pd.read_csv(SAMPLE)["secondary_structure"].astype(str).head(12).tolist()
        )
        n = prewarm_window_ladder(model, structures, 100, True, quiet=True)
        assert n >= 1
        n1 = prewarm_window_ladder(
            model, structures, 100, True, quiet=True, max_programs=1
        )
        assert n1 == 1

    def test_dense_path_ignores_bp_ladder_in_jit_key(self, model):
        """The dense aligned path never reads p_cap/b_cap, so two
        corpora differing only in base-pair ladder bucket must map to
        ONE program (caps pinned to 0), while the generic path keys on
        the real ladder caps."""
        from ginfinity_tpu.models.gine import GINConfig
        from ginfinity_tpu.pipelines.fast_windows import (
            _dense_forward_ok, _ladder_caps,
        )

        assert _dense_forward_ok(model.config)
        assert _ladder_caps(model.config, 7, 20) == (0, 0)
        assert _ladder_caps(model.config, 60, 90) == (0, 0)
        sparse_cfg = GINConfig.create(
            hidden_dim=96, output_dim=64, gin_layers=2,
            pooling_type="set2set", norm_type="batch",
            node_embed_norm="none", use_residual=False, node_feature_dim=4,
        )
        assert not _dense_forward_ok(sparse_cfg)
        a = _ladder_caps(sparse_cfg, 7, 20)
        b = _ladder_caps(sparse_cfg, 60, 90)
        assert a != b and min(a) > 0

    def test_short_structure_no_windows(self, model):
        from ginfinity_tpu.pipelines.fast_windows import embed_structure_windows

        starts, emb = embed_structure_windows(model, "((..))", 100)
        assert starts.size == 0 and emb.shape == (0, model.config.output_dim)

    def test_corpus_api(self, model):
        from ginfinity_tpu.pipelines.fast_windows import embed_corpus_windows

        res = embed_corpus_windows(model, ["." * 40 + "((((....))))" + "." * 40], 30)
        assert len(res) == 1
        starts, emb = res[0]
        assert starts.size == 63 and emb.shape == (63, 128)
        assert np.isfinite(emb).all()

    def test_f16_wire_matches_f32_within_rounding(self, model):
        """wire="f16" only changes the D2H encoding: results must be
        float32 on the host and within IEEE-half rounding (2^-11
        relative) of the exact download, window-for-window."""
        from ginfinity_tpu.pipelines.fast_windows import embed_corpus_windows

        df = pd.read_csv(SAMPLE)
        corpus = [str(df["secondary_structure"].iloc[i]) for i in range(3)]
        exact = embed_corpus_windows(model, corpus, 100, True, 0.1)
        f16 = embed_corpus_windows(model, corpus, 100, True, 0.1, wire="f16")
        for (st_a, emb_a), (st_b, emb_b) in zip(exact, f16):
            np.testing.assert_array_equal(st_a, st_b)
            assert emb_b.dtype == np.float32
            scale = np.maximum(np.abs(emb_a), 6.2e-5)  # f16 subnormal floor
            assert np.max(np.abs(emb_a - emb_b) / scale) <= 2.0 ** -11 + 1e-7

    def test_wire_typo_is_an_error(self, model):
        """A wire typo ('F16', 'f64') must raise, not silently fall back
        to the exact f32 download (ADVICE r4)."""
        from ginfinity_tpu.pipelines.fast_windows import embed_corpus_windows

        with pytest.raises(ValueError, match="wire"):
            embed_corpus_windows(model, ["((..))"], 4, True, 0.1, wire="F16")

    def test_corpus_matches_per_structure(self, model):
        """The stacked group dispatch must equal the per-structure path
        on a mixed-length corpus (different buckets, a too-short one,
        and a masked-out one interleaved)."""
        from ginfinity_tpu.pipelines.fast_windows import (
            embed_corpus_windows,
            embed_structure_windows,
        )

        df = pd.read_csv(SAMPLE)
        corpus = [
            str(df["secondary_structure"].iloc[0]),
            "((..))",                                  # too short -> empty
            str(df["secondary_structure"].iloc[1]),
            "." * 200,                                 # masked out everywhere
            str(df["secondary_structure"].iloc[2]) * 2,  # different bucket
        ]
        res = embed_corpus_windows(model, corpus, 100, True, 0.1)
        assert len(res) == len(corpus)
        for s, (starts, emb) in zip(corpus, res):
            st_ref, emb_ref = embed_structure_windows(model, s, 100, True, 0.1)
            np.testing.assert_array_equal(starts, st_ref)
            np.testing.assert_allclose(emb, emb_ref, atol=1e-5, rtol=1e-5)
        assert res[1][0].size == 0 and res[3][0].size == 0


class TestFusedWindowCLI:
    def test_matches_two_step_flow(self, model, tmp_path):
        """ginfinity-embed --window-size must reproduce the
        generate-windows -> embed --graph-pt flow row-for-row."""
        from ginfinity_tpu.pipelines.embed import main as embed_main
        from ginfinity_tpu.pipelines.windows import main as windows_main

        mini = tmp_path / "mini.csv"
        pd.read_csv(SAMPLE).head(3).to_csv(mini, index=False)

        # two-step flow
        wdir = tmp_path / "w"
        windows_main(["--input", str(mini), "--output-dir", str(wdir),
                      "--id-column", "rnacentral_id", "--L", "100",
                      "--keep-paired-neighbors", "--mask-threshold", "0.1",
                      "--quiet"])
        two_step = tmp_path / "two.tsv"
        embed_main(["--graph-pt", str(wdir / "windows_graphs.npz"),
                    "--meta-tsv", str(wdir / "windows_metadata.tsv"),
                    "--output", str(two_step), "--id-column", "rnacentral_id",
                    "--model-path", CKPT, "--quiet"])

        # fused mode
        fused = tmp_path / "fused.tsv"
        embed_main(["--input", str(mini), "--output", str(fused),
                    "--id-column", "rnacentral_id", "--model-path", CKPT,
                    "--window-size", "100", "--keep-paired-neighbors",
                    "--mask-threshold", "0.1", "--quiet"])

        a = pd.read_csv(two_step, sep="\t").set_index("window_id").sort_index()
        b = pd.read_csv(fused, sep="\t").set_index("window_id").sort_index()
        assert list(a.index) == list(b.index)
        pd.testing.assert_series_equal(a["window_start"], b["window_start"])
        va = np.array([[float(x) for x in v.split(",")] for v in a["embedding_vector"]])
        vb = np.array([[float(x) for x in v.split(",")] for v in b["embedding_vector"]])
        np.testing.assert_allclose(va, vb, atol=2e-4)

    def test_bf16_check_reports_cosine_tail(self, tmp_path, capsys):
        """--precision bf16 --bf16-check N must re-embed a sample at f32
        and put the measured cosine agreement (mean/min + worst window
        ids) in the run log, so the documented bf16 quality tail
        (BASELINE.md min 0.951) is observable per corpus."""
        import json as _json

        from ginfinity_tpu.pipelines.embed import main as embed_main

        mini = tmp_path / "mini.csv"
        pd.read_csv(SAMPLE).head(3).to_csv(mini, index=False)
        out = tmp_path / "bf.tsv"
        embed_main(["--input", str(mini), "--output", str(out),
                    "--id-column", "rnacentral_id", "--model-path", CKPT,
                    "--window-size", "100", "--keep-paired-neighbors",
                    "--precision", "bf16", "--bf16-check", "64"])
        text = capsys.readouterr().out
        assert "[bf16-check]" in text
        log = (tmp_path / "bf.log").read_text()
        assert "bf16_cosine_vs_f32_mean" in log
        assert "bf16_cosine_vs_f32_min" in log
        assert "bf16_worst_windows" in log
        mean = float(log.split("bf16_cosine_vs_f32_mean: ")[1].splitlines()[0])
        # CPU DEFAULT precision is f32 math, and even on TPU the mean
        # stays ~0.9997 — the mechanism must report a sane cosine
        assert 0.9 <= mean <= 1.0 + 1e-6
        n = int(log.split("bf16_check_windows: ")[1].splitlines()[0])
        assert n >= 64

    def test_fused_mode_skips_invalid_structures(self, tmp_path):
        """Invalid rows must be skipped-and-logged like the standard
        path, not crash the fused window mode."""
        from ginfinity_tpu.pipelines.embed import main as embed_main

        df = pd.DataFrame({
            "rid": ["bad", "ok"],
            "secondary_structure": ["((..", "." * 30 + "((((....))))" + "." * 30],
        })
        inp = tmp_path / "edge.csv"
        df.to_csv(inp, index=False)
        out = tmp_path / "w.tsv"
        embed_main(["--input", str(inp), "--id-column", "rid",
                    "--output", str(out), "--window-size", "50", "--quiet",
                    "--model-path", CKPT])
        w = pd.read_csv(out, sep="\t")
        assert set(w["rid"]) == {"ok"} and len(w) > 0
        log = (tmp_path / "w.log").read_text()
        assert "skipped_invalid_structure" in log


class TestPallasCanary:
    """The one-time Mosaic-compile canary must degrade the fused path to
    the XLA encoder on kernel failure instead of crashing the pipeline."""

    def test_key_is_stable_and_config_sensitive(self, model):
        from ginfinity_tpu.pipelines.fast_windows import _canary_key

        k1 = _canary_key(model.config, 100)
        k2 = _canary_key(model.config, 100)
        k3 = _canary_key(model.config, 60)
        assert k1 == k2 and k1 != k3

    def test_canary_failure_is_cached_and_warns(self, model):
        """On the CPU backend the kernel cannot Mosaic-compile (interpret
        mode is never requested by the canary), so the canary must catch
        the failure, warn once, and cache False for the family."""
        import warnings

        from ginfinity_tpu.pipelines import fast_windows as fw

        key = fw._canary_key(model.config, 40)
        fw._canary_cache.pop(key, None)
        try:
            with warnings.catch_warnings(record=True) as rec:
                warnings.simplefilter("always")
                ok = fw._pallas_canary_ok(model.config, 40)
            assert ok is False
            assert fw._canary_cache[key] is False
            assert any("XLA encoder" in str(w.message) for w in rec)
            # second call: cached, no device work, no new warning
            with warnings.catch_warnings(record=True) as rec2:
                warnings.simplefilter("always")
                assert fw._pallas_canary_ok(model.config, 40) is False
            assert not rec2
        finally:
            fw._canary_cache.pop(key, None)

    def test_maybe_canary_noop_on_cpu(self, model):
        from ginfinity_tpu.pipelines import fast_windows as fw

        before = dict(fw._canary_cache)
        fw._maybe_canary(model.config, 100)
        assert fw._canary_cache == before

    def test_failed_canary_routes_to_xla_path(self, model, monkeypatch):
        """With the cache poisoned to False the fused pipeline must still
        produce file-path-parity embeddings via the XLA encoder."""
        from ginfinity_tpu.pipelines import fast_windows as fw
        from ginfinity_tpu.pipelines.engine import InferenceEngine, adapt_feature_dim
        from ginfinity_tpu.pipelines.windows import structure_to_windows

        key = fw._canary_key(model.config, 40)
        monkeypatch.setitem(fw._canary_cache, key, False)
        s = "((((....))))" * 6
        starts, emb = fw.embed_structure_windows(model, s, 40, True, 0.0)
        wins = structure_to_windows(s, 40, True, 0.0)
        graphs = adapt_feature_dim([g for _, g in wins],
                                   model.config.node_feature_dim)
        emb_host = InferenceEngine(model).embed_graphs(graphs)
        np.testing.assert_allclose(emb, emb_host, atol=1e-4, rtol=1e-4)
