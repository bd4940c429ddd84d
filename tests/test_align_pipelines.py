"""node-embeddings + alignment CLI end-to-end tests."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/reference/src")

CKPT = "/root/reference/src/ginfinity/weights/gin_weights_regression_180925.pth"
SAMPLE = "/root/reference/example_data/sample_dataset.csv"


@pytest.fixture(scope="module")
def node_emb_tsv(tmp_path_factory):
    p = tmp_path_factory.mktemp("ne")
    mini = str(p / "mini.csv")
    pd.read_csv(SAMPLE).head(4).to_csv(mini, index=False)
    out = str(p / "nodes.tsv")
    from ginfinity_tpu.pipelines.node_embed import main

    main(["--input", mini, "--output", out, "--model-path", CKPT,
          "--id-column", "rnacentral_id", "--quiet"])
    return out, mini


class TestNodeEmbed:
    def test_matrix_shapes(self, node_emb_tsv):
        from ginfinity_tpu.pipelines.node_embed import parse_matrix

        out, mini = node_emb_tsv
        df = pd.read_csv(out, sep="\t")
        src = pd.read_csv(mini)
        assert len(df) == 4
        for _, row in df.iterrows():
            mat = parse_matrix(row["node_embeddings"])
            slen = len(
                src[src["rnacentral_id"] == row["rnacentral_id"]]["secondary_structure"].iloc[0]
            )
            assert mat.shape == (slen, 128)
            assert np.isfinite(mat).all()
            # zscore_l2 -> unit rows
            np.testing.assert_allclose(np.linalg.norm(mat, axis=1), 1.0, atol=1e-3)


class TestAlignCLI:
    def test_pairwise(self, node_emb_tsv, tmp_path):
        from ginfinity_tpu.pipelines.align import main

        out, mini = node_emb_tsv
        df = pd.read_csv(out, sep="\t")
        ids = df["rnacentral_id"].tolist()
        prefix = str(tmp_path / "pair")
        main([
            "--input", out, "--id-column", "rnacentral_id",
            "--rna1", ids[0], "--rna2", ids[1],
            "--output-prefix", prefix, "--structure-column-name", "sequence",
        ])
        assert os.path.exists(prefix + ".matrix.tsv")
        assert os.path.exists(prefix + ".alignment.tsv")
        assert os.path.exists(prefix + ".structures.txt")
        with open(prefix + ".alignment.tsv") as f:
            header = [next(f) for _ in range(6)]
        score_line = [l for l in header if "total_alignment_score" in l][0]
        score = float(score_line.split('"')[1])

        # cross-check against the reference aligner on the same matrix
        from ginfinity.scripts.align_node_embeddings import needleman_wunsch_affine

        from ginfinity_tpu.pipelines.align import cosine_similarity_matrix
        from ginfinity_tpu.pipelines.node_embed import parse_matrix

        A = parse_matrix(df.iloc[0]["node_embeddings"])
        B = parse_matrix(df.iloc[1]["node_embeddings"])
        ref_score, _ = needleman_wunsch_affine(cosine_similarity_matrix(A, B), -1.0, -1.0)
        assert abs(score - ref_score) < 1e-2

    def test_missing_id_errors(self, node_emb_tsv, tmp_path):
        from ginfinity_tpu.pipelines.align import main

        out, _ = node_emb_tsv
        with pytest.raises(ValueError, match="No row found"):
            main(["--input", out, "--id-column", "rnacentral_id",
                  "--rna1", "nope", "--rna2", "nah",
                  "--output-prefix", str(tmp_path / "x")])


class TestAlignBatchCLI:
    def test_all_pairs_summary(self, node_emb_tsv, tmp_path):
        from ginfinity_tpu.pipelines.align_batch import main

        out, _ = node_emb_tsv
        outdir = str(tmp_path / "batch")
        main(["--input", out, "--id-column", "rnacentral_id",
              "--output-dir", outdir, "--write-alignment"])
        summary = pd.read_csv(os.path.join(outdir, "summary.tsv"), sep="\t")
        assert len(summary) == 4 * 3 // 2
        assert np.isfinite(summary["score"]).all()
        # per-pair dirs written
        sub = [d for d in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, d))]
        assert len(sub) == 6


class TestHtmlHeatmap:
    def test_hover_and_annotations(self, tmp_path, monkeypatch):
        """save_matrix_html must use s1/s2: hover text carries structure
        characters + compatibility, axis annotations carry the chars.
        plotly is stubbed (not installed in this image, optional in the
        reference too)."""
        import sys
        import types

        captured = {}

        class FakeHeatmap:
            def __init__(self, **kw):
                captured["heatmap"] = kw

        class FakeFigure:
            def __init__(self, data=None):
                self.layout = {}

            def update_layout(self, **kw):
                self.layout.update(kw)
                captured["layout"] = self.layout

        fake_go = types.ModuleType("plotly.graph_objects")
        fake_go.Heatmap = FakeHeatmap
        fake_go.Figure = FakeFigure
        fake_pyo = types.ModuleType("plotly.offline")

        def fake_plot(fig, filename=None, auto_open=False):
            captured["filename"] = filename
            with open(filename, "w") as f:
                f.write("<html>stub</html>")

        fake_pyo.plot = fake_plot
        fake_plotly = types.ModuleType("plotly")
        fake_plotly.graph_objects = fake_go
        fake_plotly.offline = fake_pyo
        monkeypatch.setitem(sys.modules, "plotly", fake_plotly)
        monkeypatch.setitem(sys.modules, "plotly.graph_objects", fake_go)
        monkeypatch.setitem(sys.modules, "plotly.offline", fake_pyo)

        from ginfinity_tpu.pipelines.align import save_matrix_html

        m = np.array([[0.9, -0.2], [0.1, 0.8], [0.0, 0.5]], np.float32)
        out = str(tmp_path / "m.html")
        save_matrix_html(m, out, s1="(.)", s2="()", rna1_id="A", rna2_id="B")

        assert os.path.exists(out)
        hover = captured["heatmap"]["hovertext"]
        assert len(hover) == 3 and len(hover[0]) == 2
        assert "A structure: ( (stem (opening))" in hover[0][0]
        assert "B structure: ) (stem (closing))" in hover[0][1]
        assert "Structural compatibility: complementary stems" in hover[0][1]
        assert "Cosine similarity: 0.900000" in hover[0][0]
        # structure chars rendered along both axes
        ann = captured["layout"]["annotations"]
        texts = [a["text"] for a in ann]
        assert texts == ["(", ".", ")", "(", ")"]


class TestMsaPlotDiagnostics:
    def test_heatmap_pngs_written(self, tmp_path):
        from ginfinity_tpu.pipelines.msa import main

        prefix = str(tmp_path / "out" / "msa")
        main(["--input", "dummy", "--out-prefix", prefix, "--plot-diagnostics"])
        diag = prefix + ".diagnostics"
        pngs = [f for f in os.listdir(diag) if f.startswith("pair_") and f.endswith(".png")]
        assert 1 <= len(pngs) <= 6, os.listdir(diag)
