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
