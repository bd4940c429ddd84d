"""MSA pipeline: pair-HMM sanity, profile DP parity (vs reference pure-
python kernels), and end-to-end CLI runs including dummy mode."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/reference/src")


class TestPairHMM:
    def test_posteriors_identity_signal(self):
        from ginfinity_tpu.ops.pairhmm import pairhmm_posteriors

        L = np.full((10, 10), -3.0, np.float32)
        np.fill_diagonal(L, 3.0)
        P = pairhmm_posteriors([L], -10.0, -0.5)[0]
        assert P.shape == (10, 10)
        assert P.diagonal().min() > 0.9
        assert (P - np.diag(P.diagonal())).max() < 0.1
        assert P.max() <= 1.0 + 1e-5

    def test_posteriors_batch_padding(self):
        from ginfinity_tpu.ops.pairhmm import pairhmm_posteriors

        rng = np.random.default_rng(0)
        mats = [rng.normal(size=(5, 9)).astype(np.float32),
                rng.normal(size=(12, 4)).astype(np.float32)]
        batched = pairhmm_posteriors(mats, -4.0, -0.5)
        for m, P in zip(mats, batched):
            solo = pairhmm_posteriors([m], -4.0, -0.5)[0]
            np.testing.assert_allclose(P, solo, atol=1e-4)

    def test_profile_dp_matches_reference(self):
        from ginfinity.scripts.embed_msa import _affine_dp_profile

        from ginfinity_tpu.ops.pairhmm import profile_align

        rng = np.random.default_rng(1)
        for la, lb in [(4, 4), (9, 17), (21, 6)]:
            muA = rng.normal(size=(la, 8)).astype(np.float32)
            muB = rng.normal(size=(lb, 8)).astype(np.float32)
            stemA = (rng.random(la) > 0.5).astype(np.float32)
            stemB = (rng.random(lb) > 0.5).astype(np.float32)
            Mr, Xr, Yr = _affine_dp_profile(muA, muB, stemA, stemB, -2.0, -0.5)
            comp = np.where(
                (stemA[:, None] >= 0.5) == (stemB[None, :] >= 0.5), 0.2, 0.0
            ).astype(np.float32)
            M, X, Y = profile_align((muA @ muB.T + comp).astype(np.float32), -2.0, -0.5)
            for ours, ref in ((M, Mr), (X, Xr), (Y, Yr)):
                fin = ref > -1e29
                np.testing.assert_allclose(ours[fin], ref[fin], atol=1e-3)


class TestSparsify:
    def test_row_col_intersection(self):
        from ginfinity_tpu.pipelines.msa import sparsify_topk_mask

        rng = np.random.default_rng(2)
        P = rng.random((30, 25)).astype(np.float32)
        mask = sparsify_topk_mask(P, topk=5, pmin=1e-4)
        # every kept entry is in the top-5 of its row and column
        for i, j in zip(*np.nonzero(mask)):
            assert P[i, j] >= np.partition(P[i], -5)[-5] - 1e-7
            assert P[i, j] >= np.partition(P[:, j], -5)[-5] - 1e-7


class TestMSACLI:
    def test_dummy_mode(self, tmp_path):
        from ginfinity_tpu.pipelines.msa import main

        prefix = str(tmp_path / "out" / "msa")
        main(["--input", "dummy", "--out-prefix", prefix, "--max-pairs", "100"])
        assert os.path.exists(prefix + ".fasta")
        assert os.path.exists(prefix + ".sto")
        assert os.path.exists(prefix + ".aln.tsv")
        assert os.path.exists(prefix + ".diagnostics/run_meta.json")
        aln = pd.read_csv(prefix + ".aln.tsv", sep="\t")
        assert len(aln) == 5
        lens = aln["Aligned"].str.len().unique()
        assert len(lens) == 1  # all aligned rows same length

    def test_similar_sequences_align(self, tmp_path):
        """Three near-identical embedding rows must align nearly gap-free."""
        import json

        from ginfinity_tpu.pipelines.msa import main

        rng = np.random.default_rng(3)
        base = rng.normal(size=(20, 16)).astype(np.float32)
        rows = []
        for k in range(3):
            emb = base + 0.01 * rng.normal(size=base.shape).astype(np.float32)
            rows.append({
                "Name": f"r{k}",
                "node_embeddings": json.dumps(emb.round(6).tolist()),
                "DotBracket": "((((............))))",
            })
        inp = tmp_path / "in.tsv"
        pd.DataFrame(rows).to_csv(inp, sep="\t", index=False)
        prefix = str(tmp_path / "msa")
        main(["--input", str(inp), "--dotbracket-col", "DotBracket",
              "--out-prefix", prefix, "--alpha", "6.0", "--beta", "0.0"])
        aln = pd.read_csv(prefix + ".aln.tsv", sep="\t")
        # no gaps needed for near-identical sequences
        assert all("-" not in s for s in aln["Aligned"]), list(aln["Aligned"])
        assert all(s == "((((............))))" for s in aln["Aligned"])
