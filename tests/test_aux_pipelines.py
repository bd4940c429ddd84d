"""Auxiliary pipelines: the MSA hyperparameter optimizer (C21) and the
RiNALMo base-embedding bridge (C13)."""

import json
import os
import sys
import types

import numpy as np
import pandas as pd
import pytest


def _msa_input(tmp_path, n_seq=3, L=18, d=8, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(L, d)).astype(np.float32)
    rows = []
    for k in range(n_seq):
        emb = base + 0.02 * rng.normal(size=base.shape).astype(np.float32)
        rows.append({
            "Name": f"r{k}",
            "node_embeddings": json.dumps(emb.round(6).tolist()),
            "DotBracket": "(((" + "." * (L - 6) + ")))",
        })
    p = tmp_path / "in.tsv"
    pd.DataFrame(rows).to_csv(p, sep="\t", index=False)
    return str(p)


class TestOptimizeMsa:
    def test_random_search_fallback_end_to_end(self, tmp_path):
        """optuna is not installed in this image; the seeded random-search
        fallback must run trials, score column agreement, and write
        trials.csv + best_params.json (reference hard-exits without
        optuna — this is the documented upgrade)."""
        from ginfinity_tpu.pipelines.optimize_msa import main

        inp = _msa_input(tmp_path)
        regions = tmp_path / "regions.tsv"
        # known homologous region: positions 2..9 of both (1-based)
        regions.write_text("Name\tStart\tEnd\nr0\t2\t9\nr1\t2\t9\n")
        outdir = tmp_path / "opt"
        main([
            "--input", inp, "--regions-tsv", str(regions),
            "--name-a", "r0", "--name-b", "r1",
            "--n-trials", "2", "--outdir", str(outdir),
            "--study-name", "t", "--topk", "8",
            "--consistency-rounds", "1", "--max-pairs", "10",
            "--dotbracket-col", "DotBracket",
        ])
        study = outdir / "t"
        trials = pd.read_csv(study / "trials.csv")
        assert len(trials) == 2
        assert np.isfinite(trials["value"]).all()
        best = json.loads((study / "best_params.json").read_text())
        assert set(best) == {"refine_iters", "alpha", "beta", "gap_open", "gap_extend"}
        # near-identical sequences: the best trial co-aligns the region
        assert trials["value"].max() == 8  # 8 positions, all +1

    def test_score_function(self):
        from ginfinity_tpu.pipelines.optimize_msa import compute_score

        msa = {"a": "AC-GU", "b": "AC-GU", "c": "-ACGU"}
        regions = {"a": (1, 4), "b": (1, 4), "c": (1, 4)}
        assert compute_score(msa, regions, "a", "b") == 4
        # c is shifted by one column for position 1 only
        assert compute_score(msa, regions, "a", "c") < 4


class TestBaseEmbed:
    def test_clean_gate_without_rinalmo(self, tmp_path):
        from ginfinity_tpu.pipelines.base_embed import main

        inp = tmp_path / "seqs.csv"
        pd.DataFrame({"id": ["x"], "sequence": ["ACGU"]}).to_csv(inp, index=False)
        with pytest.raises(SystemExit, match="rinalmo"):
            main(["--input", str(inp), "--output", str(tmp_path / "o.tsv"),
                  "--id-column", "id"])

    def test_with_stubbed_model(self, tmp_path, monkeypatch):
        """With a stub RiNALMo, the pipeline must tokenize, trim BOS/EOS,
        and write the JSON-matrix TSV the aligners consume."""
        import torch

        D = 6

        class FakeAlphabet:
            def batch_tokenize(self, seqs):
                L = max(len(s) for s in seqs)
                # BOS + seq + EOS, padded
                return [[1] + [2] * len(s) + [3] + [0] * (L - len(s)) for s in seqs]

        class FakeModel:
            def eval(self):
                return self

            def to(self, dev):
                return self

            def __call__(self, tokens):
                B, T = tokens.shape
                rep = torch.arange(B * T * D, dtype=torch.float32).reshape(B, T, D)
                return {"representation": rep}

        fake_pre = types.ModuleType("rinalmo.pretrained")
        fake_pre.get_pretrained_model = lambda model_name: (FakeModel(), FakeAlphabet())
        fake_root = types.ModuleType("rinalmo")
        fake_root.pretrained = fake_pre
        monkeypatch.setitem(sys.modules, "rinalmo", fake_root)
        monkeypatch.setitem(sys.modules, "rinalmo.pretrained", fake_pre)

        from ginfinity_tpu.pipelines.base_embed import main

        inp = tmp_path / "seqs.tsv"
        pd.DataFrame({"id": ["x", "y"], "sequence": ["ACGU", "AcgUU"]}).to_csv(
            inp, sep="\t", index=False
        )
        out = tmp_path / "o.tsv"
        main(["--input", str(inp), "--output", str(out), "--id-column", "id",
              "--quiet"])
        df = pd.read_csv(out, sep="\t")
        assert list(df["id"]) == ["x", "y"]
        m0 = np.array(json.loads(df.iloc[0]["base_embeddings"]))
        m1 = np.array(json.loads(df.iloc[1]["base_embeddings"]))
        assert m0.shape == (4, D)   # BOS/EOS trimmed
        assert m1.shape == (5, D)
        # row 0 of the trimmed matrix is token position 1 (BOS skipped)
        assert m0[0, 0] == pytest.approx(D)  # arange: position 1 starts at D

        # padded-batch regression: a sequence >= 2 shorter than its
        # batch max used to be CENTER-CROPPED over the pad rows
        # (reference bug, generate_base_embeddings.py:94-106) — rows
        # must be the true residue positions 1..seq_len
        inp2 = tmp_path / "seqs2.tsv"
        pd.DataFrame({"id": ["s", "t"], "sequence": ["AC", "ACGUUU"]}).to_csv(
            inp2, sep="\t", index=False
        )
        out2 = tmp_path / "o2.tsv"
        main(["--input", str(inp2), "--output", str(out2),
              "--id-column", "id", "--quiet"])
        df2 = pd.read_csv(out2, sep="\t")
        short = np.array(json.loads(df2.iloc[0]["base_embeddings"]))
        assert short.shape == (2, D)
        assert short[0, 0] == pytest.approx(D)      # token position 1
        assert short[1, 0] == pytest.approx(2 * D)  # token position 2

    def test_hf_backend_executes_real_transformers_model(self, tmp_path,
                                                         monkeypatch):
        """--backend hf runs a REAL transformers encoder end-to-end (the
        rinalmo package is absent in this image; this is the genuinely
        executable LM path).  A tiny random-init BERT with a WordLevel
        nucleotide tokenizer is saved locally and loaded through
        AutoModel/AutoTokenizer — the exact code path a hub RNA LM uses."""
        monkeypatch.setenv("HF_HUB_OFFLINE", "1")
        import torch
        from tokenizers import Tokenizer
        from tokenizers.models import WordLevel
        from tokenizers.pre_tokenizers import Whitespace
        from tokenizers.processors import TemplateProcessing
        from transformers import BertConfig, BertModel, PreTrainedTokenizerFast

        vocab = {"[PAD]": 0, "[CLS]": 1, "[SEP]": 2, "[UNK]": 3,
                 "A": 4, "C": 5, "G": 6, "U": 7}
        tok = Tokenizer(WordLevel(vocab=vocab, unk_token="[UNK]"))
        tok.pre_tokenizer = Whitespace()
        tok.post_processor = TemplateProcessing(
            single="[CLS] $A [SEP]",
            special_tokens=[("[CLS]", 1), ("[SEP]", 2)],
        )
        tokenizer = PreTrainedTokenizerFast(
            tokenizer_object=tok, pad_token="[PAD]", cls_token="[CLS]",
            sep_token="[SEP]", unk_token="[UNK]",
        )
        torch.manual_seed(0)
        model = BertModel(BertConfig(
            vocab_size=8, hidden_size=16, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=64,
        ))
        mdir = tmp_path / "tiny_rna_lm"
        tokenizer.save_pretrained(str(mdir))
        model.save_pretrained(str(mdir))

        from ginfinity_tpu.pipelines.base_embed import main

        inp = tmp_path / "seqs.tsv"
        # mixed lengths exercise padding; 'acgu' exercises the upper+T->U
        # normalization; duplicate sequence pins determinism
        pd.DataFrame({
            "id": ["a", "b", "c"],
            "sequence": ["ACGUACGU", "acgu", "ACGUACGU"],
        }).to_csv(inp, sep="\t", index=False)
        out = tmp_path / "o.tsv"
        main(["--input", str(inp), "--output", str(out), "--id-column", "id",
              "--backend", "hf", "--model-name", str(mdir), "--quiet"])
        df = pd.read_csv(out, sep="\t")
        mats = [np.array(json.loads(r)) for r in df["base_embeddings"]]
        # one row per residue, specials trimmed, hidden size 16
        assert mats[0].shape == (8, 16)
        assert mats[1].shape == (4, 16)
        assert list(df["seq_len"]) == [8, 4, 8]
        # identical sequences embed identically (same batch, no pad leak)
        np.testing.assert_allclose(mats[0], mats[2], atol=1e-6)
        # padded short sequence must not carry pad-row artifacts: rerun it
        # alone and compare (pad rows masked out + trim happens pre-crop)
        inp2 = tmp_path / "one.tsv"
        pd.DataFrame({"id": ["b"], "sequence": ["ACGU"]}).to_csv(
            inp2, sep="\t", index=False)
        out2 = tmp_path / "o2.tsv"
        main(["--input", str(inp2), "--output", str(out2),
              "--id-column", "id", "--backend", "hf",
              "--model-name", str(mdir), "--quiet"])
        df2 = pd.read_csv(out2, sep="\t")
        solo = np.array(json.loads(df2.iloc[0]["base_embeddings"]))
        np.testing.assert_allclose(mats[1], solo, atol=1e-5)


class TestPrewarmMsa:
    def test_msa_bucket_prewarm_runs_both_modes(self, tmp_path, capsys):
        """--msa runs the real pipeline on a synthetic family at the
        requested scale for both dp-score modes (programs land in the
        in-process jit cache / persistent XLA cache)."""
        from ginfinity_tpu.pipelines.prewarm import main

        main(["--msa", "5", "36", "--msa-dim", "6",
              "--msa-max-pairs", "10", "--msa-topk", "4"])
        out = capsys.readouterr().out
        assert "dp-score=profile" in out
        assert "dp-score=library" in out
        assert "Prewarmed the MSA program set" in out

    def test_window_mode_still_validates_required_flags(self):
        from ginfinity_tpu.pipelines.prewarm import main

        import pytest

        with pytest.raises(SystemExit, match="Window mode needs"):
            main(["--window-size", "80"])
