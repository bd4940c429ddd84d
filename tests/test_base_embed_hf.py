"""--backend hf driven by a REAL transformers model (VERDICT r4 item 6).

Earlier rounds covered ``pipelines/base_embed.py`` only with a hand-rolled
stub object; nothing had ever exercised the real ``AutoTokenizer`` /
``AutoModel`` loading, the real tokenize -> forward -> BOS/EOS-trim ->
serialize path.  No pretrained RNA LM is obtainable offline in this image,
so the fixture materializes a tiny randomly-initialized BERT encoder +
WordPiece tokenizer ON DISK (save_pretrained) and loads it back BY PATH —
the exact code path a user points at a downloaded model directory
(reference: generate_base_embeddings.py:1-180; the hub-id path differs
only in the resolve step inside transformers).
"""

import json

import numpy as np
import pandas as pd
import pytest

transformers = pytest.importorskip("transformers")

HIDDEN = 16


@pytest.fixture(scope="module")
def hf_model_dir(tmp_path_factory):
    """A real (randomly initialized) BertModel + BertTokenizer saved to
    disk.  Vocab: specials + nucleotides, so character-spaced RNA text
    tokenizes one-token-per-residue (after base_embed's auto respace)."""
    import torch
    from transformers import BertConfig, BertModel, BertTokenizer

    d = tmp_path_factory.mktemp("tiny_hf_model")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "A", "C", "G", "U", "N"]
    vf = d / "vocab.txt"
    vf.write_text("\n".join(vocab) + "\n")
    # do_lower_case=False: BertTokenizer lowercases by DEFAULT, which
    # maps an uppercase-nucleotide vocab entirely to [UNK] — a real-
    # tokenizer behavior the old stub-only coverage could never catch
    tok = BertTokenizer(str(vf), do_lower_case=False)
    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=len(vocab), hidden_size=HIDDEN, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=64,
    )
    model = BertModel(cfg)
    model.save_pretrained(d)
    tok.save_pretrained(d)
    return str(d)


def _run(tmp_path, hf_model_dir, seqs, extra_args=()):
    from ginfinity_tpu.pipelines.base_embed import main

    inp = tmp_path / "in.csv"
    out = tmp_path / "out.tsv"
    pd.DataFrame({"id": [f"s{i}" for i in range(len(seqs))],
                  "sequence": seqs}).to_csv(inp, index=False)
    main(["--input", str(inp), "--output", str(out),
          "--id-column", "id", "--backend", "hf",
          "--model-name", hf_model_dir, "--batch-size", "2",
          "--quiet", *extra_args])
    return pd.read_csv(out, sep="\t")


class TestHFBackendRealModel:
    def test_row_alignment_and_trim(self, tmp_path, hf_model_dir):
        """One embedding row per residue after the BOS/EOS trim, for a
        ragged batch (padding must be dropped via the attention mask
        BEFORE trimming — the reference center-crops padded matrices,
        generate_base_embeddings.py:94-106)."""
        seqs = ["ACGUACGU", "GGG", "ACGUACGUACGUA"]
        df = _run(tmp_path, hf_model_dir, seqs)
        assert list(df["id"]) == ["s0", "s1", "s2"]
        for seq, cell, sl in zip(seqs, df["base_embeddings"], df["seq_len"]):
            mat = np.asarray(json.loads(cell), np.float64)
            assert mat.shape == (len(seq), HIDDEN)
            assert int(sl) == len(seq)
            assert np.isfinite(mat).all()

    def test_deterministic_and_sequence_dependent(self, tmp_path, hf_model_dir):
        """The same sequence embeds identically across rows and batches;
        different sequences differ (a real forward, not a constant)."""
        df = _run(tmp_path, hf_model_dir, ["ACGU", "ACGU", "UGCA"])
        m0, m1, m2 = (np.asarray(json.loads(c)) for c in df["base_embeddings"])
        np.testing.assert_array_equal(m0, m1)
        assert not np.array_equal(m0, m2)

    def test_t_maps_to_u(self, tmp_path, hf_model_dir):
        """DNA-alphabet input (T, lowercase) embeds identically to its
        RNA transliteration — the T->U upcast happens before tokenize."""
        df = _run(tmp_path, hf_model_dir, ["acgt", "ACGU"])
        a, b = (np.asarray(json.loads(c)) for c in df["base_embeddings"])
        np.testing.assert_array_equal(a, b)

    def test_no_trim_special_keeps_cls_sep(self, tmp_path, hf_model_dir):
        """--no-trim-special keeps the CLS/SEP rows (len+2 with this
        char-level tokenizer) and the trimmed matrix equals the middle
        slice — i.e. the trim removes exactly the special rows."""
        seqs = ["ACGUGGC"]
        full = _run(tmp_path, hf_model_dir, seqs, ("--no-trim-special",))
        trimmed = _run(tmp_path, hf_model_dir, seqs)
        mf = np.asarray(json.loads(full["base_embeddings"][0]))
        mt = np.asarray(json.loads(trimmed["base_embeddings"][0]))
        assert mf.shape == (len(seqs[0]) + 2, HIDDEN)
        np.testing.assert_array_equal(mf[1:-1], mt)

    def test_keep_cols_propagate(self, tmp_path, hf_model_dir):
        from ginfinity_tpu.pipelines.base_embed import main

        inp = tmp_path / "in2.csv"
        out = tmp_path / "out2.tsv"
        pd.DataFrame({"id": ["x"], "sequence": ["ACG"],
                      "family": ["RF00001"]}).to_csv(inp, index=False)
        main(["--input", str(inp), "--output", str(out),
              "--id-column", "id", "--backend", "hf",
              "--model-name", hf_model_dir, "--keep-cols", "family",
              "--quiet"])
        df = pd.read_csv(out, sep="\t")
        assert df["family"][0] == "RF00001"
