"""``ginfinity-generate-base-embeddings`` — per-nucleotide embeddings from
an external RNA language model.

Reference CLI parity: src/ginfinity/scripts/generate_base_embeddings.py
(RiNALMo ``giga-v1``; per-base embeddings, BOS/EOS trimming with the
center-crop fallback, keep-cols propagation, JSON-matrix TSV output).
RiNALMo is an optional external dependency in the reference as well;
when unavailable this pipeline exits with a clear message.  The output
column (``base_embeddings``) feeds --seq-weight blending in the
aligners and the MSA engine.

Beyond the reference: ``--backend hf`` runs ANY HuggingFace
``transformers`` encoder (e.g. the multimolecule RNA LMs) from a hub id
or a local directory — per-residue rows are taken from
``last_hidden_state`` under the attention mask, with an automatic
spaced-character retokenize when the model's tokenizer is not
character-level, then the same BOS/EOS trim as the RiNALMo path.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load_rinalmo(model_name: str = "giga-v1", device: str | None = None):
    try:
        import torch
        from rinalmo.pretrained import get_pretrained_model
    except ImportError as exc:
        raise SystemExit(
            "ERROR: the 'rinalmo' package (and a torch build able to run it) "
            "is required for base embeddings. Install it or skip this step; "
            "all downstream tools accept --seq-weight 0 (structure only)."
        ) from exc
    model, alphabet = get_pretrained_model(model_name=model_name)
    model.eval()
    dev = torch.device(device) if device else torch.device("cpu")
    if dev.type == "cuda" and not torch.cuda.is_available():
        print("[base_embed] --device cuda requested but CUDA is "
              "unavailable; running on CPU.")
        dev = torch.device("cpu")
    model = model.to(dev)
    return model, alphabet, dev


def _load_hf(model_name: str, device: str | None = None):
    try:
        import torch
        from transformers import AutoModel, AutoTokenizer
    except ImportError as exc:  # pragma: no cover - transformers is baked in
        raise SystemExit(
            "ERROR: the 'transformers' package is required for --backend hf."
        ) from exc
    tokenizer = AutoTokenizer.from_pretrained(model_name)
    model = AutoModel.from_pretrained(model_name)
    model.eval()
    dev = torch.device(device) if device else torch.device("cpu")
    if dev.type == "cuda" and not torch.cuda.is_available():
        print("[base_embed] --device cuda requested but CUDA is "
              "unavailable; running on CPU.")
        dev = torch.device("cpu")
    return model.to(dev), tokenizer, dev


def _hf_embed_batch(model, tokenizer, chunk, dev):
    """Per-residue hidden states for a batch of RNA sequences from any
    transformers encoder.  Residue-level alignment requires one token per
    nucleotide; when the tokenizer merges characters (BPE/WordPiece), the
    sequence is re-tokenized as space-separated characters, which the
    standard vocab-lookup tokenizers treat as one token each."""
    import torch

    n_special = tokenizer.num_special_tokens_to_add()
    texts = []
    for seq in chunk:
        ids = tokenizer(seq, add_special_tokens=True)["input_ids"]
        texts.append(seq if len(ids) == len(seq) + n_special
                     else " ".join(seq))
    enc = tokenizer(texts, return_tensors="pt", padding=True)
    enc = {k: v.to(dev) for k, v in enc.items()}
    with torch.no_grad():
        out = model(**enc)
    rep = out.last_hidden_state  # [B, T, D]
    mask = enc["attention_mask"].bool()
    return [rep[k][mask[k]].float().cpu().numpy()
            for k in range(rep.shape[0])]


def _trim_special(mat, seq_len: int):
    """BOS/EOS trim with the reference's conservative center-crop fallback
    (generate_base_embeddings.py:97-107)."""
    Lr = mat.shape[0]
    if Lr == seq_len + 2:
        return mat[1:-1]
    if Lr != seq_len and Lr > seq_len and seq_len > 0:
        start = max(0, (Lr - seq_len) // 2)
        end = min(Lr, start + seq_len)
        if end - start == seq_len:
            return mat[start:end]
    return mat


def generate_base_embeddings(df, output_path, id_column, sequence_column,
                             batch_size=8, quiet=False, keep_cols=None,
                             model_name="giga-v1", use_amp=True,
                             trim_special=True, device=None,
                             backend="rinalmo"):
    import pandas as pd
    import torch

    if backend == "hf":
        model, tokenizer, dev = _load_hf(model_name, device)
    else:
        model, alphabet, dev = _load_rinalmo(model_name, device)
    rows = []
    seqs = df[sequence_column].astype(str).str.upper().str.replace("T", "U").tolist()
    ids = df[id_column].tolist()
    keep_cols = [c for c in (keep_cols or []) if c in df.columns]
    use_amp = use_amp and dev.type == "cuda"
    with torch.no_grad():
        for s in range(0, len(seqs), batch_size):
            chunk = seqs[s : s + batch_size]
            if backend == "hf":
                # pad rows are already dropped via the attention mask
                mats = _hf_embed_batch(model, tokenizer, chunk, dev)
            else:
                tokens = torch.tensor(
                    alphabet.batch_tokenize(chunk), dtype=torch.int64,
                    device=dev,
                )
                if use_amp:  # pragma: no cover - CUDA-only branch
                    with torch.autocast("cuda"):
                        out = model(tokens)["representation"]
                else:
                    out = model(tokens)["representation"]
                mats = [out[k].float().cpu().numpy()
                        for k in range(len(chunk))]
            for k, seq in enumerate(chunk):
                rep = mats[k]
                if trim_special:
                    # batch_tokenize right-pads to the batch max; the
                    # real rows are the leading seq_len+2 (BOS+EOS).
                    # Slice BEFORE trimming so the center-crop fallback
                    # never sees pad rows — the reference center-crops
                    # the PADDED matrix and emits misaligned embeddings
                    # for any sequence >=2 shorter than its batch max
                    # (generate_base_embeddings.py:94-106)
                    if rep.shape[0] > len(seq) + 2:
                        rep = rep[: len(seq) + 2]
                    rep = _trim_special(rep, len(seq))
                row = {
                    id_column: ids[s + k],
                    "seq_len": int(rep.shape[0]),
                    "base_embeddings": json.dumps(
                        np.round(rep.astype(np.float64), 6).tolist(),
                        separators=(",", ":"),
                    ),
                }
                for c in keep_cols:
                    row[c] = df.iloc[s + k][c]
                rows.append(row)
    out_df = pd.DataFrame(rows)
    cols = [id_column, "seq_len", "base_embeddings"]
    out_df = out_df[cols + sorted(c for c in out_df.columns if c not in cols)]
    out_df.to_csv(output_path, sep="\t", index=False, na_rep="NaN")
    if not quiet:
        print(f"Base embeddings saved to {output_path}")


def build_parser():
    parser = argparse.ArgumentParser(
        description="Per-nucleotide embeddings from the RiNALMo RNA language model."
    )
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--id-column", required=True)
    parser.add_argument("--sequence-column-name", "--sequence-column",
                        dest="sequence_column", default="sequence")
    parser.add_argument("--keep-cols", default=None,
                        help="Comma-separated extra columns to carry through.")
    parser.add_argument("--model-name", default="giga-v1",
                        help="RiNALMo pretrained model name, or (with "
                             "--backend hf) a transformers hub id / local "
                             "model directory.")
    parser.add_argument("--backend", choices=("rinalmo", "hf"),
                        default="rinalmo",
                        help="LM backend: 'rinalmo' (reference parity) or "
                             "'hf' (any HuggingFace transformers encoder).")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--device", default=None, help="Reference CLI compatibility.")
    parser.add_argument("--no-amp", dest="use_amp", action="store_false",
                        default=True,
                        help="Disable autocast (only active on CUDA anyway).")
    parser.add_argument("--no-trim-special", dest="trim_special",
                        action="store_false", default=True,
                        help="Keep BOS/EOS rows instead of trimming.")
    parser.add_argument("--quiet", action="store_true")
    return parser


def main(argv=None):
    import pandas as pd

    args = build_parser().parse_args(argv)

    from ginfinity_tpu.utils.io import read_table

    df = read_table(args.input)
    for col in (args.id_column, args.sequence_column):
        if col not in df.columns:
            raise ValueError(f"Column '{col}' not found in input.")
    keep_cols = (
        [c.strip() for c in args.keep_cols.split(",") if c.strip()]
        if args.keep_cols
        else None
    )
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    generate_base_embeddings(
        df, args.output, args.id_column, args.sequence_column,
        args.batch_size, args.quiet, keep_cols, args.model_name,
        args.use_amp, args.trim_special, device=args.device,
        backend=args.backend,
    )


if __name__ == "__main__":
    main()
