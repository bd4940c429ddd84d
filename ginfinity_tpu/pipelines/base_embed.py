"""``ginfinity-generate-base-embeddings`` — per-nucleotide embeddings from
an external RNA language model.

Reference CLI parity: src/ginfinity/scripts/generate_base_embeddings.py
(RiNALMo ``giga-v1``; per-base embeddings, BOS/EOS trimming, JSON-matrix
TSV output).  RiNALMo is an optional external dependency in the
reference as well; when unavailable this pipeline exits with a clear
message.  The output column (``base_embeddings``) feeds --seq-weight
blending in the aligners and the MSA engine.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load_rinalmo():
    try:
        import torch  # noqa: F401
        from rinalmo.pretrained import get_pretrained_model
    except ImportError as exc:
        raise SystemExit(
            "ERROR: the 'rinalmo' package (and a torch build able to run it) "
            "is required for base embeddings. Install it or skip this step; "
            "all downstream tools accept --seq-weight 0 (structure only)."
        ) from exc
    model, alphabet = get_pretrained_model(model_name="giga-v1")
    model.eval()
    return model, alphabet


def generate_base_embeddings(df, output_path, id_column, sequence_column,
                             batch_size=8, quiet=False):
    import pandas as pd
    import torch

    model, alphabet = _load_rinalmo()
    rows = []
    seqs = df[sequence_column].astype(str).str.upper().str.replace("T", "U").tolist()
    ids = df[id_column].tolist()
    with torch.no_grad():
        for s in range(0, len(seqs), batch_size):
            chunk = seqs[s : s + batch_size]
            tokens = torch.tensor(alphabet.batch_tokenize(chunk), dtype=torch.int64)
            out = model(tokens)["representation"]
            for k, seq in enumerate(chunk):
                rep = out[k, 1 : 1 + len(seq)].float().cpu().numpy()  # trim BOS/EOS
                rows.append(
                    {
                        id_column: ids[s + k],
                        "base_embeddings": json.dumps(
                            [[round(float(x), 6) for x in r] for r in rep],
                            separators=(",", ":"),
                        ),
                    }
                )
    pd.DataFrame(rows).to_csv(output_path, sep="\t", index=False)
    if not quiet:
        print(f"Base embeddings saved to {output_path}")


def main(argv=None):
    import pandas as pd

    parser = argparse.ArgumentParser(
        description="Per-nucleotide embeddings from the RiNALMo RNA language model."
    )
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--id-column", required=True)
    parser.add_argument("--sequence-column", default="sequence")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--device", default=None, help="Reference CLI compatibility.")
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)

    sep = "\t" if args.input.endswith(".tsv") else ","
    df = pd.read_csv(args.input, sep=sep)
    for col in (args.id_column, args.sequence_column):
        if col not in df.columns:
            raise ValueError(f"Column '{col}' not found in input.")
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    generate_base_embeddings(
        df, args.output, args.id_column, args.sequence_column, args.batch_size, args.quiet
    )


if __name__ == "__main__":
    main()
