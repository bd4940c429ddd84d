"""``ginfinity-generate-node-embeddings`` — per-node (L x D) embeddings.

Reference CLI parity: src/ginfinity/scripts/generate_node_embeddings.py.
Output column ``node_embeddings`` holds the L x D matrix as compact JSON
rounded to 6 decimals (generate_node_embeddings.py:54-63); forgi
meta-nodes are dropped so rows align with base positions
(:132-182 base-node filtering, here exact via n_base_nodes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

from ginfinity_tpu.utils.native import parse_float_matrix as native_parse_float_matrix
from ginfinity_tpu.pipelines.engine import (
    InferenceEngine,
    adapt_graphs_to_model,
    preprocess_structures,
)
from ginfinity_tpu.utils.io import log_information, setup_and_read_input


def serialize_matrix(mat: np.ndarray) -> str:
    # np.round on float64 emits the same shortest-repr JSON as the
    # per-element round(float(x), 6) loop, at ~2x the speed (verified
    # string-identical across mixed magnitudes).
    rounded = np.round(np.asarray(mat, dtype=np.float64), 6).tolist()
    return json.dumps(rounded, separators=(",", ":"))


def parse_matrix(cell: str) -> np.ndarray:
    fast = native_parse_float_matrix(cell)
    if fast is not None:
        return fast
    arr = json.loads(cell)
    mat = np.asarray(arr, dtype=np.float32)
    if mat.ndim != 2:
        raise ValueError("node_embeddings must be a 2D array [L x D].")
    return mat


def generate_node_embeddings(
    input_df: pd.DataFrame,
    output_path: str,
    model_path: str,
    log_path: str | None,
    structure_column: str,
    id_column: str,
    batch_nodes: int = 8192,
    keep_cols: list | None = None,
    quiet: bool = False,
    graph_encoding_override: str | None = None,
    seq_weight_override: float | None = None,
    sequence_column: str = "sequence",
):
    t0 = time.perf_counter()
    final_keep = [id_column]
    if "seq_len" in input_df.columns:
        final_keep.append("seq_len")
    if keep_cols:
        final_keep.extend(keep_cols)

    engine = InferenceEngine.from_checkpoint(model_path, max_nodes_per_batch=batch_nodes)
    cfg = engine.config
    graph_encoding = (graph_encoding_override or cfg.graph_encoding or "standard").lower()
    seq_weight = (
        float(seq_weight_override) if seq_weight_override is not None else cfg.seq_weight
    )
    seq_weight = max(0.0, min(1.0, seq_weight))

    structures = input_df[structure_column].tolist()
    sequences = (
        input_df[sequence_column].tolist() if sequence_column in input_df.columns else None
    )
    pre = preprocess_structures(
        structures, sequences,
        graph_encoding=graph_encoding, seq_weight=seq_weight,
        feature_dim=cfg.node_feature_dim,
    )
    row_ids = input_df[id_column].tolist()
    for pos, reason in pre.skipped:
        log_information(log_path, {f"skipped_{reason}": f"ID {row_ids[pos]}"})
    t_pre = time.perf_counter()

    if not pre.graphs:
        print("No valid structures to process.")
        return

    mats = engine.node_embeddings(pre.graphs, base_only=True)
    t_inf = time.perf_counter()

    rows = []
    for k, pos in enumerate(pre.kept_indices):
        # positional lookup: .loc on a caller-supplied frame with
        # duplicate index labels returns a DataFrame, not a row
        base = input_df.iloc[pos]
        out = {c: base[c] for c in final_keep if c in base}
        out["node_embeddings"] = serialize_matrix(mats[k])
        rows.append(out)

    out_df = pd.DataFrame(rows)
    cols = [id_column]
    for c in ("window_start", "window_end"):
        if c in out_df.columns:
            cols.append(c)
    cols.append("node_embeddings")
    others = [c for c in out_df.columns if c not in cols]
    out_df = out_df[cols + sorted(others)]
    out_df.to_csv(output_path, sep="\t", index=False, na_rep="NaN")
    log_information(
        log_path,
        {
            "num_node_embeddings": len(out_df),
            "preprocess_sec": round(t_pre - t0, 3),
            "inference_sec": round(t_inf - t_pre, 3),
        },
        "generate_node_embeddings",
    )
    if not quiet:
        print(f"Node embeddings saved to {output_path}")


def main(argv=None):
    from ginfinity_tpu.utils.jaxinit import start_backend_warmup

    parser = argparse.ArgumentParser(
        description="Generate per-node embeddings (L x D JSON matrices) from dot-bracket structures."
    )
    parser.add_argument("--input", help="Path to raw TSV/CSV with dot-bracket structures.")
    parser.add_argument("--graph-pt", help="Path to windows_graphs.npz (or reference .pt)")
    parser.add_argument("--meta-tsv", help="Path to windows_metadata.tsv")
    parser.add_argument("--output", required=True)
    parser.add_argument("--model-path", default=None)
    parser.add_argument("--id-column", required=True)
    parser.add_argument("--structure-column-name", default="secondary_structure")
    parser.add_argument("--keep-cols", default=None)
    parser.add_argument("--device", default=None, help="Reference CLI compatibility.")
    parser.add_argument("--num-workers", type=int, default=4, help="Reference CLI compatibility.")
    parser.add_argument("--batch-size", type=int, default=None, help="Reference CLI compatibility.")
    parser.add_argument("--batch-nodes", type=int, default=8192)
    parser.add_argument("--graph-encoding", choices=["standard", "forgi"], default=None)
    parser.add_argument("--seq-weight", type=float, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--debug", action="store_true", help="Verbose per-stage timing logs.")
    parser.add_argument("--debug-preprocessing", dest="debug", action="store_true",
                        help="Reference flag; folds into the same verbose mode.")
    args = parser.parse_args(argv)
    # AFTER argparse (so --help/usage errors never touch the
    # device); overlaps remote-TPU bring-up with input parsing
    start_backend_warmup()

    if args.model_path is None:
        sys.exit("ERROR: --model-path is required (a reference .pth works directly).")
    if bool(args.graph_pt) != bool(args.meta_tsv):
        sys.exit("ERROR: --graph-pt and --meta-tsv must be given together.")

    if args.graph_pt and args.meta_tsv:
        from ginfinity_tpu.pipelines.windows import load_windows_graphs

        graph_map = load_windows_graphs(args.graph_pt)
        meta_df = pd.read_csv(args.meta_tsv, sep="\t")
        records = meta_df.to_dict(orient="records")
        graphs = [graph_map[r["window_id"]] for r in records]
        log_path = os.path.splitext(args.output)[0] + ".log"
        open(log_path, "a").close()

        engine = InferenceEngine.from_checkpoint(args.model_path, max_nodes_per_batch=args.batch_nodes)
        graphs = adapt_graphs_to_model(graphs, engine.config)
        mats = engine.node_embeddings(graphs, base_only=True)

        rows = []
        for md, mat in zip(records, mats):
            row = dict(md)
            row["node_embeddings"] = serialize_matrix(mat)
            rows.append(row)
        out_df = pd.DataFrame(rows)
        cols = [c for c in ("window_id", args.id_column, "window_start", "window_end") if c in out_df.columns]
        cols.append("node_embeddings")
        others = [c for c in out_df.columns if c not in cols]
        out_df = out_df[cols + others]
        out_df.to_csv(args.output, sep="\t", index=False, na_rep="NaN")
        log_information(log_path, {"num_node_embeddings": len(out_df)}, "generate_node_embeddings")
        print(f"Node embeddings saved to {args.output}")
        return

    df, log_path, propagate = setup_and_read_input(args, need_model=True)
    generate_node_embeddings(
        input_df=df,
        output_path=args.output,
        model_path=args.model_path,
        log_path=log_path,
        structure_column=args.structure_column_name,
        id_column=args.id_column,
        batch_nodes=args.batch_nodes,
        keep_cols=propagate,
        quiet=args.quiet,
        graph_encoding_override=args.graph_encoding,
        seq_weight_override=args.seq_weight,
    )


if __name__ == "__main__":
    main()
