"""``ginfinity-align-node-embeddings-batch`` — all-pairs embedding alignment.

Reference CLI parity: src/ginfinity/scripts/align_node_embeddings_batch.py
(same flags, same per-pair output directory layout and summary.tsv
schema).  The reference fans pairs out over a ProcessPoolExecutor; here
whole batches of similarity matrices run through one wavefront-DP device
program (ginfinity_tpu.ops.dp.affine_align_batch), so the accelerator
does the O(L^2) work for --batch-size pairs at once.
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np
import pandas as pd

from ginfinity_tpu.ops.dp import affine_align_batch
from ginfinity_tpu.pipelines.align import (
    alignment_to_tsv,
    cosine_similarity_matrix,
    read_table_auto,
    save_matrix_png,
    save_matrix_tsv,
)
from ginfinity_tpu.pipelines.node_embed import parse_matrix


def sanitize_pair_name(a: str, b: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.\-]+", "_", f"{a}__vs__{b}")


def _write_pair_outputs(args, id1, id2, s1, s2, sim, best_score, path):
    pair_name = sanitize_pair_name(str(id1), str(id2))
    pair_dir = os.path.join(args.output_dir, pair_name)
    if args.write_alignment or args.write_matrix or args.plot_matrix:
        os.makedirs(pair_dir, exist_ok=True)
    if args.write_alignment:
        with open(os.path.join(pair_dir, f"{pair_name}.alignment.tsv"), "w") as f:
            f.write(f'# mode="{args.mode}"\n')
            f.write(f'# gap_open="{args.gap_open}"\n')
            f.write(f'# gap_extend="{args.gap_extend}"\n')
            f.write(f'# rna1="{id1}", rna2="{id2}"\n')
            f.write(f'# total_alignment_score="{best_score:.6f}"\n')
            if s1 is not None and s2 is not None:
                f.write('# aligned_structures_present="true"\n')
            f.write(alignment_to_tsv(path, sim, s1, s2))
        if s1 is not None and s2 is not None:
            with open(os.path.join(pair_dir, f"{pair_name}.structures.txt"), "w") as f:
                a1 = "".join("-" if i is None else (s1[i] if i < len(s1) else "?") for i, _ in path)
                a2 = "".join("-" if j is None else (s2[j] if j < len(s2) else "?") for _, j in path)
                f.write(f"{id1}\t{a1}\n{id2}\t{a2}\n")
    if args.write_matrix:
        save_matrix_tsv(sim, os.path.join(pair_dir, f"{pair_name}.matrix.tsv"))
    if args.plot_matrix:
        save_matrix_png(
            sim,
            os.path.join(pair_dir, f"{pair_name}.matrix.png"),
            title=f"Cosine similarity: {id1} vs {id2}",
        )


def main(argv=None):
    from ginfinity_tpu.utils.jaxinit import start_backend_warmup

    parser = argparse.ArgumentParser(
        description="All-vs-all alignment of node embeddings (batched wavefront DP)."
    )
    parser.add_argument("--input", required=True)
    parser.add_argument("--id-column", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--gap-open", type=float, default=-1.0)
    parser.add_argument("--gap-extend", type=float, default=-1.0)
    parser.add_argument("--gap", type=float, default=None, help=argparse.SUPPRESS)
    parser.add_argument("--mode", choices=["global", "local"], default="global")
    parser.add_argument("--batch-size", type=int, default=64, help="Pairs per device batch.")
    parser.add_argument("--structure-column-name", default=None)
    parser.add_argument("--num-workers", type=int, default=1, help="Reference CLI compatibility.")
    parser.add_argument("--write-alignment", action="store_true")
    parser.add_argument("--write-matrix", action="store_true")
    parser.add_argument("--plot-matrix", action="store_true")
    parser.add_argument("--summary", default="summary.tsv")
    parser.add_argument(
        "--data-parallel",
        action="store_true",
        help="Shard pair batches over all devices of a ('data',) mesh.",
    )
    args = parser.parse_args(argv)
    # AFTER argparse (so --help/usage errors never touch the
    # device); overlaps remote-TPU bring-up with input parsing
    start_backend_warmup()

    os.makedirs(args.output_dir, exist_ok=True)
    df = read_table_auto(args.input)
    if args.id_column not in df.columns:
        raise ValueError(f"Required column '{args.id_column}' not found in input.")
    if "node_embeddings" not in df.columns:
        raise ValueError("Input does not contain a 'node_embeddings' column.")

    ids, mats, structs = [], [], []
    for _, row in df.iterrows():
        ids.append(row[args.id_column])
        mats.append(parse_matrix(row["node_embeddings"]))
        structs.append(
            str(row[args.structure_column_name]) if args.structure_column_name else None
        )

    n = len(ids)
    if n < 2:
        print("Nothing to do: fewer than 2 rows.")
        return

    if args.gap is not None:
        print("[align-batch] --gap is deprecated; treating as --gap-open.")
        args.gap_open = args.gap
    if args.gap_extend is None:
        args.gap_extend = args.gap_open

    mesh = None
    if args.data_parallel:
        import jax

        if jax.device_count() > 1:
            from ginfinity_tpu.parallel.mesh import make_data_mesh

            mesh = make_data_mesh()
            print(f"[align-batch] data parallel over {mesh.devices.size} devices")

    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    summary_rows = []
    for s in range(0, len(pairs), args.batch_size):
        chunk = pairs[s : s + args.batch_size]
        sims = [
            cosine_similarity_matrix(mats[i], mats[j]).astype(np.float32) for i, j in chunk
        ]
        results = affine_align_batch(
            sims, args.gap_open, args.gap_extend, args.mode, mesh=mesh
        )
        for (i, j), sim, (best_score, path) in zip(chunk, sims, results):
            _write_pair_outputs(args, ids[i], ids[j], structs[i], structs[j], sim, best_score, path)
            summary_rows.append(
                {
                    "id1": ids[i],
                    "id2": ids[j],
                    "n1": int(mats[i].shape[0]),
                    "n2": int(mats[j].shape[0]),
                    "score": float(best_score),
                    "mode": args.mode,
                    "gap_open": float(args.gap_open),
                    "gap_extend": float(args.gap_extend),
                }
            )

    out_path = os.path.join(args.output_dir, args.summary)
    pd.DataFrame(summary_rows).to_csv(out_path, sep="\t", index=False)
    print(f"Processed {len(summary_rows)} pair(s). Summary written to {out_path}")


if __name__ == "__main__":
    main()
