"""``ginfinity-embed`` — graph embeddings from dot-bracket structures.

Reference CLI parity: src/ginfinity/scripts/generate_embeddings.py.
Same flags, same TSV output schema (``embedding_vector`` as comma-joined
%.6f strings, id/window columns ordered first), same checkpoint-metadata
defaulting of graph encoding and seq_weight; the compute path is the
TPU-native bucketed engine instead of CPU worker pools.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd

from ginfinity_tpu.pipelines.engine import InferenceEngine, preprocess_structures
from ginfinity_tpu.utils.io import log_information, setup_and_read_input


def format_embedding(vec: np.ndarray) -> str:
    return ",".join(f"{x:.6f}" for x in np.asarray(vec).ravel())


def generate_embeddings(
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
    precision: str = "highest",
    mesh=None,
):
    final_keep = [id_column]
    if "seq_len" in input_df.columns:
        final_keep.append("seq_len")
    if keep_cols:
        final_keep.extend(keep_cols)

    engine = InferenceEngine.from_checkpoint(
        model_path, precision=precision, max_nodes_per_batch=batch_nodes,
        mesh=mesh,
    )
    cfg = engine.config
    graph_encoding = (graph_encoding_override or cfg.graph_encoding or "standard").lower()
    if graph_encoding not in {"standard", "forgi"}:
        raise ValueError(f"Unsupported graph encoding '{graph_encoding}'")
    seq_weight = (
        float(seq_weight_override) if seq_weight_override is not None else cfg.seq_weight
    )
    seq_weight = max(0.0, min(1.0, seq_weight))

    structures = input_df[structure_column].tolist()
    sequences = (
        input_df[sequence_column].tolist() if sequence_column in input_df.columns else None
    )
    pre = preprocess_structures(
        structures,
        sequences,
        graph_encoding=graph_encoding,
        seq_weight=seq_weight,
        feature_dim=cfg.node_feature_dim,
    )
    row_ids = input_df[id_column].tolist()
    for pos, reason in pre.skipped:
        log_information(log_path, {f"skipped_{reason}": f"ID {row_ids[pos]}"})

    if not pre.graphs:
        # keep the output contract: a header-only TSV + count log, so a
        # downstream step reading the promised file fails on content
        # (0 rows), not FileNotFoundError
        print("No valid structures to process.")
        pd.DataFrame(columns=final_keep + ["embedding_vector"]).to_csv(
            output_path, sep="\t", index=False
        )
        log_information(log_path, {"num_embeddings": 0}, "generate_embeddings")
        return

    embeddings = engine.embed_graphs(pre.graphs)

    rows = []
    for k, pos in enumerate(pre.kept_indices):
        # positional lookup: .loc on a caller-supplied frame with
        # duplicate index labels returns a DataFrame, not a row
        base = input_df.iloc[pos]
        out = {c: base[c] for c in final_keep if c in base}
        out["embedding_vector"] = format_embedding(embeddings[k])
        rows.append(out)

    out_df = pd.DataFrame(rows)
    cols = [id_column]
    for c in ("window_start", "window_end"):
        if c in out_df.columns:
            cols.append(c)
    cols.append("embedding_vector")
    others = [c for c in out_df.columns if c not in cols]
    out_df = out_df[cols + sorted(others)]
    out_df.to_csv(output_path, sep="\t", index=False, na_rep="NaN")
    log_information(log_path, {"num_embeddings": len(out_df)}, "generate_embeddings")
    if not quiet:
        print(f"Embeddings saved to {output_path}")


def generate_window_embeddings(
    input_df: pd.DataFrame,
    output_path: str,
    model_path: str,
    log_path: str | None,
    structure_column: str,
    id_column: str,
    window_size: int,
    keep_paired_neighbors: bool = True,
    mask_threshold: float = 0.0,
    keep_cols: list | None = None,
    quiet: bool = False,
    precision: str = "highest",
    max_programs: int | None = None,
    mesh=None,
    bf16_check: int = 0,
    wire: str | None = None,
):
    """Fused sliding-window embedding (--window-size): every window of
    every structure is generated AND embedded on device in one pass —
    the high-throughput path behind bench.py (~51-58k windows/sec
    end-to-end on one v5e chip, BASELINE.md roofline; vs ~1.5k through
    the file-based generate-windows -> embed --graph-pt flow).  Output
    schema matches
    that flow: one row per window with window_id/{id}/window_start/
    window_end/seq_len + embedding_vector."""
    from ginfinity_tpu.models.checkpoint import load_checkpoint
    from ginfinity_tpu.models.gine import GINModel
    from ginfinity_tpu.pipelines.fast_windows import embed_corpus_windows

    cfg, params, state, _ = load_checkpoint(model_path)
    if precision != "highest":
        cfg = cfg.with_precision(precision)
        if not quiet:
            # measured quality tail (BASELINE.md): per-window cosine vs
            # f32 mean 0.9997 but min 0.951 — fine for scanning, not for
            # retrieval-critical corpora
            print("[generate_window_embeddings] bf16 speed mode: "
                  "per-window agreement vs f32 has a tail (min cosine "
                  "~0.95 measured); use the default f32 when exact "
                  "retrieval parity matters.")
    model = GINModel(cfg, params, state)

    from ginfinity_tpu.graphs.dotbracket import pair_table

    structures = []
    ids = []
    for rid, s in zip(input_df[id_column], input_df[structure_column]):
        # skip invalid rows like the standard path (logged, not fatal)
        if not isinstance(s, str) or pair_table(s, strict=False) is None:
            log_information(log_path, {"skipped_invalid_structure": f"ID {rid}"})
            continue
        structures.append(s)
        ids.append(rid)
    results = embed_corpus_windows(
        model, structures, window_size, keep_paired_neighbors, mask_threshold,
        max_programs=max_programs, mesh=mesh, wire=wire,
    )
    if precision != "highest" and bf16_check > 0:
        _report_bf16_tail(
            cfg, params, state, structures, ids, results, window_size,
            keep_paired_neighbors, mask_threshold, bf16_check, log_path, quiet,
            wire=wire,
        )
    rows = []
    # one O(N) pass for the kept-column lookup — a boolean scan per
    # structure is O(S*N) and dominates host time on large inputs
    base_by_id = (
        {
            r[id_column]: r
            for r in input_df.drop_duplicates(id_column, keep="first")
            .to_dict(orient="records")
        }
        if keep_cols
        else {}
    )
    for rid, struct, (starts, embs) in zip(ids, structures, results):
        base = base_by_id.get(rid) if keep_cols else None
        for start, vec in zip(starts, embs):
            row = {
                "window_id": f"{rid}_{int(start)}",
                id_column: rid,
                "window_start": int(start),
                "window_end": int(start) + window_size - 1,
                "seq_len": len(struct),
                "embedding_vector": format_embedding(vec),
            }
            if keep_cols and base is not None:
                row.update({c: base[c] for c in keep_cols if c in base})
            rows.append(row)
    leading = ["window_id", id_column, "window_start", "window_end", "seq_len",
               "embedding_vector"]
    # explicit columns so zero windows still writes a header-only TSV
    # (windows.py makes the same promise) instead of a headerless file
    out_df = pd.DataFrame(rows, columns=leading if not rows else None)
    if rows:
        out_df = out_df[[c for c in leading if c in out_df.columns]
                        + [c for c in out_df.columns if c not in leading]]
    out_df.to_csv(output_path, sep="\t", index=False, na_rep="NaN")
    log_information(log_path, {
        "num_window_embeddings": len(out_df),
        "window_size": window_size,
        "keep_paired_neighbors": keep_paired_neighbors,
        "mask_threshold": mask_threshold,
    }, "generate_window_embeddings")
    if not quiet:
        print(f"Window embeddings saved to {output_path}")


def _report_bf16_tail(cfg, params, state, structures, ids, results,
                      window_size, keep_paired_neighbors, mask_threshold,
                      n_sample, log_path, quiet, wire=None):
    """Measure the bf16 quality tail on THIS corpus (--bf16-check N):
    re-embed a deterministic sample of ~N windows at f32-HIGHEST and
    report per-window cosine agreement, naming the worst windows.
    BASELINE.md's corpus-level numbers (mean 0.9997, min 0.951) say the
    tail exists; this says whether it hits the user's data.

    With ``wire='f16'`` the delivered ``results`` also carry <=2^-11
    wire rounding; the sampled structures are re-embedded at the
    PRODUCTION precision with the exact f32 wire so the reported tail
    isolates bf16 compute and is not inflated by the wire term
    (ADVICE r4)."""
    import numpy as np

    from ginfinity_tpu.models.gine import GINModel
    from ginfinity_tpu.pipelines.fast_windows import embed_corpus_windows

    rng = np.random.default_rng(0)
    order = rng.permutation(len(structures))
    take, n_win = [], 0
    for i in order:
        if len(results[i][0]) == 0:
            continue
        take.append(int(i))
        n_win += len(results[i][0])
        if n_win >= n_sample:
            break
    if not take:
        return
    if wire == "f16":
        # clean bf16-compute sample: same model, exact f32 wire
        prod_model = GINModel(cfg, params, state)
        prod_res = embed_corpus_windows(
            prod_model, [structures[i] for i in take], window_size,
            keep_paired_neighbors, mask_threshold,
        )
        results = dict(zip(take, prod_res))
    f32_model = GINModel(cfg.with_precision("highest"), params, state)
    f32_res = embed_corpus_windows(
        f32_model, [structures[i] for i in take], window_size,
        keep_paired_neighbors, mask_threshold,
    )
    cos, names = [], []
    for i, (_, f32_emb) in zip(take, f32_res):
        starts, bf16_emb = results[i]
        a = np.asarray(bf16_emb, np.float32)
        b = np.asarray(f32_emb, np.float32)
        num = np.sum(a * b, axis=1)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        cos.append(num / np.maximum(den, 1e-12))
        names.extend(f"{ids[i]}_{int(s)}" for s in starts)
    cos = np.concatenate(cos)
    worst = np.argsort(cos)[: min(5, len(cos))]
    diag = {
        "bf16_check_windows": int(len(cos)),
        "bf16_cosine_vs_f32_mean": round(float(cos.mean()), 6),
        "bf16_cosine_vs_f32_min": round(float(cos.min()), 6),
        "bf16_worst_windows": {names[int(j)]: round(float(cos[j]), 6)
                               for j in worst},
    }
    if wire == "f16":
        diag["wire_note"] = ("delivered rows additionally carry --wire f16 "
                             "rounding (<=2^-11 rel/element), excluded from "
                             "this comparison")
    log_information(log_path, diag, "bf16_check")
    if not quiet:
        print(f"[bf16-check] {len(cos)} windows re-embedded at f32: "
              f"cosine mean {diag['bf16_cosine_vs_f32_mean']}, "
              f"min {diag['bf16_cosine_vs_f32_min']}"
              + ("" if cos.min() >= 0.99 else
                 f" — WORST: {diag['bf16_worst_windows']}"))


def _embed_precomputed(args, mesh=None):
    """--graph-pt mode: embed precomputed window graphs
    (our .npz format from ginfinity_tpu.pipelines.windows; the reference's
    torch .pt format is also accepted when its unpickling deps exist).
    ``mesh`` shards the stacked batch groups (--data-parallel)."""
    from ginfinity_tpu.pipelines.engine import adapt_graphs_to_model
    from ginfinity_tpu.pipelines.windows import load_windows_graphs

    graph_map = load_windows_graphs(args.graph_pt)
    meta_df = pd.read_csv(args.meta_tsv, sep="\t")
    records = meta_df.to_dict(orient="records")
    graphs = [graph_map[r["window_id"]] for r in records]

    log_path = os.path.splitext(args.output)[0] + ".log"
    open(log_path, "a").close()

    engine = InferenceEngine.from_checkpoint(
        args.model_path,
        precision="highest" if args.precision == "f32" else "bf16",
        max_nodes_per_batch=args.batch_nodes,
        mesh=mesh,
    )
    graphs = adapt_graphs_to_model(graphs, engine.config)
    embeddings = engine.embed_graphs(graphs)

    rows = []
    for md, vec in zip(records, embeddings):
        row = dict(md)
        row["embedding_vector"] = format_embedding(vec)
        rows.append(row)
    out_df = pd.DataFrame(rows)
    cols = [c for c in ("window_id", args.id_column, "window_start", "window_end") if c in out_df.columns]
    cols.append("embedding_vector")
    others = [c for c in out_df.columns if c not in cols]
    out_df = out_df[cols + others]
    out_df.to_csv(args.output, sep="\t", index=False, na_rep="NaN")
    log_information(log_path, {"num_embeddings": len(out_df)}, "generate_embeddings")
    print(f"Embeddings saved to {args.output}")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Generate embeddings from precomputed graphs or raw dot-bracket TSV (TPU-native)."
    )
    parser.add_argument("--input", help="Path to raw TSV/CSV with dot-bracket structures.")
    parser.add_argument("--graph-pt", help="Path to windows_graphs.npz (or reference .pt)")
    parser.add_argument("--meta-tsv", help="Path to windows_metadata.tsv")
    parser.add_argument("--output", required=True, help="Output TSV for embeddings.")
    parser.add_argument("--model-path", default=None,
                        help="Path to a GIN checkpoint (.pth or native). Required (the reference's bundled default weights are not shipped here).")
    parser.add_argument("--id-column", required=True)
    parser.add_argument("--structure-column-name", default="secondary_structure")
    parser.add_argument("--keep-cols", default=None)
    parser.add_argument("--device", default=None,
                        help="Ignored (JAX selects the accelerator); kept for reference CLI compatibility.")
    parser.add_argument("--num-workers", type=int, default=4,
                        help="Host preprocessing workers (reference CLI compatibility).")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="Reference CLI compatibility; superseded by --batch-nodes.")
    parser.add_argument("--batch-nodes", type=int, default=8192,
                        help="Max real nodes per device batch (bucketed padding).")
    parser.add_argument("--graph-encoding", choices=["standard", "forgi"], default=None)
    parser.add_argument("--seq-weight", type=float, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--profile-dir", default=None,
                        help="Write a jax.profiler trace of the run to this directory "
                             "(view with TensorBoard / xprof).")
    parser.add_argument("--window-size", type=int, default=None,
                        help="Fused mode: embed every sliding window of "
                             "this length directly on device (the fast "
                             "path; replaces the two-step generate-windows "
                             "-> embed --graph-pt flow).")
    parser.add_argument("--keep-paired-neighbors", action="store_true",
                        help="With --window-size: pull out-of-window "
                             "pairing partners into each window.")
    parser.add_argument("--mask-threshold", type=float, default=0.0,
                        help="With --window-size: skip windows whose "
                             "paired-base fraction is below this.")
    parser.add_argument("--max-programs", type=int, default=None,
                        help="With --window-size: merge the smallest "
                             "length buckets until at most this many "
                             "device programs remain. First-run latency "
                             "is dominated by per-program device loads; "
                             "--max-programs 1 trades a few percent of "
                             "padding compute for one load (pairs well "
                             "with ginfinity-prewarm).")
    parser.add_argument("--data-parallel", action="store_true",
                        help="Shard the work over all visible devices "
                             "(jax.sharding data mesh): stacked batch "
                             "groups in the file path, window blocks in "
                             "the fused --window-size path.")
    parser.add_argument("--precision", choices=["f32", "bf16"], default="f32",
                        help="MXU matmul precision. f32 (default) is "
                             "retrieval-identical to the reference; bf16 is "
                             "the ~2x-throughput speed mode (see BASELINE.md "
                             "for measured recall impact).")
    parser.add_argument("--wire", choices=["f32", "f16"], default=None,
                        help="With --window-size: D2H encoding for the "
                             "embedding download. f32 is exact; f16 halves "
                             "the bytes over a link-bound transport at "
                             "<=4.9e-4 relative rounding (compute stays at "
                             "--precision; only the wire format changes). "
                             "Default: f32, EXCEPT under --precision bf16 "
                             "where f16 is auto-enabled — the user already "
                             "opted into lossy compute (bf16's ~2^-8 step "
                             "dominates the wire's <=2^-11), so the exact "
                             "download would only throw away the speed "
                             "mode's transport win; pass --wire f32 to "
                             "force the exact download.")
    parser.add_argument("--bf16-check", type=int, default=0, metavar="N",
                        help="With --precision bf16 and --window-size: "
                             "re-embed ~N sampled windows at f32 and log "
                             "the measured cosine agreement (mean/min + "
                             "the worst window ids), so the bf16 quality "
                             "tail is visible on YOUR corpus instead of "
                             "only in BASELINE.md. 0 (default) disables.")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.profile_dir:
        import jax

        with jax.profiler.trace(args.profile_dir):
            return _main_inner(args)
    return _main_inner(args)


def _main_inner(args):
    from ginfinity_tpu.utils.jaxinit import start_backend_warmup

    if args.wire == "f16" and args.window_size is None:
        # the flag is scoped to the fused window download (see --help);
        # silently ignoring it on the other paths would hand the user an
        # unexpected full-size download (ADVICE r4).  Checked BEFORE the
        # backend warmup thread starts: exiting mid-bring-up aborts the
        # TPU plugin teardown.
        sys.exit("ERROR: --wire f16 requires --window-size (it is the D2H "
                 "encoding of the fused window-embedding download).")
    if args.wire is None:
        # see --wire help: bf16 compute auto-enables the f16 wire (its
        # rounding is 8x below bf16's own step); explicit --wire wins
        args.wire = ("f16" if args.precision == "bf16"
                     and args.window_size is not None else "f32")
        if args.wire == "f16" and not args.quiet:
            print("[generate_embeddings] --precision bf16: using the f16 "
                  "result wire (halved download; pass --wire f32 to force "
                  "the exact download)")

    start_backend_warmup()  # overlap backend bring-up with input reading

    if args.model_path is None:
        default_weights = os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "weights", "default.gin.zip"
        )
        if not os.path.exists(default_weights):
            sys.exit(
                "ERROR: no --model-path given and no default weights found. "
                "Pass --model-path (a reference .pth works directly)."
            )
        args.model_path = default_weights
        if not args.quiet:
            print(f"[generate_embeddings] Using built-in weights: {args.model_path}")

    if bool(args.graph_pt) != bool(args.meta_tsv):
        sys.exit("ERROR: --graph-pt and --meta-tsv must be given together.")

    mesh = None
    if getattr(args, "data_parallel", False):
        import jax

        if jax.device_count() > 1:
            from ginfinity_tpu.parallel.mesh import make_data_mesh

            mesh = make_data_mesh()
            if not args.quiet:
                print(f"[generate_embeddings] data parallel over "
                      f"{mesh.devices.size} devices")
        elif not args.quiet:
            print("[generate_embeddings] --data-parallel: single device "
                  "visible; running unsharded")

    if args.graph_pt and args.meta_tsv:
        _embed_precomputed(args, mesh)
        return

    df, log_path, propagate = setup_and_read_input(args, need_model=True)
    if args.window_size is not None:
        if args.window_size < 2:
            sys.exit("ERROR: --window-size must be >= 2.")
        generate_window_embeddings(
            input_df=df,
            output_path=args.output,
            model_path=args.model_path,
            log_path=log_path,
            structure_column=args.structure_column_name,
            id_column=args.id_column,
            window_size=args.window_size,
            keep_paired_neighbors=args.keep_paired_neighbors,
            mask_threshold=args.mask_threshold,
            keep_cols=propagate,
            quiet=args.quiet,
            precision="highest" if args.precision == "f32" else "bf16",
            max_programs=args.max_programs,
            mesh=mesh,
            bf16_check=args.bf16_check,
            wire=None if args.wire == "f32" else args.wire,
        )
        return
    generate_embeddings(
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
        precision="highest" if args.precision == "f32" else "bf16",
        mesh=mesh,
    )


if __name__ == "__main__":
    main()
