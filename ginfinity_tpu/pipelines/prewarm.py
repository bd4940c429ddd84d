"""``ginfinity-prewarm`` — compile a corpus's window-path program ladder
into the persistent XLA compilation cache ahead of time.

First-run UX for ``ginfinity-embed --window-size L``: every capacity-
ladder bucket of the corpus needs its own XLA program; a cold cache
pays minutes of compilation, and even a warm persistent cache pays
per-program executable deserialization on the first dispatch of a fresh
process.  This tool runs the same host preprocessing + grouping as the
fused window path (fast_windows.embed_corpus_windows) and compiles every
distinct program signature — via ``jit.lower(...).compile()`` on
ShapeDtypeStructs, so no data is uploaded and nothing executes — from a
thread pool (XLA compilation releases the GIL).

After prewarming, a fresh ``ginfinity-embed`` process over the same (or
same-shaped) corpus loads executables from the cache instead of
compiling; embed_corpus_windows additionally overlaps those loads across
buckets (parallel_compile=True).

The reference has no analogue (its torch path has no compile step); this
is TPU-specific first-run tooling.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def prewarm_window_ladder(model, structures, L, keep_paired_neighbors=True,
                          mask_threshold=0.0, quiet=False, max_programs=None):
    """Compile every ladder-group signature for this corpus; returns the
    number of programs compiled (cache hits included)."""
    import jax

    from ginfinity_tpu.graphs.batching import _round_capacity
    from ginfinity_tpu.pipelines.fast_windows import (
        _chunk_for,
        _embed_windows_stacked_jit,
        _ladder_caps,
        _prep_corpus_groups,
    )

    cfg = model.config
    per, groups = _prep_corpus_groups(
        cfg, structures, L, keep_paired_neighbors, mask_threshold, max_programs
    )

    def signature(n_cap, idxs):
        s_cap = _round_capacity(len(idxs))
        n_windows = sum(per[i][4].size for i in idxs)
        w_cap = _round_capacity(n_windows)
        p_cap = max(per[i][6] for i in idxs)
        b_cap = max(per[i][5] for i in idxs)
        f32 = jax.ShapeDtypeStruct
        return (
            (
                f32((s_cap, n_cap, cfg.node_feature_dim), np.float32),
                f32((s_cap, n_cap), np.int32),
                f32((w_cap,), np.int32),
                f32((w_cap,), np.int32),
            ),
            dict(zip(("p_cap", "b_cap"), _ladder_caps(cfg, p_cap, b_cap)),
                 chunk=_chunk_for(w_cap)),
        )

    sigs = {}
    for n_cap, idxs in sorted(groups.items()):
        arrs, statics = signature(n_cap, idxs)
        key = tuple(a.shape for a in arrs) + tuple(sorted(statics.items()))
        sigs[key] = (arrs, statics)

    def compile_one(item):
        arrs, statics = item
        t0 = time.perf_counter()
        _embed_windows_stacked_jit.lower(
            cfg, model.params, model.state, *arrs,
            L, keep_paired_neighbors, **statics,
        ).compile()
        return time.perf_counter() - t0

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, max(1, len(sigs)))) as ex:
        times = list(ex.map(compile_one, sigs.values()))
    if not quiet:
        for (key, _), dt in zip(sigs.items(), times):
            print(f"  program {key[0]}: {dt:.1f}s")
    return len(sigs)


def prewarm_msa_bucket(n_seq, lmax, dim, max_pairs, topk, dp_score,
                       refine_iters, quiet=False):
    """Compile the MSA program set for one (member, pair, length) shape
    bucket by running the REAL pipeline on a synthetic family of that
    scale (outputs discarded).

    All MSA program shapes are pure functions of capacity buckets
    (ops/library_pool._member_capacity / _slab_capacity /
    _ladder_capacity, graphs.batching._round_capacity), so one run
    covers every real family whose member count, kept-pair count and
    max length land in the same buckets — a fresh process then loads
    executables from the persistent cache instead of paying the compile
    set (~1-3 min cold on a 1-CPU host for a 200x300-class family)."""
    import contextlib
    import json
    import sys
    import tempfile

    import pandas as pd

    from ginfinity_tpu.pipelines.msa import main as msa_main

    rng = np.random.default_rng(0)
    base = rng.normal(size=(lmax, dim)).astype(np.float32)
    rows = []
    for s in range(n_seq):
        Ls = int(rng.integers(max(2, int(lmax * 0.85)), lmax + 1))
        emb = base[:Ls] + 0.1 * rng.normal(size=(Ls, dim)).astype(np.float32)
        rows.append({"Name": f"s{s}",
                     "node_embeddings": json.dumps(emb.round(4).tolist())})
    with tempfile.TemporaryDirectory() as td:
        import os

        tsv = os.path.join(td, "family.tsv")
        pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)
        args = ["--input", tsv, "--out-prefix", os.path.join(td, "w", "msa"),
                "--alpha", "5", "--beta", "0", "--topk", str(topk),
                "--consistency-rounds", "1", "--max-pairs", str(max_pairs),
                "--dp-score", dp_score, "--refine-iters", str(refine_iters)]
        ctx = (contextlib.redirect_stdout(sys.stderr)
               if quiet else contextlib.nullcontext())
        with ctx:
            msa_main(args)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Pre-compile program sets into the persistent XLA "
                    "cache (TPU-native first-run tooling; no reference "
                    "analogue): the fused window-path ladder for a "
                    "corpus, or the MSA engine's bucketed program set "
                    "for a family scale (--msa N LMAX)."
    )
    ap.add_argument("--input", help="CSV/TSV with structures (window mode)")
    ap.add_argument("--structure-column-name", default="secondary_structure")
    ap.add_argument("--model-path")
    ap.add_argument("--window-size", type=int)
    ap.add_argument("--keep-paired-neighbors", action="store_true")
    ap.add_argument("--mask-threshold", type=float, default=0.0)
    ap.add_argument("--max-programs", type=int, default=None,
                    help="Match the --max-programs you will pass to "
                         "ginfinity-embed (the merged ladder compiles "
                         "different program signatures).")
    ap.add_argument("--msa", nargs=2, type=int, metavar=("N", "LMAX"),
                    help="Prewarm the MSA engine for families of ~N "
                         "members with max length ~LMAX (runs the real "
                         "pipeline on a synthetic family of that scale; "
                         "covers every family in the same capacity "
                         "buckets).")
    ap.add_argument("--msa-dim", type=int, default=128,
                    help="Node-embedding dimension (= the model's "
                         "hidden size) for --msa.")
    ap.add_argument("--msa-max-pairs", type=int, default=2000,
                    help="Match the --max-pairs you will run with.")
    ap.add_argument("--msa-topk", type=int, default=20)
    ap.add_argument("--msa-dp-score", choices=["profile", "library", "both"],
                    default="both")
    ap.add_argument("--msa-refine-iters", type=int, default=0,
                    help="Nonzero additionally warms the refinement "
                         "programs.")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    if args.msa is None and not (args.input and args.model_path
                                 and args.window_size):
        raise SystemExit("Window mode needs --input, --model-path and "
                         "--window-size (or pass --msa N LMAX).")

    t0 = time.perf_counter()
    if args.msa is not None:
        n_seq, lmax = args.msa
        modes = (["profile", "library"] if args.msa_dp_score == "both"
                 else [args.msa_dp_score])
        for mode in modes:
            if not args.quiet:
                print(f"[prewarm] MSA bucket N={n_seq} Lmax={lmax} "
                      f"dp-score={mode}...")
            prewarm_msa_bucket(
                n_seq, lmax, args.msa_dim, args.msa_max_pairs,
                args.msa_topk, mode, args.msa_refine_iters, args.quiet,
            )
        if not args.quiet:
            print(f"Prewarmed the MSA program set in "
                  f"{time.perf_counter() - t0:.1f}s (persistent XLA "
                  f"cache now covers this family scale).")
        return

    import pandas as pd

    from ginfinity_tpu.models.checkpoint import load_checkpoint
    from ginfinity_tpu.models.gine import GINModel

    sep = "\t" if args.input.endswith((".tsv", ".txt")) else ","
    df = pd.read_csv(args.input, sep=sep)
    if args.structure_column_name not in df.columns:
        raise SystemExit(f"Missing column {args.structure_column_name!r}")
    structures = df[args.structure_column_name].astype(str).tolist()

    cfg, params, state, _ = load_checkpoint(args.model_path)
    model = GINModel(cfg, params, state)
    n = prewarm_window_ladder(
        model, structures, args.window_size,
        args.keep_paired_neighbors, args.mask_threshold, args.quiet,
        args.max_programs,
    )
    if not args.quiet:
        print(
            f"Prewarmed {n} window-ladder program(s) in "
            f"{time.perf_counter() - t0:.1f}s "
            f"(persistent XLA cache now covers this corpus)."
        )


if __name__ == "__main__":
    main()
