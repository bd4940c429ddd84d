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


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Pre-compile the fused window-path program ladder for "
                    "a corpus into the persistent XLA cache (TPU-native "
                    "first-run tooling; no reference analogue)."
    )
    ap.add_argument("--input", required=True, help="CSV/TSV with structures")
    ap.add_argument("--structure-column-name", default="secondary_structure")
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--window-size", type=int, required=True)
    ap.add_argument("--keep-paired-neighbors", action="store_true")
    ap.add_argument("--mask-threshold", type=float, default=0.0)
    ap.add_argument("--max-programs", type=int, default=None,
                    help="Match the --max-programs you will pass to "
                         "ginfinity-embed (the merged ladder compiles "
                         "different program signatures).")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

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
    t0 = time.perf_counter()
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
