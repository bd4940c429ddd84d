#!/usr/bin/env python
"""A/B the refinement acceptance guard (--refine-min-gain) — VERDICT r4
item 9: at min_gain 0 (classic any-improvement acceptance) 1 of 3 bench
families' TRUE SP-F1 regressed under refinement while its embedding-SP
proxy improved.  This probe scores refine-32 vs refine-0 per family at
several guard levels and reports per-family deltas, to pick (and pin)
a shipped default with no per-family regression at equal-or-better
mean.

Quality is platform-independent; run with JAX_PLATFORMS=cpu when the
TPU is busy.  Usage: python bench_refine_guard.py [--families 6]
"""

import argparse
import contextlib
import json
import os
import sys
import tempfile

import numpy as np

CKPT = "/root/reference/src/ginfinity/weights/gin_weights_regression_180925.pth"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", type=int, default=6)
    ap.add_argument("--n-seqs", type=int, default=6)
    ap.add_argument("--anc-len", type=int, default=120)
    ap.add_argument("--gains", default="0,0.002,0.005,0.01")
    args = ap.parse_args()

    from ginfinity_tpu.pipelines.msa_eval import (
        DEFAULT_PARAMS,
        family_to_tsv,
        load_aln_tsv,
        make_family,
        run_repo_msa,
        sp_scores,
    )

    gains = [float(g) for g in args.gains.split(",")]
    out = {"families": args.families, "n_seqs": args.n_seqs,
           "anc_len": args.anc_len, "per_gain": {}}
    base_scores = []
    refined = {g: [] for g in gains}
    with tempfile.TemporaryDirectory() as td:
        for f in range(args.families):
            # same family seeds as bench.py measure_msa_refinement so the
            # probe reproduces the observed regression family
            members = make_family(1000 * f + 7, n_seqs=args.n_seqs,
                                  anc_len=args.anc_len)
            wd = os.path.join(td, f"family{f}")
            os.makedirs(wd, exist_ok=True)
            tsv = os.path.join(wd, "emb.tsv")
            with contextlib.redirect_stdout(sys.stderr):
                family_to_tsv(members, CKPT, tsv)
                prefix0 = os.path.join(wd, "r0", "msa")
                run_repo_msa(tsv, prefix0,
                             dict(DEFAULT_PARAMS, refine_iters=0),
                             dp_score="library")
                s0 = sp_scores(load_aln_tsv(prefix0 + ".aln.tsv"), members)
                base_scores.append(round(s0["sp_f1"], 4))
                for g in gains:
                    prefix = os.path.join(wd, f"g{g}", "msa")
                    run_repo_msa(
                        tsv, prefix,
                        dict(DEFAULT_PARAMS, refine_iters=32,
                             refine_min_gain=g),
                        dp_score="library",
                    )
                    sc = sp_scores(load_aln_tsv(prefix + ".aln.tsv"), members)
                    refined[g].append(round(sc["sp_f1"], 4))
    out["refine0_per_family"] = base_scores
    for g in gains:
        deltas = [round(a - b, 4) for a, b in zip(refined[g], base_scores)]
        out["per_gain"][str(g)] = {
            "per_family": refined[g],
            "per_family_delta": deltas,
            "mean": round(float(np.mean(refined[g])), 4),
            "families_regressed": int(sum(d < 0 for d in deltas)),
        }
    out["refine0_mean"] = round(float(np.mean(base_scores)), 4)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
