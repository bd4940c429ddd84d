"""Library-mode MSA quality parameter sweep.

Coordinate sweep around the current defaults on synthetic families with
known position-level homology (pipelines/msa_eval.py), scored by
sum-of-pairs F1.  Families here use a TUNE seed range disjoint from the
bench harness's families (bench.py / tests/test_msa_quality.py), so a
default promoted from this sweep is validated out-of-sample by the
existing quality benches.

Quality is platform-independent; this forces CPU JAX so it never
contends for the TPU.  Usage:

    python bench_msa_params.py [--families 6] [--n-seqs 8] [--anc-len 150]
"""

import argparse
import contextlib
import io
import json
import os
import tempfile
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

PACKAGED = "/root/reference/src/ginfinity/weights/gin_weights_regression_180925.pth"

BASE = {
    "topk": 20, "consistency_rounds": 1, "alpha": 5.0, "beta": 0.0,
    "gap_open": -10.0, "gap_extend": -0.5, "seed": 42,
}

# one-at-a-time variants around BASE (library mode)
VARIANTS = {
    "baseline": {},
    "rounds2": {"consistency_rounds": 2},
    "rounds3": {"consistency_rounds": 3},
    "topk40": {"topk": 40},
    "topk10": {"topk": 10},
    "alpha3": {"alpha": 3.0},
    "alpha8": {"alpha": 8.0},
    "gap_open-6": {"gap_open": -6.0},
    "gap_open-14": {"gap_open": -14.0},
    "gap_extend-1": {"gap_extend": -1.0},
    "gap_extend-0.25": {"gap_extend": -0.25},
    "dp_gap-0.1": {"dp_gap_open": -0.1, "dp_gap_extend": -0.02},
    "dp_gap-0.5": {"dp_gap_open": -0.5, "dp_gap_extend": -0.1},
}


def _flags(params: dict) -> list[str]:
    out = []
    for k, v in params.items():
        out += [f"--{k.replace('_', '-')}", str(v)]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", type=int, default=6)
    ap.add_argument("--n-seqs", type=int, default=8)
    ap.add_argument("--anc-len", type=int, default=150)
    ap.add_argument("--seed0", type=int, default=50_000,
                    help="First family seed (disjoint from the bench set).")
    ap.add_argument("--extra", type=json.loads, default=None,
                    help='Extra variants as JSON, e.g. '
                         '\'{"combo": {"consistency_rounds": 2, "topk": 40}}\'')
    args = ap.parse_args()

    from ginfinity_tpu.pipelines.msa import main as msa_main
    from ginfinity_tpu.pipelines.msa_eval import (
        family_to_tsv, load_aln_tsv, make_family, sp_scores,
    )

    variants = dict(VARIANTS)
    if args.extra:
        variants.update(args.extra)

    workdir = tempfile.mkdtemp(prefix="msa_params_")
    fams, tsvs = [], []
    for f in range(args.families):
        members = make_family(
            args.seed0 + f, n_seqs=args.n_seqs, anc_len=args.anc_len,
            sub_rate=0.05, del_rate=0.03, ins_rate=0.03,
        )
        tsv = os.path.join(workdir, f"fam{f}.tsv")
        family_to_tsv(members, PACKAGED, tsv)
        fams.append(members)
        tsvs.append(tsv)
    print(f"[setup] {args.families} families embedded -> {workdir}")

    results = {}
    for name, delta in variants.items():
        params = dict(BASE, **delta)
        f1s, t0 = [], time.perf_counter()
        for f, (members, tsv) in enumerate(zip(fams, tsvs)):
            prefix = os.path.join(workdir, f"out_{name}_{f}", "msa")
            with contextlib.redirect_stdout(io.StringIO()):
                msa_main([
                    "--input", tsv, "--out-prefix", prefix,
                    "--dp-score", "library", "--tree", "nj",
                    "--refine-iters", "0",
                    *_flags(params),
                ])
            f1s.append(sp_scores(load_aln_tsv(prefix + ".aln.tsv"),
                                 members)["sp_f1"])
        results[name] = {
            "mean_sp_f1": round(float(np.mean(f1s)), 4),
            "per_family": [round(x, 4) for x in f1s],
            "wall_sec": round(time.perf_counter() - t0, 1),
            "params": delta,
        }
        print(f"[{name:18s}] mean SP-F1 {results[name]['mean_sp_f1']:.4f} "
              f"({results[name]['wall_sec']}s) {delta}")

    ranked = sorted(results.items(), key=lambda kv: -kv[1]["mean_sp_f1"])
    print("\n== ranked ==")
    for name, r in ranked:
        print(f"{r['mean_sp_f1']:.4f}  {name:18s} {r['params']}")
    out = os.path.join(workdir, "results.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"\nresults -> {out}")


if __name__ == "__main__":
    main()
