#!/usr/bin/env python
"""Training data-pipeline scale probe (VERDICT r4 item 7).

The measured training runs (BENCH_EXTRA ``trained_model_eval_flagship``)
train on 120 families / 600 structures.  The reference's host dataset
path rebuilt graphs per epoch unless cached and was its training
bottleneck (train_model.py:833-936); this probe shows the repo's host
path (JSON alignment maps, graph builds, fixed-shape batch assembly)
does NOT become the bottleneck at 10x: it runs the SAME flagship-config
schedule at 120 and 1200 families and compares the effective end-to-end
training rate (graphs/sec through the whole loop, host stages included).

Writes/merges the ``trained_model_eval_scale`` entry into
BENCH_EXTRA.json (one-off scale evidence; the per-round bench keeps the
small-corpus probes).

Usage:  python bench_train_scale.py [--families 1200] [--epochs 6]
"""

import argparse
import contextlib
import io
import json
import os
import re
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def probe(n_train_families: int, epochs: int, arch: str = "flagship") -> dict:
    from ginfinity_tpu.pipelines.train_eval import (
        generate_alignment_training_data,
        train_packaged_architecture,
    )

    # fixed budget, no early stop (patience > epochs): both scales run
    # the same number of epochs so rates are directly comparable
    rounds = [{"lr": 5e-4, "decay_rate": 0.98, "patience": epochs + 1,
               "num_epochs": epochs}]
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        data_p, map_p, _ = generate_alignment_training_data(
            td, n_train_families=n_train_families, n_eval_families=1,
        )
        datagen_wall = time.perf_counter() - t0
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            _, train_wall = train_packaged_architecture(
                data_p, map_p, td, rounds=rounds, arch=arch,
            )
        text = buf.getvalue()
    epochs_run = len({
        int(m) for m in re.findall(r"^Epoch (\d+)/\d+", text, re.M)
        if int(m) > 0
    })
    n_structures = n_train_families * 5  # generator default n_seqs
    graphs_train = int(n_structures * 0.97)  # 3% val split
    steps_per_epoch = max(1, int(n_train_families * 0.97) // 32)
    return {
        "n_train_families": n_train_families,
        "n_structures": n_structures,
        "epochs_run": epochs_run,
        "datagen_wall_sec": round(datagen_wall, 1),
        "train_wall_sec": round(train_wall, 1),
        "graphs_per_sec_e2e": round(
            epochs_run * graphs_train / train_wall, 1
        ),
        "steps_per_sec_e2e": round(
            epochs_run * steps_per_epoch / train_wall, 2
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", type=int, default=1200)
    ap.add_argument("--base-families", type=int, default=120)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--arch", default="flagship")
    ap.add_argument("--no-merge", action="store_true",
                    help="print only; do not update BENCH_EXTRA.json")
    args = ap.parse_args()

    small = probe(args.base_families, args.epochs, args.arch)
    print(json.dumps({"small": small}), file=sys.stderr)
    large = probe(args.families, args.epochs, args.arch)
    ratio = (large["graphs_per_sec_e2e"] / small["graphs_per_sec_e2e"]
             if small["graphs_per_sec_e2e"] else 0.0)
    entry = {
        "arch": args.arch,
        "epochs_budget": args.epochs,
        "small": small,
        "large": large,
        "large_over_small_rate": round(ratio, 3),
        "protocol": "identical fixed-epoch flagship-config schedule at both "
                    "corpus scales; rate = epochs*train-split graphs / "
                    "training wall (host dataset path included)",
    }
    print(json.dumps(entry))
    if not args.no_merge:
        path = os.path.join(REPO, "BENCH_EXTRA.json")
        extra = {}
        if os.path.exists(path):
            with open(path) as f:
                extra = json.load(f)
        extra["trained_model_eval_scale"] = entry
        with open(path, "w") as f:
            json.dump(extra, f, indent=2)


if __name__ == "__main__":
    main()
