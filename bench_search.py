"""Secondary benchmark: sharded top-k retrieval (recall@10 + queries/sec).

Not the driver's headline metric (bench.py prints that single line);
this records the search-engine numbers behind the BASELINE.json north
star ("top-k queries/sec >= 10x CPU; recall@10 parity with brute force").
Writes/merges rows into BENCH_SEARCH.json and prints a summary.

Corpora:
- ``--corpus synthetic``: well-separated Gaussian rows (the scale knob)
  with noisy corpus rows as queries.
- ``--corpus real``: REAL window embeddings — sliding 120-nt windows of
  the reference example structures plus randomly pair-deleted variants,
  embedded by the packaged checkpoint on device (the premirna-style
  scan workload, BASELINE.json config #3).  Overlapping windows make
  this corpus heavily correlated — the hard case for reduced-precision
  ranking; queries are held-out real window embeddings.

Storage modes map to TopKSearcher(storage=...): 'f32' exact-resident,
'bf16' half-HBM, 'int8' quarter-HBM — compressed modes re-score the
over-fetched candidates exactly in f32 on the host.

Baseline: single-thread numpy brute force (the reference never computes
top-k at all — it materializes all O(n^2) pairs to TSV, SURVEY.md §3.3).
"""

import argparse
import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CKPT = "/root/reference/src/ginfinity/weights/gin_weights_regression_180925.pth"
SAMPLE = "/root/reference/example_data/sample_dataset.csv"
CACHE = os.path.join(REPO, ".bench_cache")
WINDOW = 120


def _perturb_structure(s: str, rng: np.random.Generator, rate: float) -> str:
    """Delete each base pair with probability `rate` (keeps validity)."""
    from ginfinity_tpu.graphs.dotbracket import pair_table

    pt = pair_table(s, strict=False)
    if pt is None:
        return s
    chars = list(s)
    for i in range(len(s)):
        j = int(pt[i])
        if j > i and rng.random() < rate:
            chars[i] = chars[j] = "."
    return "".join(chars)


def build_real_embeddings(n_rows: int, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Embed real sliding windows until n_rows + n_queries embeddings
    exist; queries come from held-out structure variants.  Cached on
    disk — the cache grows monotonically and is reused across runs."""
    import pandas as pd

    cache_f = os.path.join(CACHE, f"real_windows_{WINDOW}.npy")
    need = n_rows + n_queries
    if os.path.exists(cache_f):
        emb = np.load(cache_f, mmap_mode="r")
        if emb.shape[0] >= need:
            emb = np.asarray(emb[:need], np.float32)
            return emb[:n_rows], emb[n_rows:need]

    from ginfinity_tpu.models.checkpoint import import_torch_checkpoint
    from ginfinity_tpu.models.gine import GINModel
    from ginfinity_tpu.pipelines.fast_windows import embed_corpus_windows

    cfg, params, state, _ = import_torch_checkpoint(CKPT)
    model = GINModel(cfg, params, state)
    base = pd.read_csv(SAMPLE)["secondary_structure"].astype(str).tolist()
    rng = np.random.default_rng(0)
    chunks: list[np.ndarray] = []
    total = 0
    variant = 0
    t0 = time.perf_counter()
    while total < need:
        if variant == 0:
            structures = base
        else:
            rate = 0.02 + 0.25 * rng.random()
            structures = [_perturb_structure(s, rng, rate) for s in base]
        res = embed_corpus_windows(model, structures, WINDOW, True)
        emb = np.concatenate(
            [e for _, e in res if len(e)] or [np.zeros((0, cfg.output_dim), np.float32)]
        )
        chunks.append(np.asarray(emb, np.float32))
        total += emb.shape[0]
        variant += 1
        print(
            f"[real corpus] variant {variant}: {total}/{need} embeddings "
            f"({time.perf_counter() - t0:.0f}s)",
            flush=True,
        )
    emb = np.concatenate(chunks)[:need]
    os.makedirs(CACHE, exist_ok=True)
    np.save(cache_f, emb)
    return emb[:n_rows], emb[n_rows:need]


def run_one(corpus, queries, k, storage, precision, label, rescore="device", query_block=1024):
    from ginfinity_tpu.parallel.search import (
        TopKSearcher,
        brute_force_topk,
        recall_at_k,
    )

    t0 = time.perf_counter()
    searcher = TopKSearcher(
        corpus, metric="sqeuclidean", query_block=query_block,
        storage=storage, precision=precision, rescore=rescore,
    )
    build_s = time.perf_counter() - t0
    searcher.search(queries[:query_block], k)  # warm-up/compile
    t0 = time.perf_counter()
    dists, ids = searcher.search(queries, k)
    dt = time.perf_counter() - t0
    qps = len(queries) / dt

    # brute-force ground truth: full corpus, subset of queries (blocked)
    nq_check = min(256, len(queries))
    t0 = time.perf_counter()
    truth = np.empty((nq_check, k), np.int64)
    truth_d = np.empty((nq_check, k), np.float32)
    blk = 2_000_000
    if corpus.shape[0] <= blk:
        truth_d, truth = brute_force_topk(corpus, queries[:nq_check], k)
    else:
        best_d = np.full((nq_check, k), np.inf, np.float32)
        best_i = np.zeros((nq_check, k), np.int64)
        q = queries[:nq_check]
        qs = np.sum(q * q, 1)[:, None]
        for s in range(0, corpus.shape[0], blk):
            c = corpus[s : s + blk]
            d = qs - 2 * q @ c.T + np.sum(c * c, 1)[None, :]
            ii = np.argpartition(d, k - 1, axis=1)[:, :k]
            dd = np.take_along_axis(d, ii, axis=1)
            md = np.concatenate([best_d, dd], 1)
            mi = np.concatenate([best_i, ii + s], 1)
            sel = np.argsort(md, axis=1, kind="stable")[:, :k]
            best_d = np.take_along_axis(md, sel, axis=1)
            best_i = np.take_along_axis(mi, sel, axis=1)
        truth, truth_d = best_i, best_d
    bf_dt = time.perf_counter() - t0
    bf_qps = nq_check / bf_dt
    recall = recall_at_k(ids[:nq_check], truth)
    # Distance-based recall: corpora with duplicate/equidistant rows
    # (real overlapping windows!) make ID recall penalize legitimate
    # tie swaps; a returned neighbor counts if its TRUE distance is
    # within the k-th true distance (+ tolerance).
    q = queries[:nq_check]
    rows = corpus[ids[:nq_check]]
    true_d = np.sum((rows - q[:, None, :]) ** 2, axis=2, dtype=np.float32)
    kth = truth_d[:, -1][:, None]
    tol = 1e-5 + 1e-5 * np.abs(kth)
    recall_dist = float(np.mean(true_d <= kth + tol))

    row = {
        "label": label,
        "corpus_rows": int(corpus.shape[0]),
        "dim": int(corpus.shape[1]),
        "k": k,
        "storage": storage,
        "precision": precision,
        "rescore": rescore,
        "recall_at_k_vs_brute_force": round(float(recall), 5),
        "recall_at_k_distance_based": round(recall_dist, 5),
        "topk_queries_per_sec": round(qps, 1),
        "numpy_brute_force_queries_per_sec": round(bf_qps, 2),
        "speedup": round(qps / bf_qps, 1),
        "corpus_upload_seconds": round(build_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000, help="corpus rows")
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--query-block", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--corpus", choices=["synthetic", "real"], default="synthetic")
    ap.add_argument("--storage", choices=["f32", "bf16", "int8"], default="f32")
    ap.add_argument("--rescore", choices=["device", "host"], default="device",
                    help="Compressed-mode candidate re-score: on-device "
                         "(int8 keeps a residual plane; no host corpus) or "
                         "the host-exact f32 path.")
    ap.add_argument("--precision", choices=["highest", "bf16"], default="highest")
    ap.add_argument("--label", default=None)
    args = ap.parse_args()

    if args.corpus == "real":
        corpus, queries = build_real_embeddings(args.n, args.queries)
    else:
        rng = np.random.default_rng(0)
        corpus = rng.normal(size=(args.n, args.dim)).astype(np.float32)
        q_idx = rng.integers(0, args.n, size=args.queries)
        queries = corpus[q_idx] + 0.05 * rng.normal(
            size=(args.queries, args.dim)
        ).astype(np.float32)

    label = args.label or f"{args.corpus}-{args.storage}-{args.precision}-{args.rescore}"
    row = run_one(corpus, queries, args.k, args.storage, args.precision, label,
                  rescore=args.rescore, query_block=args.query_block)

    out_f = os.path.join(REPO, "BENCH_SEARCH.json")
    rows = []
    if os.path.exists(out_f):
        with open(out_f) as f:
            prev = json.load(f)
        rows = prev if isinstance(prev, list) else [prev]
    rows = [r for r in rows if r.get("label") != label] + [row]
    with open(out_f, "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
