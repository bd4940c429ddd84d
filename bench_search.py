"""Secondary benchmark: sharded top-k retrieval (recall@10 + queries/sec).

Not the driver's headline metric (bench.py prints that single line);
this records the search-engine numbers behind the BASELINE.json north
star ("top-k queries/sec >= 10x CPU; recall@10 parity with brute force").
Writes BENCH_SEARCH.json and prints a summary.

Corpus: synthetic window embeddings (the scale knob is --n); queries are
corpus rows with noise.  Baseline: single-thread numpy brute force (the
reference never computes top-k at all — it materializes all O(n^2) pairs
to TSV, SURVEY.md §3.3 — so brute force is the generous stand-in).
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000, help="corpus rows")
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(args.n, args.dim)).astype(np.float32)
    q_idx = rng.integers(0, args.n, size=args.queries)
    queries = corpus[q_idx] + 0.05 * rng.normal(size=(args.queries, args.dim)).astype(np.float32)

    from ginfinity_tpu.parallel.search import TopKSearcher, brute_force_topk, recall_at_k

    searcher = TopKSearcher(corpus, metric="sqeuclidean", query_block=1024)
    searcher.search(queries[:1024], args.k)  # warm-up/compile
    t0 = time.perf_counter()
    dists, ids = searcher.search(queries, args.k)
    dt = time.perf_counter() - t0
    qps = args.queries / dt

    # brute-force ground truth on a subset (full corpus, subset of queries)
    nq_check = min(256, args.queries)
    t0 = time.perf_counter()
    tv, ti = brute_force_topk(corpus, queries[:nq_check], args.k)
    bf_dt = time.perf_counter() - t0
    bf_qps = nq_check / bf_dt
    recall = recall_at_k(ids[:nq_check], ti)

    result = {
        "corpus_rows": args.n,
        "dim": args.dim,
        "k": args.k,
        "recall_at_k_vs_brute_force": recall,
        "topk_queries_per_sec": round(qps, 1),
        "numpy_brute_force_queries_per_sec": round(bf_qps, 1),
        "speedup": round(qps / bf_qps, 1),
    }
    with open("BENCH_SEARCH.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
