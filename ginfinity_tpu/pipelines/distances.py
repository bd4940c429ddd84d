"""``ginfinity-compute-distances`` — pairwise squared-Euclidean distances.

Reference CLI parity: src/ginfinity/scripts/compute_distances.py (same
flags, same output schema: kept columns suffixed _1/_2 plus a
``distance`` column of **squared** Euclidean distances,
compute_distances.py:63).  The pair loop is replaced by tiled device
compute: ||a||^2 + ||b||^2 - 2ab' Gram tiles on the accelerator.

For large-scale retrieval use :mod:`ginfinity_tpu.parallel.search`
(sharded top-k) instead of materializing all O(n^2) pairs.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


def parse_embedding_column(series: pd.Series) -> np.ndarray:
    return np.stack(
        [np.array(s.split(","), dtype=np.float32) for s in series]
    )


@jax.jit
def _sq_dists_pairs(emb: jnp.ndarray, i1: jnp.ndarray, i2: jnp.ndarray) -> jnp.ndarray:
    """Squared euclid for index pairs (gather fused into one program)."""
    d = emb[i1] - emb[i2]
    return jnp.sum(d * d, axis=1)


def pair_distances(emb: np.ndarray, idx1: np.ndarray, idx2: np.ndarray,
                   batch: int = 262144) -> np.ndarray:
    """Distances for explicit index pairs, batched on device.

    Index batches are padded to the block size so every chunk reuses one
    compiled program."""
    n_pairs = idx1.shape[0]
    batch = min(batch, max(1, n_pairs))
    out = np.empty(n_pairs, np.float32)
    dev = jnp.asarray(emb)
    for s in range(0, n_pairs, batch):
        i1 = idx1[s : s + batch]
        i2 = idx2[s : s + batch]
        pad = batch - i1.shape[0]
        if pad:
            i1 = np.concatenate([i1, np.zeros(pad, i1.dtype)])
            i2 = np.concatenate([i2, np.zeros(pad, i2.dtype)])
        d = np.asarray(_sq_dists_pairs(dev, jnp.asarray(i1), jnp.asarray(i2)))
        out[s : s + batch] = d[: batch - pad] if pad else d
    return out


def all_pairs_indices(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Upper-triangular (i < j) index pairs, in combinations() order."""
    iu = np.triu_indices(n, k=1)
    return iu[0].astype(np.int64), iu[1].astype(np.int64)


def main(argv=None):
    from ginfinity_tpu.utils.jaxinit import start_backend_warmup

    parser = argparse.ArgumentParser(
        description="Compute squared Euclidean distances between rows' embedding vectors."
    )
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--embedding-col", default="embedding_vector")
    parser.add_argument("--keep-cols", default=None)
    parser.add_argument("--num-workers", type=int, default=1,
                        help="Reference CLI compatibility (compute is on-device).")
    parser.add_argument("--device", default=None,
                        help="Reference CLI compatibility; JAX selects the accelerator.")
    parser.add_argument("--batch-size", type=int, default=262144,
                        help="Pairs per device batch.")
    parser.add_argument("--mode", type=int, default=1, choices=[1, 2])
    parser.add_argument("--id-column", default="exon_id")
    parser.add_argument("--query")
    parser.add_argument("--top-k", type=int, default=None,
                        help="Emit only each row's K nearest neighbours "
                             "(exact sharded top-k search) instead of "
                             "materializing every pair — the scalable "
                             "retrieval mode the reference lacks.")
    args = parser.parse_args(argv)
    # AFTER argparse (so --help/usage errors never touch the
    # device); overlaps remote-TPU bring-up with input parsing
    start_backend_warmup()

    if not args.keep_cols:
        args.keep_cols = args.id_column

    df = pd.read_csv(args.input, sep="\t")
    columns_to_keep = [c.strip() for c in args.keep_cols.split(",")]
    missing = [c for c in columns_to_keep if c not in df.columns]
    if missing:
        raise ValueError(f"Missing columns in input: {', '.join(missing)}")

    emb = parse_embedding_column(df[args.embedding_col])

    n = len(df)
    if args.mode == 2:
        if not args.query:
            raise ValueError("--query must be provided when --mode=2.")
        mask_q = df[args.id_column].astype(str) == str(args.query)
        idx_q = np.nonzero(mask_q.values)[0]
        if idx_q.size == 0:
            raise ValueError(f"No rows where {args.id_column} == {args.query}")
        idx_o = np.nonzero(~mask_q.values)[0]

    if args.top_k is not None:
        if args.top_k < 1:
            raise ValueError("--top-k must be >= 1.")
        from ginfinity_tpu.parallel.search import TopKSearcher

        if args.mode == 1:
            # k+1 then drop the self match
            searcher = TopKSearcher(emb, metric="sqeuclidean")
            d, ids = searcher.search(emb, min(args.top_k + 1, n))
            queries = np.arange(n)
            remap = None
        else:
            if idx_o.size == 0:
                raise ValueError("No non-query rows to search against.")
            searcher = TopKSearcher(emb[idx_o], metric="sqeuclidean")
            d, ids = searcher.search(emb[idx_q], min(args.top_k, idx_o.size))
            queries = idx_q
            remap = idx_o
        l1, l2, dist = [], [], []
        for r, qi in enumerate(queries):
            kept = 0
            for dv, ci in zip(d[r], ids[r]):
                ci = int(ci) if remap is None else int(remap[int(ci)])
                if ci == qi:
                    continue
                l1.append(int(qi))
                l2.append(ci)
                dist.append(float(dv))
                kept += 1
                if kept == args.top_k:
                    break
        idx1 = np.asarray(l1, np.int64)
        idx2 = np.asarray(l2, np.int64)
        distances = np.asarray(dist, np.float32)
    else:
        if args.mode == 1:
            idx1, idx2 = all_pairs_indices(n)
        else:
            idx1 = np.repeat(idx_q, idx_o.size)
            idx2 = np.tile(idx_o, idx_q.size)
        distances = pair_distances(emb, idx1, idx2, batch=args.batch_size)

    rows1 = df.iloc[idx1][columns_to_keep].add_suffix("_1").reset_index(drop=True)
    rows2 = df.iloc[idx2][columns_to_keep].add_suffix("_2").reset_index(drop=True)
    out_df = pd.concat([rows1, rows2], axis=1)
    out_df["distance"] = distances
    out_df.to_csv(args.output, sep="\t", index=False)
    print(f"Finished processing {len(idx1)} pairs. Output written to {args.output}")


if __name__ == "__main__":
    main()
