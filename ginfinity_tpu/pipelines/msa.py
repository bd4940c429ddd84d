"""``ginfinity-embed-msa`` — embedding-based multiple sequence alignment.

Reference CLI parity: src/ginfinity/scripts/embed_msa.py (T-Coffee /
ProbCons-style pipeline; same stages, flags, and output files):

1. load TSV, L2-normalize per-position embeddings, optional center trim
2. pair selection (all pairs, kNN on mean embeddings when > --max-pairs)
3. cosine -> calibrated log-odds ``logit(sigmoid(alpha*s + beta))``
4. pair-HMM forward/backward -> match posteriors
   (**batched device wavefronts** — ginfinity_tpu.ops.pairhmm — replacing
   the numba kernels; see that module for the documented bug fix to the
   reference's degenerate forward/backward initialization)
5. top-K row/col-intersection sparsification with pmin
6. T-Coffee consistency transform on the MXU
   (P'_AB = (1-lam) P_AB + lam * mean_C P_AC @ P_CB, exactly equivalent
   to the reference's sparse dict triple products): the pairwise stage's
   row-top-k slabs stay DEVICE-RESIDENT end-to-end — small families run
   the dense one-einsum-per-round path, large ones the tiled sparse path
   (forward-only [P, L, K] slabs + signed slot map; no [N, N, L, L]
   tensor ever exists, so Rfam-scale families never fall back to the
   host loop)
7. guide tree (NJ / UPGMA) from 1 - mean(P) distances
8. progressive profile-profile alignment (device wavefront DP with
   ON-DEVICE value-based traceback — only op codes download; reference
   scoring: struct dot + 0.2 stem-compat bonus, optional dual modality)
9. iterative refinement — REAL split-and-realign keeping sum-of-pairs
   improvements (the reference's hook is an explicit no-op placeholder,
   embed_msa.py:1149-1164; this is a capability the reference lacks)
10. FASTA / Stockholm / TSV outputs + diagnostics JSON/heatmaps
"""

from __future__ import annotations

import argparse
import json
import os
import random
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

from ginfinity_tpu.utils.native import parse_float_matrix as native_parse_float_matrix


# ==========================================================================
# Records and I/O (embed_msa.py:82-312 semantics)
# ==========================================================================


@dataclass
class SequenceRecord:
    name: str
    emb: np.ndarray  # (L, D)
    dotbracket: Optional[str] = None
    paired_idx: Optional[list[int]] = None
    base_emb: Optional[np.ndarray] = None


def _json_loads_maybe(x):
    if isinstance(x, (list, dict)):
        return x
    if isinstance(x, str):
        x = x.strip()
        if not x:
            return None
        try:
            return json.loads(x)
        except Exception:
            return None
    return None


def _parse_matrix_cell(cell) -> Optional[np.ndarray]:
    """JSON matrix cell -> float32 [L, D], or None if malformed.

    Tries the native strtod scanner first (utils/native.py — the host
    TSV parse was ~25% of MSA wall-time at Rfam-family scale), falling
    back to json.loads for anything it rejects."""
    if isinstance(cell, str):
        fast = native_parse_float_matrix(cell)
        if fast is not None:
            return fast
    raw = _json_loads_maybe(cell)
    if raw is None:
        return None
    try:
        return np.array(raw, dtype=np.float32)
    except (ValueError, TypeError):
        return None


def _l2_normalize_rows(x: np.ndarray) -> np.ndarray:
    norms = np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-8)
    return (x / norms).astype(np.float32)


def _dotbracket_to_pairs(db: str) -> list[int]:
    L = len(db)
    pairs = [-1] * L
    stacks = {"(": [], "[": [], "{": []}
    mates = {")": "(", "]": "[", "}": "{"}
    for i, ch in enumerate(db):
        if ch in stacks:
            stacks[ch].append(i)
        elif ch in mates and stacks[mates[ch]]:
            j = stacks[mates[ch]].pop()
            pairs[i] = j
            pairs[j] = i
    return pairs


def _pairs_to_dotbracket(pairs: list[int]) -> str:
    return "".join(
        "." if j == -1 else ("(" if j > i else ")") for i, j in enumerate(pairs)
    )


def load_tsv(path, name_col, embeds_col, dotbracket_col=None, paired_col=None,
             base_embeds_col=None) -> list[SequenceRecord]:
    import pandas as pd

    try:
        # pyarrow's multithreaded reader is ~2x faster on the huge
        # JSON-matrix string column; fall back for anything it rejects.
        df = pd.read_csv(path, sep="\t", engine="pyarrow")
    except Exception:
        df = pd.read_csv(path, sep="\t")
    if name_col not in df.columns or embeds_col not in df.columns:
        raise ValueError(f"Missing required columns: {name_col}, {embeds_col}")
    records = []
    for idx, row in df.iterrows():
        name = str(row[name_col])
        emb = _parse_matrix_cell(row[embeds_col])
        if emb is None:
            print(f"[WARN] Row {idx} ('{name}') has invalid embeddings; skipping.")
            continue
        if emb.ndim != 2 or emb.shape[0] == 0:
            print(f"[WARN] Row {idx} ('{name}') embeddings malformed; skipping.")
            continue
        dotbracket = None
        paired_idx = None
        if paired_col and paired_col in df.columns:
            p = _json_loads_maybe(row[paired_col])
            if isinstance(p, list) and len(p) == emb.shape[0]:
                paired_idx = [int(v) for v in p]
        if paired_idx is None and dotbracket_col and dotbracket_col in df.columns:
            db = row[dotbracket_col]
            if isinstance(db, str) and len(db) == emb.shape[0]:
                dotbracket = db
                paired_idx = _dotbracket_to_pairs(db)
        base_arr = None
        if base_embeds_col and base_embeds_col in df.columns:
            base_arr = _parse_matrix_cell(row[base_embeds_col])
            if base_arr is not None:
                if base_arr.ndim != 2:
                    base_arr = None
                elif base_arr.shape[0] == emb.shape[0] + 2:
                    base_arr = base_arr[1:-1]
                elif base_arr.shape[0] != emb.shape[0]:
                    print(f"[WARN] Row {idx} ('{name}') base embeddings length mismatch; ignoring.")
                    base_arr = None
        records.append(SequenceRecord(name, emb, dotbracket, paired_idx, base_arr))
    return records


def apply_center_trim(records, fraction):
    trims = []
    for rec in records:
        L = rec.emb.shape[0]
        frac = max(0.0, min(1.0, fraction))
        keep = max(1, min(L, int(round(L * frac))))
        start = (L - keep) // 2
        end = min(L, start + keep)
        trims.append((start, end))
        if start <= 0 and end >= L:
            continue
        rec.emb = rec.emb[start:end].copy()
        if rec.base_emb is not None:
            rec.base_emb = rec.base_emb[start:end].copy()
        src = rec.paired_idx or (
            _dotbracket_to_pairs(rec.dotbracket) if rec.dotbracket else None
        )
        if src is not None:
            new_pairs = [
                -1 if (src[i] < start or src[i] >= end or src[i] < 0) else src[i] - start
                for i in range(start, end)
            ]
            rec.paired_idx = new_pairs
            rec.dotbracket = _pairs_to_dotbracket(new_pairs)
        elif rec.dotbracket is not None:
            rec.dotbracket = rec.dotbracket[start:end]
    return trims


# ==========================================================================
# Pair selection + calibration (embed_msa.py:319-371)
# ==========================================================================


def _pool_env_enabled() -> bool:
    """GINFINITY_MSA_POOL=0 disables EVERY device-resident merge/scoring
    path (level pools, fused fallback, device scorer, fused refinement)
    so runs can be cross-checked against the independent host
    implementations."""
    return os.environ.get("GINFINITY_MSA_POOL", "1") != "0"


def _profile_dp_exact_enabled() -> bool:
    """Reference-exact f32 profile DP (default ON).

    The reference's progressive DP runs in pure-Python float32
    (embed_msa.py:874-930 under its no-op njit shim); co-optimal profile
    paths at L~300 differ by less than any differently-ordered f32
    evaluation's noise, so only the reference's exact op order
    reproduces its merge paths — and its measured alignment quality
    (SP-F1 0.110-0.123 vs 0.094-0.112 for the exact-dot XLA-ordered
    kernel on N=50/L=300 shuffles; see ops/pairhmm.py).  Profile mode's
    claim is reference parity, so exact semantics are the default;
    GINFINITY_PROFILE_DP=fast opts into the MXU einsum kernel."""
    return os.environ.get("GINFINITY_PROFILE_DP", "exact") != "fast"


def pairwise_pairs_to_compute(records, max_pairs):
    N = len(records)
    pairs = [(i, j) for i in range(N) for j in range(i + 1, N)]
    if N <= 1:
        return []
    if max_pairs is None or max_pairs <= 0 or len(pairs) <= max_pairs:
        return pairs
    means = np.stack([
        r.emb.mean(axis=0) / (np.linalg.norm(r.emb.mean(axis=0)) + 1e-8) for r in records
    ]).astype(np.float32)
    sims = means @ means.T
    k = max(1, int(max_pairs / max(1, N)))
    nn_pairs = set()
    for i in range(N):
        order = np.argsort(-sims[i])
        c = 0
        for j in order:
            if j == i:
                continue
            nn_pairs.add((min(i, j), max(i, j)))
            c += 1
            if c >= k:
                break
    pairs = sorted(nn_pairs)
    return pairs[:max_pairs] if len(pairs) > max_pairs else pairs


def calibrate_log_odds(S, alpha, beta):
    X = alpha * S + beta
    p = np.clip(1.0 / (1.0 + np.exp(-X)), 1e-6, 1.0 - 1e-6)
    return (np.log(p) - np.log(1.0 - p)).astype(np.float32)


# ==========================================================================
# Sparsification (vectorized; embed_msa.py:524-562 semantics)
# ==========================================================================


def sparsify_topk_mask(P: np.ndarray, topk: int, pmin: float = 1e-4) -> np.ndarray:
    """Boolean keep-mask: entries in the row top-K AND column top-K with
    P >= pmin (the reference's row/col intersection rule)."""
    La, Lb = P.shape
    row_mask = np.zeros_like(P, dtype=bool)
    k = min(topk, Lb)
    idx = np.argpartition(-P, k - 1, axis=1)[:, :k]
    np.put_along_axis(row_mask, idx, True, axis=1)
    col_mask = np.zeros_like(P, dtype=bool)
    k = min(topk, La)
    idx = np.argpartition(-P, k - 1, axis=0)[:k, :]
    np.put_along_axis(col_mask, idx, True, axis=0)
    return row_mask & col_mask & (P >= pmin)


# ==========================================================================
# Consistency transform as dense masked matmuls (embed_msa.py:565-681)
# ==========================================================================


def consistency_round(post: dict, N: int, lam: float = 0.5, topk: int = 20,
                      pmin: float = 1e-4) -> dict:
    """One T-Coffee consistency round over the sparse-as-dense posterior
    dict — the host-resident fallback and the oracle for the
    device-resident path below.

    ``post[(a, b)]`` is the dense (already sparsified: zeros elsewhere)
    posterior matrix.  P'_AB = (1-lam) P_AB + lam * mean_C (P_AC @ P_CB),
    where the mean runs over intermediates C with BOTH (a, C) and (C, b)
    posteriors present; then row/col top-K + pmin sparsification.
    """
    lengths = {}
    for (a, b), P in post.items():
        lengths[a] = P.shape[0]
        lengths[b] = P.shape[1]
    if not lengths:
        return dict(post)

    def get(a, c):
        if (a, c) in post:
            return post[(a, c)]
        if (c, a) in post:
            return post[(c, a)].T
        return None

    out = {}
    for (a, b), Pab in post.items():
        acc = np.zeros_like(Pab)
        count = 0
        for c in range(N):
            if c in (a, b):
                continue
            AC = get(a, c)
            CB = get(c, b)
            if AC is None or CB is None:
                continue
            acc += AC @ CB
            count += 1
        newP = (1.0 - lam) * Pab + lam * (acc / max(1, count))
        keep = sparsify_topk_mask(newP, topk, pmin)
        out[(a, b)] = np.where(keep, newP, 0.0).astype(np.float32)
    return out


def _consistency_device_round_fn():
    """Build the jitted one-round transform over the stacked posterior
    tensor P [N, N, Lmax, Lmax] (P[b,a] = P[a,b].T, diagonal zero) and
    presence mask E [N, N].

    The whole round is ONE einsum on the MXU: acc[a,b] = sum_C
    P[a,C] @ P[C,b]; the zero diagonal removes C in {a, b}, and the
    zero blocks of missing pairs contribute nothing, so dividing by
    counts[a,b] = (E @ E)[a,b] reproduces the sparse-dict mean exactly.
    Sparsification uses per-row/per-column k-th-value thresholds (equal
    to the argpartition rule away from exact ties).
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("topk",))
    def round_fn(P, E, lam, topk, pmin):
        acc = jnp.einsum("acik,cbkj->abij", P, P,
                         preferred_element_type=jnp.float32)
        Ef = E.astype(jnp.float32)
        counts = Ef @ Ef  # diag(E) is False -> C in {a, b} never counted
        newP = (1.0 - lam) * P + lam * acc / jnp.maximum(counts, 1.0)[..., None, None]
        k = min(int(topk), P.shape[-1])
        row_kth = jax.lax.top_k(newP, k)[0][..., -1:]
        col_kth = jnp.swapaxes(
            jax.lax.top_k(jnp.swapaxes(newP, -1, -2), k)[0][..., -1:], -1, -2
        )
        keep = (newP >= row_kth) & (newP >= col_kth) & (newP >= pmin)
        return jnp.where(keep & E[..., None, None], newP, 0.0)

    return round_fn


# --------------------------------------------------------------------------
# Tiled sparse consistency: the device path past the dense-stack HBM cliff.
#
# The dense path stacks [N, N, Lmax, Lmax] — 28.8 GB at N=200, L=300 —
# so real Rfam-family workloads used to fall back to the O(N^3) host
# loop.  The posteriors are row/col top-K sparse, so here they live on
# device as row-compacted [N, N, Lmax, K] (values + col indices, both
# directions), ~1.9 GB at the same scale.  One round processes pair
# tiles: per pair, a lax.scan over intermediate-C chunks densifies the
# two [TC, L, K] operand slabs into [TC, L, L] scratch (VMEM-sized),
# accumulates the MXU einsum, then re-sparsifies the updated pair to
# row top-K — exactly the dense transform away from exact ties
# (embed_msa.py:565-681 semantics).
# --------------------------------------------------------------------------

_TILE_TC = 8  # intermediate sequences per scratch slab
_TILE_TP = 8  # pairs per scatter tile
_MAX_PAIRS_PER_CALL = 2048  # per-device-call bound (multiple of _TILE_TP)


def _pack_sparse_posteriors(post: dict, N: int, Lmax: int, k: int,
                            TC: int, TP: int):
    """Compact slot form: the device never holds an [N, N, ...] posterior
    tensor — only one FORWARD row-top-k slab per pair plus a SIGNED
    [Np, Np] int32 slot map: M[a, b] = t+1 and M[b, a] = -(t+1) for
    pairs[t] = (a, b); 0 = absent (the zero diagonal also excludes C in
    {a, b}).  Reverse reads densify the same slab TRANSPOSED — an exact
    transpose (the previous column-top-k reverse slabs could drop ties),
    and it halves slab memory, transfers, and re-sparsify work.

    Returns (pairs, Cv [P, Lmax, k] f32, Ci [P, Lmax, k] i32, M)."""
    from ginfinity_tpu.ops.library_pool import _ladder_capacity, _member_capacity

    Np = _member_capacity(N)
    pairs = sorted(post.keys())
    P_pad = _ladder_capacity(max(len(pairs), 1))
    Cv = np.zeros((P_pad, Lmax, k), np.float32)
    Ci = np.zeros((P_pad, Lmax, k), np.int32)
    M = np.zeros((Np, Np), np.int32)
    for t, (a, b) in enumerate(pairs):
        Pm = post[(a, b)]
        rows, cols = Pm.shape
        kk = min(k, cols)
        idx = np.argpartition(-Pm, kk - 1, axis=1)[:, :kk]
        Cv[t, :rows, :kk] = np.take_along_axis(Pm, idx, axis=1)
        Ci[t, :rows, :kk] = idx
        M[a, b] = t + 1
        M[b, a] = -(t + 1)
    return pairs, Cv, Ci, M


def _make_consistency_round(Lmax: int, k: int, TC: int, TP: int, mesh,
                            make_dense):
    """Shared body of one consistency round (tiled and memoized
    variants differ ONLY in how a signed slot densifies to an [L, L]
    posterior block — ``make_dense(Cv, Ci) -> (dense1, denseV)``
    returning the scalar-slot and [TC]-vector-slot forms).

    The intermediate axis is TRIPLE-COMPACTED on the host: each pair
    row carries only the signed slots of its PRESENT intermediates
    (``sacs``/``scbs`` [n_pairs, Cmax], zero-padded) instead of the
    device scanning every C against an [N, N] slot map.  Device work is
    therefore proportional to the true (a, C, b) triple count — for
    kNN-capped libraries most C are absent for any given pair — and no
    slot map enters the program (shapes depend only on the pair-axis
    bucket and Cmax, both padded to capacity ladders).

    With ``mesh``, the pair block axis (descriptors and the output
    slabs) shards over the mesh's 'data' axis while the slab arrays
    replicate — every pair's update reads arbitrary other pairs' slabs,
    so the read side stays replicated and only the embarrassingly-
    parallel write side shards (no collectives)."""
    import jax
    import jax.numpy as jnp

    f32 = jnp.float32

    def round_fn(Cv, Ci, sab, sacs, scbs, pvalid, lam, pmin):
        Cmax = sacs.shape[1]
        nC = Cmax // TC
        dense1, denseV = make_dense(Cv, Ci)

        def one_pair(slot_ab, sac_row, scb_row, valid):
            Pab = dense1(slot_ab)

            def cstep(carry, xs):
                acc, cnt = carry
                sac, scb = xs  # [TC] signed slots, 0 = padding
                m = ((sac != 0) & (scb != 0)).astype(f32)
                A = denseV(sac) * m[:, None, None]
                B = denseV(scb)
                acc = acc + jnp.einsum(
                    "cik,ckj->ij", A, B,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=f32,
                )
                return (acc, cnt + m.sum()), None

            (acc, cnt), _ = jax.lax.scan(
                cstep,
                (jnp.zeros((Lmax, Lmax), f32), jnp.float32(0.0)),
                (sac_row.reshape(nC, TC), scb_row.reshape(nC, TC)),
            )
            newP = (1.0 - lam) * Pab + lam * acc / jnp.maximum(cnt, 1.0)
            row_kth = jax.lax.top_k(newP, k)[0][:, -1:]
            col_kth = jax.lax.top_k(newP.T, k)[0][:, -1:]
            keep = (newP >= row_kth) & (newP >= col_kth.T) & (newP >= pmin)
            masked = jnp.where(keep, newP, 0.0) * valid
            vab, iab = jax.lax.top_k(masked, k)
            return vab, iab.astype(jnp.int32)

        one_pair_v = jax.vmap(one_pair)

        def tile_compute(args):
            tab, tac, tcb, tv = args  # [TP], [TP, Cmax] x2, [TP]
            return one_pair_v(tab, tac, tcb, tv)

        # lax.map over the (shardable) pair-tile axis: stacked outputs,
        # no multi-GB carry to copy per step; mapping the reshaped
        # descriptor arrays directly (rather than an arange + gather)
        # lets SPMD partition the loop across the mesh
        n_pairs = sab.shape[0]
        vab, iab = jax.lax.map(
            tile_compute,
            (sab.reshape(-1, TP), sacs.reshape(-1, TP, Cmax),
             scbs.reshape(-1, TP, Cmax), pvalid.reshape(-1, TP)),
        )
        # padding pairs (valid = 0) produce all-zero slots — harmless
        return (
            vab.reshape(n_pairs, Lmax, k),
            iab.reshape(n_pairs, Lmax, k),
        )

    if mesh is None:
        return jax.jit(round_fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P("data"))
    return jax.jit(
        round_fn,
        in_shardings=(repl, repl, rows, rows, rows, rows, repl, repl),
        out_shardings=(rows, rows),
    )


def _tiled_consistency_round_fn(Lmax: int, k: int, TC: int, TP: int,
                                mesh=None):
    """One tiled consistency round, jitted: every operand slab
    densifies on demand per (a, b, C) triple — no resident block array,
    so arbitrarily large libraries fit."""
    import jax
    import jax.numpy as jnp

    f32 = jnp.float32

    def make_dense(Cv, Ci):
        rows = jnp.broadcast_to(jnp.arange(Lmax)[:, None], (Lmax, k))

        def densify_dir(slot):
            # signed slot: +t -> slab t-1 as-is; -t -> its EXACT
            # transpose (transposed scatter); 0 -> zero block
            sidx = jnp.maximum(jnp.abs(slot) - 1, 0)
            v = Cv[sidx] * (slot != 0).astype(f32)
            i = Ci[sidx]
            fwd = slot > 0
            r_idx = jnp.where(fwd, rows, i)
            c_idx = jnp.where(fwd, i, rows)
            return jnp.zeros((Lmax, Lmax), f32).at[r_idx, c_idx].add(v)

        return densify_dir, jax.vmap(densify_dir)

    return _make_consistency_round(Lmax, k, TC, TP, mesh, make_dense)


def _memo_consistency_round_fn(Lmax: int, k: int, TC: int, TP: int,
                               n_slabs: int, mesh=None):
    """One consistency round with MEMOIZED densification.

    The tiled round re-densifies each operand slab for every (a, b, C)
    triple — 2 * P * N scatter-built [L, L] scratch blocks per round,
    and those scatters (not the MXU einsum, ~2% of the time) dominated
    the consistency stage.  Here every present pair densifies ONCE per
    round into a [2P+1, L, L] block array (forward + exact transpose +
    a zero block for absent slots) — ~1.2 GB at the 200-seq/L=320
    scale, affordable precisely because only PRESENT pairs are stored
    (the round-2 dense path's [N, N, L, L] stack was 28.8 GB) — and the
    triple product just gathers dense blocks.  Semantics identical to
    the tiled round (same einsum, same re-sparsify — the shared body in
    ``_make_consistency_round``).

    Callers pick this variant when the block array fits the memory
    budget (``_memo_consistency_bytes``), else fall back to the tiled
    round."""
    import jax
    import jax.numpy as jnp

    f32 = jnp.float32

    def make_dense(Cv, Ci):
        rows = jnp.broadcast_to(jnp.arange(Lmax)[:, None], (Lmax, k))

        def densify(v, i):
            return jnp.zeros((Lmax, Lmax), f32).at[rows, i].add(v)

        Pd_f = jax.vmap(densify)(Cv[:n_slabs], Ci[:n_slabs])
        Pd = jnp.concatenate([
            jnp.zeros((1, Lmax, Lmax), f32),      # absent slot -> 0
            Pd_f,                                  # slot +t -> index t
            jnp.transpose(Pd_f, (0, 2, 1)),        # slot -t -> index P+t
        ])

        def slot_idx(slot):
            return jnp.where(slot >= 0, slot, n_slabs - slot)

        dense = lambda slot: Pd[slot_idx(slot)]  # noqa: E731
        return dense, dense

    return _make_consistency_round(Lmax, k, TC, TP, mesh, make_dense)


def _memo_consistency_bytes(n_slabs: int, Lmax: int) -> int:
    return (2 * n_slabs + 1) * Lmax * Lmax * 4


# The memoized round keeps a [2P+1, L, L] f32 block array resident;
# above this budget fall back to the tiled round (override via env for
# bigger-HBM parts).
_MEMO_BUDGET_BYTES = int(
    os.environ.get("GINFINITY_MSA_DENSE_BUDGET_MB", "6144")
) << 20


def _consistency_rounds_on_slabs(Cv_d, Ci_d, pairs, N, rounds, lam, pmin,
                                 Lmax, k, mesh=None):
    """Core round loop over device-resident forward slabs [P_pad, Lmax, k]."""
    import jax.numpy as jnp

    from ginfinity_tpu.ops.pairhmm import _pow2_batch

    TC, TP = _TILE_TC, _TILE_TP
    n_pairs = Cv_d.shape[0]
    # mesh mode: every block's pair axis must divide by TP * mesh size
    tile_mult = TP * (mesh.devices.size if mesh is not None else 1)
    T_real = len(pairs)
    # host-only signed slot map (never uploaded): M[a, b] = t+1 and
    # M[b, a] = -(t+1) for pairs[t] = (a, b); the zero diagonal also
    # excludes C in {a, b}
    M = np.zeros((N, N), np.int32)
    pa = np.zeros(T_real, np.int32)
    pb = np.zeros(T_real, np.int32)
    pvalid = np.zeros(n_pairs, np.float32)
    for t, (a, b) in enumerate(pairs):
        M[a, b] = t + 1
        M[b, a] = -(t + 1)
        pa[t], pb[t], pvalid[t] = a, b, 1.0
    # triple compaction: each pair row carries only its PRESENT
    # intermediates' signed slots, padded to a pow2 Cmax bucket
    present = M != 0
    validC = present[pa] & present[:, pb].T if T_real else np.zeros((0, N), bool)
    Cmax = _pow2_batch(max(TC, int(validC.sum(1).max()) if T_real else TC))
    sab = np.zeros(n_pairs, np.int32)
    sab[:T_real] = np.arange(1, T_real + 1)
    sacs = np.zeros((n_pairs, Cmax), np.int32)
    scbs = np.zeros((n_pairs, Cmax), np.int32)
    for t in range(T_real):
        cs = np.nonzero(validC[t])[0]
        sacs[t, : cs.size] = M[pa[t], cs]
        scbs[t, : cs.size] = M[cs, pb[t]]
    if _memo_consistency_bytes(n_pairs, Lmax) <= _MEMO_BUDGET_BYTES:
        round_fn = _memo_consistency_round_fn(
            Lmax, k, TC, TP, Cv_d.shape[0], mesh=mesh
        )
    else:
        round_fn = _tiled_consistency_round_fn(Lmax, k, TC, TP, mesh=mesh)

    # Bound the per-call program size: one huge lax.map over thousands of
    # pairs crashes the remote TPU worker; blocks of <= _MAX_PAIRS_PER_CALL
    # pairs (all padded to one size -> one compiled program) are robust
    # and equivalent (each round reads only the previous round's slabs).
    block = max(tile_mult, _MAX_PAIRS_PER_CALL // tile_mult * tile_mult)
    if n_pairs <= block:
        blen = -(-n_pairs // tile_mult) * tile_mult
        starts = [0]
    else:
        blen = block
        starts = list(range(0, n_pairs, block))
    blocks = []
    for s in starts:
        e = min(n_pairs, s + blen)
        bs_ab = np.zeros(blen, np.int32)
        bs_ac = np.zeros((blen, Cmax), np.int32)
        bs_cb = np.zeros((blen, Cmax), np.int32)
        bv = np.zeros(blen, np.float32)
        bs_ab[: e - s] = sab[s:e]
        bs_ac[: e - s] = sacs[s:e]
        bs_cb[: e - s] = scbs[s:e]
        bv[: e - s] = pvalid[s:e]
        blocks.append((jnp.asarray(bs_ab), jnp.asarray(bs_ac),
                       jnp.asarray(bs_cb), jnp.asarray(bv)))
    lam_d, pmin_d = jnp.float32(lam), jnp.float32(pmin)
    for _ in range(rounds):
        outs = [
            round_fn(Cv_d, Ci_d, b_ab, b_ac, b_cb, bv, lam_d, pmin_d)
            for b_ab, b_ac, b_cb, bv in blocks
        ]
        # keep the slab count stable across rounds: mesh padding may
        # make the descriptor arrays (and thus outputs) longer than the
        # slab arrays; tail rows are zero-valid padding either way
        if len(outs) == 1:
            Cv_d, Ci_d = outs[0]
            if Cv_d.shape[0] != n_pairs:
                Cv_d, Ci_d = Cv_d[:n_pairs], Ci_d[:n_pairs]
        else:
            Cv_d = jnp.concatenate([o[0] for o in outs])[:n_pairs]
            Ci_d = jnp.concatenate([o[1] for o in outs])[:n_pairs]
    return Cv_d, Ci_d


def _run_consistency_tiled(post, N, rounds, lam, topk, pmin, Lmax):
    """Run all rounds on the compact sparse device representation;
    returns (pairs, Cv_dev [P, Lmax, k] forward slabs, Ci_dev)."""
    import jax.numpy as jnp

    k = min(int(topk), Lmax)
    TC, TP = _TILE_TC, _TILE_TP
    pairs, Cv, Ci, M = _pack_sparse_posteriors(post, N, Lmax, k, TC, TP)

    def upload_chunked(x, budget=96 << 20):
        # remote-TPU transports cap single-transfer sizes; slice big
        # uploads along the slot axis and concatenate on device
        if x.nbytes <= budget:
            return jnp.asarray(x)
        step = max(1, budget // max(1, x[0].nbytes))
        return jnp.concatenate(
            [jnp.asarray(x[s : s + step]) for s in range(0, x.shape[0], step)]
        )

    Cv_d = upload_chunked(Cv)
    if Lmax < 32768:  # transfer indices at half width; cast on device
        Ci_d = upload_chunked(Ci.astype(np.int16)).astype(jnp.int32)
    else:
        Ci_d = upload_chunked(Ci)
    Cv_d, Ci_d = _consistency_rounds_on_slabs(
        Cv_d, Ci_d, pairs, N, rounds, lam, pmin, Lmax, k
    )
    return pairs, Cv_d, Ci_d


def consistency_rounds_to_distances_from_slabs(
    kv_list, ki_list, pair_chunks, N, Lmax, k, rounds,
    lam: float = 0.5, pmin: float = 1e-4,
    return_slabs: bool = False, mesh=None,
):
    """Fully device-resident consistency + distances: consumes the
    pairwise stage's per-batch row-top-k slab arrays DIRECTLY (no
    posterior download and no re-upload — at max-pairs=2000, L=300 the
    old dict round-trip moved ~1.7 GB over the host link).

    kv_list/ki_list: per-batch device arrays [bs, Lmax, k] (forward
    slabs, batch-padded rows beyond len(chunk) ignored); pair_chunks:
    the (a, b) lists matching each batch."""
    import jax.numpy as jnp

    pairs = [pr for chunk in pair_chunks for pr in chunk]
    P = len(pairs)
    if P == 0:
        D0 = np.zeros((N, N), np.float32)
        return (D0, pairs, None, None) if return_slabs else D0
    from ginfinity_tpu.ops.library_pool import _ladder_capacity

    TP = _TILE_TP
    # quarter-step pair bucket (not pow2): the slab count enters every
    # round program's shape AND the memoized round's [2P+1, L, L] block
    # array — pow2 padding at all-pairs scale (4950 -> 8192) blew the
    # memo budget and forced the tiled fallback; the ladder caps waste
    # at 1/8 while still bounding the distinct-shape count
    P_pad = _ladder_capacity(P)
    kv_parts = [kv[: len(chunk)] for kv, chunk in zip(kv_list, pair_chunks)]
    ki_parts = [ki[: len(chunk)] for ki, chunk in zip(ki_list, pair_chunks)]
    if P_pad > P:
        kv_parts.append(jnp.zeros((P_pad - P, Lmax, k), jnp.float32))
        ki_parts.append(jnp.zeros((P_pad - P, Lmax, k), jnp.int32))
    Cv_d = jnp.concatenate(kv_parts)
    Ci_d = jnp.concatenate([p.astype(jnp.int32) for p in ki_parts])
    if rounds > 0:
        Cv_d, Ci_d = _consistency_rounds_on_slabs(
            Cv_d, Ci_d, pairs, N, rounds, lam, pmin, Lmax, k, mesh=mesh
        )
    sums = np.asarray(Cv_d.sum(axis=(-1, -2)))
    cnts = np.asarray((Cv_d > 0).sum(axis=(-1, -2)))
    D = np.zeros((N, N), np.float32)
    for t, (a, b) in enumerate(pairs):
        d = 1.0 - sums[t] / cnts[t] if cnts[t] > 0 else 1.0
        D[a, b] = D[b, a] = min(1.0, max(0.0, float(d)))
    if return_slabs:
        # library-mode progressive alignment consumes the transformed
        # posteriors — DEVICE refs: the library pool reads them in
        # place; the host scorer (fallback/refinement) downloads lazily
        # through PosteriorLibrary.by_pair
        return D, pairs, Cv_d[:P], Ci_d[:P]
    return D


def _sparse_bytes(n_pairs: int, Lmax: int, topk: int) -> int:
    # per pair: one forward slab (f32 values + i32 idx), old + new copies
    k = min(int(topk), Lmax)
    return n_pairs * Lmax * k * 8 * 2


def run_consistency_rounds(
    post: dict, N: int, rounds: int, lam: float = 0.5, topk: int = 20,
    pmin: float = 1e-4, hbm_budget_bytes: int = 4 << 30,
) -> dict:
    """All consistency rounds with the posteriors resident on device.

    Uploads the stacked [N, N, Lmax, Lmax] tensor once, runs every round
    as one einsum program, downloads the result once.  When the dense
    stack exceeds ``hbm_budget_bytes`` the tiled sparse path takes over
    (same transform, [N, N, Lmax, K] storage); only when even that
    exceeds the budget does it fall back to the per-pair host loop.
    """
    if rounds <= 0 or not post:
        return post
    lengths = np.zeros(N, np.int64)
    for (a, b), P in post.items():
        lengths[a] = P.shape[0]
        lengths[b] = P.shape[1]
    Lmax = int(lengths.max())
    if 2 * (N * N * Lmax * Lmax * 4) > hbm_budget_bytes:
        if _sparse_bytes(len(post), Lmax, topk) <= hbm_budget_bytes:
            pairs, Cv, Ci = _run_consistency_tiled(
                post, N, rounds, lam, topk, pmin, Lmax
            )
            Cv = np.asarray(Cv)
            if Lmax < 32768:  # download at half width too
                Ci = np.asarray(Ci.astype("int16")).astype(np.int32)
            else:
                Ci = np.asarray(Ci)
            out = {}
            for t, (a, b) in enumerate(pairs):
                la, lb = int(lengths[a]), int(lengths[b])
                P = np.zeros((la, lb), np.float32)
                rows = np.repeat(np.arange(la), Cv.shape[-1])
                cols = Ci[t, :la].ravel()
                vals = Cv[t, :la].ravel()
                nz = vals > 0
                P[rows[nz], cols[nz]] = vals[nz]
                out[(a, b)] = P
            return out
        out = post
        for _ in range(rounds):
            out = consistency_round(out, N, lam, topk, pmin)
        return out

    import jax.numpy as jnp

    Pstack = np.zeros((N, N, Lmax, Lmax), np.float32)
    E = np.zeros((N, N), bool)
    for (a, b), P in post.items():
        la, lb = P.shape
        Pstack[a, b, :la, :lb] = P
        Pstack[b, a, :lb, :la] = P.T
        E[a, b] = E[b, a] = True
    round_fn = _consistency_device_round_fn()
    Pdev = jnp.asarray(Pstack)
    Edev = jnp.asarray(E)
    for _ in range(rounds):
        Pdev = round_fn(Pdev, Edev, jnp.float32(lam), topk, jnp.float32(pmin))
    Pout = np.asarray(Pdev)
    return {
        (a, b): Pout[a, b, : lengths[a], : lengths[b]].copy()
        for (a, b) in post
    }


def consistency_rounds_to_distances(
    post: dict, N: int, rounds: int, lam: float = 0.5, topk: int = 20,
    pmin: float = 1e-4, hbm_budget_bytes: int = 4 << 30,
) -> np.ndarray:
    """Consistency rounds + guide-tree distance matrix fully on device.

    The posteriors are SPARSE (row/col top-K), so they upload as COO
    triplets and densify on device with one scatter; after the rounds
    only the [N, N] distance matrix comes back.  This is the path
    ``main`` uses: at N=50, Lmax=150 the dense [N, N, L, L] tensor is
    225 MB — ~90 s of round-trip on a ~15 MB/s host link — while the
    sparse triplets are a few MB and the actual compute is ~0.1 s per
    round on the MXU."""
    if not post:
        return np.zeros((N, N), np.float32)
    lengths = np.zeros(N, np.int64)
    for (a, b), P in post.items():
        lengths[a] = P.shape[0]
        lengths[b] = P.shape[1]
    Lmax = int(lengths.max())
    if rounds <= 0:
        return build_distance_matrix(post, N)
    if 2 * (N * N * Lmax * Lmax * 4) > hbm_budget_bytes:
        if _sparse_bytes(len(post), Lmax, topk) <= hbm_budget_bytes:
            pairs, Cv, _ = _run_consistency_tiled(
                post, N, rounds, lam, topk, pmin, Lmax
            )
            # only [P] per-slot reductions come back over the link
            sums = np.asarray(Cv.sum(axis=(-1, -2)))
            cnts = np.asarray((Cv > 0).sum(axis=(-1, -2)))
            D = np.zeros((N, N), np.float32)
            for t, (a, b) in enumerate(pairs):
                d = 1.0 - sums[t] / cnts[t] if cnts[t] > 0 else 1.0
                D[a, b] = D[b, a] = min(1.0, max(0.0, float(d)))
            return D
        out = post
        for _ in range(rounds):
            out = consistency_round(out, N, lam, topk, pmin)
        return build_distance_matrix(out, N)

    import jax.numpy as jnp

    flats, vals = [], []
    E = np.zeros((N, N), bool)
    for (a, b), P in post.items():
        ii, jj = np.nonzero(P)
        p = P[ii, jj]
        flats.append(((a * N + b) * Lmax + ii) * Lmax + jj)
        flats.append(((b * N + a) * Lmax + jj) * Lmax + ii)
        vals.append(p)
        vals.append(p)
        E[a, b] = E[b, a] = True
    flat = np.concatenate(flats).astype(np.int32)
    val = np.concatenate(vals).astype(np.float32)

    Pdev = (
        jnp.zeros(N * N * Lmax * Lmax, jnp.float32)
        .at[jnp.asarray(flat)]
        .set(jnp.asarray(val))
        .reshape(N, N, Lmax, Lmax)
    )
    Edev = jnp.asarray(E)
    round_fn = _consistency_device_round_fn()
    for _ in range(rounds):
        Pdev = round_fn(Pdev, Edev, jnp.float32(lam), topk, jnp.float32(pmin))
    sums = Pdev.sum(axis=(-1, -2))
    cnts = (Pdev > 0).sum(axis=(-1, -2))
    D = jnp.where(cnts > 0, 1.0 - sums / jnp.maximum(cnts, 1), 1.0)
    D = jnp.where(Edev, jnp.clip(D, 0.0, 1.0), 0.0)
    return np.asarray(D, np.float32)


def build_distance_matrix(post: dict, N: int) -> np.ndarray:
    """1 - mean(kept posteriors) as distance (embed_msa.py:684-693)."""
    D = np.zeros((N, N), dtype=np.float32)
    for (a, b), P in post.items():
        vals = P[P > 0]
        d = 1.0 if vals.size == 0 else 1.0 - float(vals.mean())
        D[a, b] = D[b, a] = min(1.0, max(0.0, d))
    return D


# ==========================================================================
# Guide tree (embed_msa.py:700-805 semantics)
# ==========================================================================


def build_guide_tree(D: np.ndarray, method: str = "nj"):
    """NJ / UPGMA guide tree in matrix form (no dicts, no Python double
    loops).  Cluster ids index one (2N-1)x(2N-1) working matrix; every
    merge is a vectorized row update plus a masked argmin.  Row-major
    argmin over the id-ordered matrix reproduces the canonical "first
    (a, b) in ascending-id order wins ties" selection.  Returns the
    nested-tuple topology the progressive aligner consumes
    (reference semantics: embed_msa.py:700-805)."""
    N = D.shape[0]
    if N == 1:
        return 0
    # Compact m x m working matrix in ascending-cluster-id order: leaves
    # start sorted, and every new cluster gets the largest id so far, so
    # appending its row/col at the END keeps the order — which makes the
    # row-major argmin reproduce the canonical "first (a, b) in
    # ascending-id order wins ties" selection.
    Wm = D.astype(np.float64).copy()
    np.fill_diagonal(Wm, 0.0)
    nodes: list = list(range(N))
    sizes = np.ones(N, np.float64)
    stop_at = 1 if method == "upgma" else 2
    while len(nodes) > stop_at:
        m = Wm.shape[0]
        if method == "upgma":
            Q = Wm.copy()
        else:
            rsum = Wm.sum(axis=1)  # d(i,i) = 0
            Q = (m - 2) * Wm - rsum[:, None] - rsum[None, :]
        Q[np.tril_indices(m)] = np.inf
        flat = int(np.argmin(Q))
        a, b = flat // m, flat % m  # a < b in id order
        dab = Wm[a, b]
        sa, sb = sizes[a], sizes[b]
        if method == "upgma":
            row = (Wm[a] * sa + Wm[b] * sb) / (sa + sb)
        else:
            row = (Wm[a] + Wm[b] - dab) / 2.0
        keep = np.ones(m, bool)
        keep[[a, b]] = False
        Wm = np.pad(Wm[np.ix_(keep, keep)], ((0, 1), (0, 1)))
        Wm[-1, :-1] = Wm[:-1, -1] = row[keep]
        nodes = [n for k, n in enumerate(nodes) if keep[k]] + [(nodes[a], nodes[b])]
        sizes = np.append(sizes[keep], sa + sb)
    return nodes[0] if method == "upgma" else (nodes[0], nodes[1])


# ==========================================================================
# Profiles + progressive alignment (embed_msa.py:812-1129 semantics)
# ==========================================================================


_GAP = np.uint8(ord("-"))


@dataclass
class Profile:
    mu_struct: np.ndarray  # (L, Ds), L2-normalized rows
    mu_base: Optional[np.ndarray]  # (L, Db) or None
    stem: np.ndarray  # (L,)
    member_indices: list[int]
    # per member: uint8 char codes per alignment column ('-' = gap);
    # kept as arrays so merges/extractions vectorize (the per-column
    # python loops dominated progressive-alignment host time at N=200)
    aligned_chars: dict[int, np.ndarray] = field(default_factory=dict)


def initial_profiles(records: list[SequenceRecord]) -> list[Profile]:
    base_dim = next((r.base_emb.shape[1] for r in records if r.base_emb is not None), 0)
    profiles = []
    for idx, r in enumerate(records):
        L = r.emb.shape[0]
        if isinstance(r.dotbracket, str) and len(r.dotbracket) == L:
            chars = np.frombuffer(r.dotbracket.encode("latin-1"), np.uint8).copy()
        elif isinstance(r.paired_idx, list) and len(r.paired_idx) == L:
            chars = np.frombuffer(
                _pairs_to_dotbracket(r.paired_idx).encode("latin-1"), np.uint8
            ).copy()
        else:
            chars = np.full(L, ord("X"), np.uint8)
        stem = np.array(
            [1.0 if (r.paired_idx and r.paired_idx[k] != -1) else 0.0 for k in range(L)],
            np.float32,
        )
        mu_base = None
        if base_dim > 0:
            mu_base = (
                r.base_emb.astype(np.float32)
                if r.base_emb is not None
                else np.zeros((L, base_dim), np.float32)
            )
        profiles.append(Profile(r.emb.astype(np.float32), mu_base, stem, [idx], {idx: chars}))
    return profiles


def _profile_score_matrix(A: Profile, B: Profile, seq_weight: float) -> np.ndarray:
    S = A.mu_struct @ B.mu_struct.T
    if seq_weight > 0.0 and A.mu_base is not None and B.mu_base is not None:
        S = (1.0 - seq_weight) * S + seq_weight * (A.mu_base @ B.mu_base.T)
    comp = np.where(
        (A.stem[:, None] >= 0.5) == (B.stem[None, :] >= 0.5), 0.2, 0.0
    ).astype(np.float32)
    return (S + comp).astype(np.float32)


class PosteriorLibrary:
    """Sparse (consistency-transformed) match posteriors for library-mode
    progressive alignment (``--dp-score library``).

    This is the T-Coffee/ProbCons-correct use of the library: the
    progressive DP scores column pairs by the mean posterior match
    probability between their member positions, instead of the
    reference's raw mean-embedding dot products (embed_msa.py:874-985,
    which uses the library only for the guide tree).  Storage is the
    row-top-k slab layout of the consistency engine: per pair (a, b) in
    FORWARD orientation, ``vals[i, t]`` is the posterior between a's
    position i and b's position ``idx[i, t]`` (zero entries unused).

    When constructed with ``device_slabs`` (the [T, Lcap, k] device
    arrays the consistency stage already holds), the host copy is
    downloaded LAZILY — the device-resident library pool
    (ops/library_pool.py) consumes the slabs in place, so the normal
    library-mode run never pays the slab download at all; only the
    host-scorer fallback and iterative refinement materialize it.
    """

    def __init__(self, pairs, vals, idx, lengths, device_slabs=None):
        self.pairs = list(pairs)
        self.lengths = lengths
        self.device_slabs = device_slabs
        self._vals = vals
        self._idx = idx
        self._by_pair: Optional[dict] = None
        self._pair_arrays = None  # device (pair_a, pair_b), built lazily

    @property
    def by_pair(self) -> dict:
        if self._by_pair is None:
            if self._vals is None:
                self._vals = np.asarray(self.device_slabs[0])
                self._idx = np.asarray(self.device_slabs[1])
            self._by_pair = {}
            for t, (a, b) in enumerate(self.pairs):
                la = self.lengths[a]
                self._by_pair[(a, b)] = (self._vals[t, :la], self._idx[t, :la])
        return self._by_pair

    def score_matrix(self, A: "Profile", B: "Profile") -> np.ndarray:
        """Library score matrix for merging profiles A and B.

        With device slabs resident, the scatter-accumulate runs on
        device (one [1, P, P] program reusing the library pool's
        accumulator — iterative refinement and the pool-overflow
        fallback both stay off the host scorer loop).  The host loop is
        the reference implementation and the parity oracle
        (tests/test_library_pool.py); GINFINITY_MSA_POOL=0 forces it so
        a suspected device-scatter bug can be cross-checked against a
        genuinely independent path."""
        if self.device_slabs is not None and _pool_env_enabled():
            return self._score_matrix_device(A, B)
        return self._score_matrix_host(A, B)

    def _accumulate_device(self, merges: list[tuple["Profile", "Profile"]]):
        """Scatter one LEVEL of merges' library scores on device.

        ``merges`` may be any set of (A, B) pairs with disjoint member
        sets (one tree level, or a single refinement realign).  Returns
        the UN-normalised [Bp, P, P] device accumulator plus the
        per-merge (La, Lb, denom) lists."""
        import jax.numpy as jnp

        from ginfinity_tpu.graphs.batching import _round_capacity
        from ginfinity_tpu.ops.library_pool import accumulate_pair_scores

        las = [A.mu_struct.shape[0] for A, _ in merges]
        lbs = [B.mu_struct.shape[0] for _, B in merges]
        denoms = [len(A.member_indices) * len(B.member_indices)
                  for A, B in merges]
        side_of = {}          # member -> (lane, 0=A/1=B)
        for lane, (A, B) in enumerate(merges):
            for x in A.member_indices:
                side_of[x] = (lane, 0)
            for y in B.member_indices:
                side_of[y] = (lane, 1)
        entries = []
        for t, (a, b) in enumerate(self.pairs):
            sa = side_of.get(a)
            sb = side_of.get(b)
            if sa is None or sb is None or sa[0] != sb[0] or sa[1] == sb[1]:
                continue
            # owner (slab row side) = a; flip when a sits in the B
            # child.  MUST stay in lockstep with the level-schedule
            # firing rule in library_pool.build_library_schedule (same
            # skip conditions, same flip convention) — the two paths are
            # asserted equivalent in tests/test_library_pool.py
            entries.append((sa[0], t, 1 if sa[1] == 1 else 0))
        Ls = int(self.device_slabs[0].shape[1])
        P = _round_capacity(max(max(las), max(lbs), Ls))
        n_seq = len(self.lengths)
        pos2col = np.tile(np.arange(P, dtype=np.int32), (n_seq, 1))
        for A, B in merges:
            for prof in (A, B):
                for x in prof.member_indices:
                    cols = _member_pos_to_col(prof.aligned_chars[x])
                    pos2col[x, : cols.size] = cols
        if self._pair_arrays is None:
            self._pair_arrays = (
                jnp.asarray(np.asarray([a for a, _ in self.pairs], np.int32)),
                jnp.asarray(np.asarray([b for _, b in self.pairs], np.int32)),
            )
        S = accumulate_pair_scores(
            self.device_slabs[0], self.device_slabs[1],
            self._pair_arrays[0], self._pair_arrays[1],
            jnp.asarray(pos2col), entries, P, n_lanes=len(merges),
        )
        return S, las, lbs, denoms

    def _score_matrix_device(self, A: "Profile",
                             B: "Profile") -> Optional[np.ndarray]:
        S, las, lbs, denoms = self._accumulate_device([(A, B)])
        return (
            np.asarray(S[0])[: las[0], : lbs[0]] / denoms[0]
        ).astype(np.float32)

    def merge_ops(self, A: "Profile", B: "Profile", gap_open, gap_extend):
        """Device-FUSED score + profile DP for one merge: the library
        scatter and the DP/traceback run back-to-back on device and only
        [2P] int8 op codes cross the link (vs score_matrix's [La, Lb]
        f32 download that profile_align_batch_ops then re-uploads).
        Used by iterative refinement; returns forward-order op codes, or
        None when no device slabs are resident or GINFINITY_MSA_POOL=0
        (host scorer + batched DP is the fallback)."""
        ops = self.merge_ops_level([(A, B)], gap_open, gap_extend)
        return None if ops is None else ops[0]

    def merge_ops_level(self, merges, gap_open, gap_extend):
        """Batched fused score+DP for one level of ready merges (the
        pool-overflow fallback in msa_from_tree): one accumulator
        program + one batched DP program per level, only op codes over
        the link.  Returns a list of forward-order op arrays aligned
        with ``merges``, or None when no device slabs are resident."""
        if self.device_slabs is None or not merges or not _pool_env_enabled():
            return None
        from ginfinity_tpu.ops.library_pool import merge_ops_from_scores

        S, las, lbs, denoms = self._accumulate_device(merges)
        B = len(merges)
        # pad the lane metadata to the accumulator's pow2 batch; padding
        # lanes DP over all-zero matrices and are dropped below
        Bp = S.shape[0]
        pad = Bp - B
        return merge_ops_from_scores(
            S, denoms + [1] * pad, las + [1] * pad, lbs + [1] * pad,
            gap_open, gap_extend,
        )[:B]

    def _score_matrix_host(self, A: "Profile", B: "Profile") -> np.ndarray:
        La = A.mu_struct.shape[0]
        Lb = B.mu_struct.shape[0]
        flat = np.zeros(La * Lb, np.float64)
        pos_a = {x: _member_pos_to_col(A.aligned_chars[x]) for x in A.member_indices}
        pos_b = {y: _member_pos_to_col(B.aligned_chars[y]) for y in B.member_indices}
        for x in A.member_indices:
            for y in B.member_indices:
                # slab entry (p, t): posterior v[p, t] between the slab
                # owner's position p and the partner's position i[p, t]
                if pos_a[x].size == 0 or pos_b[y].size == 0:
                    continue
                fwd = self.by_pair.get((x, y))
                if fwd is not None:
                    v, i = fwd  # owner = x
                    rows = np.repeat(pos_a[x], v.shape[1])
                    # clip before the fancy gather; zero-val padding rows
                    # may hold garbage indices and are masked out below
                    cols = pos_b[y][np.minimum(i.ravel(), pos_b[y].size - 1)]
                else:
                    rev = self.by_pair.get((y, x))
                    if rev is None:
                        continue  # pair outside the (kNN-capped) library
                    v, i = rev  # owner = y
                    rows = pos_a[x][np.minimum(i.ravel(), pos_a[x].size - 1)]
                    cols = np.repeat(pos_b[y], v.shape[1])
                vv = v.ravel()
                nz = vv > 0
                flat += np.bincount(
                    rows[nz] * Lb + cols[nz], weights=vv[nz], minlength=La * Lb
                )
        denom = len(A.member_indices) * len(B.member_indices)
        return (flat / denom).reshape(La, Lb).astype(np.float32)


def _member_pos_to_col(chars: np.ndarray) -> np.ndarray:
    """For one member's aligned char row: original position -> profile
    column index."""
    return np.nonzero(chars != _GAP)[0]


def merge_profiles(A: Profile, B: Profile, gap_open, gap_extend, seq_weight=0.0) -> Profile:
    if _profile_dp_exact_enabled():
        from ginfinity_tpu.ops.pairhmm import profile_align_batch_ops_exact

        ops = profile_align_batch_ops_exact(
            [(A.mu_struct, B.mu_struct)], [(A.stem, B.stem)],
            gap_open, gap_extend,
            base_pairs=[(A.mu_base, B.mu_base)], seq_weight=seq_weight,
        )[0]
    else:
        from ginfinity_tpu.ops.pairhmm import profile_align_batch_ops

        ops = profile_align_batch_ops(
            [_profile_score_matrix(A, B, seq_weight)], gap_open, gap_extend
        )[0]
    return _merge_from_ops(A, B, ops)


def _merge_from_dp(A: Profile, B: Profile, M, X, Y) -> Profile:
    La, Lb = A.mu_struct.shape[0], B.mu_struct.shape[0]
    # reference value-based traceback (embed_msa.py:1042-1054); the hot
    # path computes these ops ON DEVICE (pairhmm._profile_ops) — this
    # host version is the oracle it is tested against
    i, j = La, Lb
    ops = []  # 0 match, 1 gap-in-B, 2 gap-in-A
    while i > 0 or j > 0:
        cur_state, cur_val = 0, -1e30
        if i > 0 and j > 0 and M[i, j] > cur_val:
            cur_val, cur_state = M[i, j], 0
        if i > 0 and X[i, j] > cur_val:
            cur_val, cur_state = X[i, j], 1
        if j > 0 and Y[i, j] > cur_val:
            cur_val, cur_state = Y[i, j], 2
        ops.append(cur_state)
        if cur_state == 0:
            i -= 1
            j -= 1
        elif cur_state == 1:
            i -= 1
        else:
            j -= 1
    ops.reverse()
    return _merge_from_ops(A, B, ops)


def _merge_from_ops(A: Profile, B: Profile, ops) -> Profile:
    # build merged columns (vectorized: per-column python loops over
    # members x columns dominated host time at family scale)
    op = np.asarray(ops, np.int8)  # 0 match, 1 gap-in-B, 2 gap-in-A
    base_dim = 0
    if A.mu_base is not None:
        base_dim = A.mu_base.shape[1]
    elif B.mu_base is not None:
        base_dim = B.mu_base.shape[1]
    takes_a = op != 2
    takes_b = op != 1
    match = op == 0
    ia_c = np.where(takes_a, np.cumsum(takes_a) - 1, 0)
    jb_c = np.where(takes_b, np.cumsum(takes_b) - 1, 0)
    ta = takes_a[:, None].astype(np.float32)
    tb = takes_b[:, None].astype(np.float32)

    summed = A.mu_struct[ia_c] * ta + B.mu_struct[jb_c] * tb
    normed = summed / (np.linalg.norm(summed, axis=1, keepdims=True) + 1e-8)
    mu_s = np.where(match[:, None], normed, summed).astype(np.float32)
    mu_b = None
    if base_dim:
        sb = np.zeros((op.size, base_dim), np.float32)
        if A.mu_base is not None:
            sb += A.mu_base[ia_c] * ta
        if B.mu_base is not None:
            sb += B.mu_base[jb_c] * tb
        nb = sb / (np.linalg.norm(sb, axis=1, keepdims=True) + 1e-8)
        mu_b = np.where(match[:, None], nb, sb).astype(np.float32)
    stem = (
        (A.stem[ia_c] * takes_a + B.stem[jb_c] * takes_b)
        / np.maximum(takes_a.astype(np.float32) + takes_b, 1.0)
    ).astype(np.float32)

    members = A.member_indices + B.member_indices
    aligned = {}
    for idx in A.member_indices:
        aligned[idx] = np.where(takes_a, A.aligned_chars[idx][ia_c], _GAP)
    for idx in B.member_indices:
        aligned[idx] = np.where(takes_b, B.aligned_chars[idx][jb_c], _GAP)
    return Profile(mu_s, mu_b, stem, members, aligned)


def _build_levels(internals):
    """Readiness-levelize the internal nodes: list of lists of nodes."""
    levels = []
    resolved_ids: set[int] = set()

    def ready(n):
        def ok(c):
            return isinstance(c, int) or id(c) in resolved_ids
        return ok(n[0]) and ok(n[1])

    remaining = internals
    while remaining:
        lv = [n for n in remaining if ready(n)]
        remaining = [n for n in remaining if not ready(n)]
        for n in lv:
            resolved_ids.add(id(n))
        levels.append(lv)
    return levels


def _msa_from_tree_pool(tree, internals, seq_profiles, gap_open, gap_extend,
                        seq_weight) -> Optional[Profile]:
    """Device-resident progressive alignment (ops/profile_pool.py):
    every level's score+DP+merge runs on device against a profile pool,
    so the host enqueues all levels without per-level round trips and
    downloads only the traceback op codes at the end, replaying them
    through ``_merge_from_ops`` for the aligned character rows (the
    final Profile is therefore host-exact).  Returns None when a merge
    outgrows the padded length (caller falls back to the host loop)."""
    from ginfinity_tpu.ops.profile_pool import (
        pool_padded_len,
        run_progressive_pool,
    )

    N = len(seq_profiles)
    lens = [p.mu_struct.shape[0] for p in seq_profiles]
    P = pool_padded_len(max(lens))
    d = seq_profiles[0].mu_struct.shape[1]
    has_base = seq_weight > 0.0 and all(
        p.mu_base is not None for p in seq_profiles
    )

    leaf_mu = np.zeros((N, P, d), np.float32)
    leaf_stem = np.zeros((N, P), np.float32)
    leaf_len = np.asarray(lens, np.int32)
    leaf_base = None
    if has_base:
        db = seq_profiles[0].mu_base.shape[1]
        leaf_base = np.zeros((N, P, db), np.float32)
    for i, p in enumerate(seq_profiles):
        L = lens[i]
        if L > P:
            return None
        leaf_mu[i, :L] = p.mu_struct
        leaf_stem[i, :L] = p.stem
        if has_base:
            leaf_base[i, :L] = p.mu_base

    slot = {}
    for k, n in enumerate(internals):
        slot[id(n)] = N + k

    def slot_of(node):
        return node if isinstance(node, int) else slot[id(node)]

    node_levels = _build_levels(internals)
    levels = [
        (
            np.asarray([slot_of(n[0]) for n in lv], np.int64),
            np.asarray([slot_of(n[1]) for n in lv], np.int64),
            np.asarray([slot[id(n)] for n in lv], np.int64),
        )
        for lv in node_levels
    ]

    out = run_progressive_pool(
        levels, leaf_mu, leaf_base, leaf_stem, leaf_len,
        P, gap_open, gap_extend, seq_weight,
        exact=_profile_dp_exact_enabled(),
    )
    if out is None:
        return None
    ops_levels, _ = out

    # host replay: ops -> merged Profiles (chars + host-exact tensors)
    resolved: dict[int, Profile] = {}

    def get(node):
        if isinstance(node, int):
            return seq_profiles[node]
        return resolved[id(node)]

    for lv, ops_b in zip(node_levels, ops_levels):
        for n, opsr in zip(lv, ops_b):
            ops = opsr[opsr != 3][::-1]
            resolved[id(n)] = _merge_from_ops(get(n[0]), get(n[1]), ops)
    return resolved[id(tree)]


def _msa_from_tree_pool_library(tree, internals, seq_profiles, library,
                                gap_open, gap_extend) -> Optional[Profile]:
    """Device-resident library-mode progressive alignment
    (ops/library_pool.py): scores come from the device-resident
    posterior slabs through per-member position->column maps, so the
    host enqueues all levels with no per-level round trips AND no slab
    download.  Returns None when the library has no device slabs or a
    merge outgrows the padded length (caller falls back to the host
    scorer loop, which downloads the slabs lazily)."""
    from ginfinity_tpu.ops.library_pool import (
        build_library_schedule,
        run_library_pool,
    )
    from ginfinity_tpu.ops.profile_pool import library_pool_padded_len

    if getattr(library, "device_slabs", None) is None:
        return None
    N = len(seq_profiles)
    lens = [p.mu_struct.shape[0] for p in seq_profiles]
    P = library_pool_padded_len(max(lens))
    if max(lens) > P:
        return None

    slot = {id(n): N + k for k, n in enumerate(internals)}

    def slot_of(node):
        return node if isinstance(node, int) else slot[id(node)]

    members_cache: dict[int, list[int]] = {}

    def members_of(node):
        if isinstance(node, int):
            return [node]
        r = members_cache.get(id(node))
        if r is None:
            r = members_of(node[0]) + members_of(node[1])
            members_cache[id(node)] = r
        return r

    node_levels = _build_levels(internals)
    schedule = build_library_schedule(
        node_levels, slot_of, N, library.pairs, N, members_of
    )
    pair_a = np.asarray([a for a, _ in library.pairs], np.int32)
    pair_b = np.asarray([b for _, b in library.pairs], np.int32)
    out = run_library_pool(
        schedule, library.device_slabs[0], library.device_slabs[1],
        pair_a, pair_b, np.asarray(lens, np.int32), len(internals), P,
        gap_open, gap_extend,
    )
    if out is None and max(lens) <= P:
        # overflow: retry ONE rung up (1.5x leaves) before surrendering
        # to the host scorer loop — a fresh program load costs seconds,
        # the host fallback minutes at family scale
        from ginfinity_tpu.graphs.batching import _round_capacity

        P2 = _round_capacity(max(lens) + max(12, max(lens) // 2))
        if P2 > P:
            out = run_library_pool(
                schedule, library.device_slabs[0], library.device_slabs[1],
                pair_a, pair_b, np.asarray(lens, np.int32), len(internals),
                P2, gap_open, gap_extend,
            )
    if out is None:
        return None
    ops_levels, _ = out

    resolved: dict[int, Profile] = {}

    def get(node):
        if isinstance(node, int):
            return seq_profiles[node]
        return resolved[id(node)]

    for lv, ops_b in zip(node_levels, ops_levels):
        for n, opsr in zip(lv, ops_b):
            ops = opsr[opsr != 3][::-1]
            resolved[id(n)] = _merge_from_ops(get(n[0]), get(n[1]), ops)
    return resolved[id(tree)]


def msa_from_tree(tree, seq_profiles, gap_open, gap_extend, seq_weight=0.0,
                  scorer=None, library=None) -> Profile:
    """Progressive alignment, levelized: every round batches ALL merges
    whose children are ready into one device DP program (the tree depth,
    not the merge count, sets the number of sequential device round
    trips — a 50-leaf balanced tree runs ~6 rounds instead of 49).

    Profile-mode scoring (scorer=None) routes through the device-
    resident pool (ops/profile_pool.py), and library-mode scoring (a
    ``library`` with device slabs) through ops/library_pool.py — zero
    per-level round trips either way — unless GINFINITY_MSA_POOL=0 or a
    merge outgrows the padded length."""
    from ginfinity_tpu.ops.pairhmm import (
        profile_align_batch_ops,
        profile_align_batch_ops_exact,
    )

    if isinstance(tree, int):
        return seq_profiles[tree]

    internals: list[tuple] = []

    def walk(node):
        if isinstance(node, int):
            return
        walk(node[0])
        walk(node[1])
        internals.append(node)

    walk(tree)

    pool_env = _pool_env_enabled()
    if scorer is None and pool_env:
        t0 = time.perf_counter()
        prof = _msa_from_tree_pool(
            tree, internals, seq_profiles, gap_open, gap_extend, seq_weight
        )
        if prof is not None:
            if os.environ.get("GINFINITY_MSA_TIMING"):
                print(f"[progressive detail] pool path "
                      f"{time.perf_counter() - t0:.2f}s")
            return prof
        if os.environ.get("GINFINITY_MSA_TIMING"):
            print("[progressive detail] pool overflow -> host path")
    elif library is not None and pool_env:
        t0 = time.perf_counter()
        prof = _msa_from_tree_pool_library(
            tree, internals, seq_profiles, library, gap_open, gap_extend
        )
        if prof is not None:
            if os.environ.get("GINFINITY_MSA_TIMING"):
                print(f"[progressive detail] library pool path "
                      f"{time.perf_counter() - t0:.2f}s")
            return prof
        if os.environ.get("GINFINITY_MSA_TIMING"):
            print("[progressive detail] library pool unavailable/overflow "
                  "-> host scorer path")

    resolved: dict[int, Profile] = {}

    def get(node):
        if isinstance(node, int):
            return seq_profiles[node]
        return resolved.get(id(node))

    timing = os.environ.get("GINFINITY_MSA_TIMING")
    t_score = t_dp = t_merge = 0.0
    rounds = []
    # fused level scoring only when the pool machinery is enabled (the
    # pool overflowed or was unavailable); GINFINITY_MSA_POOL=0 keeps
    # forcing the per-merge scorer + batched-DP loop for parity checks
    lib_fused = (pool_env and library is not None
                 and getattr(library, "device_slabs", None) is not None)
    for ready in _build_levels(internals):
        pairs = [(get(n[0]), get(n[1])) for n in ready]
        t0 = time.perf_counter()
        all_ops = None
        if lib_fused:
            # fused level path: scatter + batched DP on device, only op
            # codes over the link (no [La, Lb] matrix round trips)
            all_ops = library.merge_ops_level(pairs, gap_open, gap_extend)
        t1 = time.perf_counter()
        fused_this = all_ops is not None
        if all_ops is None:
            if scorer is not None:
                mats = [scorer(a, b) for a, b in pairs]
                t1 = time.perf_counter()
                all_ops = profile_align_batch_ops(mats, gap_open, gap_extend)
            elif _profile_dp_exact_enabled():
                t1 = time.perf_counter()
                all_ops = profile_align_batch_ops_exact(
                    [(a.mu_struct, b.mu_struct) for a, b in pairs],
                    [(a.stem, b.stem) for a, b in pairs],
                    gap_open, gap_extend,
                    base_pairs=[(a.mu_base, b.mu_base) for a, b in pairs],
                    seq_weight=seq_weight,
                )
            else:
                mats = [_profile_score_matrix(a, b, seq_weight)
                        for a, b in pairs]
                t1 = time.perf_counter()
                all_ops = profile_align_batch_ops(mats, gap_open, gap_extend)
        t2 = time.perf_counter()
        for n, (a, b), ops in zip(ready, pairs, all_ops):
            resolved[id(n)] = _merge_from_ops(a, b, ops)
        t3 = time.perf_counter()
        if fused_this:
            # scatter and DP are one enqueue — not separable; count the
            # whole span as dp so score= stays host-scorer-only
            t_dp += t1 - t0
        else:
            t_score += t1 - t0
            t_dp += t2 - t1
        t_merge += t3 - t2
        if timing:
            rounds.append((len(ready),
                           max(a.mu_struct.shape[0] for a, _ in pairs),
                           max(b.mu_struct.shape[0] for _, b in pairs)))
    if timing:
        print(f"[progressive detail] rounds={len(rounds)} score={t_score:.2f}s "
              f"dp={t_dp:.2f}s merge={t_merge:.2f}s shapes={rounds}")
    return resolved[id(tree)]


# ==========================================================================
# Iterative refinement — REAL split-and-realign.
#
# The reference's refinement is an explicit placeholder: it scores the
# alignment but never perturbs it (embed_msa.py:1149-1164, "No change for
# now").  Here --refine-iters actually refines: each iteration bipartitions
# the sequences at random, extracts the two sub-alignments (dropping
# all-gap columns), re-aligns them with the profile DP, and keeps the
# result iff the sum-of-pairs score improves.
# ==========================================================================


def _column_positions(profile: Profile) -> tuple[np.ndarray, np.ndarray]:
    """Per (member, column): the member's residue index, -1 at gaps.
    Returns (members array, pos [n_members, n_cols])."""
    members = np.asarray(profile.member_indices)
    n_cols = len(profile.stem)
    pos = np.full((members.size, n_cols), -1, np.int64)
    for r, idx in enumerate(profile.member_indices):
        chars = np.asarray(profile.aligned_chars[idx])[:n_cols]
        present = chars != _GAP
        pos[r, : chars.size][present] = np.cumsum(present)[present] - 1
    return members, pos


def sp_score(profile: Profile, seq_profiles: list[Profile],
             beta_struct: float = 0.2) -> float:
    """Sum-of-pairs alignment score over the ORIGINAL per-sequence
    embeddings: for every column and every pair of members both present,
    dot(e_i, e_j) plus ``beta_struct`` when their stem flags agree — the
    same scoring convention as the profile DP (embed_msa.py:874-930).
    Computed with the sum-of-squares identity, no pair loop."""
    members, pos = _column_positions(profile)
    if members.size < 2 or pos.shape[1] == 0:
        return 0.0
    d = seq_profiles[int(members[0])].mu_struct.shape[1]
    present = pos >= 0
    E = np.zeros((members.size, pos.shape[1], d), np.float32)
    stem = np.zeros_like(pos, np.float32)
    for r, idx in enumerate(members):
        sp = seq_profiles[int(idx)]
        p = pos[r][present[r]]
        E[r, present[r]] = sp.mu_struct[p]
        stem[r][present[r]] = sp.stem[p]
    # sum over pairs of dots = (||sum||^2 - sum ||.||^2) / 2, per column
    s = E.sum(axis=0)  # [C, d]
    dot_total = 0.5 * float(
        (s * s).sum() - (E * E).sum()
    )
    n_stem = ((stem >= 0.5) & present).sum(axis=0).astype(np.float64)
    n_un = ((stem < 0.5) & present).sum(axis=0).astype(np.float64)
    agree_pairs = (n_stem * (n_stem - 1) + n_un * (n_un - 1)) / 2.0
    return dot_total + beta_struct * float(agree_pairs.sum())


def extract_subprofile(profile: Profile, members: list[int],
                       seq_profiles: list[Profile]) -> Profile:
    """Sub-alignment restricted to ``members``: drop columns where every
    member is gapped, rebuild column means/stems from the original
    per-sequence embeddings."""
    all_members, pos = _column_positions(profile)
    rows = [list(all_members).index(m) for m in members]
    sub = pos[rows]
    keep = (sub >= 0).any(axis=0)
    sub = sub[:, keep]
    n_cols = sub.shape[1]
    d = seq_profiles[int(members[0])].mu_struct.shape[1]
    base_dim = next(
        (seq_profiles[m].mu_base.shape[1] for m in members
         if seq_profiles[m].mu_base is not None), 0
    )
    mu_s = np.zeros((n_cols, d), np.float32)
    mu_b = np.zeros((n_cols, base_dim), np.float32) if base_dim else None
    stem_acc = np.zeros(n_cols, np.float32)
    cnt = np.zeros(n_cols, np.float32)
    aligned = {}
    for r, m in enumerate(members):
        spf = seq_profiles[int(m)]
        pres = sub[r] >= 0
        p = sub[r][pres]
        mu_s[pres] += spf.mu_struct[p]
        if base_dim and spf.mu_base is not None:
            mu_b[pres] += spf.mu_base[p]
        stem_acc[pres] += spf.stem[p]
        cnt[pres] += 1.0
        src = np.asarray(profile.aligned_chars[m])
        if src.size < keep.size:
            src = np.concatenate(
                [src, np.full(keep.size - src.size, _GAP, np.uint8)]
            )
        aligned[m] = src[: keep.size][keep]
    mu_s = mu_s / np.maximum(np.linalg.norm(mu_s, axis=1, keepdims=True), 1e-8)
    if mu_b is not None:
        mu_b = mu_b / np.maximum(np.linalg.norm(mu_b, axis=1, keepdims=True), 1e-8)
    stem = stem_acc / np.maximum(cnt, 1.0)
    return Profile(mu_s, mu_b, stem, list(members), aligned)


def tree_partitions(tree, n: int) -> list[frozenset]:
    """Member sets of the guide tree's internal edges (sizes 2..n-2),
    deduplicated with their complements — the MUSCLE stage-3 restricted
    partitions (singletons are covered by the refinement's leave-one-out
    sweep).  Order: shallow subtrees first (closest to the root merge,
    where progressive errors concentrate)."""
    sets: list[frozenset] = []

    def walk(node) -> frozenset:
        if isinstance(node, int):
            return frozenset((node,))
        s = walk(node[0]) | walk(node[1])
        if 2 <= len(s) <= n - 2:
            sets.append(s)
        return s

    walk(tree)
    seen: set[frozenset] = set()
    out: list[frozenset] = []
    for s in reversed(sets):  # reversed post-order = root-adjacent first
        comp = frozenset(range(n)) - s
        key = min(s, comp, key=lambda x: tuple(sorted(x)))
        if key in seen:
            continue
        seen.add(key)
        out.append(s)
    return out


def iterative_refinement(
    aln: Profile,
    seq_profiles: list[Profile],
    iters: int,
    rng: np.random.Generator,
    gap_open: float,
    gap_extend: float,
    seq_weight: float = 0.0,
    scorer=None,
    merge_ops_fn=None,
    partitions: list[frozenset] | None = None,
    min_gain: float = 0.0,
) -> tuple[Profile, dict]:
    """Split-and-realign refinement; returns (best alignment, stats).

    Schedule: a leave-one-out sweep over every member, then the given
    restricted ``partitions`` (guide-tree edge splits from
    :func:`tree_partitions`), then random binary splits.

    ``merge_ops_fn(A, B, go, ge)`` (PosteriorLibrary.merge_ops) is the
    device-fused scorer+DP fast path; when it returns None (or is not
    given) each realign scores via ``scorer`` + the batched DP.

    ``min_gain``: relative acceptance threshold — a realign is kept only
    when it improves the embedding-SP proxy by more than
    ``min_gain * max(1, |current score|)``.  The proxy is correlated
    with, not identical to, true alignment quality, and marginal proxy
    gains are where the two disagree (round-4 refinement A/B: 1 of 3
    families' true SP-F1 regressed while its proxy improved); requiring
    a material gain filters those noise-level acceptances.  0 keeps the
    classic any-improvement rule."""
    best = aln
    best_score = sp_score(best, seq_profiles)
    stats = {"sp_initial": best_score, "accepted": 0, "iters": max(0, int(iters))}
    members = list(aln.member_indices)
    if iters <= 0 or len(members) < 3:
        stats["sp_final"] = best_score
        return best, stats
    parts = partitions or []
    for it in range(int(iters)):
        if it < len(members):
            # leave-one-out sweep first (MUSCLE-style): re-aligning a
            # single sequence against the rest is the highest-yield
            # restricted partition and deterministic coverage beats
            # waiting for random draws to hit each singleton
            side = {members[it]}
        elif it - len(members) < len(parts):
            side = set(parts[it - len(members)])
        else:
            k = int(rng.integers(1, len(members)))
            side = set(
                rng.choice(np.asarray(members), size=k, replace=False).tolist()
            )
        part_a = [m for m in best.member_indices if m in side]
        part_b = [m for m in best.member_indices if m not in side]
        if not part_a or not part_b:
            continue
        A = extract_subprofile(best, part_a, seq_profiles)
        B = extract_subprofile(best, part_b, seq_profiles)
        if scorer is not None:
            ops = (merge_ops_fn(A, B, gap_open, gap_extend)
                   if merge_ops_fn is not None else None)
            if ops is None:
                from ginfinity_tpu.ops.pairhmm import profile_align_batch_ops

                ops = profile_align_batch_ops(
                    [scorer(A, B)], gap_open, gap_extend
                )[0]
            cand = _merge_from_ops(A, B, ops)
        else:
            cand = merge_profiles(A, B, gap_open, gap_extend, seq_weight)
        sc = sp_score(cand, seq_profiles)
        if sc - best_score > min_gain * max(1.0, abs(best_score)):
            best, best_score = cand, sc
            stats["accepted"] += 1
    stats["sp_final"] = best_score
    return best, stats


# ==========================================================================
# Outputs (embed_msa.py:1171-1240)
# ==========================================================================


def profile_to_msa_strings(profile: Profile, names: list[str]) -> dict[str, str]:
    aln_len = len(profile.stem)
    out = {}
    for idx in profile.member_indices:
        chars = np.asarray(profile.aligned_chars[idx])
        if chars.size < aln_len:
            chars = np.concatenate(
                [chars, np.full(aln_len - chars.size, _GAP, np.uint8)]
            )
        out[names[idx]] = chars[:aln_len].tobytes().decode("latin-1")
    return out


def write_outputs(aln: Profile, names, out_prefix, diagnostics):
    import pandas as pd

    out_dir = os.path.dirname(out_prefix)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    msa = profile_to_msa_strings(aln, names)
    with open(f"{out_prefix}.fasta", "w") as f:
        for n in names:
            if n in msa:
                f.write(f">{n}\n{msa[n]}\n")
    with open(f"{out_prefix}.sto", "w") as f:
        f.write("# STOCKHOLM 1.0\n")
        for n in names:
            if n in msa:
                f.write(f"{n} {msa[n]}\n")
        f.write("//\n")
    pd.DataFrame({"Name": list(msa.keys()), "Aligned": list(msa.values())}).to_csv(
        f"{out_prefix}.aln.tsv", sep="\t", index=False
    )
    diag_dir = f"{out_prefix}.diagnostics"
    os.makedirs(diag_dir, exist_ok=True)
    if "expected_scores" in diagnostics:
        pd.DataFrame(diagnostics["expected_scores"]).to_csv(
            os.path.join(diag_dir, "expected_scores.tsv"), sep="\t", header=False, index=False
        )
    # posterior heatmap PNGs, first 6 pairs (embed_msa.py:1219-1238)
    heatmaps = diagnostics.get("posteriors_heatmaps") or []
    if heatmaps:
        try:
            import matplotlib

            matplotlib.use("Agg", force=True)
            import matplotlib.pyplot as plt
        except ImportError:
            plt = None
        if plt is not None:
            for k, (pair, mat) in enumerate(heatmaps):
                if k >= 6:
                    break
                plt.figure(figsize=(4, 4))
                plt.imshow(mat, origin="lower", aspect="auto", cmap="viridis")
                plt.colorbar()
                plt.title(f"Pair {pair[0]}-{pair[1]}")
                plt.tight_layout()
                plt.savefig(os.path.join(diag_dir, f"pair_{pair[0]}_{pair[1]}.png"))
                plt.close()
    meta = {k: v for k, v in diagnostics.items() if k != "posteriors_heatmaps"}
    with open(os.path.join(diag_dir, "run_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


# ==========================================================================
# Main
# ==========================================================================


def build_parser():
    ap = argparse.ArgumentParser(
        description="MSA for RNAs using node embeddings (T-Coffee/ProbCons-style, TPU-native)"
    )
    ap.add_argument("--input", required=True, help='Input TSV path or "dummy"')
    ap.add_argument("--name-col", default="Name")
    ap.add_argument("--embeds-col", default="node_embeddings")
    ap.add_argument("--base-embeds-col", default=None)
    ap.add_argument("--dotbracket-col", default=None)
    ap.add_argument("--paired-col", default=None)
    ap.add_argument("--out-prefix", default=None)
    ap.add_argument("--topk", type=int, default=20)
    ap.add_argument("--consistency-rounds", type=int, default=1)
    ap.add_argument("--alpha", type=float, default=None,
                    help="Cosine->log-odds calibration slope. Default is "
                         "mode-dependent: 5.0 in profile mode (reference "
                         "parity, embed_msa.py:1262/1336) and 8.0 in "
                         "library mode (quality-tuned; see BASELINE.md "
                         "MSA parameter tuning).")
    ap.add_argument("--beta", type=float, default=None)
    ap.add_argument("--seq-weight", type=float, default=0.0)
    ap.add_argument("--gap-open", type=float, default=None,
                    help="Pair-HMM gap-open log-odds. Default is "
                         "mode-dependent: -10.0 in profile mode "
                         "(reference parity, embed_msa.py:1265) and "
                         "-4.0 in library mode (quality-tuned).")
    ap.add_argument("--gap-extend", type=float, default=-0.5)
    ap.add_argument("--use-center", type=float, default=None)
    ap.add_argument("--use-local", action="store_true",
                    help="Local pair-HMM posteriors (restart/end-anywhere "
                         "model; reference embed_msa.py --use-local).")
    ap.add_argument("--tree", choices=["nj", "upgma"], default="nj")
    ap.add_argument("--dp-score", choices=["profile", "library"],
                    default="library",
                    help="Progressive-DP scoring. 'library' (default) is "
                         "the T-Coffee/ProbCons-correct mode: columns score "
                         "by the consistency-transformed match posteriors — "
                         "measured ~3x the reference pipeline's SP-F1 on "
                         "families with known homology (BASELINE.md 'MSA "
                         "output quality'). 'profile' is reference parity: "
                         "raw mean-embedding dots + stem bonus "
                         "(embed_msa.py:874-985), with the reference's own "
                         "alpha/gap defaults.")
    ap.add_argument("--dp-gap-open", type=float, default=None,
                    help="Progressive-DP gap open (library mode defaults "
                         "to 0: posterior scores already price gaps).")
    ap.add_argument("--dp-gap-extend", type=float, default=None)
    ap.add_argument("--refine-iters", type=int, default=0)
    ap.add_argument("--refine-min-gain", type=float, default=0.002,
                    help="Relative embedding-SP gain a refinement realign "
                         "must clear to be accepted (guards against "
                         "noise-level proxy gains that can trade away true "
                         "alignment quality; 0 = accept any improvement).")
    ap.add_argument("--num-workers", type=int, default=4, help="Reference CLI compatibility.")
    ap.add_argument("--max-pairs", type=int, default=2000)
    ap.add_argument("--pair-batch", type=int, default=64,
                    help="Pairs per device batch (the anti-diagonal scan "
                         "is latency-bound per step, so bigger batches "
                         "amortize nearly for free; 64 measured best).")
    ap.add_argument("--data-parallel", action="store_true",
                    help="Shard the pairwise-posterior batches and the "
                         "consistency pair tiles over all visible devices "
                         "(jax.sharding data mesh; pairs are "
                         "embarrassingly parallel, no collectives).")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--plot-diagnostics", action="store_true")
    return ap


def main(argv=None):
    from ginfinity_tpu.utils.jaxinit import start_backend_warmup

    args = build_parser().parse_args(argv)
    if args.topk < 1:
        raise SystemExit("--topk must be >= 1")
    # AFTER argparse (--help/usage errors never touch the device).
    # Remote-TPU session bring-up overlaps the (large) embedding-TSV
    # parse; without this the first posterior batch eats the bring-up
    # and can degrade ~100x (BASELINE.md cold-start section)
    start_backend_warmup()
    random.seed(args.seed)
    np.random.seed(args.seed)
    t_start = time.time()

    out_prefix = args.out_prefix
    if not (out_prefix and str(out_prefix).strip()):
        out_prefix = os.path.join(
            f"embed_msa_out_{time.strftime('%y%m%d_%H%M%S')}", "msa"
        )

    trim_bounds = None
    if args.input == "dummy":
        records = [
            SequenceRecord(
                name=f"seq{i + 1}",
                emb=np.random.randn(random.randint(6, 10), 16).astype(np.float32),
            )
            for i in range(5)
        ]
    else:
        if not (0.0 <= float(args.seq_weight) <= 1.0):
            raise SystemExit("--seq-weight must be in [0,1]")
        records = load_tsv(args.input, args.name_col, args.embeds_col,
                           args.dotbracket_col, args.paired_col, args.base_embeds_col)
        if not records:
            raise SystemExit("No valid records found.")

    if args.use_center is not None:
        frac = float(args.use_center)
        if not (0.0 < frac <= 1.0):
            raise SystemExit("--use-center must be in (0,1].")
        trim_bounds = apply_center_trim(records, frac)

    for r in records:
        r.emb = _l2_normalize_rows(r.emb)
        if r.base_emb is not None:
            r.base_emb = _l2_normalize_rows(r.base_emb)

    N = len(records)
    names = [r.name for r in records]
    dims = {r.emb.shape[1] for r in records}
    if len(dims) != 1:
        raise SystemExit("All embeddings must have the same dimension.")

    # load the progressive-stage program ladder while the posterior and
    # consistency stages run — one device program per tree level with a
    # level-specific batch size otherwise stalls ~1.5 s per shape on
    # executable loads (measured 11 shapes = ~17 s on the 200x300 family)
    lmax_rec = max(r.emb.shape[0] for r in records)
    pairs = pairwise_pairs_to_compute(records, args.max_pairs)
    # hold background prewarm compiles until the posteriors stage is done:
    # on this 1-CPU host a speculative compile running concurrently with
    # the stage's own compiles starved it (library-mode posteriors 18.6 s
    # vs 4.2 s uncontended — BASELINE.md); released after stage_done(
    # "posteriors") below, leaving the consistency window for the loads
    from ginfinity_tpu.utils.jaxinit import hold_prewarm, release_prewarm

    hold_prewarm()
    pool_env = os.environ.get("GINFINITY_MSA_POOL", "1") != "0"
    pool_on = args.dp_score != "library" and pool_env
    if args.dp_score == "library" and pool_env:
        # library mode never dispatches the profile-DP ladder — warm
        # the library-pool program set instead (shapes are pure
        # functions of N, the pair count, Lcap and topk)
        from ginfinity_tpu.graphs.batching import _round_capacity
        from ginfinity_tpu.ops.library_pool import prewarm_library_programs
        from ginfinity_tpu.ops.profile_pool import library_pool_padded_len

        Lcap_pw = _round_capacity(lmax_rec)
        refine_len = (lmax_rec + max(8, lmax_rec // 8)
                      if int(args.refine_iters) > 0 else 0)
        prewarm_library_programs(
            N, library_pool_padded_len(lmax_rec), len(pairs), Lcap_pw,
            min(int(args.topk), Lcap_pw), max(1, N // 2),
            refine_len=refine_len,
        )
    if pool_on:
        from ginfinity_tpu.ops.profile_pool import (
            pool_padded_len,
            prewarm_pool_programs,
        )

        base_dim = 0
        if float(args.seq_weight) > 0.0:
            base_dim = next(
                (r.base_emb.shape[1] for r in records if r.base_emb is not None), 0
            )
        prewarm_pool_programs(
            N, pool_padded_len(lmax_rec), int(next(iter(dims))),
            base_dim, max(1, N // 2), exact=_profile_dp_exact_enabled(),
        )
        if int(args.refine_iters) > 0:
            from ginfinity_tpu.ops.pairhmm import prewarm_profile_programs

            # refinement aligns sub-profiles whose length is the column
            # count (>= leaf length, gaps included) — warm with headroom
            prewarm_profile_programs(
                lmax_rec + max(8, lmax_rec // 8), 2,
                exact_dims=((int(next(iter(dims))), base_dim)
                            if _profile_dp_exact_enabled() else None),
            )
    elif not (args.dp_score == "library" and pool_env):
        # pool disabled (or profile mode with GINFINITY_MSA_POOL=0):
        # the host-driven levelized loop batches through the
        # profile-DP ladder (exact kernel in profile mode; library mode's
        # scorer path DPs on accumulated score matrices)
        from ginfinity_tpu.ops.pairhmm import prewarm_profile_programs

        prewarm_profile_programs(
            lmax_rec, max(1, N // 2),
            exact_dims=((int(next(iter(dims))), 0)
                        if (args.dp_score != "library"
                            and _profile_dp_exact_enabled()) else None),
        )

    # Mode-dependent defaults: profile mode keeps the reference's values
    # (embed_msa.py:1262-1266, 1336); library mode uses the values from
    # the coordinate sweep + out-of-sample validation (BASELINE.md "MSA
    # parameter tuning": +0.07 SP-F1 over the reference defaults on
    # held-out known-homology families). Explicit flags always win.
    want_library_defaults = args.dp_score == "library"
    alpha_default = 8.0 if want_library_defaults else 5.0
    gap_open_default = -4.0 if want_library_defaults else -10.0
    if args.gap_open is None:
        args.gap_open = gap_open_default
    alpha = args.alpha if args.alpha is not None else alpha_default
    beta = args.beta if args.beta is not None else 0.0
    if args.alpha is None or args.beta is None:
        print(f"[WARN] alpha/beta not fully provided; falling back to "
              f"default alpha={alpha}, beta={beta}")

    stage_times: dict[str, float] = {}

    def stage_done(name, t0):
        stage_times[name] = round(time.time() - t0, 2)
        print(f"[{name}] {stage_times[name]}s")
        return time.time()

    mesh = None
    if getattr(args, "data_parallel", False):
        import jax

        if jax.device_count() > 1:
            from ginfinity_tpu.parallel.mesh import make_data_mesh

            mesh = make_data_mesh()
            print(f"[embed_msa] data parallel over {mesh.devices.size} devices")
        else:
            print("[embed_msa] --data-parallel: single device visible; "
                  "running unsharded")

    t_stage = time.time()
    print(f"Computing pairwise posteriors for {len(pairs)} pairs...")

    post: dict[tuple[int, int], np.ndarray] = {}
    slab_kv: list = []   # device [bs, Lcap, k] row-top-k posterior slabs
    slab_ki: list = []
    pair_chunks: list[list[tuple[int, int]]] = []
    expected_scores = np.zeros((N, N), np.float32)
    heatmaps: list[tuple[tuple[int, int], np.ndarray]] = []
    # Embedding-resident pairwise stage: embeddings upload once, scores
    # (incl. dual-modality blending), calibration, posteriors, and
    # sparsification run on device; only row-compacted kept entries come
    # back (a few hundred KB per batch vs ~15 MB of score upload +
    # dense-posterior download per 64 pairs).
    if pairs:
        import jax.numpy as jnp

        from ginfinity_tpu.graphs.batching import _round_capacity
        from ginfinity_tpu.ops.pairhmm import _pair_posteriors_from_embs
        from ginfinity_tpu.utils.jaxinit import join_backend_warmup

        # a large first execution on a cold backend degrades ~100x; the
        # warmup op launched at main() entry must complete before the
        # first pair-HMM program dispatches
        join_backend_warmup()

        use_base = args.seq_weight > 0.0 and any(
            r.base_emb is not None for r in records
        )
        Lcap = _round_capacity(max(r.emb.shape[0] for r in records))
        dim = records[0].emb.shape[1]
        embs = np.zeros((N, Lcap, dim), np.float32)
        lens = np.zeros(N, np.int32)
        for i, r in enumerate(records):
            embs[i, : r.emb.shape[0]] = r.emb
            lens[i] = r.emb.shape[0]
        base_kw = {}
        if use_base:
            bdim = max(
                r.base_emb.shape[1] for r in records if r.base_emb is not None
            )
            base = np.zeros((N, Lcap, bdim), np.float32)
            has_base = np.zeros(N, np.float32)
            for i, r in enumerate(records):
                if r.base_emb is not None and r.base_emb.shape[1] == bdim:
                    base[i, : r.base_emb.shape[0]] = r.base_emb
                    has_base[i] = 1.0
            base_kw = {
                "base_embs": jnp.asarray(base),
                "has_base": jnp.asarray(has_base),
                "seq_weight": jnp.float32(args.seq_weight),
                "use_base": True,
            }
        embs_d = jnp.asarray(embs)
        lens_d = jnp.asarray(lens)
        bs = max(1, int(args.pair_batch))
        if mesh is not None:  # pair axis shards: pad batches to mesh size
            n_dev = mesh.devices.size
            bs = -(-bs // n_dev) * n_dev
        k = min(args.topk, Lcap)
        for s in range(0, len(pairs), bs):
            chunk = pairs[s : s + bs]
            ia = np.zeros(bs, np.int32)
            ib = np.zeros(bs, np.int32)
            for t, (a, b) in enumerate(chunk):  # padding reuses pair 0
                ia[t], ib[t] = a, b
            if mesh is not None:
                from ginfinity_tpu.ops.pairhmm import (
                    pair_posteriors_from_embs_sharded,
                )

                kv, ki, ex = pair_posteriors_from_embs_sharded(
                    mesh, embs_d, lens_d, jnp.asarray(ia), jnp.asarray(ib),
                    jnp.float32(alpha), jnp.float32(beta),
                    jnp.float32(args.gap_open), jnp.float32(args.gap_extend),
                    jnp.float32(1e-4), args.use_local, k, **base_kw,
                )
            else:
                kv, ki, ex = _pair_posteriors_from_embs(
                    embs_d, lens_d, jnp.asarray(ia), jnp.asarray(ib),
                    jnp.float32(alpha), jnp.float32(beta),
                    jnp.float32(args.gap_open), jnp.float32(args.gap_extend),
                    jnp.float32(1e-4), args.use_local, k, **base_kw,
                )
            # posteriors STAY on device as row-top-k slabs — the
            # consistency transform consumes them directly (the old dict
            # round-trip moved ~1.7 GB over the host link at scale)
            slab_kv.append(kv)
            slab_ki.append(ki)
            pair_chunks.append(chunk)
            ex = np.asarray(ex)
            # NOTE: do NOT release the prewarm gate here (tried in round
            # 5: releasing after the first batch let the background
            # program load run concurrently with the remaining posterior
            # dispatches, and 2/2 such runs hit a 430-510 s tunnel
            # session stall inside this stage vs 0/5 with the gate held
            # — the axon transport degrades under concurrent submission
            # threads; the release stays after stage_done below)
            for t, (a, b) in enumerate(chunk):
                expected_scores[a, b] = expected_scores[b, a] = float(ex[t])

    def materialize_post():
        """Download slabs into the dense per-pair dict (only needed for
        heatmap diagnostics and the no-consistency path)."""
        if post or not pairs:
            return post
        for kv_d, ki_d, chunk in zip(slab_kv, slab_ki, pair_chunks):
            kv = np.asarray(kv_d)
            ki = np.asarray(ki_d)
            for t, (a, b) in enumerate(chunk):
                la, lb = int(records[a].emb.shape[0]), int(records[b].emb.shape[0])
                Pk = np.zeros((la, lb), np.float32)
                rows_i = np.repeat(np.arange(la), kv.shape[-1])
                vals = kv[t, :la].ravel()
                cols = ki[t, :la].ravel()
                nz = vals > 0
                Pk[rows_i[nz], cols[nz]] = vals[nz]
                post[(a, b)] = Pk
        return post

    if args.plot_diagnostics and pairs:
        mp = materialize_post()
        for (a, b) in pairs[:6]:
            heatmaps.append(((a, b), mp[(a, b)]))

    t_stage = stage_done("posteriors", t_stage)
    release_prewarm()  # compile-heavy foreground lead stage is over
    want_library = args.dp_score == "library"
    library = None
    if N >= 3 and args.consistency_rounds > 0 and pairs:
        print(f"Running {args.consistency_rounds} consistency round(s)...")
        Lcap_used = slab_kv[0].shape[1]
        out = consistency_rounds_to_distances_from_slabs(
            slab_kv, slab_ki, pair_chunks, N, Lcap_used, slab_kv[0].shape[2],
            args.consistency_rounds, lam=0.5, pmin=1e-4,
            return_slabs=want_library, mesh=mesh,
        )
        if want_library:
            D, lib_pairs, lib_v, lib_i = out
            if lib_v is not None:
                # lib_v/lib_i are DEVICE refs: the library pool consumes
                # them in place; host download happens lazily only on
                # fallback or refinement (PosteriorLibrary.by_pair)
                library = PosteriorLibrary(
                    lib_pairs, None, None,
                    [r.emb.shape[0] for r in records],
                    device_slabs=(lib_v, lib_i),
                )
        else:
            D = out
    else:
        D = build_distance_matrix(materialize_post(), N)
    if want_library and library is None and pairs:
        # no consistency pass ran (rounds=0 or N<3): the raw pairwise
        # slabs are the library
        import jax.numpy as jnp

        lib_pairs = [pr for chunk in pair_chunks for pr in chunk]
        lib_v = jnp.concatenate(
            [kv[: len(ch)] for kv, ch in zip(slab_kv, pair_chunks)]
        )
        lib_i = jnp.concatenate(
            [ki[: len(ch)].astype(jnp.int32)
             for ki, ch in zip(slab_ki, pair_chunks)]
        )
        library = PosteriorLibrary(
            lib_pairs, None, None, [r.emb.shape[0] for r in records],
            device_slabs=(lib_v, lib_i),
        )
    t_stage = stage_done("consistency+distances", t_stage)
    tree = build_guide_tree(D, method=args.tree)
    t_stage = stage_done("guide_tree", t_stage)

    scorer = library.score_matrix if library is not None else None
    if want_library and scorer is None and N >= 2 and pairs:
        print("[WARN] --dp-score library requested but no library available; "
              "falling back to profile scoring.")
    # library-mode progressive DP gap costs: posteriors already price
    # gaps, so the DP default is 0 (override with --dp-gap-open/-extend)
    dp_go = args.gap_open if args.dp_gap_open is None else args.dp_gap_open
    dp_ge = args.gap_extend if args.dp_gap_extend is None else args.dp_gap_extend
    if scorer is not None:
        if args.dp_gap_open is None:
            dp_go = 0.0
        if args.dp_gap_extend is None:
            dp_ge = 0.0

    profiles = initial_profiles(records)
    aln = msa_from_tree(tree, profiles, dp_go, dp_ge,
                        seq_weight=float(args.seq_weight), scorer=scorer,
                        library=library)
    t_stage = stage_done("progressive_alignment", t_stage)
    refine_stats = None
    if args.refine_iters > 0 and N >= 3:
        print(f"Refining for {args.refine_iters} iteration(s)...")
        aln, refine_stats = iterative_refinement(
            aln, profiles, args.refine_iters, np.random.default_rng(args.seed),
            dp_go, dp_ge, seq_weight=float(args.seq_weight), scorer=scorer,
            merge_ops_fn=library.merge_ops if library is not None else None,
            partitions=tree_partitions(tree, N),
            min_gain=float(args.refine_min_gain),
        )
    # alignment work is over: any prewarm program not yet started is
    # pure waste now (and would stall process exit on its compile)
    from ginfinity_tpu.utils.jaxinit import stop_prewarm_threads

    stop_prewarm_threads()

    diagnostics: dict[str, Any] = {
        "expected_scores": expected_scores.tolist(),
        "num_pairs": len(pairs),
        "N": N,
        "alpha": alpha,
        "beta": beta,
        "seq_weight": float(args.seq_weight),
        "input_path": args.input,
        "out_prefix": out_prefix,
        "topk": args.topk,
        "consistency_rounds": args.consistency_rounds,
        "gap_open": args.gap_open,
        "gap_extend": args.gap_extend,
        "tree_method": args.tree,
        "dp_score": args.dp_score,
        "refine_iters": args.refine_iters,
        "seed": args.seed,
        "max_pairs": args.max_pairs,
        "timing_sec": time.time() - t_start,
        "stage_times_sec": stage_times,
    }
    if args.plot_diagnostics and heatmaps:
        diagnostics["posteriors_heatmaps"] = heatmaps
    if refine_stats is not None:
        diagnostics["refinement"] = refine_stats
    if args.use_center is not None and trim_bounds is not None:
        diagnostics["use_center_fraction"] = float(args.use_center)
        diagnostics["center_trim_bounds"] = [[int(s_), int(e)] for s_, e in trim_bounds]
    write_outputs(aln, names, out_prefix, diagnostics)
    print(f"Done. Outputs written to: {out_prefix}.*")


if __name__ == "__main__":
    main()
