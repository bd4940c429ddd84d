"""Affine-gap alignment DP (Gotoh) as a batched anti-diagonal wavefront.

The reference runs Needleman-Wunsch / Smith-Waterman with affine gaps as
O(L1*L2) Python loops over numpy (align_node_embeddings.py:193-370) or
numba (embed_msa.py).  Anti-diagonal d = i + j only depends on diagonals
d-1 and d-2, so here every diagonal is one vectorized step of a
``lax.scan`` and many pairs run per batch — the device does B * L work
per step on the VPU.

Semantics match the reference exactly, including tie-breaking:
  E (gap in B / up):   from-H wins ties over from-E
  F (gap in A / left): from-H wins ties over from-F
  H: diag wins ties over E, E over F; SW clamps at 0 and tracks the max.
Tracebacks are uint8 codes computed on device (packed TH|TE<<2|TF<<3)
and walked on the host (O(L) Python, reference traceback semantics,
align_node_embeddings.py:256-282).

Note (documented deviation): the reference breaks ties for the SW *start
cell* by row-major first-max; the wavefront visits cells in diagonal
order, so exact float ties at distinct cells may pick a different (but
equally optimal) endpoint.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = jnp.float32(-1e9)  # matches the reference's neg_inf sentinel


@partial(jax.jit, static_argnames=("mode",))
def _wavefront(scores, l1, l2, gap_open, gap_extend, mode: str):
    """Run the DP for a batch of score matrices.

    scores: [B, L1, L2] (padded); l1, l2: [B] actual lengths.
    Returns (best [B], best_i [B], best_j [B], codes [D, B, L1+1] uint8)
    where D = L1 + L2 is the number of scanned diagonals (d = 1..D).
    """
    B, L1, L2 = scores.shape
    D = L1 + L2
    iidx = jnp.arange(L1 + 1)  # [I] cell row index within a diagonal

    go = jnp.float32(gap_open)
    ge = jnp.float32(gap_extend)
    local = mode == "local"

    def shift_down(x, fill):
        # x[:, i] -> x[:, i-1] content at position i
        return jnp.concatenate([jnp.full((B, 1), fill, x.dtype), x[:, :-1]], axis=1)

    def step(carry, d):
        H1, H2, E1, F1, best, bi, bj = carry
        j = d - iidx  # [I] column index per cell
        valid = (iidx <= l1[:, None]) & (j[None, :] >= 0) & (j[None, :] <= l2[:, None])

        Hup = shift_down(H1, NEG)  # H[i-1, j]
        Eup = shift_down(E1, NEG)  # E[i-1, j]
        Hleft = H1  # H[i, j-1]
        Fleft = F1  # F[i, j-1]
        Hdiag = shift_down(H2, NEG)  # H[i-1, j-1]

        # gather s[i-1, j-1] for this diagonal
        si = jnp.clip(iidx - 1, 0, L1 - 1)
        sj = jnp.clip(j - 1, 0, L2 - 1)
        s = scores[:, si, sj]  # [B, I]

        e_from_h = Hup + go
        e_from_e = Eup + ge
        E = jnp.maximum(e_from_h, e_from_e)
        TE = (e_from_h < e_from_e).astype(jnp.uint8)  # 0 = from H (ties -> H)

        f_from_h = Hleft + go
        f_from_f = Fleft + ge
        F = jnp.maximum(f_from_h, f_from_f)
        TF = (f_from_h < f_from_f).astype(jnp.uint8)

        diag = Hdiag + s
        if local:
            H = jnp.maximum(jnp.maximum(jnp.maximum(diag, E), F), 0.0)
            TH = jnp.where(
                H <= 0.0,
                jnp.uint8(3),
                jnp.where(diag >= jnp.maximum(E, F), jnp.uint8(0),
                          jnp.where(E >= F, jnp.uint8(1), jnp.uint8(2))),
            )
            H = jnp.where(H <= 0.0, 0.0, H)
        else:
            H = jnp.where(
                (diag >= E) & (diag >= F), diag, jnp.where(E >= F, E, F)
            )
            TH = jnp.where(
                (diag >= E) & (diag >= F), jnp.uint8(0),
                jnp.where(E >= F, jnp.uint8(1), jnp.uint8(2)),
            )

        # boundaries: i == 0 or j == 0
        is_i0 = iidx[None, :] == 0
        is_j0 = j[None, :] == 0
        if local:
            h_bound = jnp.zeros_like(H)
            th_bound = jnp.full_like(TH, 3)
        else:
            h_row0 = go + (j[None, :].astype(jnp.float32) - 1.0) * ge  # H[0, j]
            h_col0 = go + (iidx[None, :].astype(jnp.float32) - 1.0) * ge  # H[i, 0]
            h_bound = jnp.where(is_i0, h_row0, h_col0)
            th_bound = jnp.where(is_i0, jnp.uint8(2), jnp.uint8(1))
        on_bound = is_i0 | is_j0
        H = jnp.where(on_bound, h_bound, H)
        TH = jnp.where(on_bound, th_bound, TH)
        E = jnp.where(on_bound, NEG, E)
        F = jnp.where(on_bound, NEG, F)

        H = jnp.where(valid, H, NEG)
        E = jnp.where(valid, E, NEG)
        F = jnp.where(valid, F, NEG)

        if local:
            # running max over valid interior cells (i>=1, j>=1)
            cand = jnp.where(valid & ~on_bound, H, NEG)
            cmax = jnp.max(cand, axis=1)
            cargi = jnp.argmax(cand, axis=1)
            take = cmax > best
            best = jnp.where(take, cmax, best)
            bi = jnp.where(take, cargi, bi)
            bj = jnp.where(take, d - cargi, bj)
        else:
            # capture H[l1, l2] when its diagonal is reached
            at_end = d == (l1 + l2)
            h_end = jnp.take_along_axis(H, l1[:, None], axis=1)[:, 0]
            best = jnp.where(at_end, h_end, best)
            bi = jnp.where(at_end, l1, bi)
            bj = jnp.where(at_end, l2, bj)

        codes = (TH | (TE << 2) | (TF << 3)).astype(jnp.uint8)
        return (H, H1, E, F, best, bi, bj), codes

    init_H = jnp.full((B, L1 + 1), NEG)
    # d = 0 diagonal: only cell (0, 0)
    H0 = init_H.at[:, 0].set(0.0)
    E0 = jnp.full((B, L1 + 1), NEG)
    F0 = jnp.full((B, L1 + 1), NEG)
    best0 = jnp.full((B,), 0.0 if local else NEG)
    bi0 = jnp.zeros((B,), jnp.int32)
    bj0 = jnp.zeros((B,), jnp.int32)

    (_, _, _, _, best, bi, bj), codes = jax.lax.scan(
        step,
        (H0, init_H, E0, F0, best0, bi0.astype(l1.dtype), bj0.astype(l1.dtype)),
        jnp.arange(1, D + 1),
    )
    return best, bi, bj, codes


_MESH_WAVEFRONTS: dict = {}


def _wavefront_mesh(mesh):
    """Mesh-jitted wavefront: the batch axis shards over 'data' (pairs
    are independent — XLA partitions the whole scan with no collectives;
    codes carry batch on axis 1, hence P(None, 'data'))."""
    key = tuple(d.id for d in mesh.devices.flat)
    fn = _MESH_WAVEFRONTS.get(key)
    if fn is None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rows = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        fn = jax.jit(
            _wavefront.__wrapped__,
            static_argnames=("mode",),
            in_shardings=(rows, rows, rows, repl, repl),
            out_shardings=(rows, rows, rows, NamedSharding(mesh, P(None, "data"))),
        )
        _MESH_WAVEFRONTS[key] = fn
    return fn


@functools.lru_cache(maxsize=8)
def _shear_index(D: int, L1: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Masked (diag, i, j) scatter indices for un-shearing [D, I] codes
    into a dense [L1+1, L2+1] plane.  Identical for every pair of a
    batch (shapes are ladder-rounded, so a handful of keys cover a
    run) — computing them per pair dominated the traceback stage."""
    L2 = D - L1
    dd, ii = np.meshgrid(np.arange(1, D + 1), np.arange(L1 + 1), indexing="ij")
    jj = dd - ii
    m = (jj >= 0) & (jj <= L2)
    return dd[m] - 1, ii[m], jj[m]


def _codes_dense(codes: np.ndarray, b: int, L1: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Un-shear one pair's diagonal codes into dense TH/TE/TF [L1+1, L2+1]
    (vectorized scatter; the per-diagonal Python loop dominated wall time
    for large batches)."""
    D = codes.shape[0]
    L2 = D - L1
    TH = np.zeros((L1 + 1, L2 + 1), np.uint8)
    TE = np.zeros((L1 + 1, L2 + 1), np.uint8)
    TF = np.zeros((L1 + 1, L2 + 1), np.uint8)
    di, ii, jj = _shear_index(D, L1)
    c = codes[di, b, ii]
    TH[ii, jj] = c & 3
    TE[ii, jj] = (c >> 2) & 1
    TF[ii, jj] = (c >> 3) & 1
    return TH, TE, TF


def _traceback_global(TH, TE, TF, l1, l2):
    path = []
    i, j = l1, l2
    state = TH[i, j]
    while i > 0 or j > 0:
        if state == 0:
            if i == 0 or j == 0:
                break
            path.append((i - 1, j - 1))
            i -= 1
            j -= 1
            state = TH[i, j]
        elif state == 1:
            if i == 0:
                break
            path.append((i - 1, None))
            prev = TE[i, j]
            i -= 1
            state = 0 if prev == 0 else 1
        else:
            if j == 0:
                break
            path.append((None, j - 1))
            prev = TF[i, j]
            j -= 1
            state = 0 if prev == 0 else 2
    path.reverse()
    return path


def _traceback_local(TH, H_unused, l1, l2, bi, bj):
    # Reference semantics (align_node_embeddings.py:339-369): follow TH
    # until a stop cell; gap states continue via TH at the new cell.
    path = []
    i, j = bi, bj
    while i > 0 and j > 0 and TH[i, j] != 3:
        tb = TH[i, j]
        if tb == 0:
            path.append((i - 1, j - 1))
            i -= 1
            j -= 1
        elif tb == 1:
            path.append((i - 1, None))
            i -= 1
        elif tb == 2:
            path.append((None, j - 1))
            j -= 1
        else:
            break
    path.reverse()
    return path


def _pallas_eligible(L1: int, L2: int, mode: str) -> bool:
    """Use the Pallas VMEM kernel on TPU (global and local modes) for
    batches whose sheared score + code planes fit in VMEM
    (see ops.pallas_dp)."""
    if mode not in ("global", "local"):
        return False
    import jax

    if jax.default_backend() != "tpu":
        return False
    I = ((L1 + 1 + 127) // 128) * 128
    # x2: Pallas double-buffers the pipelined grid blocks, so the live
    # VMEM footprint is twice the single-block estimate
    return (L1 + L2) * I * 8 * 2 <= 12 * 1024 * 1024


def affine_align_batch(
    score_mats: list[np.ndarray],
    gap_open: float,
    gap_extend: float,
    mode: str = "global",
    backend: str = "auto",
    mesh=None,
) -> list[tuple[float, list]]:
    """Align a batch of similarity matrices; returns [(score, path)].

    Pads to the max (L1, L2) in the batch; run cost is one wavefront scan
    (or one Pallas VMEM kernel on TPU, backend='auto'|'pallas'|'lax')
    for the whole batch.

    ``mesh``: a 1-D ``('data',)`` device mesh (parallel/mesh.py) shards
    the batch dimension — pairs are independent, so the wavefront
    partitions with zero collectives.  Multi-chip runs use the XLA
    wavefront (the Pallas kernel is per-chip).
    """
    if backend != "lax" and mesh is None:
        from ginfinity_tpu.graphs.batching import _round_capacity as _rc

        # eligibility on the LADDER-ROUNDED dims align_batch_pallas pads
        # to — the kernel's VMEM footprint is set by those, not the raw
        # batch maxima
        L1 = _rc(max(m.shape[0] for m in score_mats))
        L2 = _rc(max(m.shape[1] for m in score_mats))
        if backend == "pallas" or _pallas_eligible(L1, L2, mode):
            from ginfinity_tpu.ops.pallas_dp import align_batch_pallas

            return align_batch_pallas(score_mats, gap_open, gap_extend, mode)
    from ginfinity_tpu.graphs.batching import _round_capacity

    B = len(score_mats)
    # pad the batch so it tiles the mesh; dummy 1x1 pairs are masked out
    # of the outputs below
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    B_pad = ((B + n_dev - 1) // n_dev) * n_dev
    # ladder-round so varying batch shapes reuse O(log L) compiled
    # programs (the wavefront is masked by the real l1/l2)
    L1 = _round_capacity(max(m.shape[0] for m in score_mats))
    L2 = _round_capacity(max(m.shape[1] for m in score_mats))
    scores = np.full((B_pad, L1, L2), 0.0, np.float32)
    l1 = np.ones(B_pad, np.int32)
    l2 = np.ones(B_pad, np.int32)
    for k, m in enumerate(score_mats):
        scores[k, : m.shape[0], : m.shape[1]] = m
        l1[k], l2[k] = m.shape

    if mesh is None:
        fn = _wavefront
        inputs = (jnp.asarray(scores), jnp.asarray(l1), jnp.asarray(l2))
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rows = NamedSharding(mesh, P("data"))
        fn = _wavefront_mesh(mesh)
        inputs = tuple(
            jax.device_put(x, rows) for x in (scores, l1, l2)
        )

    best, bi, bj, codes = fn(
        inputs[0], inputs[1], inputs[2], gap_open, gap_extend, mode,
    )
    best = np.asarray(best)
    bi = np.asarray(bi)
    bj = np.asarray(bj)
    codes = np.asarray(codes)

    out = []
    for k in range(B):
        TH, TE, TF = _codes_dense(codes, k, L1)
        # restrict to this pair's actual lengths
        if mode == "global":
            path = _traceback_global(TH, TE, TF, int(l1[k]), int(l2[k]))
        else:
            path = _traceback_local(TH, None, int(l1[k]), int(l2[k]), int(bi[k]), int(bj[k]))
        out.append((float(best[k]), path))
    return out


def affine_align(
    score: np.ndarray, gap_open: float, gap_extend: float, mode: str = "global"
) -> tuple[float, list]:
    """Single-pair convenience wrapper (reference
    needleman_wunsch_affine / smith_waterman_affine signature)."""
    return affine_align_batch([score], gap_open, gap_extend, mode)[0]
