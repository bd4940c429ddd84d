"""3-state affine pair-HMM forward/backward and profile-DP wavefronts.

TPU-native replacements for the reference MSA engine's numba kernels
(embed_msa.py:378-517 forward/backward, :874-985 profile DP), as batched
anti-diagonal ``lax.scan``s like :mod:`ginfinity_tpu.ops.dp`.

**Documented deviation (bug fix):** the reference's forward initializes
the global-mode start state to -inf (embed_msa.py:407: ``M[0,0] = 0.0 if
local else NEG_INF``) and its backward pass never feeds mass into the
gap states (:459-496), which makes the "posteriors" numerically
degenerate (finite only near one diagonal).  Here the forward/backward
is the actual ProbCons-style sum-product in log space:

  forward   M[i,j] = L[i-1,j-1] + lse(M,X,Y at [i-1,j-1]);  M[0,0] = 0
            X[i,j] = lse(M[i-1,j] + go, X[i-1,j] + ge)
            Y[i,j] = lse(M[i,j-1] + go, Y[i,j-1] + ge)
            Z = lse(M,X,Y at [La,Lb])
  backward  B_M[i,j] = lse(L[i,j] + B_M[i+1,j+1], go + B_X[i+1,j], go + B_Y[i,j+1])
            B_X[i,j] = lse(L[i,j] + B_M[i+1,j+1], ge + B_X[i+1,j])
            B_Y[i,j] = lse(L[i,j] + B_M[i+1,j+1], ge + B_Y[i,j+1])
  posterior P[i-1,j-1] = exp(M[i,j] + B_M[i,j] - Z)  in [0, 1].

The profile-DP (`profile_align`) replicates the reference recurrence
exactly (max-merge of all three states into M plus the column score;
embed_msa.py:874-930) including its value-based traceback semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = jnp.float32(-1e30)


def _lse2(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG)
    return jnp.where(
        m <= NEG, NEG, m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))
    )


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG)
    return jnp.where(
        m <= NEG,
        NEG,
        m_safe
        + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)),
    )


def _lse_masked_rows(vals, mask):
    """Per-row logsumexp over masked entries; NEG where the mask is
    empty."""
    v = jnp.where(mask, vals, NEG)
    m = jnp.max(v, axis=1)
    m_safe = jnp.maximum(m, NEG)
    s = jnp.sum(jnp.where(mask, jnp.exp(v - m_safe[:, None]), 0.0), axis=1)
    return jnp.where(m <= NEG, NEG, m_safe + jnp.log(jnp.maximum(s, 1e-38)))


@partial(jax.jit, static_argnames=("local",))
def _forward(L, l1, l2, go, ge, local: bool = False):
    """Sum-product forward. Returns (M_diag [D+1, B, I], Z [B]).

    ``local=True`` switches to the local model: every match cell may
    start a fresh alignment (the +1 restart term in the M merge), there
    are no leading-gap boundary chains, and Z sums alignment weight over
    ALL match cells (end-anywhere, end-in-match).  This is the
    sum-product counterpart of the reference's heuristic local mode
    (embed_msa.py:397-517, ``local=1``)."""
    B, L1, L2 = L.shape
    D = L1 + L2
    iidx = jnp.arange(L1 + 1)

    def shift_down(x, fill=NEG):
        return jnp.concatenate([jnp.full((B, 1), fill, x.dtype), x[:, :-1]], axis=1)

    # The M-merge needs M, X, Y at diag d-2; carry two past diagonals of each.
    def step2(carry, d):
        M1, M2, X1, X2, Y1, Y2, Z, Mend = carry
        j = d - iidx
        jf = j.astype(jnp.float32)
        valid = (iidx <= l1[:, None]) & (j[None, :] >= 0) & (j[None, :] <= l2[:, None])

        si = jnp.clip(iidx - 1, 0, L1 - 1)
        sj = jnp.clip(j - 1, 0, L2 - 1)
        s = L[:, si, sj]

        Mdd = shift_down(M2)  # M[i-1, j-1]
        Xdd = shift_down(X2)
        Ydd = shift_down(Y2)
        merge = _lse3(Mdd, Xdd, Ydd)
        if local:
            merge = _lse2(merge, jnp.zeros_like(merge))  # restart at (i, j)
        M = s + merge

        Mup = shift_down(M1)  # M[i-1, j]
        Xup = shift_down(X1)
        X = _lse2(Mup + go, Xup + ge)
        Y = _lse2(M1 + go, Y1 + ge)  # M[i, j-1], Y[i, j-1]

        # boundaries
        is_i0 = iidx[None, :] == 0
        is_j0 = j[None, :] == 0
        # M[0,0] = 0 handled in init (d=0); M on boundary rows = NEG
        M = jnp.where(is_i0 | is_j0, NEG, M)
        if local:
            # no leading-gap chains: local alignments start at a match
            X = jnp.where(is_i0 | is_j0, NEG, X)
            Y = jnp.where(is_i0 | is_j0, NEG, Y)
        else:
            # X[i,0] = go + ge*(i-1); X[0,j] = NEG
            X = jnp.where(
                is_j0,
                go + ge * (iidx[None, :].astype(jnp.float32) - 1.0),
                jnp.where(is_i0, NEG, X),
            )
            Y = jnp.where(is_i0, go + ge * (jf[None, :] - 1.0), jnp.where(is_j0, NEG, Y))

        M = jnp.where(valid, M, NEG)
        X = jnp.where(valid, X, NEG)
        Y = jnp.where(valid, Y, NEG)

        if local:
            # Z accumulates every in-range match cell (end anywhere)
            match_ok = valid & ~is_i0 & ~is_j0
            Z = _lse2(Z, _lse_masked_rows(M, match_ok))
        else:
            at_end = d == (l1 + l2)
            m_end = jnp.take_along_axis(M, l1[:, None], axis=1)[:, 0]
            x_end = jnp.take_along_axis(X, l1[:, None], axis=1)[:, 0]
            y_end = jnp.take_along_axis(Y, l1[:, None], axis=1)[:, 0]
            Z = jnp.where(at_end, _lse3(m_end, x_end, y_end), Z)

        return (M, M1, X, X1, Y, Y1, Z, Mend), M

    M0 = jnp.full((B, L1 + 1), NEG).at[:, 0].set(0.0 if not local else NEG)
    X0 = jnp.full((B, L1 + 1), NEG)
    Y0 = jnp.full((B, L1 + 1), NEG)
    Mm1 = jnp.full((B, L1 + 1), NEG)  # "diag -1"
    Z0 = jnp.full((B,), NEG)

    (_, _, _, _, _, _, Z, _), Ms = jax.lax.scan(
        step2,
        (M0, Mm1, X0, Mm1, Y0, Mm1, Z0, Z0),
        jnp.arange(1, D + 1),
    )
    # prepend diag 0
    Ms = jnp.concatenate([M0[None], Ms], axis=0)  # [D+1, B, I]
    return Ms, Z


@partial(jax.jit, static_argnames=("local",))
def _backward(L, l1, l2, go, ge, local: bool = False):
    """Sum-product backward; returns B_M over diagonals [D+1, B, I].

    ``local=True``: every match cell may END an alignment (a +1 term in
    B_M), replacing the global mode's end-at-(l1,l2) condition."""
    B, L1, L2 = L.shape
    D = L1 + L2
    iidx = jnp.arange(L1 + 1)

    def shift_up(x, fill=NEG):
        # x[:, i] -> value at i+1
        return jnp.concatenate([x[:, 1:], jnp.full((B, 1), fill, x.dtype)], axis=1)

    def step(carry, d):
        # processing diagonal d (descending); carry holds diag d+1 and d+2
        BM1, BM2, BX1, BY1 = carry
        j = d - iidx
        valid = (iidx <= l1[:, None]) & (j[None, :] >= 0) & (j[None, :] <= l2[:, None])
        in_range = (iidx[None, :] < l1[:, None]) & (j[None, :] < l2[:, None])

        # L[i, j] for transition out of (i, j)
        si = jnp.clip(iidx, 0, L1 - 1)
        sj = jnp.clip(j, 0, L2 - 1)
        s = L[:, si, sj]
        s = jnp.where(in_range, s, NEG)

        BMdd = shift_up(BM2)  # B_M[i+1, j+1] lives on diag d+2 at index i+1
        BXup = shift_up(BX1)  # B_X[i+1, j] on diag d+1 at index i+1
        BYright = BY1  # B_Y[i, j+1] on diag d+1 at index i

        diag_term = s + BMdd
        can_gap_x = iidx[None, :] < l1[:, None]
        can_gap_y = j[None, :] < l2[:, None]
        gx = jnp.where(can_gap_x, go + BXup, NEG)
        gy = jnp.where(can_gap_y, go + BYright, NEG)
        BM = _lse3(diag_term, gx, gy)
        BX = _lse2(diag_term, jnp.where(can_gap_x, ge + BXup, NEG))
        BY = _lse2(diag_term, jnp.where(can_gap_y, ge + BYright, NEG))

        if local:
            # any in-range match cell can end the alignment
            is_match = (iidx[None, :] >= 1) & (j[None, :] >= 1)
            BM = jnp.where(is_match, _lse2(BM, jnp.zeros_like(BM)), BM)
        else:
            # end cell (l1, l2): all states end with log-prob 0
            at_end_cell = (iidx[None, :] == l1[:, None]) & (j[None, :] == l2[:, None])
            BM = jnp.where(at_end_cell, 0.0, BM)
            BX = jnp.where(at_end_cell, 0.0, BX)
            BY = jnp.where(at_end_cell, 0.0, BY)

        BM = jnp.where(valid, BM, NEG)
        BX = jnp.where(valid, BX, NEG)
        BY = jnp.where(valid, BY, NEG)
        return (BM, BM1, BX, BY), BM

    init = (
        jnp.full((B, L1 + 1), NEG),
        jnp.full((B, L1 + 1), NEG),
        jnp.full((B, L1 + 1), NEG),
        jnp.full((B, L1 + 1), NEG),
    )
    _, BMs = jax.lax.scan(step, init, jnp.arange(D, -1, -1))
    return BMs[::-1]  # [D+1, B, I], diag-major ascending


@partial(jax.jit, static_argnames=("local",))
def _posteriors_dense(L, l1, l2, go, ge, local: bool = False):
    """forward + backward + dense posteriors in ONE program.

    Returns [B, L1, L2] — the diagonal-major state tensors (each ~10x
    larger than the posteriors) never leave the device, and the
    unshearing is a gather here instead of a per-diagonal host loop."""
    B, L1, L2 = L.shape
    Ms, Z = _forward(L, l1, l2, go, ge, local=local)
    BMs = _backward(L, l1, l2, go, ge, local=local)
    # cell (i+1, j+1) lives on diagonal i+j+2 at index i+1
    ii = jnp.arange(L1)[:, None]
    jj = jnp.arange(L2)[None, :]
    dsel = ii + jj + 2
    isel = jnp.broadcast_to(ii + 1, (L1, L2))
    Mf = jnp.transpose(Ms, (1, 0, 2))[:, dsel, isel]  # [B, L1, L2]
    Mb = jnp.transpose(BMs, (1, 0, 2))[:, dsel, isel]
    return jnp.exp(jnp.clip(Mf + Mb - Z[:, None, None], -80.0, 0.0))


def pairhmm_posteriors(
    score_mats: list[np.ndarray], gap_open: float, gap_extend: float,
    mode: str = "global",
) -> list[np.ndarray]:
    """Batched match posteriors P(i~j) for log-odds matrices.

    Pads to the batch max shape; returns per-pair [La, Lb] float32 in
    [0, 1].  ``mode="local"`` uses the restart/end-anywhere local model
    (reference ``--use-local``, embed_msa.py:397-517)."""
    if mode not in ("global", "local"):
        raise ValueError(f"mode must be 'global' or 'local', got {mode!r}")
    local = mode == "local"
    from ginfinity_tpu.graphs.batching import _round_capacity

    B = len(score_mats)
    # ladder-round padded dims so program variants stay O(log L) across
    # batches (cold TPU compiles cost minutes; recurrences are masked by
    # the real l1/l2, so padding does not change real-region values)
    L1 = _round_capacity(max(m.shape[0] for m in score_mats))
    L2 = _round_capacity(max(m.shape[1] for m in score_mats))
    L = np.full((B, L1, L2), -1e4, np.float32)
    l1 = np.zeros(B, np.int32)
    l2 = np.zeros(B, np.int32)
    for k, m in enumerate(score_mats):
        L[k, : m.shape[0], : m.shape[1]] = m
        l1[k], l2[k] = m.shape

    P = np.asarray(_posteriors_dense(
        jnp.asarray(L), jnp.asarray(l1), jnp.asarray(l2),
        jnp.float32(gap_open), jnp.float32(gap_extend), local=local,
    ))
    return [
        P[k, : m.shape[0], : m.shape[1]].astype(np.float32)
        for k, m in enumerate(score_mats)
    ]


@partial(jax.jit, static_argnames=("local", "topk", "use_base"))
def _pair_posteriors_from_embs(embs, lens, ia, ib, alpha, beta, go, ge, pmin,
                               local: bool, topk: int,
                               base_embs=None, has_base=None, seq_weight=None,
                               use_base: bool = False):
    """Embedding-resident posterior stage for a batch of pairs.

    embs [N, Lcap, d] (rows L2-normalized, zero-padded), lens [N];
    ia/ib [B] pair indices.  Computes cosine scores, log-odds
    calibration, forward/backward posteriors, and row∩col top-k
    sparsification all on device; returns per-pair row-compacted kept
    entries (kvals/kidx [B, Lcap, k]) plus the expected score — a few
    hundred KB per batch instead of the ~15 MB of score-matrix upload +
    dense-posterior download per 64 pairs.

    ``use_base=True`` blends base-embedding cosine similarities by
    ``seq_weight`` for pairs where BOTH records carry base embeddings
    (``has_base`` [N] 0/1; reference embed_msa.py dual-modality rule).
    """
    Lcap = embs.shape[1]
    A = embs[ia]
    Bm = embs[ib]
    S = jnp.einsum("bld,bmd->blm", A, Bm, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    if use_base:
        Sb = jnp.einsum(
            "bld,bmd->blm", base_embs[ia], base_embs[ib],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        wb = (seq_weight * has_base[ia] * has_base[ib])[:, None, None]
        S = (1.0 - wb) * S + wb * Sb
    l1 = lens[ia]
    l2 = lens[ib]
    rows = jnp.arange(Lcap)
    mask = (rows[None, :, None] < l1[:, None, None]) & (
        rows[None, None, :] < l2[:, None, None]
    )
    x = alpha * S + beta
    p = jnp.clip(jax.nn.sigmoid(x), 1e-6, 1.0 - 1e-6)
    L = jnp.where(mask, jnp.log(p) - jnp.log1p(-p), -1e4)
    P = _posteriors_dense(L, l1, l2, go, ge, local=local)

    k = min(topk, Lcap)
    row_kth = jax.lax.top_k(P, k)[0][..., -1:]
    col_kth = jnp.swapaxes(
        jax.lax.top_k(jnp.swapaxes(P, -1, -2), k)[0][..., -1:], -1, -2
    )
    keep = (P >= row_kth) & (P >= col_kth) & (P >= pmin) & mask
    Pk = jnp.where(keep, P, 0.0)
    expected = jnp.sum(S * Pk, axis=(-1, -2))
    kvals, kidx = jax.lax.top_k(Pk, k)  # kept entries sit in the row top-k
    return kvals, kidx.astype(jnp.int32), expected


_PAIR_POST_SHARDED_CACHE: dict = {}


def pair_posteriors_from_embs_sharded(mesh, embs, lens, ia, ib, alpha, beta,
                                      go, ge, pmin, local: bool, topk: int,
                                      base_embs=None, has_base=None,
                                      seq_weight=None, use_base: bool = False):
    """Mesh variant of :func:`_pair_posteriors_from_embs`: the pair axis
    (ia/ib) shards over the mesh's 'data' axis, embeddings replicate
    (they are the small operand — pairs are the O(N^2) scale axis), and
    the per-pair slabs come back sharded.  Pairs are embarrassingly
    parallel, so no collectives appear on this path.  The batch size
    must divide by the mesh size (callers pad with repeats of pair 0)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = (mesh, bool(local), int(topk), bool(use_base))
    fn = _PAIR_POST_SHARDED_CACHE.get(key)
    if fn is None:
        repl = NamedSharding(mesh, P())
        rows = NamedSharding(mesh, P("data"))
        if use_base:
            def impl(embs, lens, ia, ib, alpha, beta, go, ge, pmin,
                     base_embs, has_base, seq_weight):
                return _pair_posteriors_from_embs.__wrapped__(
                    embs, lens, ia, ib, alpha, beta, go, ge, pmin,
                    local, topk, base_embs, has_base, seq_weight, True,
                )

            fn = jax.jit(
                impl,
                in_shardings=(repl,) * 2 + (rows,) * 2 + (repl,) * 8,
                out_shardings=(rows, rows, rows),
            )
        else:
            def impl(embs, lens, ia, ib, alpha, beta, go, ge, pmin):
                return _pair_posteriors_from_embs.__wrapped__(
                    embs, lens, ia, ib, alpha, beta, go, ge, pmin,
                    local, topk,
                )

            fn = jax.jit(
                impl,
                in_shardings=(repl,) * 2 + (rows,) * 2 + (repl,) * 5,
                out_shardings=(rows, rows, rows),
            )
        _PAIR_POST_SHARDED_CACHE[key] = fn
    if use_base:
        return fn(embs, lens, ia, ib, alpha, beta, go, ge, pmin,
                  base_embs, has_base, seq_weight)
    return fn(embs, lens, ia, ib, alpha, beta, go, ge, pmin)


@jax.jit
def _profile_wavefront(S, l1, l2, go, ge):
    B, L1, L2 = S.shape
    D = L1 + L2
    iidx = jnp.arange(L1 + 1)

    def shift_down(x, fill=NEG):
        return jnp.concatenate([jnp.full((B, 1), fill, x.dtype), x[:, :-1]], axis=1)

    def step(carry, d):
        M1, M2, X1, X2, Y1, Y2 = carry
        j = d - iidx
        valid = (iidx <= l1[:, None]) & (j[None, :] >= 0) & (j[None, :] <= l2[:, None])
        si = jnp.clip(iidx - 1, 0, L1 - 1)
        sj = jnp.clip(j - 1, 0, L2 - 1)
        s = S[:, si, sj]

        Mdd, Xdd, Ydd = shift_down(M2), shift_down(X2), shift_down(Y2)
        M = s + jnp.maximum(jnp.maximum(Mdd, Xdd), Ydd)
        Mup, Xup = shift_down(M1), shift_down(X1)
        X = jnp.maximum(Mup + go, Xup + ge)
        Y = jnp.maximum(M1 + go, Y1 + ge)

        is_i0 = iidx[None, :] == 0
        is_j0 = j[None, :] == 0
        M = jnp.where(is_i0 | is_j0, NEG, M)
        # Boundary chains X[i,0] = max(M[i-1,0]+go, X[i-1,0]+ge) telescope to
        # go + ge*(i-1) (embed_msa.py:887-890); encode in closed form.
        X = jnp.where(
            is_j0 & (iidx[None, :] >= 1),
            go + ge * (iidx[None, :].astype(jnp.float32) - 1.0),
            X,
        )
        Y = jnp.where(
            is_i0 & (j[None, :] >= 1),
            go + ge * (j[None, :].astype(jnp.float32) - 1.0),
            Y,
        )

        M = jnp.where(valid, M, NEG)
        X = jnp.where(valid, X, NEG)
        Y = jnp.where(valid, Y, NEG)
        return (M, M1, X, X1, Y, Y1), (M, X, Y)

    M0 = jnp.full((B, L1 + 1), NEG).at[:, 0].set(0.0)
    X0 = jnp.full((B, L1 + 1), NEG)
    Y0 = jnp.full((B, L1 + 1), NEG)
    Mm1 = jnp.full((B, L1 + 1), NEG)
    _, (Ms, Xs, Ys) = jax.lax.scan(
        step, (M0, Mm1, X0, Mm1, Y0, Mm1), jnp.arange(1, D + 1)
    )
    pre = lambda z0, zs: jnp.concatenate([z0[None], zs], axis=0)
    return pre(M0, Ms), pre(X0, Xs), pre(Y0, Ys)


def profile_align(S: np.ndarray, gap_open: float, gap_extend: float):
    """Run the reference's profile-profile affine DP on one score matrix.

    Returns dense (M, X, Y) [(L1+1, L2+1)] for the reference's
    value-based traceback (embed_msa.py:1042-1054).

    Shapes are ladder-rounded before compilation: progressive alignment
    calls this with a different (L1, L2) at every merge, and per-shape
    TPU compiles would dominate the pipeline."""
    return profile_align_batch([S], gap_open, gap_extend)[0]


@partial(jax.jit, static_argnames=())
def _profile_dense(S, l1, l2, go, ge):
    """Wavefront + on-device unshear to dense [B, L1+1, L2+1] M/X/Y."""
    B, L1, L2 = S.shape
    Ms, Xs, Ys = _profile_wavefront(S, l1, l2, go, ge)
    ii = jnp.arange(L1 + 1)[:, None]
    jj = jnp.arange(L2 + 1)[None, :]
    dsel = ii + jj  # cell (i, j) lives on diagonal i+j at index i
    isel = jnp.broadcast_to(ii, (L1 + 1, L2 + 1))
    un = lambda Zs: jnp.transpose(Zs, (1, 0, 2))[:, dsel, isel]
    return un(Ms), un(Xs), un(Ys)


def _value_traceback(M, X, Y, l1, l2):
    """The reference's VALUE-BASED traceback on dense [B, L1+1, L2+1]
    M/X/Y (embed_msa.py:1042-1054 selection semantics, including the
    M-then-X-then-Y strict-greater priority).  Returns op codes in
    traceback (reverse) order: 0 match, 1 gap-in-B, 2 gap-in-A,
    3 padding."""
    n_steps = (M.shape[1] - 1) + (M.shape[2] - 1)

    def one(Mk, Xk, Yk, a, b):
        def step(carry, _):
            i, j, done = carry
            neg = jnp.float32(-1e30)
            cm = jnp.where((i > 0) & (j > 0), Mk[i, j], neg)
            state = jnp.int32(0)
            best = cm
            cx = jnp.where(i > 0, Xk[i, j], neg)
            state = jnp.where(cx > best, 1, state)
            best = jnp.maximum(best, cx)
            cy = jnp.where(j > 0, Yk[i, j], neg)
            state = jnp.where(cy > best, 2, state)
            active = (done == 0) & ((i > 0) | (j > 0))
            di = jnp.where(active & (state != 2), 1, 0)
            dj = jnp.where(active & (state != 1), 1, 0)
            op = jnp.where(active, state, 3).astype(jnp.int8)
            i2, j2 = i - di, j - dj
            done2 = jnp.where((i2 == 0) & (j2 == 0), jnp.int32(1), done)
            return (i2, j2, done2), op

        _, ops = jax.lax.scan(
            step, (a, b, jnp.int32(0)), None, length=n_steps
        )
        return ops

    return jax.vmap(one)(M, X, Y, l1, l2)


def _profile_ops_impl(S, l1, l2, go, ge):
    """Dense profile DP + value traceback, both on device.  Un-jitted
    body so the device-resident progressive pool (ops/profile_pool.py)
    can inline it into its own level program."""
    M, X, Y = _profile_dense(S, l1, l2, go, ge)
    return _value_traceback(M, X, Y, l1, l2)


_profile_ops = jax.jit(_profile_ops_impl)


# ==========================================================================
# Reference-EXACT profile DP (bit-for-bit float32 parity)
#
# The reference's progressive DP runs in pure-Python float32 when numba
# is absent (embed_msa.py:874-930 under the no-op njit shim): the column
# dot product accumulates SEQUENTIALLY over the embedding dim with an
# f32 rounding per term, and the match update rounds twice —
# (best_prev + s) then + comp.  Competing co-optimal paths in profile
# alignment differ by ~1e-5 at L~300 score magnitudes (~370), which is
# BELOW the f32 noise floor of any differently-ordered evaluation — so
# two correct f32 implementations of the same recurrence systematically
# pick different merge paths, and the measured alignment quality tracks
# the reference's realization (N=50/L=300 families: reference-realization
# DP 0.112-0.123 SP-F1 vs exact-dot/XLA-ordered DP 0.096-0.104 across
# input shuffles — the gap is systematic, not tie-luck).
#
# TPU f32 multiply/add/max are IEEE-exact and XLA:TPU does not
# FMA-contract these elementwise ops, so the kernel below reproduces the
# reference's DP matrices BIT-FOR-BIT (asserted on device), which with
# the exact traceback + merge bookkeeping makes profile-mode progressive
# alignment byte-identical to the reference's given the same guide tree.
# ==========================================================================


def _seq_dot_scores(MUA, MUB):
    """[B, P, d] x [B, Q, d] -> [B, P, Q] with the reference's SEQUENTIAL
    f32 accumulation order: one rounded multiply + one rounded add per
    embedding dim (no FMA, no tree reduction)."""
    B, P, _ = MUA.shape
    Q = MUB.shape[1]

    def step(S, ab):
        a, b = ab
        prod = a[:, :, None] * b[:, None, :]
        return S + prod, None

    S, _ = jax.lax.scan(
        step,
        jnp.zeros((B, P, Q), jnp.float32),
        (jnp.moveaxis(MUA, 2, 0), jnp.moveaxis(MUB, 2, 0)),
    )
    return S


def _profile_wavefront_exact(S, C, l1, l2, go, ge):
    """Wavefront profile DP with the reference's exact f32 op order:
    M = (best_prev + s) + comp, two separately-rounded adds, and the
    X/Y boundary chains evaluated by the recurrence itself (the closed
    form go + ge*(i-1) rounds differently for non-representable ge)."""
    B, L1, L2 = S.shape
    D = L1 + L2
    iidx = jnp.arange(L1 + 1)

    def shift_down(x, fill=NEG):
        return jnp.concatenate([jnp.full((B, 1), fill, x.dtype), x[:, :-1]], axis=1)

    def step(carry, d):
        M1, M2, X1, X2, Y1, Y2 = carry
        j = d - iidx
        valid = (iidx <= l1[:, None]) & (j[None, :] >= 0) & (j[None, :] <= l2[:, None])
        si = jnp.clip(iidx - 1, 0, L1 - 1)
        sj = jnp.clip(j - 1, 0, L2 - 1)
        s = S[:, si, sj]
        c = C[:, si, sj]

        Mdd, Xdd, Ydd = shift_down(M2), shift_down(X2), shift_down(Y2)
        M = (jnp.maximum(jnp.maximum(Mdd, Xdd), Ydd) + s) + c
        Mup, Xup = shift_down(M1), shift_down(X1)
        X = jnp.maximum(Mup + go, Xup + ge)
        Y = jnp.maximum(M1 + go, Y1 + ge)

        is_i0 = iidx[None, :] == 0
        is_j0 = j[None, :] == 0
        M = jnp.where(is_i0 | is_j0, NEG, M)
        # X[i,0] and Y[0,j] come out of the recurrence itself: the NEG
        # fills absorb the go/ge adds exactly at f32 (-1e30 - 10 rounds
        # to -1e30), matching the reference's boundary chain bits.
        X = jnp.where(is_i0 & is_j0, NEG, X)
        Y = jnp.where(is_i0 & is_j0, NEG, Y)

        M = jnp.where(valid, M, NEG)
        X = jnp.where(valid, X, NEG)
        Y = jnp.where(valid, Y, NEG)
        return (M, M1, X, X1, Y, Y1), (M, X, Y)

    M0 = jnp.full((B, L1 + 1), NEG).at[:, 0].set(0.0)
    X0 = jnp.full((B, L1 + 1), NEG)
    Y0 = jnp.full((B, L1 + 1), NEG)
    Mm1 = jnp.full((B, L1 + 1), NEG)
    _, (Ms, Xs, Ys) = jax.lax.scan(
        step, (M0, Mm1, X0, Mm1, Y0, Mm1), jnp.arange(1, D + 1)
    )
    pre = lambda z0, zs: jnp.concatenate([z0[None], zs], axis=0)
    return pre(M0, Ms), pre(X0, Xs), pre(Y0, Ys)


def _comp_bonus(STA, STB):
    """[B, P] x [B, Q] -> [B, P, Q] stem-compatibility bonus (0.2 when
    both columns are on the same side of the 0.5 stem-fraction split;
    embed_msa.py:897-899)."""
    agree = (STA[:, :, None] >= 0.5) == (STB[:, None, :] >= 0.5)
    return jnp.where(agree, jnp.float32(0.2), jnp.float32(0.0))


def _profile_ops_from_split_scores(S, C, l1, l2, go, ge):
    """Exact wavefront on split (dot, comp) scores + value traceback.
    Un-jitted body so the progressive pool can inline it."""
    B, L1, L2 = S.shape
    Mw, Xw, Yw = _profile_wavefront_exact(S, C, l1, l2, go, ge)
    ii = jnp.arange(L1 + 1)[:, None]
    jj = jnp.arange(L2 + 1)[None, :]
    dsel = ii + jj
    isel = jnp.broadcast_to(ii, (L1 + 1, L2 + 1))
    un = lambda Zs: jnp.transpose(Zs, (1, 0, 2))[:, dsel, isel]
    return _value_traceback(un(Mw), un(Xw), un(Yw), l1, l2)


def _profile_ops_exact_impl(MUA, MUB, STA, STB, l1, l2, go, ge,
                            MBA=None, MBB=None, sw=None):
    """Reference-exact profile DP + value traceback from raw column
    embeddings.  Dual modality follows the reference's op order too:
    s = (1-w)*s_struct + w*s_base with separately-rounded f32 terms
    (embed_msa.py:955-960)."""
    S = _seq_dot_scores(MUA, MUB)
    if MBA is not None:
        Sb = _seq_dot_scores(MBA, MBB)
        S = (jnp.float32(1.0) - sw) * S + sw * Sb
    C = _comp_bonus(STA, STB)
    return _profile_ops_from_split_scores(S, C, l1, l2, go, ge)


_profile_ops_exact = jax.jit(_profile_ops_exact_impl)


def profile_align_batch_ops_exact(
    mu_pairs: list[tuple[np.ndarray, np.ndarray]],
    stem_pairs: list[tuple[np.ndarray, np.ndarray]],
    gap_open: float, gap_extend: float,
    base_pairs: list[tuple[np.ndarray, np.ndarray]] | None = None,
    seq_weight: float = 0.0,
) -> list[np.ndarray]:
    """Batched reference-exact profile DP from raw column embeddings;
    returns forward-order op sequences like profile_align_batch_ops."""
    B = len(mu_pairs)
    Bp = _pow2_batch(B)
    from ginfinity_tpu.graphs.batching import _round_capacity

    P = _round_capacity(max(
        max(a.shape[0] for a, _ in mu_pairs),
        max(b.shape[0] for _, b in mu_pairs),
    ))
    d = mu_pairs[0][0].shape[1]
    MUA = np.zeros((Bp, P, d), np.float32)
    MUB = np.zeros((Bp, P, d), np.float32)
    STA = np.zeros((Bp, P), np.float32)
    STB = np.zeros((Bp, P), np.float32)
    l1 = np.zeros(Bp, np.int32)
    l2 = np.zeros(Bp, np.int32)
    for k, ((a, b), (sa, sb)) in enumerate(zip(mu_pairs, stem_pairs)):
        MUA[k, : a.shape[0]] = a
        MUB[k, : b.shape[0]] = b
        STA[k, : sa.shape[0]] = sa
        STB[k, : sb.shape[0]] = sb
        l1[k], l2[k] = a.shape[0], b.shape[0]
    kw = {}
    if base_pairs is not None and seq_weight > 0.0:
        db = next((a.shape[1] for a, _ in base_pairs if a is not None), 0)
        if db:
            MBA = np.zeros((Bp, P, db), np.float32)
            MBB = np.zeros((Bp, P, db), np.float32)
            for k, (a, b) in enumerate(base_pairs):
                if a is not None:
                    MBA[k, : a.shape[0]] = a
                if b is not None:
                    MBB[k, : b.shape[0]] = b
            kw = {"MBA": jnp.asarray(MBA), "MBB": jnp.asarray(MBB),
                  "sw": jnp.float32(seq_weight)}
    ops = np.asarray(
        _profile_ops_exact(
            jnp.asarray(MUA), jnp.asarray(MUB), jnp.asarray(STA),
            jnp.asarray(STB), jnp.asarray(l1), jnp.asarray(l2),
            jnp.float32(gap_open), jnp.float32(gap_extend), **kw,
        )
    )
    return [ops[k][ops[k] != 3][::-1].copy() for k in range(B)]


def _pow2_batch(b: int) -> int:
    p = 1
    while p < b:
        p *= 2
    return p


def _profile_pad_shape(S_list: list[np.ndarray]) -> tuple[int, int]:
    """Padded (batch, square-dim) for a profile-DP call.

    Progressive alignment issues one device program per tree level with a
    DIFFERENT batch size at every level (and a long batch=1 caterpillar
    tail on NJ trees), so each distinct (B, P1, P2) costs a ~1.5 s
    persistent-cache executable load per fresh process — measured 11
    distinct shapes = ~17 s of the 200x300 family's progressive stage
    while the warm dispatch itself is ~50 ms.  Padding B to powers of
    two and both length dims to one shared ladder cap collapses the
    program set to a handful of shapes that `prewarm_profile_programs`
    can load in the background before the stage starts."""
    from ginfinity_tpu.graphs.batching import _round_capacity

    Bp = _pow2_batch(len(S_list))
    P = max(
        _round_capacity(max(s.shape[0] for s in S_list)),
        _round_capacity(max(s.shape[1] for s in S_list)),
    )
    return Bp, P


def profile_align_batch_ops(S_list: list[np.ndarray], gap_open: float,
                            gap_extend: float) -> list[np.ndarray]:
    """Batched profile DP returning per-pair traceback op sequences
    (0 match, 1 gap-in-B, 2 gap-in-A, forward order) computed ON DEVICE
    — only [B, L1+L2] int8 codes come over the link instead of three
    dense DP tensors (~110 MB per progressive-alignment round at family
    scale)."""
    B = len(S_list)
    Bp, P = _profile_pad_shape(S_list)
    Sp = np.full((Bp, P, P), -1e4, np.float32)
    l1 = np.zeros(Bp, np.int32)
    l2 = np.zeros(Bp, np.int32)
    for k, sm in enumerate(S_list):
        Sp[k, : sm.shape[0], : sm.shape[1]] = sm
        l1[k], l2[k] = sm.shape
    ops = np.asarray(
        _profile_ops(
            jnp.asarray(Sp), jnp.asarray(l1), jnp.asarray(l2),
            jnp.float32(gap_open), jnp.float32(gap_extend),
        )
    )
    return [ops[k][ops[k] != 3][::-1].copy() for k in range(B)]


def prewarm_profile_programs(l_cap: int, b_max: int,
                             exact_dims: tuple[int, int] | None = None):
    """Load/compile the progressive-DP program ladder in the background.

    Call at pipeline entry (lengths known, guide tree not yet built):
    the executable loads overlap the posterior/consistency stages so the
    progressive stage never blocks on a per-shape program load.  Inputs
    are created on device (`jnp.zeros`) — nothing crosses the host link.
    Returns the thread; `.join()` is optional.

    ``exact_dims=(d, base_dim)`` warms the reference-exact kernel
    (profile-mode default) instead of the S-matrix kernel; base_dim 0
    warms the struct-only signature."""
    import threading

    from ginfinity_tpu.graphs.batching import _round_capacity

    P = _round_capacity(max(2, l_cap))
    batches = []
    b = 1
    while b <= _pow2_batch(max(1, b_max)):
        batches.append(b)
        b *= 2
    stop = threading.Event()

    def work():
        from ginfinity_tpu.utils.jaxinit import prewarm_gate_wait

        # foreground-priority gate (see library_pool's twin)
        if not prewarm_gate_wait(stop):
            return
        for B in batches:
            if stop.is_set():
                return
            try:
                if exact_dims is not None:
                    d, db = exact_dims
                    kw = {}
                    if db:
                        kw = {"MBA": jnp.zeros((B, P, db), jnp.float32),
                              "MBB": jnp.zeros((B, P, db), jnp.float32),
                              "sw": jnp.float32(0.5)}
                    r = _profile_ops_exact(
                        jnp.zeros((B, P, d), jnp.float32),
                        jnp.zeros((B, P, d), jnp.float32),
                        jnp.zeros((B, P), jnp.float32),
                        jnp.zeros((B, P), jnp.float32),
                        jnp.ones((B,), jnp.int32),
                        jnp.ones((B,), jnp.int32),
                        jnp.float32(-1.0), jnp.float32(-0.1), **kw,
                    )
                else:
                    r = _profile_ops(
                        jnp.zeros((B, P, P), jnp.float32),
                        jnp.ones((B,), jnp.int32),
                        jnp.ones((B,), jnp.int32),
                        jnp.float32(-1.0), jnp.float32(-0.1),
                    )
                jax.block_until_ready(r)
            except Exception:  # pragma: no cover - best-effort warmup
                return

    from ginfinity_tpu.utils.jaxinit import register_prewarm_thread

    t = threading.Thread(target=work, daemon=True, name="profile-dp-prewarm")
    register_prewarm_thread(t, stop)
    t.start()
    return t


def profile_align_batch(S_list: list[np.ndarray], gap_open: float,
                        gap_extend: float):
    """Batched profile DP: pads every score matrix to the ladder-rounded
    batch max and runs ONE program; returns per-pair dense (M, X, Y)
    cropped to the real (L1+1, L2+1)."""
    B = len(S_list)
    Bp, P = _profile_pad_shape(S_list)
    P1 = P2 = P
    Sp = np.full((Bp, P1, P2), -1e4, np.float32)
    l1 = np.zeros(Bp, np.int32)
    l2 = np.zeros(Bp, np.int32)
    for k, s in enumerate(S_list):
        Sp[k, : s.shape[0], : s.shape[1]] = s
        l1[k], l2[k] = s.shape
    M, X, Y = (
        np.asarray(z)
        for z in _profile_dense(
            jnp.asarray(Sp), jnp.asarray(l1), jnp.asarray(l2),
            jnp.float32(gap_open), jnp.float32(gap_extend),
        )
    )
    return [
        (M[k, : a + 1, : b + 1], X[k, : a + 1, : b + 1], Y[k, : a + 1, : b + 1])
        for k, (a, b) in enumerate(zip(l1[:B], l2[:B]))
    ]
