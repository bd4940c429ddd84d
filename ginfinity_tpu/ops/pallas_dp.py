"""Pallas TPU kernel: affine-gap alignment wavefront in VMEM.

The lax.scan wavefront (:mod:`ginfinity_tpu.ops.dp`) schedules one XLA
step per anti-diagonal (L1+L2 steps of small [B, I] ops).  This kernel
runs the ENTIRE DP inside one Pallas program per pair: the three state
diagonals live in VMEM scratch, the diagonal loop is an on-core
``fori_loop``, and only packed traceback codes stream back to HBM.

The score matrix is pre-sheared on the XLA side into diagonal-major
layout ``S[d, i] = scores[i-1, d-i]`` so every kernel read is a
contiguous row — no in-kernel gathers (Mosaic-friendly).

Semantics identical to ``ops.dp._wavefront`` in BOTH modes (global NW
and local SW, same tie-breaking incl. the first-max argmax of the local
best cell); verified against it in tests, and transitively against the
reference aligner (align_node_embeddings.py:193-370).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9  # python scalar: jnp constants would be captured as kernel consts


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def shear_scores(scores: jnp.ndarray, I: int) -> jnp.ndarray:
    """[B, L1, L2] -> diagonal-major [B, D, I] with
    out[b, d-1, i] = scores[b, i-1, (d-i)-1] (cells of diagonal d)."""
    B, L1, L2 = scores.shape
    D = L1 + L2
    d = jnp.arange(1, D + 1)[:, None]  # [D, 1]
    i = jnp.arange(I)[None, :]  # [1, I]
    si = jnp.clip(i - 1, 0, L1 - 1)
    sj = jnp.clip(d - i - 1, 0, L2 - 1)
    return scores[:, si, sj]  # [B, D, I]


def _kernel(l1_ref, l2_ref, s_ref, codes_ref, best_ref, bixy_ref, h1, h2, e1, f1,
            *, I: int, D: int, go: float, ge: float, local: bool):
    b = pl.program_id(0)
    l1 = l1_ref[b]
    l2 = l2_ref[b]
    iidx = jax.lax.broadcasted_iota(jnp.int32, (1, I), 1)
    ifl = iidx.astype(jnp.float32)

    h1[:] = jnp.where(iidx == 0, 0.0, NEG)  # diagonal 0: only (0, 0)
    h2[:] = jnp.full((1, I), NEG)
    e1[:] = jnp.full((1, I), NEG)
    f1[:] = jnp.full((1, I), NEG)
    best_ref[:] = jnp.full((1, 8, 128), 0.0 if local else NEG)
    bixy_ref[:] = jnp.zeros((1, 8, 128), jnp.int32)

    def shift_down(x):
        return jnp.where(iidx == 0, NEG, pltpu.roll(x, 1, 1))

    def body(d, carry):
        best, bi, bj = carry
        j = d - iidx
        valid = (iidx <= l1) & (j >= 0) & (j <= l2)
        s = s_ref[0, d - 1, :][None, :]

        Hup = shift_down(h1[:])
        Eup = shift_down(e1[:])
        Hleft = h1[:]
        Fleft = f1[:]
        Hdiag = shift_down(h2[:])

        e_from_h = Hup + go
        e_from_e = Eup + ge
        E = jnp.maximum(e_from_h, e_from_e)
        TE = jnp.where(e_from_h < e_from_e, 1, 0)  # int32: i8 relayouts fail in Mosaic

        f_from_h = Hleft + go
        f_from_f = Fleft + ge
        F = jnp.maximum(f_from_h, f_from_f)
        TF = jnp.where(f_from_h < f_from_f, 1, 0)

        diag = Hdiag + s
        take_diag = (diag >= E) & (diag >= F)
        H = jnp.where(take_diag, diag, jnp.where(E >= F, E, F))
        TH = jnp.where(take_diag, 0, jnp.where(E >= F, 1, 2))
        if local:
            # Smith-Waterman restart: clamp at 0, code 3 = stop cell
            TH = jnp.where(H <= 0.0, 3, TH)
            H = jnp.maximum(H, 0.0)

        is_i0 = iidx == 0
        is_j0 = j == 0
        on_bound = is_i0 | is_j0
        if local:
            H = jnp.where(on_bound, 0.0, H)
            TH = jnp.where(on_bound, 3, TH)
        else:
            jf = j.astype(jnp.float32)
            h_bound = jnp.where(is_i0, go + (jf - 1.0) * ge, go + (ifl - 1.0) * ge)
            H = jnp.where(on_bound, h_bound, H)
            TH = jnp.where(on_bound, jnp.where(is_i0, 2, 1), TH)
        E = jnp.where(on_bound, NEG, E)
        F = jnp.where(on_bound, NEG, F)

        H = jnp.where(valid, H, NEG)
        E = jnp.where(valid, E, NEG)
        F = jnp.where(valid, F, NEG)

        if local:
            # running best over valid interior cells (first-max index,
            # matching jnp.argmax in the lax wavefront)
            cand = jnp.where(valid & ~on_bound, H, NEG)
            cmax = jnp.max(cand)
            carg = jnp.min(jnp.where(cand == cmax, iidx, jnp.int32(2**30)))
            take = cmax > best
            best = jnp.where(take, cmax, best)
            bi = jnp.where(take, carg, bi)
            bj = jnp.where(take, d - carg, bj)
        else:
            @pl.when(d == l1 + l2)
            def _():
                # scalar stores to VMEM are unsupported; broadcast-fill
                h_at_end = jnp.sum(jnp.where(iidx == l1, H, 0.0))
                best_ref[:] = jnp.full((1, 8, 128), h_at_end)

        # codes stay int32 in-kernel (int8 stores/relayouts do not lower
        # in Mosaic); narrowed to uint8 outside the kernel
        codes_ref[0, d - 1, :] = (TH | (TE << 2) | (TF << 3))[0]

        h2[:] = h1[:]
        h1[:] = H
        e1[:] = E
        f1[:] = F
        return (best, bi, bj)

    init = (jnp.float32(0.0 if local else NEG), jnp.int32(0), jnp.int32(0))
    best, bi, bj = jax.lax.fori_loop(1, D + 1, body, init)
    if local:
        best_ref[:] = jnp.full((1, 8, 128), best)
        bixy_ref[:] = jnp.full((1, 8, 128), bi * jnp.int32(100000) + bj)


@partial(jax.jit, static_argnames=("go", "ge", "local", "interpret"))
def pallas_wavefront(scores, l1, l2, go: float, ge: float,
                     local: bool = False, interpret: bool = False):
    """Affine wavefront via Pallas (global NW or local SW).

    scores [B, L1, L2] f32; l1, l2 [B] i32.
    Returns (best [B] f32, bixy [B] i32 = bi*100000+bj for local mode,
    codes [B, D, I] uint8) with I = round_up(L1+1, 128), D = L1 + L2.
    """
    B, L1, L2 = scores.shape
    I = _round_up(L1 + 1, 128)
    D = L1 + L2
    sheared = shear_scores(scores, I)

    kernel = partial(_kernel, I=I, D=D, go=go, ge=ge, local=local)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, D, I), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, D, I), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # (8, 128) tile floor: a scalar output is not addressable on
            # TPU, so the best score rides in lane [0, 0] of a min tile
            pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, I), jnp.float32),
            pltpu.VMEM((1, I), jnp.float32),
            pltpu.VMEM((1, I), jnp.float32),
            pltpu.VMEM((1, I), jnp.float32),
        ],
    )
    codes, best, bixy = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, D, I), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(l1.astype(jnp.int32), l2.astype(jnp.int32), sheared)
    return best[:, 0, 0], bixy[:, 0, 0], codes.astype(jnp.uint8)


def pallas_nw_wavefront(scores, l1, l2, go: float, ge: float,
                        interpret: bool = False):
    """Back-compat global-mode wrapper."""
    best, _, codes = pallas_wavefront(scores, l1, l2, go, ge,
                                      local=False, interpret=interpret)
    return best, codes


def align_batch_pallas(score_mats: list[np.ndarray], gap_open: float,
                       gap_extend: float, mode: str = "global",
                       interpret: bool = False):
    """Drop-in variant of ops.dp.affine_align_batch running the Pallas
    kernel (global NW or local SW); returns [(score, path)]."""
    from ginfinity_tpu.ops.dp import (
        _codes_dense,
        _traceback_global,
        _traceback_local,
    )

    local = mode == "local"
    from ginfinity_tpu.graphs.batching import _round_capacity
    from ginfinity_tpu.ops.pairhmm import _pow2_batch

    # ladder-round like the lax path (dp.py) — raw batch maxima would
    # Mosaic-compile a fresh kernel per distinct (B, L1, L2) triple
    B = len(score_mats)
    Bp = _pow2_batch(B)
    L1 = _round_capacity(max(m.shape[0] for m in score_mats))
    L2 = _round_capacity(max(m.shape[1] for m in score_mats))
    scores = np.zeros((Bp, L1, L2), np.float32)
    l1 = np.ones(Bp, np.int32)   # padding pairs DP a masked 1x1 cell
    l2 = np.ones(Bp, np.int32)
    for k, m in enumerate(score_mats):
        scores[k, : m.shape[0], : m.shape[1]] = m
        l1[k], l2[k] = m.shape

    best, bixy, codes = pallas_wavefront(
        jnp.asarray(scores), jnp.asarray(l1), jnp.asarray(l2),
        float(gap_open), float(gap_extend), local=local, interpret=interpret,
    )
    best = np.asarray(best)
    bixy = np.asarray(bixy)
    codes = np.asarray(codes)  # [B, D, I]
    # _codes_dense expects [D, B, I] diagonal-major
    codes_dm = np.transpose(codes, (1, 0, 2))[:, :, : L1 + 1]
    out = []
    for k in range(B):
        TH, TE, TF = _codes_dense(codes_dm, k, L1)
        if local:
            bi, bj = int(bixy[k]) // 100000, int(bixy[k]) % 100000
            path = _traceback_local(TH, None, int(l1[k]), int(l2[k]), bi, bj)
        else:
            path = _traceback_global(TH, TE, TF, int(l1[k]), int(l2[k]))
        out.append((float(best[k]), path))
    return out


def nw_align_batch_pallas(score_mats: list[np.ndarray], gap_open: float,
                          gap_extend: float, interpret: bool = False):
    """Back-compat global-mode wrapper."""
    return align_batch_pallas(score_mats, gap_open, gap_extend,
                              mode="global", interpret=interpret)
