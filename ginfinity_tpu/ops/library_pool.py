"""Device-resident progressive alignment for LIBRARY-mode scoring.

``--dp-score library`` is the T-Coffee/ProbCons-correct progressive
mode (and the measured-quality winner — BASELINE.md "MSA output quality
vs the reference pipeline"): the progressive DP scores column pairs by
the mean consistency-transformed match posterior between their member
positions.  Until now only profile-mode scoring had the device-resident
pool (ops/profile_pool.py); library mode ran the host loop
(pipelines/msa.py::PosteriorLibrary.score_matrix — python loops over
member pairs + np.bincount per merge), paying a host round trip per
tree level AND a posterior-slab download.

This module keeps the whole library-mode merge state on device.  The
key observation: the library score matrix for merging profiles A and B,

    S[c, d] = (1 / nA*nB) * sum over library pairs (x, y), x in A, y in B,
              of the sparse posterior val[x-pos p, y-pos q]
              scattered at (column-of-p-in-A, column-of-q-in-B),

needs only (1) the sparse posterior slabs, which are ALREADY device-
resident at the end of the consistency stage (pipelines/msa.py::
consistency_rounds_to_distances_from_slabs), and (2) a per-member
position->column map POS2COL [N, P], updated from each merge's
traceback ops.  No profile tensors ever touch the device; unlike the
profile pool there is no mean-embedding state at all.

Because each library pair (x, y) contributes to exactly ONE merge (the
tree node where x and y first share a profile — their LCA), the total
scatter work over the whole run is one pass over the library.  The
host schedule (which pair fires at which level/lane, with which
orientation) depends only on the guide tree and is built up front;
every level is then enqueued asynchronously with zero per-level
round trips, and only the [levels, 2P] traceback op codes download at
the end (pipelines/msa.py replays them through ``_merge_from_ops`` for
the aligned character rows, so the final Profile is host-exact).

The whole run dispatches ONE scanned program (``_lib_tail_wide``):
levels split into fixed-width lane groups of ``_LIB_BW``, each scan
step scatters one EC-wide entry chunk (chunked so a pair-dense level
cannot blow VMEM/HBM with a [E, Lmax, k] gather) and, on merge steps,
runs the DP + traceback + POS2COL remap for its lane block.
_POOL_SCAN_CHUNK steps ride per submission.  One program = one
persistent-cache load per fresh process (~12 MB executables cost
3.5-6 s EACH to load over the axon transport — the round-4 design's
{1, Bmax} width pair plus a separate batch-1 scan was five loads).

Precision note (same as ops/profile_pool.py): the host scorer
accumulates in float64 (np.bincount) while the device scatter-adds in
f32, so on merges where two DP alternatives land within 1 ulp the
value traceback may pick a different CO-OPTIMAL op than the host path.
Both alignments score identically; exact string parity with the host
path is asserted per-backend (CPU) in tests/test_library_pool.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ginfinity_tpu.ops.pairhmm import _pow2_batch, _profile_ops_impl
from ginfinity_tpu.ops.profile_pool import _POOL_SCAN_CHUNK

# entries per accumulation chunk: bounds the [EC, Lmax, k] gather
# temporaries (~EC*Lmax*k*4 bytes each) regardless of how many library
# pairs fire at one level
_ENTRY_CHUNK = 512


def _member_capacity(n: int) -> int:
    """Pad the member dimension to a power of two.  Pool program shapes
    must not depend on the exact member count N: every new family size
    would otherwise compile a fresh program set (~38 s cold for the
    scanned-tail program alone on a 1-CPU host, measured) instead of
    hitting the persistent cache.  Padded members are idle (mside 2) in
    every level, so results are bit-identical."""
    return _pow2_batch(max(8, n))


def _slab_capacity(t: int) -> int:
    """Pad the library slab count T the same way (zero slabs referenced
    only by weight-0 padding entries)."""
    return _pow2_batch(max(64, t))


def _ladder_capacity(n: int, min_cap: int = 64) -> int:
    """Quarter-step geometric bucket (pow2 x {1, 1.25, 1.5, 1.75}):
    bounded shape count like pow2, but <= 1/8 wasted rows — used where
    padded rows cost real compute (the consistency round's pair axis),
    not just memory."""
    n = max(min_cap, n)
    p = min_cap
    while p * 2 < n:
        p *= 2
    for frac in (4, 5, 6, 7, 8):
        cap = p * frac // 4
        if n <= cap:
            return cap
    return p * 2


def _entry_chunk_width(n_pairs: int) -> int:
    """The _lib_accum chunk width for a library of ``n_pairs`` — a pure
    function of the library size so every call site (level schedule,
    refinement, overflow fallback) dispatches the SAME program shape
    and the prewarm can predict it."""
    return _pow2_batch(min(_ENTRY_CHUNK, max(1, n_pairs)))


def _scan_entry_width(n_pairs: int) -> int:
    """Per-step entry capacity of the unified progressive scan.  Most
    levels carry few spanning pairs (the 200x300 workload averages ~23
    per step), so a narrow fixed width with accumulate-only overflow
    steps does ~8x less padded scatter work per step than the standalone
    accumulation chunk would — the scatter was the scan's dominant
    device cost at _ENTRY_CHUNK width (measured ~8 s of the stage;
    each step scattered EC*Ls*K = 3.3M mostly-zero elements)."""
    return min(_entry_chunk_width(n_pairs), 64)


def _lib_accum_impl(S, POS2COL, Cv, Ci, pair_a, pair_b, lane, t, flip, w):
    """Scatter one entry chunk into the level's score matrices.

    S [Bp, P, P] (donated accumulator); POS2COL [N, P] current
    position->column maps; Cv/Ci [T, Ls, k] the device-resident library
    slabs (forward orientation: slab t's owner position p matches
    partner position Ci[t, p, j] with posterior Cv[t, p, j]);
    lane/t/flip/w [EC] the chunk: which score matrix, which slab, the
    owner side (0 = owner is in the A child: slab rows are S rows), and
    a 0/1 weight (0 = padding entry)."""
    Bp, P, _ = S.shape
    Ls, K = Cv.shape[1], Cv.shape[2]
    v = Cv[t] * w[:, None, None]                       # [EC, Ls, k]
    ci = jnp.clip(Ci[t], 0, P - 1)                     # [EC, Ls, k]
    own_col = POS2COL[pair_a[t]][:, :Ls]               # [EC, Ls]
    par_map = POS2COL[pair_b[t]]                       # [EC, P]
    EC = v.shape[0]
    par_col = jnp.take_along_axis(
        par_map, ci.reshape(EC, Ls * K), axis=1
    ).reshape(EC, Ls, K)
    oc = jnp.broadcast_to(own_col[:, :, None], (EC, Ls, K))
    f = flip[:, None, None]
    r = jnp.where(f == 0, oc, par_col)
    c = jnp.where(f == 0, par_col, oc)
    flat = (lane[:, None, None] * P + r) * P + c
    return (
        S.reshape(-1).at[flat.reshape(-1)].add(v.reshape(-1)).reshape(S.shape)
    )


_lib_accum = partial(jax.jit, donate_argnums=(0,))(_lib_accum_impl)


def _lib_dp_merge_impl(POS2COL, LN, S, blk, denom, mlane, mside, go, ge):
    """DP + traceback on the accumulated score matrices, then remap
    every member's position->column map through its merge's ops.

    blk [Bp, 3] (slotA, slotB, slotOut); denom [Bp] = nA*nB; mlane [N]
    the lane merging each member this level (0 for idle members);
    mside [N] 0 = member is in the A child, 1 = B child, 2 = idle."""
    ia, ib, iout = blk[:, 0], blk[:, 1], blk[:, 2]
    P = POS2COL.shape[1]
    S = S / denom[:, None, None]
    ops_rev = _profile_ops_impl(S, LN[ia], LN[ib], go, ge)  # [Bp, 2P] int8

    def maps_one(opsr):
        T = opsr.shape[0]
        opf = opsr[::-1]                    # forward order, 3s prefix
        n = (opf != 3).sum()
        idx = jnp.arange(T)
        opc = jnp.where(idx < n, opf[jnp.clip(idx + (T - n), 0, T - 1)], 3)
        takes_a = (opc == 0) | (opc == 1)
        takes_b = (opc == 0) | (opc == 2)
        ia_c = jnp.cumsum(takes_a) - 1
        jb_c = jnp.cumsum(takes_b) - 1
        # old column -> merged column: each real old column is written
        # exactly once (with value idx >= 0); padding steps write 0 via
        # max, which can never exceed a real merged index
        mapA = jnp.zeros(P, jnp.int32).at[
            jnp.where(takes_a, jnp.clip(ia_c, 0, P - 1), P - 1)
        ].max(jnp.where(takes_a, idx, 0).astype(jnp.int32))
        mapB = jnp.zeros(P, jnp.int32).at[
            jnp.where(takes_b, jnp.clip(jb_c, 0, P - 1), P - 1)
        ].max(jnp.where(takes_b, idx, 0).astype(jnp.int32))
        return mapA, mapB, n.astype(jnp.int32)

    mapA, mapB, n_new = jax.vmap(maps_one)(ops_rev)     # [Bp, P] x2, [Bp]

    cur = jnp.clip(POS2COL, 0, P - 1)
    remapA = jnp.take_along_axis(mapA[mlane], cur, axis=1)
    remapB = jnp.take_along_axis(mapB[mlane], cur, axis=1)
    side = mside[:, None]
    POS2COL = jnp.where(
        side == 0, remapA, jnp.where(side == 1, remapB, POS2COL)
    )
    LN = LN.at[iout].set(n_new)
    return POS2COL, LN, ops_rev, n_new


# Lanes per scan step of the unified tail program.  The whole
# progressive run rides ONE scanned program: wide levels split into
# ceil(width / _LIB_BW) steps, batch-1 levels pad idle lanes (a B=8 DP
# wavefront measures ~1.4-1.6x a B=1 one — idle lanes are nearly free),
# and levels with more spanning pairs than one entry chunk insert
# accumulate-only steps (merges=0) before their merge step.  Round-5
# motivation: each distinct program costs seconds to LOAD from the
# persistent cache over the axon transport (3.5-6 s measured for the
# 12-16 MB pool executables — the load, not the compile, dominated a
# warm-cache fresh process), so the {1, Bmax} width pair + separate
# accumulate/merge/tail programs (5 loads) became one fixed-shape
# program (1 load), family-size-independent via the capacity buckets.
_LIB_BW = 8


@partial(jax.jit, donate_argnums=(0, 1))
def _lib_tail_wide(POS2COL, LN, Cv, Ci, pa, pb, blks, denoms, mlanes,
                   msides, lanes_e, tids, flips, ws, merges, go, ge):
    """One fixed-shape chunk of the unified progressive scan.

    Per step ``t``: scatter entry chunk ``(lanes_e, tids, flips, ws)[t]``
    into the carried [_LIB_BW, P, P] accumulator, then (when
    ``merges[t] > 0``) run the DP/merge for the step's lane block and
    reset the accumulator; accumulate-only steps (``merges[t] == 0``)
    carry S forward and their DP outputs are masked out.  No-op padding
    steps are merge steps with every lane at (0, 0, dump), every member
    idle, and zero entry weights.

    Returns the updated maps plus per-step reverse-order op codes
    [TC, _LIB_BW, 2P] and merged lengths [TC, _LIB_BW]."""

    def body(carry, xs):
        POS2COL, LN, S = carry
        blk, denom, mlane, mside, lane_e, tid, flip, w, mf = xs
        S = _lib_accum_impl(S, POS2COL, Cv, Ci, pa, pb, lane_e, tid, flip, w)
        P2, LN2, ops_rev, n_new = _lib_dp_merge_impl(
            POS2COL, LN, S, blk, denom, mlane, mside, go, ge
        )
        keep = mf > 0
        POS2COL = jnp.where(keep, P2, POS2COL)
        LN = jnp.where(keep, LN2, LN)
        S = jnp.where(keep, jnp.zeros_like(S), S)
        return (POS2COL, LN, S), (ops_rev, n_new)

    BW = blks.shape[1]
    P = POS2COL.shape[1]
    S0 = jnp.zeros((BW, P, P), jnp.float32)
    (POS2COL, LN, _), (ops, ns) = jax.lax.scan(
        body, (POS2COL, LN, S0),
        (blks, denoms, mlanes, msides, lanes_e, tids, flips, ws, merges),
    )
    return POS2COL, LN, ops, ns


@jax.jit
def _lib_merge_ops(S, denom, l1, l2, go, ge):
    """Normalize accumulated [B, P, P] score matrices and run the
    profile DP + value traceback on them in place — the device-fused
    tail of PosteriorLibrary.merge_ops / merge_ops_level.  Returns
    [B, 2P] int8 op codes in traceback order (3 = padding)."""
    return _profile_ops_impl(S / denom[:, None, None], l1, l2, go, ge)


def merge_ops_from_scores(S, denom, l1, l2, gap_open, gap_extend):
    """Host wrapper: device DP on accumulated score matrices, download
    ONLY the op codes (2P bytes per merge instead of the P*P*4-byte
    matrix that profile_align_batch_ops would re-upload).  ``S`` is
    [B, P, P]; ``denom``/``l1``/``l2`` are length-B sequences.  Returns
    a list of forward-order op arrays (0 match, 1 gap-in-B, 2 gap-in-A,
    np.int8)."""
    ops = np.asarray(
        _lib_merge_ops(
            S, jnp.asarray(denom, jnp.float32),
            jnp.asarray(l1, jnp.int32), jnp.asarray(l2, jnp.int32),
            jnp.float32(gap_open), jnp.float32(gap_extend),
        )
    )
    return [row[row != 3][::-1].copy() for row in ops]


def accumulate_pair_scores(Cv_d, Ci_d, pair_a, pair_b, pos2col,
                           entries, P, n_lanes=1):
    """Score one LEVEL of merges' [n_lanes, P, P] library matrices on
    device.

    Entry point reusing ``_lib_accum`` for the call sites the level
    schedule does not cover: iterative-refinement re-merges (one lane)
    and the pool-overflow fallback's ready-merge batches
    (pipelines/msa.py::PosteriorLibrary).  ``entries`` is
    ``[(lane, slab_t, flip)]`` with the same orientation convention as
    one schedule level's entry list; ``pos2col`` [N, P] is the CURRENT
    position->column map for every member (identity rows for members
    outside the level are harmless — their slabs are not in
    ``entries``).  Returns the UN-normalised [n_lanes, P, P] device
    accumulator; the caller divides by each merge's nA*nB and crops."""
    Bp = 1 if n_lanes == 1 else _pow2_batch(n_lanes)
    S = jnp.zeros((Bp, P, P), jnp.float32)
    if not entries:
        return S
    # chunk width keyed off the LIBRARY size, not this call's entry
    # count, so the program shape is deterministic given (T, P) and
    # prewarm_library_programs can load it ahead of time
    EC = _entry_chunk_width(int(pair_a.shape[0]))
    return _scatter_entry_chunks(
        S, pos2col, Cv_d, Ci_d, pair_a, pair_b, entries, EC
    )


def _scatter_entry_chunks(S, POS2COL, Cv_d, Ci_d, pa, pb, entries, EC):
    """Scatter ``entries`` [(lane, slab_t, flip)] into the donated
    accumulator in EC-wide zero-padded chunks — the one place the entry
    layout is packed for _lib_accum (level schedule, refinement and
    overflow fallback all route through here)."""
    for s in range(0, len(entries), EC):
        chunk = entries[s : s + EC]
        lane = np.zeros(EC, np.int32)
        tid = np.zeros(EC, np.int32)
        flip = np.zeros(EC, np.int32)
        w = np.zeros(EC, np.float32)
        for i, (ln, tt, fl) in enumerate(chunk):
            lane[i], tid[i], flip[i], w[i] = ln, tt, fl, 1.0
        S = _lib_accum(
            S, POS2COL, Cv_d, Ci_d, pa, pb,
            jnp.asarray(lane), jnp.asarray(tid),
            jnp.asarray(flip), jnp.asarray(w),
        )
    return S


def prewarm_library_programs(n_seq: int, P: int, n_pairs: int, Ls: int,
                             K: int, b_max: int = 0, refine_len: int = 0):
    """Compile/load the library-pool program set in the background.

    Since the unified ``_lib_tail_wide`` redesign the whole progressive
    run dispatches ONE program whose shape is a pure function of
    (member bucket, slab bucket, P, Ls, K) — so the prewarm is one
    compile/load that overlaps the posterior/consistency stages instead
    of stalling the progressive stage (a warm-cache LOAD of the ~12 MB
    executable costs ~3.5-6 s over the axon transport; a cold compile
    ~38 s on this 1-CPU host).  ``b_max`` is retained for call-site
    compatibility; there is no width ladder anymore.  ``refine_len > 0``
    additionally warms the single-lane accumulate + fused-DP programs
    iterative refinement dispatches (PosteriorLibrary.merge_ops at the
    refine column-count headroom).  All inputs are created on device —
    nothing crosses the host link.

    Deliberately NOT warmed: the pool-overflow fallback's grown-length
    programs (merge_ops_level re-rounds P per level as profiles outgrow
    the pool padding, so its shape set is data-dependent) — overflow is
    already the rare slow path and speculative compiles would mostly
    miss."""
    import threading

    # the same shape buckets run_library_pool pads to — prewarmed
    # programs therefore match the run's exactly for EVERY family whose
    # (member, pair) counts land in the same buckets
    Npad = _member_capacity(n_seq)
    T = _slab_capacity(max(1, n_pairs))
    EC = _scan_entry_width(T)
    ECr = _entry_chunk_width(T)  # refinement accum keeps the wide chunk
    M = 2 * Npad
    n_seq = Npad
    stop = threading.Event()

    def work():
        import os
        import time

        from ginfinity_tpu.utils.jaxinit import prewarm_gate_wait

        # foreground-priority: when a pipeline holds the gate, its own
        # compile-heavy leading stage runs uncontended on this 1-CPU
        # host before any speculative compile starts (BASELINE.md: the
        # contention cost the library-mode posteriors stage 18.6 s vs
        # 4.2 s)
        if not prewarm_gate_wait(stop):
            return
        t0 = time.perf_counter()
        n_done = 0
        try:
            Cv = jnp.zeros((T, Ls, K), jnp.float32)
            Ci = jnp.zeros((T, Ls, K), jnp.int32)
            pa = jnp.zeros((T,), jnp.int32)
            pb = jnp.zeros((T,), jnp.int32)
            go = jnp.float32(0.0)
            TC = _POOL_SCAN_CHUNK
            BW = _LIB_BW
            if stop.is_set():
                return
            _lib_tail_wide(
                jnp.zeros((n_seq, P), jnp.int32), jnp.ones((M,), jnp.int32),
                Cv, Ci, pa, pb,
                jnp.zeros((TC, BW, 3), jnp.int32),
                jnp.ones((TC, BW), jnp.float32),
                jnp.zeros((TC, n_seq), jnp.int32),
                jnp.full((TC, n_seq), 2, jnp.int32),
                jnp.zeros((TC, EC), jnp.int32),
                jnp.zeros((TC, EC), jnp.int32),
                jnp.zeros((TC, EC), jnp.int32),
                jnp.zeros((TC, EC), jnp.float32),
                jnp.ones((TC,), jnp.float32), go, go,
            )[2].block_until_ready()
            n_done += 1
            if refine_len > 0 and not stop.is_set():
                from ginfinity_tpu.graphs.batching import _round_capacity

                Pr = _round_capacity(max(refine_len, Ls))
                S = jnp.zeros((1, Pr, Pr), jnp.float32)
                POS = jnp.zeros((n_seq, Pr), jnp.int32)
                lane = jnp.zeros((ECr,), jnp.int32)
                w = jnp.zeros((ECr,), jnp.float32)
                S = _lib_accum(S, POS, Cv, Ci, pa, pb, lane, lane, lane, w)
                _lib_merge_ops(
                    S, jnp.ones((1,), jnp.float32), jnp.ones((1,), jnp.int32),
                    jnp.ones((1,), jnp.int32), go, go,
                ).block_until_ready()
                n_done += 1
            if os.environ.get("GINFINITY_MSA_TIMING"):
                print(f"[prewarm] library-pool programs "
                      f"({n_done} programs, EC={EC}, P={P}) "
                      f"{time.perf_counter() - t0:.2f}s", flush=True)
        except Exception:  # pragma: no cover - prewarm is best-effort
            pass

    from ginfinity_tpu.utils.jaxinit import register_prewarm_thread

    th = threading.Thread(
        target=work, name="ginfinity-library-prewarm", daemon=True
    )
    register_prewarm_thread(th, stop)
    th.start()
    return th


def build_library_schedule(node_levels, slot_of, n_internal_offset,
                           pairs, n_seq, members_of):
    """Host-side static schedule: which library pair fires at which
    (level, lane, orientation), plus per-level member remap tables.

    ``node_levels``: the levelized internal nodes (pipelines/msa.py::
    _build_levels output); ``slot_of(node)`` the pool slot of a leaf or
    internal node; ``pairs``: the library's (a, b) list; ``members_of``:
    node -> list of member indices.  Each pair fires exactly once, at
    the merge where its two members first share a profile."""
    pending = {tid: ab for tid, ab in enumerate(pairs)}
    comp = {m: ("leaf", m) for m in range(n_seq)}
    schedule = []
    for lv in node_levels:
        lanes = []
        entries = []
        mlane = np.zeros(n_seq, np.int32)
        mside = np.full(n_seq, 2, np.int32)
        key_to_lane_side = {}
        for lane_i, node in enumerate(lv):
            a_child, b_child = node[0], node[1]
            ka = comp[members_of(a_child)[0]]
            kb = comp[members_of(b_child)[0]]
            key_to_lane_side[ka] = (lane_i, 0)
            key_to_lane_side[kb] = (lane_i, 1)
            na, nb = len(members_of(a_child)), len(members_of(b_child))
            lanes.append(
                (slot_of(a_child), slot_of(b_child), slot_of(node),
                 float(na * nb))
            )
            for m in members_of(a_child):
                mlane[m], mside[m] = lane_i, 0
            for m in members_of(b_child):
                mlane[m], mside[m] = lane_i, 1
        done = []
        for tid, (a, b) in pending.items():
            la = key_to_lane_side.get(comp[a])
            lb = key_to_lane_side.get(comp[b])
            if la is None or lb is None or la[0] != lb[0] or la[1] == lb[1]:
                continue
            # owner (slab row side) = a; flip when a sits in the B
            # child — mirror of PosteriorLibrary._accumulate_device's
            # rule (asserted equivalent in tests/test_library_pool.py)
            entries.append((la[0], tid, 1 if la[1] == 1 else 0))
            done.append(tid)
        for tid in done:
            del pending[tid]
        for node in lv:
            key = ("node", id(node))
            for m in members_of(node):
                comp[m] = key
        schedule.append((lanes, entries, mlane, mside))
    return schedule


def run_library_pool(schedule, Cv_d, Ci_d, pair_a, pair_b,
                     leaf_len, n_internal, P, gap_open, gap_extend):
    """Execute a library-mode level schedule on device.

    Returns (ops_per_level, lengths_per_level) host arrays, or None on
    overflow (a merge outgrew the padded length P) — the caller falls
    back to the host scorer loop."""
    N = leaf_len.shape[0]
    if Cv_d.shape[1] > P:
        return None                             # slab rows would not map

    # Shape-bucketed state: member dim padded to Npad (extra members are
    # idle at every level), internal slots shifted to [Npad, 2*Npad-2],
    # slabs padded to Tpad with zero posteriors.  Program shapes then
    # depend only on (Npad, Tpad, P, Ls, K) — families of different
    # sizes share the same cached executables.
    Npad = _member_capacity(N)
    shift = Npad - N
    M = 2 * Npad                                # last slot = padding dump
    dump = M - 1
    if N + n_internal + 1 > M:
        return None                             # cannot happen (binary tree)
    T = int(pair_a.shape[0])
    Tpad = _slab_capacity(T)
    if Tpad > T:
        Cv_d = jnp.concatenate(
            [Cv_d, jnp.zeros((Tpad - T,) + Cv_d.shape[1:], Cv_d.dtype)]
        )
        Ci_d = jnp.concatenate(
            [Ci_d, jnp.zeros((Tpad - T,) + Ci_d.shape[1:], Ci_d.dtype)]
        )
    pa = jnp.asarray(np.pad(np.asarray(pair_a, np.int32), (0, Tpad - T)))
    pb = jnp.asarray(np.pad(np.asarray(pair_b, np.int32), (0, Tpad - T)))

    POS2COL = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[None, :], (Npad, P)
    ) + jnp.zeros((Npad, 1), jnp.int32)         # materialized identity maps
    LN = jnp.concatenate(
        [jnp.asarray(leaf_len, dtype=jnp.int32),
         jnp.zeros((M - N,), jnp.int32)]
    )
    go = jnp.float32(gap_open)
    ge = jnp.float32(gap_extend)

    def _slot(s):
        return s if s < N else s + shift

    EC = _scan_entry_width(int(pa.shape[0]))
    BW = _LIB_BW
    TC = _POOL_SCAN_CHUNK
    N_members = POS2COL.shape[0]

    import os
    import time

    timing = os.environ.get("GINFINITY_MSA_TIMING")
    t0 = time.perf_counter()

    # Flat step plan for the ONE unified program (see _LIB_BW): each
    # level splits into lane groups of BW; each group's entry list
    # splits into EC-wide chunks, all but the last accumulate-only.
    # level_layout[level] = [(merge step index, group width), ...].
    steps = []
    level_layout: list[list[tuple[int, int]]] = []
    for lanes, entries, mlane, mside in schedule:
        groups = []
        for g0 in range(0, len(lanes), BW):
            glanes = lanes[g0 : g0 + BW]
            gent = [(ln - g0, tt, fl) for (ln, tt, fl) in entries
                    if g0 <= ln < g0 + BW]
            chunks = ([gent[s : s + EC] for s in range(0, len(gent), EC)]
                      or [[]])
            for ch in chunks[:-1]:
                steps.append((None, None, None, None, ch, 0))
            blk = np.full((BW, 3), (0, 0, dump), np.int32)
            denom = np.ones(BW, np.float32)
            for i, (sa, sb, so, dn) in enumerate(glanes):
                blk[i] = (_slot(sa), _slot(sb), _slot(so))
                denom[i] = dn
            g_mlane = np.zeros(N_members, np.int32)
            g_mside = np.full(N_members, 2, np.int32)
            in_g = (mside != 2) & (mlane >= g0) & (mlane < g0 + BW)
            g_mlane[:N][in_g] = mlane[in_g] - g0
            g_mside[:N][in_g] = mside[in_g]
            steps.append((blk, denom, g_mlane, g_mside, chunks[-1], 1))
            groups.append((len(steps) - 1, len(glanes)))
        level_layout.append(groups)

    n_steps = -(-len(steps) // TC) * TC
    blks = np.broadcast_to(
        np.asarray((0, 0, dump), np.int32), (n_steps, BW, 3)
    ).copy()
    denoms = np.ones((n_steps, BW), np.float32)
    mlanes = np.zeros((n_steps, N_members), np.int32)
    msides = np.full((n_steps, N_members), 2, np.int32)
    lanes_e = np.zeros((n_steps, EC), np.int32)
    tids = np.zeros((n_steps, EC), np.int32)
    flips = np.zeros((n_steps, EC), np.int32)
    ws = np.zeros((n_steps, EC), np.float32)
    merges = np.ones(n_steps, np.float32)  # padding steps merge into dump
    for t, (blk, denom, g_mlane, g_mside, ch, mf) in enumerate(steps):
        if mf:
            blks[t], denoms[t] = blk, denom
            mlanes[t], msides[t] = g_mlane, g_mside
        merges[t] = mf
        for i, (ln, tt, fl) in enumerate(ch):
            lanes_e[t, i], tids[t, i], flips[t, i] = ln, tt, fl
            ws[t, i] = 1.0

    ops_out, len_out = [], []
    for s in range(0, n_steps, TC):
        sl = slice(s, s + TC)
        POS2COL, LN, ops_rev, n_new = _lib_tail_wide(
            POS2COL, LN, Cv_d, Ci_d, pa, pb,
            jnp.asarray(blks[sl]), jnp.asarray(denoms[sl]),
            jnp.asarray(mlanes[sl]), jnp.asarray(msides[sl]),
            jnp.asarray(lanes_e[sl]), jnp.asarray(tids[sl]),
            jnp.asarray(flips[sl]), jnp.asarray(ws[sl]),
            jnp.asarray(merges[sl]), go, ge,
        )
        ops_out.append(ops_rev)                 # [TC, BW, 2P] device ref
        len_out.append(n_new)
    t1 = time.perf_counter()

    # ONE blocking download for the whole run (see profile_pool)
    ops_all = np.asarray(jnp.concatenate(ops_out, axis=0))
    len_all = np.asarray(jnp.concatenate(len_out))
    t2 = time.perf_counter()
    if timing:
        print(f"[progressive detail] library pool enqueue {t1 - t0:.2f}s "
              f"device+download {t2 - t1:.2f}s levels={len(schedule)} "
              f"steps={len(steps)} submissions={n_steps // TC}")

    ops_host, lengths = [], []
    for groups in level_layout:
        ops_host.append(
            np.concatenate([ops_all[si][:w] for si, w in groups])
        )
        lengths.append(
            np.concatenate([len_all[si][:w] for si, w in groups])
        )
    if any(int(l.max(initial=0)) > P for l in lengths):
        return None                             # overflow -> host fallback
    return ops_host, lengths
