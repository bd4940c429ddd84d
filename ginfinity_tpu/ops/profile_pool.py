"""Device-resident progressive alignment: the profile pool.

The levelized progressive stage (pipelines/msa.py::msa_from_tree) is a
host-driven loop: per tree level it builds score matrices on host,
uploads them ([B, P, P] f32 — ~117 MB over a 200x300 family's 58
levels), runs the profile DP on device, downloads the traceback ops and
merges profiles on host.  Every level is therefore a synchronous
host<->device round trip (~50-90 ms each over the remote tunnel), and
an NJ tree's batch=1 caterpillar tail makes there be many levels.

This module keeps the whole merge state ON DEVICE instead: a pool of
profile tensors (``MU`` [M, P, d] mean-structure embeddings, optional
``MB`` base embeddings, ``ST`` stem fractions, ``LN`` lengths; M = 2N
slots — N leaves, N-1 internal nodes, 1 dump slot for batch padding).
One jitted program per level gathers the two child profiles of every
ready merge, computes the score matrix on device (HIGHEST-precision
dots + the 0.2 stem-agreement term — pipelines/msa.py::
_profile_score_matrix semantics, reference embed_msa.py:874-930), runs
the wavefront DP + value-based traceback (pairhmm._profile_ops_impl),
vectorizes the merge (the same cumsum-gather math as
pipelines/msa.py::_merge_from_ops) and scatters the result back into
the pool.  Because each level's inputs are device-resident, the host
can enqueue ALL levels without reading anything back (JAX async
dispatch); the only blocking download is the per-level op codes at the
end, which the host replays to build the aligned character rows.

Score-mode coverage: the profile-mode scorer only (``--dp-score
profile``, the default and the reference-parity mode).  Library-mode
scoring reads the sparse posterior library through per-member column
maps that live on host; it keeps the host-driven path.

Merged profiles can outgrow the padded length P (gap-rich merges).
Every level emits per-merge lengths; the driver checks them after the
final download and signals overflow, upon which the caller falls back
to the host-driven path (correctness is never at risk — the pool is an
execution strategy, not a different algorithm).

Precision note: the device computes score matrices with XLA
HIGHEST-precision dots while the host path uses NumPy BLAS; on cells
where two DP states tie EXACTLY, a 1-ulp reduction-order difference can
flip the strict-greater value traceback to a different CO-OPTIMAL op.
Both alignments score identically (quality is unaffected); exact
string parity with the host path is guaranteed only per-backend (the
parity tests run on CPU).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ginfinity_tpu.ops.pairhmm import _pow2_batch, _profile_ops_impl

_HIGHEST = jax.lax.Precision.HIGHEST

# NJ caterpillar tails dispatch one batch-1 program per level; chunks of
# this many consecutive batch-1 levels run as ONE lax.scan program
# instead (58 tail submissions -> 4 on the 200x300 family; each
# submission costs ~20-25 ms of client/tunnel overhead even fully
# async).  One fixed width = one extra program shape for the prewarm;
# tails shorter than _POOL_SCAN_MIN keep the per-level program, where
# chunk-padding no-op levels would cost more device time than the saved
# submissions.
_POOL_SCAN_CHUNK = 16
_POOL_SCAN_MIN = 8


def pool_padded_len(max_leaf_len: int) -> int:
    """Padded profile length P for a pool run.

    Merged profiles grow past the longest leaf as soon as any merge
    emits a gap column, so padding to the bare ladder rung would
    guarantee overflow (and a wasted pool run + host re-run) for any
    family whose longest sequence sits exactly on a rung.  Always keep
    >= 12.5% headroom before rounding."""
    from ginfinity_tpu.graphs.batching import _round_capacity

    m = max(2, max_leaf_len)
    return _round_capacity(m + max(8, m // 8))


def library_pool_padded_len(max_leaf_len: int) -> int:
    """Padded profile length for a LIBRARY-mode pool run.

    Library-scored alignments are gap-heavier than profile-scored ones
    (zero DP gap costs; scores vanish outside covered regions), so the
    merged column count routinely exceeds profile mode's 12.5% headroom
    — measured: an N=50/L=315 family merged to ~390 columns, overflowing
    P=384 and paying a 132 s host-scorer fallback.  25% headroom keeps
    the fused pool on-path; msa.py retries one rung higher on overflow."""
    from ginfinity_tpu.graphs.batching import _round_capacity

    m = max(2, max_leaf_len)
    return _round_capacity(m + max(8, m // 4))


def _pool_level_impl(MU, MB, ST, LN, blk, go, ge, sw, has_base,
                     exact=True):
    """Run one tree level: gather children, score, DP, merge, scatter.

    ``blk`` is the level's [Bp, 3] (ia, ib, iout) slot table — sliced on
    device from the whole run's index table (run_progressive_pool
    uploads that table ONCE; per-level host index uploads would pay a
    tunnel transfer three times per tree level).

    ``exact=True`` (default) scores and DPs with the reference's exact
    f32 op order (pairhmm._profile_ops_exact_impl): sequential-d dot
    accumulation + (prev + s) + comp two-step adds, which reproduces the
    reference's DP matrices bit-for-bit on TPU — profile-mode output is
    then byte-identical to the reference's for the same guide tree.
    ``exact=False`` keeps the exact-dot MXU einsum (faster, XLA rounding
    order; opt in via GINFINITY_PROFILE_DP=fast).

    Returns the updated pool plus the per-merge reverse-order op codes
    [B, 2P] (for host char replay) and merged lengths [B]."""
    ia, ib, iout = blk[:, 0], blk[:, 1], blk[:, 2]
    P = MU.shape[1]
    A = MU[ia]
    Bm = MU[ib]  # [B, P, d]
    stA = ST[ia]
    stB = ST[ib]
    l1 = LN[ia]
    l2 = LN[ib]
    if exact:
        from ginfinity_tpu.ops.pairhmm import _profile_ops_exact_impl

        kw = ({"MBA": MB[ia], "MBB": MB[ib], "sw": sw}
              if has_base else {})
        ops_rev = _profile_ops_exact_impl(
            A, Bm, stA, stB, l1, l2, go, ge, **kw
        )
    else:
        S = jnp.einsum("bpd,bqd->bpq", A, Bm, precision=_HIGHEST)
        if has_base:
            Sb = jnp.einsum(
                "bpd,bqd->bpq", MB[ia], MB[ib], precision=_HIGHEST
            )
            S = (1.0 - sw) * S + sw * Sb
        comp = jnp.where(
            (stA[:, :, None] >= 0.5) == (stB[:, None, :] >= 0.5), 0.2, 0.0
        ).astype(S.dtype)
        S = S + comp
        ops_rev = _profile_ops_impl(S, l1, l2, go, ge)  # [B, 2P] int8

    def merge_one(opsr, Amu, Bmu, Ast, Bst, Abase, Bbase):
        T = opsr.shape[0]
        opf = opsr[::-1]  # forward order; the padding 3s form a prefix
        valid = opf != 3
        n = valid.sum()
        # compact: the p-th real op sits at index p + (T - n)
        idx = jnp.arange(T)
        opc = jnp.where(idx < n, opf[jnp.clip(idx + (T - n), 0, T - 1)], 3)
        takes_a = (opc == 0) | (opc == 1)
        takes_b = (opc == 0) | (opc == 2)
        match = opc == 0
        ia_c = jnp.clip(jnp.cumsum(takes_a) - 1, 0, P - 1)
        jb_c = jnp.clip(jnp.cumsum(takes_b) - 1, 0, P - 1)
        ta = takes_a[:, None].astype(jnp.float32)
        tb = takes_b[:, None].astype(jnp.float32)
        summed = Amu[ia_c] * ta + Bmu[jb_c] * tb  # [T, d]
        normed = summed / (
            jnp.linalg.norm(summed, axis=1, keepdims=True) + 1e-8
        )
        mu = jnp.where(match[:, None], normed, summed)
        stem = (Ast[ia_c] * takes_a + Bst[jb_c] * takes_b) / jnp.maximum(
            ta[:, 0] + tb[:, 0], 1.0
        )
        if Abase is not None:
            sb = Abase[ia_c] * ta + Bbase[jb_c] * tb
            nb = sb / (jnp.linalg.norm(sb, axis=1, keepdims=True) + 1e-8)
            mb = jnp.where(match[:, None], nb, sb)[:P]
        else:
            mb = None
        # rows past the merged length stay zero (leaf padding convention)
        live = (idx < n)[:, None].astype(jnp.float32)
        mu = (mu * live)[:P]
        stem = (stem * live[:, 0])[:P]
        if mb is not None:
            mb = mb * live[:P]
        return mu, stem, mb, n.astype(jnp.int32)

    if has_base:
        mu_new, st_new, mb_new, n_new = jax.vmap(merge_one)(
            ops_rev, A, Bm, stA, stB, MB[ia], MB[ib]
        )
        MB = MB.at[iout].set(mb_new)
    else:
        mu_new, st_new, _, n_new = jax.vmap(
            lambda o, a, b, sa, sb: merge_one(o, a, b, sa, sb, None, None)
        )(ops_rev, A, Bm, stA, stB)
    MU = MU.at[iout].set(mu_new)
    ST = ST.at[iout].set(st_new)
    LN = LN.at[iout].set(n_new)
    return MU, MB, ST, LN, ops_rev, n_new


_pool_level = partial(jax.jit, static_argnames=("has_base", "exact"),
                      donate_argnums=(0, 1, 2, 3))(_pool_level_impl)


@partial(jax.jit, static_argnames=("has_base", "exact"),
         donate_argnums=(0, 1, 2, 3))
def _pool_tail(MU, MB, ST, LN, blks, go, ge, sw, has_base, exact=True):
    """Run a fixed-width chunk of consecutive batch-1 tree levels as ONE
    device program: ``lax.scan`` over ``blks`` [_POOL_SCAN_CHUNK, 3],
    each step a full batch-1 level (score + DP + merge + scatter).  The
    levels are sequentially dependent (each merge's children may be the
    previous merge's output), which is exactly what scan expresses —
    the caterpillar tail becomes a handful of submissions instead of one
    per level.  Chunk-padding rows use the (0, 0, dump-slot) convention
    of run_progressive_pool's batch padding: a real DP on leaf 0 whose
    result lands in the dump slot and whose op rows the host discards.

    Returns the updated pool plus per-level reverse-order op codes
    [_POOL_SCAN_CHUNK, 2P] and merged lengths [_POOL_SCAN_CHUNK]."""

    def body(carry, blk):
        MU, MB, ST, LN = carry
        MU, MB, ST, LN, ops_rev, n_new = _pool_level_impl(
            MU, MB, ST, LN, blk[None, :], go, ge, sw, has_base, exact
        )
        return (MU, MB, ST, LN), (ops_rev[0], n_new[0])

    (MU, MB, ST, LN), (ops, ns) = jax.lax.scan(
        body, (MU, MB, ST, LN), blks
    )
    return MU, MB, ST, LN, ops, ns


def run_progressive_pool(levels, leaf_mu, leaf_base, leaf_stem, leaf_len,
                         P, gap_open, gap_extend, seq_weight, exact=True):
    """Execute the level schedule on a device-resident pool.

    ``levels``: list of (ia, ib, iout) int arrays (slot indices; leaves
    occupy slots [0, N), internal nodes [N, M-2], slot M-1 is the
    batch-padding dump).  ``leaf_*``: [N, ...] host arrays padded to P.

    Returns (ops_per_level, lengths_per_level) as host arrays, or None
    on overflow (some merged profile outgrew P) — caller falls back."""
    from ginfinity_tpu.ops.library_pool import _member_capacity

    N, d = leaf_mu.shape[0], leaf_mu.shape[2]
    # member dim padded to a power-of-two bucket and internal slots
    # shifted to [Npad, 2*Npad-2]: program shapes then depend only on
    # (Npad, P, d), so families of different sizes share cached
    # executables (see library_pool._member_capacity)
    Npad = _member_capacity(N)
    shift = Npad - N
    M = 2 * Npad
    levels = [
        tuple(np.where(a >= N, a + shift, a).astype(np.int64) for a in lv)
        for lv in levels
    ]
    has_base = leaf_base is not None

    MU = jnp.concatenate(
        [jnp.asarray(leaf_mu), jnp.zeros((M - N, P, d), jnp.float32)]
    )
    if has_base:
        db = leaf_base.shape[2]
        MB = jnp.concatenate(
            [jnp.asarray(leaf_base), jnp.zeros((M - N, P, db), jnp.float32)]
        )
    else:
        # zero-width placeholder keeps the jit signature stable
        MB = jnp.zeros((M, P, 1), jnp.float32)
    ST = jnp.concatenate(
        [jnp.asarray(leaf_stem), jnp.zeros((M - N, P), jnp.float32)]
    )
    LN = jnp.concatenate(
        [jnp.asarray(leaf_len), jnp.zeros((M - N,), jnp.int32)]
    )

    go = jnp.float32(gap_open)
    ge = jnp.float32(gap_extend)
    sw = jnp.float32(seq_weight)
    dump = M - 1

    import os
    import time

    timing = os.environ.get("GINFINITY_MSA_TIMING")
    t0 = time.perf_counter()

    # Two program shapes only: Bp=1 for the (always-present) caterpillar
    # tail and one shared Bmax for every wider level.  DP lanes are
    # nearly free (B=16 measured 1.6x the B=1 device time) while every
    # distinct batch shape costs a ~1.5 s per-process executable load —
    # two shapes keep the background prewarm ahead of the stage even on
    # a degraded tunnel.
    Bmax = _pow2_batch(max(len(ia) for ia, _, _ in levels))

    # Dispatch plan: each item is either one tree level through the
    # per-level program ("one": Bp rows of IDX, batch-padded with the
    # (0, 0, dump) convention) or a chunk of consecutive batch-1 levels
    # through the scan program ("scan": _POOL_SCAN_CHUNK rows, the tail
    # chunk padded the same way).  IDX rows are laid out in dispatch
    # order so ONE upload serves the whole run and every output row
    # lines up with the concatenated ops/length download.
    TC = _POOL_SCAN_CHUNK
    noop = np.asarray([[0, 0, dump]], np.int32)
    rows = []
    plan = []  # ("one", B, Bp) | ("scan", n_real_levels)
    li = 0
    while li < len(levels):
        B = len(levels[li][0])
        if B == 1:
            j = li
            while j < len(levels) and len(levels[j][0]) == 1:
                j += 1
            if j - li >= _POOL_SCAN_MIN:
                for s in range(li, j, TC):
                    cnt = min(TC, j - s)
                    for ia, ib, iout in levels[s : s + cnt]:
                        rows.append(np.asarray(
                            [[ia[0], ib[0], iout[0]]], np.int32))
                    rows.extend([noop] * (TC - cnt))
                    plan.append(("scan", cnt))
                li = j
                continue
        Bp = 1 if B == 1 else Bmax
        ia, ib, iout = levels[li]
        pad = Bp - B
        rows.append(np.stack(
            [
                np.concatenate([ia, np.zeros(pad, np.int64)]),
                np.concatenate([ib, np.zeros(pad, np.int64)]),
                np.concatenate([iout, np.full(pad, dump, np.int64)]),
            ],
            axis=1,
        ).astype(np.int32))
        plan.append(("one", B, Bp))
        li += 1
    IDX = jnp.asarray(np.concatenate(rows, axis=0))
    ZERO = jnp.int32(0)

    ops_out = []
    len_out = []
    off = 0
    n_submit = 0
    for item in plan:
        # eager on-device slice: stable jit signature, no host upload
        if item[0] == "scan":
            blks = jax.lax.dynamic_slice(IDX, (jnp.int32(off), ZERO), (TC, 3))
            MU, MB, ST, LN, ops_rev, n_new = _pool_tail(
                MU, MB, ST, LN, blks, go, ge, sw, has_base, exact
            )
            off += TC
        else:
            Bp = item[2]
            blk = jax.lax.dynamic_slice(IDX, (jnp.int32(off), ZERO), (Bp, 3))
            MU, MB, ST, LN, ops_rev, n_new = _pool_level(
                MU, MB, ST, LN, blk, go, ge, sw, has_base, exact
            )
            off += Bp
        ops_out.append(ops_rev)  # device refs — no sync inside the loop
        len_out.append(n_new)
        n_submit += 1
    t1 = time.perf_counter()

    # ONE device concat + ONE blocking download (per-level np.asarray
    # would pay a D2H round trip per tree level — the very cost the
    # pool exists to remove)
    ops_all = np.asarray(jnp.concatenate(ops_out, axis=0))
    len_all = np.asarray(jnp.concatenate(len_out))
    t2 = time.perf_counter()
    if timing:
        print(f"[progressive detail] pool enqueue {t1 - t0:.2f}s "
              f"device+download {t2 - t1:.2f}s levels={len(levels)} "
              f"submissions={n_submit}")

    # distribute download rows back to tree levels in plan order
    lengths = []
    ops_host = []
    off = 0
    for item in plan:
        if item[0] == "scan":
            cnt = item[1]
            for t in range(cnt):
                ops_host.append(ops_all[off + t : off + t + 1])
                lengths.append(len_all[off + t : off + t + 1])
            off += TC
        else:
            B, Bp = item[1], item[2]
            ops_host.append(ops_all[off : off + B])
            lengths.append(len_all[off : off + B])
            off += Bp
    if any(int(l.max(initial=0)) > P for l in lengths):
        return None  # overflow: a merge outgrew the padded length
    return ops_host, lengths


def prewarm_pool_programs(n_leaves: int, P: int, d: int, base_dim: int,
                          b_max: int, exact: bool = True):
    """Compile/load the pool-level program ladder in the background (the
    same motivation as pairhmm.prewarm_profile_programs: one program per
    distinct batch size, ~1.5 s executable load each in a fresh
    process).  All inputs are created on device — nothing crosses the
    host link."""
    import threading

    from ginfinity_tpu.ops.library_pool import _member_capacity

    # the same member bucket run_progressive_pool pads to
    M = 2 * _member_capacity(max(1, n_leaves))
    has_base = base_dim > 0
    db = base_dim if has_base else 1

    # The run uses exactly two batch shapes: 1 (caterpillar tail) and
    # one Bmax = pow2(widest level).  The widest level of an NJ tree is
    # usually the first one (~n/12 cherries empirically), so the CORE
    # set is the n/8-ish guess plus 1; the remaining ladder widths only
    # hedge a wrong guess and are warmed ONLY when the persistent cache
    # is hot (cheap executable loads) — compiling them cold steals this
    # host's single CPU from the foreground stages for programs the run
    # most likely never dispatches (see library_pool's twin).
    n = max(1, b_max * 2)
    core = []
    for guess in (-(-n // 8), 1):
        g = _pow2_batch(max(1, guess))
        if g not in core:
            core.append(g)
    extras = []
    for guess in (4, 2, -(-n // 4), -(-n // 2)):
        g = _pow2_batch(max(1, guess))
        if g not in core and g not in extras:
            extras.append(g)
    stop = threading.Event()
    _COLD_SECS = 6.0

    def work():
        import os
        import time

        from ginfinity_tpu.utils.jaxinit import prewarm_gate_wait

        # foreground-priority gate (see library_pool's twin)
        if not prewarm_gate_wait(stop):
            return
        t0 = time.perf_counter()
        n_done = 0
        try:
            MU = jnp.zeros((M, P, d), jnp.float32)
            MB = jnp.zeros((M, P, db), jnp.float32)
            ST = jnp.zeros((M, P), jnp.float32)
            LN = jnp.ones((M,), jnp.int32)
            cold = False

            def warm_width(B, MU, MB, ST, LN):
                blk = jnp.full((B, 3), M - 1, jnp.int32)
                out = _pool_level(
                    MU, MB, ST, LN, blk,
                    jnp.float32(-1.0), jnp.float32(-0.1), jnp.float32(0.0),
                    has_base, exact,
                )
                jax.block_until_ready(out[4])
                return out[:4]

            for B in core:
                if stop.is_set():
                    return
                ts = time.perf_counter()
                MU, MB, ST, LN = warm_width(B, MU, MB, ST, LN)
                cold |= (time.perf_counter() - ts) > _COLD_SECS
                n_done += 1
            # the caterpillar-tail scan program: guaranteed to fire on
            # any non-trivial NJ tree and the most expensive compile,
            # so it follows the core widths directly
            if stop.is_set():
                return
            blks = jnp.full((_POOL_SCAN_CHUNK, 3), M - 1, jnp.int32)
            ts = time.perf_counter()
            out = _pool_tail(
                MU, MB, ST, LN, blks,
                jnp.float32(-1.0), jnp.float32(-0.1), jnp.float32(0.0),
                has_base, exact,
            )
            MU, MB, ST, LN = out[:4]
            jax.block_until_ready(out[4])
            cold |= (time.perf_counter() - ts) > _COLD_SECS
            n_done += 1
            if not cold:
                for B in extras:
                    if stop.is_set():
                        return
                    MU, MB, ST, LN = warm_width(B, MU, MB, ST, LN)
                    n_done += 1
            if os.environ.get("GINFINITY_MSA_TIMING"):
                print(f"[progressive detail] pool prewarm done "
                      f"({n_done} programs, cold={cold}, "
                      f"{time.perf_counter() - t0:.1f}s)",
                      flush=True)
        except Exception as e:  # pragma: no cover - best-effort warmup
            if os.environ.get("GINFINITY_MSA_TIMING"):
                print(f"[progressive detail] pool prewarm failed: {e!r}",
                      flush=True)
            return

    from ginfinity_tpu.utils.jaxinit import register_prewarm_thread

    t = threading.Thread(target=work, daemon=True, name="pool-dp-prewarm")
    register_prewarm_thread(t, stop)
    t.start()
    return t
