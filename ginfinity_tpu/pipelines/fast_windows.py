"""Device-side sliding-window embedding — the scale path for window
corpora.

The file-based flow (``ginfinity-generate-windows`` -> ``ginfinity-embed
--graph-pt``) matches the reference pipeline; for large corpora it moves
every window's arrays across the host->device link.  This module instead
uploads each structure's *full* feature/pair arrays once (~20 bytes/nt)
and builds every window subgraph **inside jit** with index arithmetic
(vmapped over window starts), then runs the encoder and pooling in the
same program.  Window semantics are identical to
:func:`ginfinity_tpu.pipelines.windows.slice_window` (keep-paired-
neighbors pull-in, backbone cuts, adjacent-pair quirk); pooled
embeddings match the file-based path to float32 tolerance.

Layout (standard configs, the hot path): ALIGNED — 2L slots per window,
slot i < L holds position start+i and slot L+i holds position i's
pulled outside partner (masked when absent).  Round 3's ablation showed
~99% of device time was the per-window graph BUILD (compaction
scatters, edge-array assembly), not the encoder; the aligned layout
removes every scatter and all edge arrays — backbone and pulled-partner
messages are axis shifts, in-window base-pair messages one
take_along_axis row-gather per layer, and the edge-attr embeddings are
constant [H] vectors (`_forward_windows_aligned`; 28k -> 52k emb/s
device-only, BASELINE.md).  Exotic configs fall back to the generic
compact `_window_batch` + flattened `forward_once` path.  Graph-level
pooling is invariant to node ordering, so both match the file-based
path to f32 tolerance.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# VMEM-resident Pallas encoder for the aligned window path
# (ops/pallas_windows.py) — on by default for the configs it covers
# (TPU-parity-verified to 1.5e-6 vs the XLA path at HIGHEST precision;
# 76.7k vs 55.7k emb/s device-only on the bench corpus).  Set
# GINFINITY_PALLAS_WINDOWS=0 to force the XLA path.
_USE_PALLAS = os.environ.get("GINFINITY_PALLAS_WINDOWS", "1") != "0"
_canary_cache: dict = {}


def _canary_key(cfg: "GINConfig", L: int) -> tuple:
    """Everything the kernel's lowering specializes on (see
    pallas_windows._pallas_forward static args) plus the backend."""
    from ginfinity_tpu.ops.pallas_windows import layer_dims

    return (
        jax.default_backend(), layer_dims(cfg), cfg.output_dim,
        cfg.pooling_type,
        cfg.node_embed_norm if cfg.normalize_nodes_before_pool else "none",
        cfg.use_residual, cfg.matmul_precision, L,
    )


def _pallas_canary_ok(cfg: "GINConfig", L: int) -> bool:
    """One-time per-(config-family, L) check that the window kernel
    actually Mosaic-compiles and runs on this backend — a toolchain
    regression (or an unforeseen Mosaic lowering gap on a new config
    family) must degrade the fused path to the XLA encoder, not crash
    the pipeline.  The canary is a concrete one-block forward of the
    USER'S config at the user's window size, executed at host level so
    compile failures are catchable (the real call sites sit inside
    outer jits where they would not be).  Host entry points run it
    BEFORE their first dispatch; the trace-time gate in
    :func:`_forward_windows_aligned` only reads the cached verdict —
    device work during tracing would produce tracers, not results."""
    key = _canary_key(cfg, L)
    if key in _canary_cache:
        return _canary_cache[key]
    try:
        from ginfinity_tpu.models.gine import init_params
        from ginfinity_tpu.ops.pallas_windows import (
            _pick_cb,
            forward_windows_pallas,
            layer_dims,
        )

        dims = layer_dims(cfg)
        cb = _pick_cb(dims, cfg.output_dim, L)
        if cb is None:
            # no VMEM fit: forward_windows_pallas returns None at trace
            # time and the XLA path runs — nothing to canary
            _canary_cache[key] = True
            return True
        params, state = init_params(jax.random.PRNGKey(0), cfg)
        zc = jnp.zeros((cb, L), jnp.float32)
        out = forward_windows_pallas(
            cfg, params, state,
            jnp.zeros((cb, 2 * L, dims[0][0]), jnp.float32),
            zc.astype(jnp.int32), zc, zc, zc, zc, L,
        )
        assert out is not None
        np.asarray(out)  # force compile + execute
        ok = True
    except Exception as exc:  # pragma: no cover - toolchain-dependent
        import warnings

        warnings.warn(
            "Pallas window kernel unavailable for this config on backend "
            f"{jax.default_backend()!r} ({exc!r}); using the XLA encoder"
        )
        ok = False
    _canary_cache[key] = ok
    return ok


def _maybe_canary(cfg: "GINConfig", L: int) -> None:
    """Run the Pallas canary iff this config would take the kernel path
    (host level, before the first fused dispatch)."""
    if _USE_PALLAS and jax.default_backend() != "cpu" and _dense_forward_ok(cfg):
        from ginfinity_tpu.ops.pallas_windows import pallas_windows_ok

        if pallas_windows_ok(cfg):
            _pallas_canary_ok(cfg, L)

from ginfinity_tpu.graphs.batching import GraphBatch
from ginfinity_tpu.graphs.build import (
    window_edge_const_rows,
    window_node_features,
)
from ginfinity_tpu.graphs.dotbracket import pair_table
from ginfinity_tpu.models.gine import GINConfig, forward_once


def _compact(flags, values_list, cap: int):
    """Scatter ``values_list`` rows where ``flags`` is true into ``cap``
    slots (in position order) via cumsum targets.  Returns the compacted
    value arrays plus the slot-occupancy mask.  Entries beyond ``cap``
    are dropped (callers size ``cap`` from exact host counts, so this is
    purely defensive)."""
    tgt = jnp.cumsum(flags.astype(jnp.int32)) - 1
    # masked entries (and overflow) all land on the drop slot ``cap``,
    # which is sliced away — no zeroing of values needed
    slot = jnp.where(flags & (tgt < cap), tgt, cap)
    outs = []
    for v in values_list:
        buf = jnp.zeros((cap + 1,) + v.shape[1:], v.dtype)
        outs.append(buf.at[slot].add(v)[:cap])
    occ = jnp.zeros(cap + 1, jnp.float32).at[slot].add(flags.astype(jnp.float32))[:cap]
    return outs, occ


def _window_batch(feats_all, pts_all, si, start, L: int,
                  keep_paired_neighbors: bool,
                  p_cap: int = None, b_cap: int = None,
                  include_backbone: bool = True, edge_dim: int = 4):
    """Build one window's GraphBatch (single graph) inside jit.

    ``feats_all [S, n_cap, F]`` / ``pts_all [S, n_cap]`` are the stacked
    per-structure arrays and ``si`` the structure slot — rows are
    gathered directly (``feats_all[si, idx]``) so vmapping never
    materializes whole structure slabs per window.

    ``p_cap``/``b_cap`` bound the pulled-partner and in-window base-pair
    slot counts (compact layout); ``None`` falls back to the loose upper
    bounds (L and L) for callers that cannot precompute them.
    ``include_backbone=False`` omits the (i, i±1) backbone edges (their
    messages can be computed as array shifts instead)."""
    if p_cap is None:
        p_cap = L if keep_paired_neighbors else 0
    if b_cap is None:
        b_cap = L
    idx = start + jnp.arange(L, dtype=jnp.int32)  # original positions
    partner = pts_all[si, idx]
    has_pair = partner >= 0
    adj_pair = jnp.abs(partner - idx) == 1  # 'adjacent' edge in the reference
    bp_real = has_pair & ~adj_pair
    in_win = (partner >= start) & (partner < start + L)
    pulled = bp_real & ~in_win if keep_paired_neighbors else jnp.zeros_like(bp_real)
    local = jnp.arange(L, dtype=jnp.int32)

    # nodes: [L + p_cap, F]; pulled partners compacted into the tail slots
    feat_window = feats_all[si, idx]
    partner_feat = feats_all[si, jnp.clip(partner, 0)]
    if p_cap > 0:
        (pulled_feat, pl_src, pl_fwd), pl_occ = _compact(
            pulled,
            [partner_feat, local, (idx < partner).astype(jnp.float32)],
            p_cap,
        )
        node_feat = jnp.concatenate([feat_window, pulled_feat])
        node_mask = jnp.concatenate([jnp.ones(L, jnp.float32), pl_occ])
    else:
        node_feat = feat_window
        node_mask = jnp.ones(L, jnp.float32)

    # backbone edges (both directions): (i, i-1) for i in 1..L-1 — dense
    bb_src = jnp.arange(1, L, dtype=jnp.int32)
    bb_dst = bb_src - 1
    bb_mask = jnp.ones(L - 1, jnp.float32)

    # in-window base pairs (i < j side), compacted into b_cap slots
    j_local = partner - start
    bp_in = bp_real & in_win & (partner > idx)
    (bp_src, bp_dst), bp_occ = _compact(
        bp_in, [local, jnp.clip(j_local, 0, L - 1)], b_cap
    )

    def both_dirs(src, dst, mask, fwd, attr2):
        # attr2 = [adjacent, base_pair]; fwd/bwd sit in the LAST two attr
        # cols for both the standard (4) and forgi (7) edge layouts —
        # forgi's middle cols are meta-edge classes, zero here.
        s = jnp.concatenate([src, dst])
        d = jnp.concatenate([dst, src])
        m = jnp.concatenate([mask, mask])
        f = jnp.concatenate([fwd, 1.0 - fwd])
        a = jnp.broadcast_to(jnp.asarray(attr2, jnp.float32), (s.shape[0], 2))
        mid = jnp.zeros((s.shape[0], edge_dim - 4), jnp.float32)
        attr = jnp.concatenate([a, mid, f[:, None], 1.0 - f[:, None]], axis=1)
        return s, d, attr * m[:, None], m

    # forward flags: backbone src(i) > dst(i-1) in original order -> fwd=0
    segs = []
    if include_backbone:
        segs.append(both_dirs(bb_src, bb_dst, bb_mask, jnp.zeros(L - 1), (1.0, 0.0)))
    segs.append(both_dirs(bp_src, bp_dst, bp_occ, jnp.ones(b_cap), (0.0, 1.0)))
    if p_cap > 0:
        # pulled-partner pairs: compacted local i <-> tail slot L+k
        pl_dst = L + jnp.arange(p_cap, dtype=jnp.int32)
        segs.append(both_dirs(pl_src, pl_dst, pl_occ, pl_fwd, (0.0, 1.0)))

    edge_src = jnp.concatenate([s for s, _, _, _ in segs])
    edge_dst = jnp.concatenate([d for _, d, _, _ in segs])
    edge_attr = jnp.concatenate([a for _, _, a, _ in segs])
    edge_mask = jnp.concatenate([m for _, _, _, m in segs])

    n_nodes = jnp.sum(node_mask).astype(jnp.int32)
    return GraphBatch(
        node_feat=node_feat,
        node_graph=jnp.where(node_mask > 0, 0, 1).astype(jnp.int32),
        node_mask=node_mask,
        base_mask=node_mask,
        edge_src=edge_src,
        edge_dst=edge_dst,
        edge_attr=edge_attr,
        edge_mask=edge_mask,
        n_nodes=n_nodes[None],
        num_graphs=1,
    )


def _cap_ladder(x: int) -> int:
    """Round a slot count up to {0, 8, 16, 32, 64, ...} to bound program
    variants."""
    if x <= 0:
        return 0
    return max(8, 1 << (int(x) - 1).bit_length())


def _window_slot_caps(pt: np.ndarray, L: int, starts: np.ndarray,
                      keep_paired_neighbors: bool) -> tuple[int, int]:
    """Exact maxima over ``starts`` of (in-window base pairs, pulled
    partners) per window — one O(n) interval-sum sweep on the host, no
    per-window loop."""
    n = pt.shape[0]
    ns = n - L + 1
    i = np.arange(n)
    j = pt
    up = (j >= 0) & (np.abs(j - i) != 1) & (j > i)
    ii, jj = i[up], j[up]

    def interval_counts(lo, hi):
        diff = np.zeros(ns + 1, np.int64)
        lo = np.maximum(lo, 0)
        hi = np.minimum(hi, ns - 1)
        ok = lo <= hi
        np.add.at(diff, lo[ok], 1)
        np.add.at(diff, hi[ok] + 1, -1)
        return np.cumsum(diff[:ns])

    # pair (i, j) fully in window [s, s+L): s in [j-L+1, i]
    bp_counts = interval_counts(jj - L + 1, ii)
    if keep_paired_neighbors and ii.size:
        # i in window, j outside (above): s in [i-L+1, min(i, j-L)]
        pl = interval_counts(ii - L + 1, np.minimum(ii, jj - L))
        # j in window, i outside (below): s in [max(i+1, j-L+1), j]
        pl = pl + interval_counts(np.maximum(ii + 1, jj - L + 1), jj)
    else:
        pl = np.zeros(ns, np.int64)
    if starts.size == 0:
        return 0, 0
    return int(bp_counts[starts].max()), int(pl[starts].max())


@partial(jax.jit, static_argnames=("config", "L", "keep_paired_neighbors",
                                   "p_cap", "b_cap", "chunk"))
def _embed_windows_jit(config: GINConfig, params, state, feat, pt, starts,
                       L: int, keep_paired_neighbors: bool,
                       p_cap: int = None, b_cap: int = None, chunk: int = 64):
    """Single-structure variant of :func:`_embed_windows_stacked_jit`."""
    n_per = L + (p_cap if p_cap is not None else (L if keep_paired_neighbors else 0))
    dense = _dense_forward_ok(config)

    def chunk_fn(st):
        if dense:
            return _forward_windows_aligned(
                config, params, state, feat[None], pt[None],
                jnp.zeros_like(st), st, L, keep_paired_neighbors,
            )
        wb = jax.vmap(
            lambda s: _window_batch(feat[None], pt[None], 0, s, L,
                                    keep_paired_neighbors, p_cap, b_cap,
                                    edge_dim=config.edge_feature_dim)
        )(st)
        gb = _flatten_window_chunk(wb, chunk, n_per)
        return forward_once(config, params, state, gb)[0]

    w_cap = starts.shape[0]
    return jax.lax.map(chunk_fn, starts.reshape(-1, chunk)).reshape(w_cap, -1)


def _ladder_caps(cfg: GINConfig, p_max: int, b_max: int) -> tuple[int, int]:
    """Static (p_cap, b_cap) for the window-embedding jits.  The dense
    aligned path never reads them, so pin them to 0 there — otherwise
    two structures differing only in their base-pair ladder bucket
    would compile two byte-identical dense programs (each a ~1.5-30 s
    executable load on a fresh process)."""
    if _dense_forward_ok(cfg):
        return 0, 0
    return _cap_ladder(p_max), _cap_ladder(b_max)


def _chunk_for(w_cap: int) -> int:
    """Largest of {128, 64, 32} dividing the padded window count (every
    ladder capacity is a multiple of 32).  128 measured fastest on the
    v5e (12.4k vs 10.9k emb/s at 64; 256 regresses — VMEM pressure)."""
    for c in (128, 64, 32):
        if w_cap % c == 0:
            return c
    return 32


def embed_structure_windows(
    model,
    structure: str,
    L: int,
    keep_paired_neighbors: bool = True,
    mask_threshold: float = 0.0,
    starts_pad: int = 256,
    block: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """All window embeddings of one structure, computed on device.

    Returns (starts [W], embeddings [W, D]).  ``starts_pad`` buckets the
    window count so XLA reuses one program across structures.
    """
    from ginfinity_tpu.pipelines.windows import window_starts_mask

    cfg = model.config
    _maybe_canary(cfg, L)
    pt = pair_table(structure)
    n = pt.shape[0]
    if n < L:
        return np.zeros(0, np.int64), np.zeros((0, cfg.output_dim), np.float32)
    feat = window_node_features(
        pt, None, cfg.seq_weight, cfg.graph_encoding, cfg.node_feature_dim
    )
    keep = window_starts_mask(structure, L, mask_threshold)
    starts = np.nonzero(keep)[0].astype(np.int32)
    if starts.size == 0:
        return np.zeros(0, np.int64), np.zeros((0, cfg.output_dim), np.float32)

    cap = -(-starts.size // starts_pad) * starts_pad
    starts_padded = np.zeros(cap, np.int32)
    starts_padded[: starts.size] = starts

    # pad the structure arrays to a ladder so XLA reuses programs across
    # structures of similar length (padding rows are unpaired/zero and
    # unreachable from valid window starts)
    from ginfinity_tpu.graphs.batching import _round_capacity

    n_cap = _round_capacity(n)
    feat_p = np.zeros((n_cap, feat.shape[1]), np.float32)
    feat_p[:n] = feat
    pt_p = np.full(n_cap, -1, np.int32)
    pt_p[:n] = pt

    b_max, p_max = _window_slot_caps(pt, L, starts, keep_paired_neighbors)
    emb = _embed_windows_jit(
        cfg, model.params, model.state,
        jnp.asarray(feat_p), jnp.asarray(pt_p), jnp.asarray(starts_padded),
        L, keep_paired_neighbors,
        *_ladder_caps(cfg, p_max, b_max), _chunk_for(cap),
    )
    if block:
        emb = np.asarray(emb)[: starts.size]
    return starts.astype(np.int64), emb


def _flatten_window_chunk(wb: GraphBatch, chunk: int, n_per: int) -> GraphBatch:
    """Merge ``chunk`` vmapped single-window GraphBatches into ONE flat
    multi-graph batch (window w occupies node slots [w*n_per, (w+1)*n_per)).

    Message passing, norms, and pooling then run as flat segment ops over
    the whole chunk — the same layout as the file-based engine's packed
    batches — instead of vmapped per-window ops, which XLA schedules far
    less efficiently on TPU."""
    e_per = wb.edge_src.shape[1]
    offs = (jnp.arange(chunk, dtype=jnp.int32) * n_per)[:, None]
    node_mask = wb.node_mask.reshape(-1)
    node_graph = jnp.where(
        node_mask > 0,
        jnp.repeat(jnp.arange(chunk, dtype=jnp.int32), n_per),
        chunk,
    )
    return GraphBatch(
        node_feat=wb.node_feat.reshape(chunk * n_per, -1),
        node_graph=node_graph,
        node_mask=node_mask,
        base_mask=node_mask,
        edge_src=(wb.edge_src + offs).reshape(-1),
        edge_dst=(wb.edge_dst + offs).reshape(-1),
        edge_attr=wb.edge_attr.reshape(chunk * e_per, -1),
        edge_mask=wb.edge_mask.reshape(-1),
        n_nodes=wb.n_nodes.reshape(-1),
        num_graphs=chunk,
    )


def _forward_windows_aligned(config: GINConfig, params, state, feats_all,
                             pts_all, si, st, L: int,
                             keep_paired_neighbors: bool = True,
                             views=None, use_pallas=None):
    """Fused build + GINE forward for a chunk of windows in the ALIGNED
    layout: slot i < L holds window position start+i; slot L+i holds the
    pulled outside partner of position i (masked when absent).

    The ablation story (BASELINE.md round 3): the encoder was ~1% of the
    fused path's device time — ~99% was the per-window *graph build*
    (compaction cumsum+scatter, edge-array assembly, many small vmapped
    ops).  Aligning partners to their puller's position removes every
    scatter and all edge arrays:

    - backbone messages: axis shifts (as before);
    - in-window base-pair messages: ONE take_along_axis row-gather per
      layer (j_local is position-static);
    - pulled-partner messages: an axis SHIFT by L (slots are aligned);
    - edge embeddings: 6 constant [H] vectors (2 per edge class),
      selected per position by the is_forward flag.

    Semantics identical to the compact path (window semantics of
    windows.slice_window; pooling is node-order invariant)."""
    from ginfinity_tpu.models.gine import _dense, _prec, apply_node_norm

    prec = _prec(config)
    f32 = jnp.float32
    C = si.shape[0]
    H = config.hidden_dims[0]

    idx = st[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]   # [C, L]
    if views is not None:
        # sliding-window views (built once per program by the caller):
        # one CONTIGUOUS [L(, F)] row per window instead of C*L scalar
        # element gathers from the structure slabs
        fview, pview = views
        ns_cap = feats_all.shape[1] - L + 1
        flat = si * ns_cap + st
        fw = fview[flat]                                          # [C, L, F]
        partner = pview[flat]                                     # [C, L]
    else:
        partner = pts_all[si[:, None], idx]                       # [C, L]
        fw = feats_all[si[:, None], idx]                          # [C, L, F]
    pfeat = feats_all[si[:, None], jnp.clip(partner, 0)]          # [C, L, F]
    has = partner >= 0
    adj = jnp.abs(partner - idx) == 1    # reference adjacent-pair quirk
    bp_real = has & ~adj
    in_win = (partner >= st[:, None]) & (partner < st[:, None] + L)
    if keep_paired_neighbors:
        pulled = (bp_real & ~in_win).astype(f32)                  # [C, L]
    else:
        pulled = jnp.zeros_like(idx, f32)
    bp_in = (bp_real & in_win).astype(f32)
    j_local = jnp.clip(partner - st[:, None], 0, L - 1)           # [C, L]
    # is_forward of the message ARRIVING at each node (src < dst in
    # original coordinates): at window pos i from partner j: j < i
    fwd_into_w = (partner < idx).astype(f32)[..., None]           # [C, L, 1]
    # at the pulled slot (holds j) from its puller i: i < j
    fwd_into_p = (idx < partner).astype(f32)[..., None]

    mask = jnp.concatenate([jnp.ones((C, L), f32), pulled], axis=1)
    mask3 = mask[..., None]                                       # [C, 2L, 1]
    counts = jnp.maximum(mask.sum(axis=1), 1.0)

    node_feat = jnp.concatenate([fw, pfeat * pulled[..., None]], axis=1)
    x = _dense(
        node_feat.reshape(C * 2 * L, -1), params["node_encoder"], prec
    ).reshape(C, 2 * L, -1)

    if use_pallas is None:
        # default on for accelerators only: on CPU the kernel can only
        # run in (slow) interpret mode — covered explicitly by tests.
        # _canary_cache is read-only here (trace time); the host entry
        # points populate it before their first dispatch.  Default True
        # for keys never canaried (direct-jit callers: prewarm, tests).
        use_pallas = (
            _USE_PALLAS
            and jax.default_backend() != "cpu"
            and _canary_cache.get(_canary_key(config, L), True)
        )
    if use_pallas and C % 8 == 0:
        from ginfinity_tpu.ops.pallas_windows import (
            forward_windows_pallas,
            pallas_windows_ok,
        )

        if pallas_windows_ok(config):
            res = forward_windows_pallas(
                config, params, state, x, j_local, bp_in, pulled,
                fwd_into_w[..., 0], fwd_into_p[..., 0], L,
                interpret=jax.default_backend() == "cpu",
            )
            if res is not None:   # None = no VMEM fit; XLA path below
                return res

    pos = jnp.arange(L)
    m_next = (pos <= L - 2).astype(f32)[None, :, None]
    m_prev = (pos >= 1).astype(f32)[None, :, None]
    pulled3 = pulled[..., None]
    bp3 = bp_in[..., None]

    # constant edge-attr rows in the model's edge layout (standard 4-dim
    # or forgi 7-dim; fwd/bwd always the last two cols)
    const_rows = window_edge_const_rows(config.edge_feature_dim)
    attrs = {
        "adj_from_next": jnp.asarray(const_rows[0], f32),
        "adj_from_prev": jnp.asarray(const_rows[1], f32),
        "bp_f": jnp.asarray(const_rows[2], f32),   # is_forward = 1
        "bp_b": jnp.asarray(const_rows[3], f32),
    }

    for i in range(config.gin_layers):
        conv = params["convs"][i]
        h_in = x
        eb = {k: _dense(v[None, :], conv["edge_lin"], prec)[0]
              for k, v in attrs.items()}
        xw = x[:, :L, :]
        xp = x[:, L:, :]
        zrow = jnp.zeros_like(xw[:, :1, :])
        x_next = jnp.concatenate([xw[:, 1:, :], zrow], axis=1)
        x_prev = jnp.concatenate([zrow, xw[:, :-1, :]], axis=1)
        agg_w = (
            jax.nn.relu(x_next + eb["adj_from_next"]) * m_next
            + jax.nn.relu(x_prev + eb["adj_from_prev"]) * m_prev
        )
        # in-window base pairs: x[j_local] rows + fwd-selected edge emb
        xj = jnp.take_along_axis(xw, j_local[..., None], axis=1)
        e_bp_w = fwd_into_w * eb["bp_f"] + (1.0 - fwd_into_w) * eb["bp_b"]
        agg_w = agg_w + jax.nn.relu(xj + e_bp_w) * bp3
        # pulled partners: slot L+i <-> window pos i (aligned: a shift by L)
        agg_w = agg_w + jax.nn.relu(xp + e_bp_w) * pulled3
        e_bp_p = fwd_into_p * eb["bp_f"] + (1.0 - fwd_into_p) * eb["bp_b"]
        agg_p = jax.nn.relu(xw + e_bp_p) * pulled3
        agg = jnp.concatenate([agg_w, agg_p], axis=1)

        h = (1.0 + conv["eps"]) * x + agg
        hf = h.reshape(C * 2 * L, -1)
        hf = jax.nn.relu(_dense(hf, conv["mlp0"], prec))
        hf = jax.nn.relu(_dense(hf, conv["mlp1"], prec))
        h = hf.reshape(C, 2 * L, -1)
        if config.norm_type == "graph":
            p = params["norms"][i]
            cnt = counts[:, None, None]
            mean = (h * mask3).sum(axis=1, keepdims=True) / cnt
            out = h - mean * p["mean_scale"]
            var = ((out * out) * mask3).sum(axis=1, keepdims=True) / cnt
            h = p["weight"] * out / jnp.sqrt(var + 1e-5) + p["bias"]
        if config.use_residual and h.shape == h_in.shape:
            h = h + h_in
        x = h

    if config.normalize_nodes_before_pool:
        x = apply_node_norm(config, state, x.reshape(C * 2 * L, -1)).reshape(
            C, 2 * L, -1
        )
    x = x * mask3
    pooled = x.sum(axis=1)
    if config.pooling_type == "global_mean_pool":
        pooled = pooled / counts[:, None]
    return _dense(pooled, params["fc"], prec)


def _dense_forward_ok(config: GINConfig) -> bool:
    """The dense chunk forward covers the window pipeline's config space:
    standard encoding (4-dim edges), graph/none norm, add/mean pooling.
    Anything else routes through the generic flattened forward_once."""
    return (
        config.edge_feature_dim in (4, 7)
        and config.norm_type in ("graph", "none")
        and config.pooling_type in ("global_add_pool", "global_mean_pool")
    )


@partial(jax.jit, static_argnames=("config", "L", "keep_paired_neighbors",
                                   "p_cap", "b_cap", "chunk"))
def _embed_windows_stacked_jit(config: GINConfig, params, state, feats, pts,
                               sidx, starts, L: int, keep_paired_neighbors: bool,
                               p_cap: int = None, b_cap: int = None,
                               chunk: int = 64):
    """All windows of a stacked structure group in ONE program.

    feats [S, n_cap, F] / pts [S, n_cap]: padded per-structure arrays.
    sidx/starts [W_cap]: flat window descriptors (structure slot, start);
    W_cap must be a multiple of ``chunk``.  Each chunk of windows is
    vmap-built and encoded by the dense chunk forward (or the generic
    flattened forward for exotic configs).
    """
    n_per = L + (p_cap if p_cap is not None else (L if keep_paired_neighbors else 0))
    dense = _dense_forward_ok(config)

    views = None
    if dense:
        ns_cap = feats.shape[1] - L + 1
        views = (
            jnp.stack(
                [feats[:, i : i + ns_cap, :] for i in range(L)], axis=2
            ).reshape(-1, L, feats.shape[2]),
            jnp.stack(
                [pts[:, i : i + ns_cap] for i in range(L)], axis=2
            ).reshape(-1, L),
        )

    def chunk_fn(args):
        si, st = args  # [chunk]
        if dense:
            # aligned fused build+forward: no compaction scatters, no
            # edge arrays (the build dominated the old path's time)
            return _forward_windows_aligned(
                config, params, state, feats, pts, si, st, L,
                keep_paired_neighbors, views,
            )
        wb = jax.vmap(
            lambda s_, t_: _window_batch(feats, pts, s_, t_, L,
                                         keep_paired_neighbors, p_cap, b_cap,
                                         edge_dim=config.edge_feature_dim)
        )(si, st)
        gb = _flatten_window_chunk(wb, chunk, n_per)
        return forward_once(config, params, state, gb)[0]

    w_cap = sidx.shape[0]
    out = jax.lax.map(
        chunk_fn, (sidx.reshape(-1, chunk), starts.reshape(-1, chunk))
    )
    return out.reshape(w_cap, -1)


_SHARDED_STACKED_CACHE: dict = {}


def _embed_windows_stacked_sharded(config, params, state, feats, pts, sidx,
                                   starts, L, keep_paired_neighbors, p_cap,
                                   b_cap, chunk, mesh):
    """Mesh variant of :func:`_embed_windows_stacked_jit`: the flat
    window-descriptor axis shards over the mesh's 'data' axis (structure
    slabs + params replicated — they are small; windows are the scale
    axis), each chip maps its chunk slice, outputs concatenate sharded.
    The descriptor count must divide by ``chunk * mesh size`` (the
    packer pads to that multiple in mesh mode)."""
    import jax.numpy as jnp  # noqa: F401  (kept for parity with caller)
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = (config, L, keep_paired_neighbors, p_cap, b_cap, chunk, mesh)
    fn = _SHARDED_STACKED_CACHE.get(key)
    if fn is None:
        def impl(params, state, feats, pts, sidx, starts):
            return _embed_windows_stacked_jit.__wrapped__(
                config, params, state, feats, pts, sidx, starts,
                L, keep_paired_neighbors, p_cap, b_cap, chunk,
            )

        repl = NamedSharding(mesh, P())
        rows = NamedSharding(mesh, P("data"))
        fn = jax.jit(
            impl,
            in_shardings=(repl, repl, repl, repl, rows, rows),
            out_shardings=rows,
        )
        _SHARDED_STACKED_CACHE[key] = fn
    return fn(params, state, feats, pts, sidx, starts)


def _prep_corpus_groups(cfg, structures, L, keep_paired_neighbors,
                        mask_threshold, max_programs=None):
    """Host preprocessing + capacity-ladder grouping shared by the run
    and prewarm paths.  Returns (per, groups).  ``max_programs`` merges
    the smallest length buckets upward until at most that many remain."""
    from ginfinity_tpu.graphs.batching import _round_capacity
    from ginfinity_tpu.pipelines.windows import window_starts_mask

    per = [None] * len(structures)
    for i, s in enumerate(structures):
        pt = pair_table(s)
        n = pt.shape[0]
        if n < L:
            continue
        keep = window_starts_mask(s, L, mask_threshold)
        starts = np.nonzero(keep)[0].astype(np.int32)
        if starts.size == 0:
            continue
        feat = window_node_features(
            pt, None, cfg.seq_weight, cfg.graph_encoding, cfg.node_feature_dim
        )
        b_max, p_max = _window_slot_caps(pt, L, starts, keep_paired_neighbors)
        per[i] = (_round_capacity(n), feat, pt, n, starts, b_max, p_max)

    groups: dict[int, list[int]] = {}
    for i, item in enumerate(per):
        if item is not None:
            groups.setdefault(item[0], []).append(i)
    if max_programs and len(groups) > max_programs:
        items = sorted(groups.items())
        while len(items) > max_programs:
            (nc0, i0), (nc1, i1) = items[0], items[1]
            items = sorted([(nc1, i0 + i1)] + items[2:])
        groups = dict(items)
    return per, groups


def _pack_group(cfg, per, n_cap, idxs, w_multiple: int | None = None):
    """Stacked padded arrays + window descriptors for one ladder group.
    ``w_multiple`` additionally rounds the descriptor count up to that
    multiple (mesh mode needs chunk * n_devices divisibility)."""
    from ginfinity_tpu.graphs.batching import _round_capacity

    s_cap = _round_capacity(len(idxs))
    feats = np.zeros((s_cap, n_cap, cfg.node_feature_dim), np.float32)
    pts_p = np.full((s_cap, n_cap), -1, np.int32)
    sidx_parts, starts_parts = [], []
    b_cap = p_cap = 0
    for local, i in enumerate(idxs):
        _, feat, pt, n, starts, b_max, p_max = per[i]
        feats[local, :n] = feat
        pts_p[local, :n] = pt
        sidx_parts.append(np.full(starts.size, local, np.int32))
        starts_parts.append(starts)
        b_cap = max(b_cap, b_max)
        p_cap = max(p_cap, p_max)
    sidx = np.concatenate(sidx_parts)
    starts_all = np.concatenate(starts_parts)
    w_cap = _round_capacity(sidx.size)
    if w_multiple:
        w_cap = -(-w_cap // w_multiple) * w_multiple
    # pad descriptors with (slot 0, start 0): slot 0 is a real
    # structure with n >= L, so the padded windows are valid compute
    # whose results are simply discarded
    sidx_p = np.zeros(w_cap, np.int32)
    sidx_p[: sidx.size] = sidx
    starts_p = np.zeros(w_cap, np.int32)
    starts_p[: starts_all.size] = starts_all
    return feats, pts_p, sidx_p, starts_p, p_cap, b_cap, w_cap


def embed_corpus_windows(model, structures, L, keep_paired_neighbors=True,
                         mask_threshold=0.0, parallel_compile=True,
                         max_programs=None, mesh=None, wire=None):
    """Window embeddings for a corpus.  Returns a list of
    (starts, embeddings) per structure.

    Structures are grouped by padded length (the capacity ladder), each
    group's feature/pair arrays stacked into one [S, n_cap] upload, and
    every window in the group embedded by a single device program that
    maps over flat (structure, start) descriptors — dispatch and link
    latency amortize over the whole group instead of paying per
    structure (the round-1 bottleneck: ~100 dispatches for the bench
    corpus; now one per length bucket).

    ``parallel_compile``: dispatch the groups from a small thread pool so
    cold compiles / persistent-cache executable loads of DIFFERENT
    ladder programs overlap (they serialize on the main thread
    otherwise; XLA compilation releases the GIL).  Steady-state
    behaviour is unchanged — threads only overlap host-side work.

    ``max_programs``: merge the smallest length buckets upward until at
    most this many device programs remain.  First-run latency on a
    remote TPU is dominated by per-program device loads (~25-30 s each,
    serialized on the worker even when compilation itself hits the
    persistent cache), so ``max_programs=1`` trades a few percent of
    padding compute for a single load.

    ``mesh``: shard each group's flat window-descriptor axis over the
    mesh's 'data' axis (structure slabs + params replicated) — corpus
    window embedding then scales linearly with chip count; no
    collectives on the forward path.  Certified against the
    single-device path in the driver dryrun.

    ``wire``: D2H encoding for the result download.  ``None``/"f32"
    downloads exact float32.  "f16" casts on device and upcasts on the
    host — half the D2H bytes on a link-bound transport for a bounded
    rounding error (IEEE half: <=2^-11 ~ 4.9e-4 relative per element;
    embeddings are O(1) and far from f16 overflow/subnormal range).
    Compute is untouched — this is purely the wire format.
    """
    from ginfinity_tpu.utils.jaxinit import join_backend_warmup, start_backend_warmup

    if wire not in (None, "f32", "f16"):
        # a typo ("F16", "f64") must not silently fall back to the exact
        # f32 download (ADVICE r4)
        raise ValueError(f"wire must be None, 'f32' or 'f16', got {wire!r}")
    start_backend_warmup()  # overlap backend bring-up with host prep
    cfg = model.config
    _maybe_canary(cfg, L)
    empty = (np.zeros(0, np.int64), np.zeros((0, cfg.output_dim), np.float32))
    per, groups = _prep_corpus_groups(
        cfg, structures, L, keep_paired_neighbors, mask_threshold, max_programs
    )
    # a large first execution on a cold backend degrades ~100x (see
    # jaxinit.start_backend_warmup); fence before the real dispatches
    join_backend_warmup()

    # dispatch phase: one async program per group
    def dispatch(n_cap, idxs):
        n_real = sum(per[i][4].size for i in idxs)
        if mesh is not None:
            # windows (the scale axis) shard over the mesh: descriptor
            # count padded to chunk * n_devices so every chip maps an
            # equal slice of chunks
            chunk = 64
            n_dev = mesh.devices.size
            feats, pts_p, sidx_p, starts_p, p_cap, b_cap, w_cap = _pack_group(
                cfg, per, n_cap, idxs, w_multiple=chunk * n_dev
            )
            emb = _embed_windows_stacked_sharded(
                cfg, model.params, model.state,
                jnp.asarray(feats), jnp.asarray(pts_p),
                jnp.asarray(sidx_p), jnp.asarray(starts_p),
                L, keep_paired_neighbors,
                *_ladder_caps(cfg, p_cap, b_cap), chunk, mesh,
            )
            emb = emb[:n_real]
            if wire == "f16":
                emb = emb.astype(jnp.float16)
            return idxs, emb
        feats, pts_p, sidx_p, starts_p, p_cap, b_cap, w_cap = _pack_group(
            cfg, per, n_cap, idxs
        )
        emb = _embed_windows_stacked_jit(
            cfg, model.params, model.state,
            jnp.asarray(feats), jnp.asarray(pts_p),
            jnp.asarray(sidx_p), jnp.asarray(starts_p),
            L, keep_paired_neighbors,
            *_ladder_caps(cfg, p_cap, b_cap), _chunk_for(w_cap),
        )
        # slice padding rows off ON DEVICE (a cheap fused slice) so the
        # host download moves only real windows (~14% of the bench
        # corpus's rows were ladder padding)
        emb = emb[:n_real]
        if wire == "f16":
            emb = emb.astype(jnp.float16)
        return idxs, emb

    # dispatch LARGEST groups first: their (large) D2H copies then
    # overlap the remaining groups' compute; the last download left
    # unhidden is the smallest one
    items = sorted(
        groups.items(),
        key=lambda kv: -sum(per[i][4].size for i in kv[1]),
    )
    if parallel_compile and len(items) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(items))) as ex:
            pending = list(ex.map(lambda kv: dispatch(*kv), items))
    else:
        pending = [dispatch(*kv) for kv in items]

    # fetch phase: device compute for later groups overlaps these copies
    for _, emb in pending:
        try:
            # enqueue every D2H copy now — each starts the moment its
            # group's compute finishes, so downloads of earlier groups
            # overlap compute of later ones instead of serializing at
            # the blocking np.asarray below
            emb.copy_to_host_async()
        except (AttributeError, RuntimeError):  # non-jax arrays / cpu
            pass
    results = [empty] * len(structures)
    for idxs, emb in pending:
        emb_np = np.asarray(emb)
        if emb_np.dtype != np.float32:
            emb_np = emb_np.astype(np.float32)
        off = 0
        for i in idxs:
            starts = per[i][4]
            results[i] = (starts.astype(np.int64), emb_np[off : off + starts.size])
            off += starts.size
    return results
