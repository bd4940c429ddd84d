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

Layout per window (capacity 2L nodes): slots [0, L) hold the in-window
positions, slots [L, 2L) hold each position's pulled outside partner
(masked when absent).  Graph-level pooling is invariant to this node
ordering.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ginfinity_tpu.graphs.batching import GraphBatch
from ginfinity_tpu.graphs.build import standard_node_features
from ginfinity_tpu.graphs.dotbracket import pair_table
from ginfinity_tpu.models.gine import GINConfig, forward_once


def _window_batch(feat, pt, start, L: int, keep_paired_neighbors: bool):
    """Build one window's GraphBatch (single graph) inside jit."""
    idx = start + jnp.arange(L, dtype=jnp.int32)  # original positions
    partner = pt[idx]
    has_pair = partner >= 0
    adj_pair = jnp.abs(partner - idx) == 1  # 'adjacent' edge in the reference
    bp_real = has_pair & ~adj_pair
    in_win = (partner >= start) & (partner < start + L)
    pulled = bp_real & ~in_win if keep_paired_neighbors else jnp.zeros_like(bp_real)

    # nodes: [2L, F]
    node_feat = jnp.concatenate(
        [feat[idx], feat[jnp.clip(partner, 0)] * pulled[:, None].astype(feat.dtype)]
    )
    node_mask = jnp.concatenate(
        [jnp.ones(L, jnp.float32), pulled.astype(jnp.float32)]
    )

    # backbone edges (both directions): (i, i-1) for i in 1..L-1
    bb_src = jnp.arange(1, L, dtype=jnp.int32)
    bb_dst = bb_src - 1
    bb_mask = jnp.ones(L - 1, jnp.float32)

    # in-window base pairs (i < j side only, both directions emitted below)
    j_local = partner - start
    bp_in = bp_real & in_win & (partner > idx)
    bp_src = jnp.arange(L, dtype=jnp.int32)
    bp_dst = jnp.clip(j_local, 0, L - 1)
    bp_mask = bp_in.astype(jnp.float32)

    # pulled-partner pairs: local i <-> slot L+i
    pl_src = jnp.arange(L, dtype=jnp.int32)
    pl_dst = L + jnp.arange(L, dtype=jnp.int32)
    pl_mask = pulled.astype(jnp.float32)
    # original-order forward flag for pulled edges
    pl_fwd = (idx < partner).astype(jnp.float32)

    def both_dirs(src, dst, mask, fwd, attr2):
        # attr2 = [adjacent, base_pair]
        s = jnp.concatenate([src, dst])
        d = jnp.concatenate([dst, src])
        m = jnp.concatenate([mask, mask])
        f = jnp.concatenate([fwd, 1.0 - fwd])
        a = jnp.broadcast_to(jnp.asarray(attr2, jnp.float32), (s.shape[0], 2))
        attr = jnp.concatenate([a, f[:, None], 1.0 - f[:, None]], axis=1)
        return s, d, attr * m[:, None], m

    # forward flags: backbone src(i) > dst(i-1) in original order -> fwd=0
    segs = [
        both_dirs(bb_src, bb_dst, bb_mask, jnp.zeros(L - 1), (1.0, 0.0)),
        both_dirs(bp_src, bp_dst, bp_mask, jnp.ones(L), (0.0, 1.0)),
    ]
    if keep_paired_neighbors:
        segs.append(both_dirs(pl_src, pl_dst, pl_mask, pl_fwd, (0.0, 1.0)))

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


@partial(jax.jit, static_argnames=("config", "L", "keep_paired_neighbors"))
def _embed_windows_jit(config: GINConfig, params, state, feat, pt, starts,
                       L: int, keep_paired_neighbors: bool):
    def one(start):
        b = _window_batch(feat, pt, start, L, keep_paired_neighbors)
        return forward_once(config, params, state, b)[0][0]

    return jax.lax.map(one, starts, batch_size=64)


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
    pt = pair_table(structure)
    n = pt.shape[0]
    if n < L:
        return np.zeros(0, np.int64), np.zeros((0, cfg.output_dim), np.float32)
    feat = standard_node_features(pt, None, cfg.seq_weight, cfg.node_feature_dim)
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

    emb = _embed_windows_jit(
        cfg, model.params, model.state,
        jnp.asarray(feat_p), jnp.asarray(pt_p), jnp.asarray(starts_padded),
        L, keep_paired_neighbors,
    )
    if block:
        emb = np.asarray(emb)[: starts.size]
    return starts.astype(np.int64), emb


def embed_corpus_windows(model, structures, L, keep_paired_neighbors=True,
                         mask_threshold=0.0):
    """Window embeddings for a corpus; one device program per window-count
    bucket, one tiny upload per structure.  Returns a list of
    (starts, embeddings) per structure.

    Note: programs are keyed on the padded feature length too; pad
    structures' feature arrays to a ladder to bound recompilation.
    """
    # two-phase: enqueue every structure's program (async JAX dispatch),
    # then fetch — device compute overlaps host preprocessing and the
    # per-call link latency amortizes across the corpus
    pending = [
        embed_structure_windows(
            model, s, L, keep_paired_neighbors, mask_threshold, block=False
        )
        for s in structures
    ]
    return [
        (starts, np.asarray(emb)[: starts.size]) for starts, emb in pending
    ]
