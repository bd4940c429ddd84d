"""Vectorized graph construction: dot-bracket -> flat feature arrays.

Replaces the reference's networkx object graphs + per-node Python loops
(utils.py:179-537) with array construction.  The output is a
:class:`GraphArrays` record holding exactly the tensors the encoder
needs; no intermediate graph objects exist.

Feature semantics match the reference featurizer exactly:

Standard encoding (utils.py:391-441):
  node features  ``[w*paired, w*unpaired, loop_size_norm, loop_pos_norm]``
                 (+ ``seq_weight``-scaled ACGU one-hot when seq_weight>0),
                 where ``w = 1 - seq_weight``;
  edge attrs     ``[adjacent, base_pair, is_forward, is_backward]`` with
                 every undirected edge emitted in both directions.

Forgi encoding (utils.py:444-537): 16-dim nodes
  ``[4 structural, 4 sequence, is_base, 7-way forgi type one-hot]`` and
  7-dim edge attrs
  ``[adj, bp, forgi parent->child, child->parent, forgi-forgi, fwd, bwd]``.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ginfinity_tpu.graphs.dotbracket import (
    loop_features,
    one_hot_sequence,
    pair_table,
)

FORGI_NODE_TYPES = (
    "five_prime",
    "stem",
    "hairpin",
    "internal",
    "multiloop",
    "three_prime",
    "other",
)
FORGI_TYPE_TO_INDEX = {name: idx for idx, name in enumerate(FORGI_NODE_TYPES)}

STANDARD_EDGE_DIM = 4
FORGI_EDGE_DIM = 7


@dataclasses.dataclass
class GraphArrays:
    """A single RNA structure as flat arrays (host-side, NumPy).

    ``edge_src/edge_dst`` list every directed edge; attrs are per directed
    edge.  ``n_base_nodes`` distinguishes real bases from forgi meta-nodes
    (equals ``n_nodes`` for standard encoding).
    """

    node_feat: np.ndarray  # [N, F] float32
    edge_src: np.ndarray  # [E] int32
    edge_dst: np.ndarray  # [E] int32
    edge_attr: np.ndarray  # [E, Fe] float32
    n_nodes: int
    n_base_nodes: int

    @property
    def n_edges(self) -> int:
        return int(self.edge_src.shape[0])

    @property
    def base_node_mask(self) -> np.ndarray:
        mask = np.zeros(self.n_nodes, dtype=bool)
        mask[: self.n_base_nodes] = True
        return mask


def _directed_both_ways(src: np.ndarray, dst: np.ndarray, attr_base: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Duplicate undirected edges in both directions and append
    [is_forward, is_backward] flags (utils.py:424-428)."""
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    a = np.concatenate([attr_base, attr_base], axis=0)
    fwd = (s < d).astype(np.float32)[:, None]
    return s, d, np.concatenate([a, fwd, 1.0 - fwd], axis=1)


def standard_node_features(
    pt: np.ndarray,
    sequence: str | None,
    seq_weight: float,
    feature_dim: int | None = None,
) -> np.ndarray:
    """Standard node feature block.

    ``feature_dim`` supports legacy checkpoints: the packaged reference
    checkpoint has ``node_feature_dim=3`` (predates the 4-feature builder,
    see SURVEY.md C23); passing 3 keeps the first three features
    ``[w*paired, w*unpaired, loop_size_norm]``.
    """
    n = pt.shape[0]
    paired = (pt >= 0).astype(np.float32)
    loop_size_norm, loop_pos_norm = loop_features(pt)
    w = 1.0 - seq_weight
    cols = [w * paired, w * (1.0 - paired), loop_size_norm, loop_pos_norm]
    feat = np.stack(cols, axis=1).astype(np.float32)
    if seq_weight > 0:
        feat = np.concatenate([feat, seq_weight * one_hot_sequence(sequence, n)], axis=1)
    if feature_dim is not None and feature_dim != feat.shape[1]:
        if feature_dim < feat.shape[1]:
            feat = feat[:, :feature_dim]
        else:
            feat = np.pad(feat, ((0, 0), (0, feature_dim - feat.shape[1])))
    return feat


def window_node_features(
    pt: np.ndarray,
    sequence: str | None,
    seq_weight: float,
    graph_encoding: str = "standard",
    feature_dim: int | None = None,
) -> np.ndarray:
    """Node features for base-only window graphs in a model's feature
    space.

    Standard models get the plain standard block.  Forgi models get the
    same block placed in the forgi node layout (utils.py:498-531:
    ``[4 struct, 4 seq, is_base, 7 type]``) with ``is_base=1`` and no
    element-type one-hot — windows carry no meta-nodes (the reference's
    window generator builds standard graphs only, generate_windows.py:69,
    so base rows in forgi space are the faithful extension), and in the
    full forgi featurizer base nodes never carry a type either
    (build_forgi above).
    """
    if (graph_encoding or "standard").lower() != "forgi":
        return standard_node_features(pt, sequence, seq_weight, feature_dim)
    n = pt.shape[0]
    fdim = (
        feature_dim
        if feature_dim is not None
        else 4 + 4 + 1 + len(FORGI_NODE_TYPES)
    )
    std = standard_node_features(pt, sequence, seq_weight)  # 4 (+4 seq) cols
    feat = np.zeros((n, fdim), np.float32)
    c = min(std.shape[1], 8, fdim)
    feat[:, :c] = std[:, :c]
    if fdim > 8:
        feat[:, 8] = 1.0  # is_base
    return feat


def window_edge_const_rows(edge_dim: int) -> np.ndarray:
    """Constant edge-attr rows ``[adj_from_next, adj_from_prev, bp_fwd,
    bp_bwd]`` for the standard (4) or forgi (7) edge layout: adjacent /
    base_pair flags in cols 0/1, is_forward / is_backward in the LAST two
    cols; forgi's middle cols are meta-edge classes, always zero for the
    base-level edges windows contain."""
    rows = np.zeros((4, edge_dim), np.float32)
    rows[0, 0] = rows[1, 0] = 1.0  # adjacent
    rows[2, 1] = rows[3, 1] = 1.0  # base_pair
    fwd, bwd = edge_dim - 2, edge_dim - 1
    rows[0, bwd] = 1.0  # message from next node: src > dst -> is_forward=0
    rows[1, fwd] = 1.0
    rows[2, fwd] = 1.0
    rows[3, bwd] = 1.0
    return rows


def _standard_edges(pt: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    n = pt.shape[0]
    # Backbone: (i-1, i) for i in 1..n-1.
    bb_src = np.arange(1, n, dtype=np.int32)
    bb_dst = bb_src - 1
    # Base pairs: one undirected edge per pair (i < j).  Pairs between
    # backbone-adjacent positions (j == i+1) are excluded: the reference's
    # networkx simple graph overwrites such a base_pair edge with the
    # 'adjacent' edge added immediately after (utils.py:267,289).
    i = np.arange(n, dtype=np.int32)
    bp_mask = (pt >= 0) & (i < pt) & (pt != i + 1)
    bp_src = i[bp_mask]
    bp_dst = pt[bp_mask].astype(np.int32)

    src = np.concatenate([bb_src, bp_src])
    dst = np.concatenate([bb_dst, bp_dst])
    attr = np.zeros((src.shape[0], 2), dtype=np.float32)
    attr[: bb_src.shape[0], 0] = 1.0  # adjacent
    attr[bb_src.shape[0] :, 1] = 1.0  # base_pair
    return _directed_both_ways(src, dst, attr)


def build_standard(
    structure: str,
    sequence: str | None = None,
    seq_weight: float = 0.0,
    feature_dim: int | None = None,
) -> GraphArrays:
    pt = pair_table(structure)
    feat = standard_node_features(pt, sequence, seq_weight, feature_dim)
    src, dst, attr = _standard_edges(pt)
    return GraphArrays(
        node_feat=feat,
        edge_src=src.astype(np.int32),
        edge_dst=dst.astype(np.int32),
        edge_attr=attr,
        n_nodes=pt.shape[0],
        n_base_nodes=pt.shape[0],
    )


def build_forgi(
    structure: str,
    sequence: str | None = None,
    seq_weight: float = 0.0,
    feature_dim: int | None = None,
) -> GraphArrays:
    """Forgi-style encoding with structural-element meta-nodes.

    Elements are decomposed from the pair table directly (no forgi
    dependency); see :mod:`ginfinity_tpu.graphs.forgi_elements` for the
    decomposition rules (matching forgi's stem/hairpin/internal/multiloop/
    5'/3' classification; reference utils.py:298-365).
    """
    from ginfinity_tpu.graphs.forgi_elements import decompose_elements

    pt = pair_table(structure)
    n = pt.shape[0]
    elements = decompose_elements(pt)

    # --- base-node features (zeros for meta-node rows added below) ---
    paired = (pt >= 0).astype(np.float32)
    loop_size_norm, loop_pos_norm = loop_features(pt)
    w = 1.0 - seq_weight
    struct_block = np.stack(
        [w * paired, w * (1.0 - paired), loop_size_norm, loop_pos_norm], axis=1
    ).astype(np.float32)
    seq_block = (
        seq_weight * one_hot_sequence(sequence, n)
        if seq_weight > 0
        else np.zeros((n, 4), dtype=np.float32)
    )

    n_meta = len(elements)
    total = n + n_meta
    fdim = 4 + 4 + 1 + len(FORGI_NODE_TYPES)
    feat = np.zeros((total, fdim), dtype=np.float32)
    feat[:n, 0:4] = struct_block
    feat[:n, 4:8] = seq_block
    feat[:n, 8] = 1.0  # is_base
    for k, el in enumerate(elements):
        feat[n + k, 9 + FORGI_TYPE_TO_INDEX.get(el.kind, FORGI_TYPE_TO_INDEX["other"])] = 1.0

    # --- edges ---
    # Base-level edges (adjacent + base_pair), widened to 5 attr columns.
    src_b, dst_b, attr_b4 = _standard_edges(pt)
    e_b = src_b.shape[0]
    attr_b = np.zeros((e_b, FORGI_EDGE_DIM), dtype=np.float32)
    attr_b[:, 0:2] = attr_b4[:, 0:2]
    attr_b[:, 5:7] = attr_b4[:, 2:4]

    # Membership edges: meta <-> each member base, both directions.
    mem_src, mem_dst, mem_attr = [], [], []
    for k, el in enumerate(elements):
        meta = n + k
        for member in el.members:
            # meta -> base: parent->child (col 2); base -> meta: child->parent (col 3)
            for s, d, col in ((meta, member, 2), (member, meta, 3)):
                mem_src.append(s)
                mem_dst.append(d)
                a = np.zeros(FORGI_EDGE_DIM, dtype=np.float32)
                a[col] = 1.0
                a[5] = 1.0 if s < d else 0.0
                a[6] = 1.0 - a[5]
                mem_attr.append(a)

    # Element-connectivity edges: meta <-> meta (col 4), both directions.
    from ginfinity_tpu.graphs.forgi_elements import element_connections

    con_src, con_dst, con_attr = [], [], []
    for a_idx, b_idx in element_connections(elements):
        for s, d in ((n + a_idx, n + b_idx), (n + b_idx, n + a_idx)):
            con_src.append(s)
            con_dst.append(d)
            a = np.zeros(FORGI_EDGE_DIM, dtype=np.float32)
            a[4] = 1.0
            a[5] = 1.0 if s < d else 0.0
            a[6] = 1.0 - a[5]
            con_attr.append(a)

    src = np.concatenate([src_b, np.array(mem_src + con_src, dtype=np.int32)]) if (mem_src or con_src) else src_b
    dst = np.concatenate([dst_b, np.array(mem_dst + con_dst, dtype=np.int32)]) if (mem_dst or con_dst) else dst_b
    attr = (
        np.concatenate([attr_b, np.stack(mem_attr + con_attr, axis=0)], axis=0)
        if (mem_attr or con_attr)
        else attr_b
    )

    if feature_dim is not None and feature_dim != feat.shape[1]:
        if feature_dim < feat.shape[1]:
            feat = feat[:, :feature_dim]
        else:
            feat = np.pad(feat, ((0, 0), (0, feature_dim - feat.shape[1])))

    return GraphArrays(
        node_feat=feat,
        edge_src=src.astype(np.int32),
        edge_dst=dst.astype(np.int32),
        edge_attr=attr.astype(np.float32),
        n_nodes=total,
        n_base_nodes=n,
    )


def build_graph_arrays(
    structure: str,
    sequence: str | None = None,
    seq_weight: float = 0.0,
    graph_encoding: str = "standard",
    feature_dim: int | None = None,
) -> GraphArrays:
    encoding = (graph_encoding or "standard").lower()
    if encoding == "standard":
        return build_standard(structure, sequence, seq_weight, feature_dim)
    if encoding == "forgi":
        return build_forgi(structure, sequence, seq_weight, feature_dim)
    raise ValueError(f"Unsupported graph_encoding '{graph_encoding}'")
