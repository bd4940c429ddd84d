"""Batched flat graph representation for the TPU encoder.

The reference batches graphs with PyG ``Batch.from_data_list`` into a
dynamically-sized flat tensor (generate_embeddings.py:154).  Dynamic
shapes force recompilation under XLA, so here graphs are packed into a
:class:`GraphBatch` padded to *bucketed* (node, edge) capacities: a small
ladder of capacities bounds both padding waste and the number of compiled
program variants.

Layout (jraph-style segment form):
  - ``node_feat  [N_pad, F]`` node features, zero-padded
  - ``node_graph [N_pad]``    graph id per node; padding rows -> num_graphs
  - ``edge_src/edge_dst [E_pad]`` directed edges (padding -> node 0)
  - ``edge_attr  [E_pad, Fe]`` zero-padded (so padded messages vanish
    under the masked segment-sum)
  - ``edge_mask  [E_pad]``
  - ``n_nodes    [G]``        real node count per graph

Aggregations downstream use ``jax.ops.segment_sum`` with one trash
segment for padding.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

from ginfinity_tpu.graphs.build import GraphArrays


@struct.dataclass
class WireBatch:
    """Compressed host->device representation of a GraphBatch.

    The embedding pipelines move a lot of graph batches to the device;
    on remote-TPU links the transfer is bandwidth-bound, so the wire
    format carries uint16 edge indices, codebook-compressed edge
    attributes (uint8 codes into a <=16-row codebook) and no mask arrays
    (masks are rebuilt on device from the real-node/edge counts — the
    packer always places real entries contiguously first).  Decoded on
    device by :func:`decode_wire`; lossless.
    """

    node_feat: jnp.ndarray  # [N_pad, F] f32
    node_graph: jnp.ndarray  # [N_pad] u16 (pad rows = num_graphs)
    edge_src: jnp.ndarray  # [E_pad] u16
    edge_dst: jnp.ndarray  # [E_pad] u16
    edge_code: jnp.ndarray  # [E_pad] u8
    edge_codebook: jnp.ndarray  # [16, Fe] f32
    n_nodes: jnp.ndarray  # [G] i32
    n_real_nodes: jnp.ndarray  # [] i32
    n_real_edges: jnp.ndarray  # [] i32
    n_real_graphs: jnp.ndarray  # [] i32
    num_graphs: int = struct.field(pytree_node=False)


@struct.dataclass
class GraphBatch:
    node_feat: jnp.ndarray  # [N_pad, F] f32
    node_graph: jnp.ndarray  # [N_pad] i32 (pad rows = num_graphs)
    node_mask: jnp.ndarray  # [N_pad] f32
    base_mask: jnp.ndarray  # [N_pad] f32 (1 for base nodes; excludes forgi meta)
    edge_src: jnp.ndarray  # [E_pad] i32
    edge_dst: jnp.ndarray  # [E_pad] i32
    edge_attr: jnp.ndarray  # [E_pad, Fe] f32
    edge_mask: jnp.ndarray  # [E_pad] f32
    n_nodes: jnp.ndarray  # [G] i32 real nodes per graph
    num_graphs: int = struct.field(pytree_node=False)

    @property
    def num_nodes_padded(self) -> int:
        return self.node_feat.shape[0]


# Capacity ladder: powers of two-ish steps bound recompilation to
# O(log(max_len)) program variants per batch shape.
_LADDER = (32, 64, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096, 6144, 8192, 12288, 16384)


def _round_capacity(n: int) -> int:
    for c in _LADDER:
        if n <= c:
            return c
    # beyond ladder: round up to multiple of 4096
    return ((n + 4095) // 4096) * 4096


def bucket_sizes(n_nodes: int, n_edges: int) -> tuple[int, int]:
    """Padded (node, edge) capacities for a batch."""
    return _round_capacity(max(1, n_nodes)), _round_capacity(max(1, n_edges))


def batch_graphs(
    graphs: Sequence[GraphArrays],
    node_capacity: int | None = None,
    edge_capacity: int | None = None,
    graph_capacity: int | None = None,
) -> GraphBatch:
    """Pack graphs into one padded GraphBatch (host-side NumPy).

    ``graph_capacity`` pads the *graph count* too, so batches with
    different numbers of graphs reuse one compiled program (num_graphs is
    a static shape under jit).  Rows >= len(graphs) of the pooled output
    are padding and must be dropped by the caller.
    """
    g = graph_capacity or len(graphs)
    if len(graphs) > g:
        raise ValueError(f"{len(graphs)} graphs exceed graph_capacity {g}")
    total_nodes = sum(x.n_nodes for x in graphs)
    total_edges = sum(x.n_edges for x in graphs)
    n_cap = node_capacity or bucket_sizes(total_nodes, total_edges)[0]
    e_cap = edge_capacity or bucket_sizes(total_nodes, total_edges)[1]
    if total_nodes > n_cap or total_edges > e_cap:
        raise ValueError(
            f"batch needs ({total_nodes} nodes, {total_edges} edges), "
            f"capacity is ({n_cap}, {e_cap})"
        )

    fdim = graphs[0].node_feat.shape[1]
    edim = graphs[0].edge_attr.shape[1]
    k = len(graphs)

    # Vectorized packing: one np.concatenate per tensor instead of
    # per-graph slice assignment (host packing is the pipeline bottleneck;
    # the device is ~20x faster than a Python-loop packer).
    nn_arr = np.fromiter((x.n_nodes for x in graphs), np.int64, k)
    ne_arr = np.fromiter((x.n_edges for x in graphs), np.int64, k)
    nb_arr = np.fromiter((x.n_base_nodes for x in graphs), np.int64, k)
    n_off = np.zeros(k, np.int64)
    np.cumsum(nn_arr[:-1], out=n_off[1:])

    def pad_rows(x, cap):
        r = cap - x.shape[0]
        if r == 0:
            return x
        return np.concatenate([x, np.zeros((r,) + x.shape[1:], x.dtype)])

    node_feat = pad_rows(np.concatenate([x.node_feat for x in graphs]), n_cap)
    node_graph = pad_rows(
        np.repeat(np.arange(k, dtype=np.int32), nn_arr), n_cap
    )
    node_graph[total_nodes:] = g  # trash segment
    node_mask = np.zeros(n_cap, np.float32)
    node_mask[:total_nodes] = 1.0
    # base-node mask: first n_base_nodes of each graph
    pos_in_graph = np.arange(total_nodes, dtype=np.int64) - np.repeat(n_off, nn_arr)
    base_mask = np.zeros(n_cap, np.float32)
    base_mask[:total_nodes] = (pos_in_graph < np.repeat(nb_arr, nn_arr)).astype(np.float32)

    e_shift = np.repeat(n_off, ne_arr).astype(np.int32)
    edge_src = pad_rows(np.concatenate([x.edge_src for x in graphs]) + e_shift, e_cap)
    edge_dst = pad_rows(np.concatenate([x.edge_dst for x in graphs]) + e_shift, e_cap)
    edge_attr = pad_rows(np.concatenate([x.edge_attr for x in graphs]), e_cap)
    edge_mask = np.zeros(e_cap, np.float32)
    edge_mask[:total_edges] = 1.0
    n_nodes = np.zeros(g, np.int32)  # padded graph slots stay 0
    n_nodes[:k] = nn_arr

    # Leaves stay NumPy: the device transfer happens at jit call time (or
    # once per *stacked group* in the inference engine — per-batch
    # transfers over a remote-TPU tunnel dominate the pipeline otherwise).
    return GraphBatch(
        node_feat=node_feat,
        node_graph=node_graph,
        node_mask=node_mask,
        base_mask=base_mask,
        edge_src=edge_src,
        edge_dst=edge_dst,
        edge_attr=edge_attr,
        edge_mask=edge_mask,
        n_nodes=n_nodes,
        num_graphs=g,
    )


_CODEBOOK_ROWS = 16


def batch_graphs_wire(
    graphs: Sequence[GraphArrays],
    node_capacity: int,
    edge_capacity: int,
    graph_capacity: int,
) -> WireBatch | None:
    """Pack graphs into the compressed wire format.

    Returns None when the batch is not wire-representable (edge-attr
    alphabet larger than the codebook or capacities beyond uint16) —
    callers fall back to the plain GraphBatch path.
    """
    if node_capacity >= 65535 or edge_capacity >= 65536:
        return None
    gb = batch_graphs(graphs, node_capacity, edge_capacity, graph_capacity)
    total_edges = int(sum(x.n_edges for x in graphs))
    attr = np.asarray(gb.edge_attr[:total_edges])
    codebook, codes = np.unique(attr, axis=0, return_inverse=True) if total_edges else (
        np.zeros((1, gb.edge_attr.shape[1]), np.float32),
        np.zeros(0, np.int64),
    )
    if codebook.shape[0] > _CODEBOOK_ROWS:
        return None
    cb = np.zeros((_CODEBOOK_ROWS, gb.edge_attr.shape[1]), np.float32)
    cb[: codebook.shape[0]] = codebook
    code_arr = np.zeros(edge_capacity, np.uint8)
    code_arr[:total_edges] = codes.astype(np.uint8)
    return WireBatch(
        node_feat=gb.node_feat,
        node_graph=gb.node_graph.astype(np.uint16),
        edge_src=gb.edge_src.astype(np.uint16),
        edge_dst=gb.edge_dst.astype(np.uint16),
        edge_code=code_arr,
        edge_codebook=cb,
        n_nodes=gb.n_nodes,
        n_real_nodes=np.int32(sum(x.n_nodes for x in graphs)),
        n_real_edges=np.int32(total_edges),
        n_real_graphs=np.int32(len(graphs)),
        num_graphs=graph_capacity,
    )


def decode_wire(w: WireBatch) -> GraphBatch:
    """Device-side decode of a WireBatch (jit-friendly)."""
    n_pad = w.node_feat.shape[0]
    e_pad = w.edge_src.shape[0]
    node_iota = jnp.arange(n_pad, dtype=jnp.int32)
    edge_iota = jnp.arange(e_pad, dtype=jnp.int32)
    node_mask = (node_iota < w.n_real_nodes).astype(jnp.float32)
    edge_mask = (edge_iota < w.n_real_edges).astype(jnp.float32)
    edge_attr = w.edge_codebook[w.edge_code.astype(jnp.int32)]
    return GraphBatch(
        node_feat=w.node_feat,
        node_graph=w.node_graph.astype(jnp.int32),
        node_mask=node_mask,
        base_mask=node_mask,  # base filtering happens host-side
        edge_src=w.edge_src.astype(jnp.int32),
        edge_dst=w.edge_dst.astype(jnp.int32),
        edge_attr=edge_attr,
        edge_mask=edge_mask,
        n_nodes=w.n_nodes,
        num_graphs=w.num_graphs,
    )


def plan_batches(
    graphs: Sequence[GraphArrays],
    max_nodes_per_batch: int = 8192,
    max_graphs_per_batch: int = 512,
) -> list[list[int]]:
    """Greedy packing of graph indices into batches bounded by node count.

    Graphs are packed in size order so each batch holds graphs of similar
    length (less padding waste per bucket); callers keep the returned
    index lists to restore original order.
    """
    order = sorted(range(len(graphs)), key=lambda i: graphs[i].n_nodes)
    batches: list[list[int]] = []
    cur: list[int] = []
    cur_nodes = 0
    for i in order:
        n = graphs[i].n_nodes
        if cur and (cur_nodes + n > max_nodes_per_batch or len(cur) >= max_graphs_per_batch):
            batches.append(cur)
            cur = []
            cur_nodes = 0
        cur.append(i)
        cur_nodes += n
    if cur:
        batches.append(cur)
    return batches
