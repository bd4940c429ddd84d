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

    node_feat = np.zeros((n_cap, fdim), np.float32)
    node_graph = np.full(n_cap, g, np.int32)
    node_mask = np.zeros(n_cap, np.float32)
    base_mask = np.zeros(n_cap, np.float32)
    edge_src = np.zeros(e_cap, np.int32)
    edge_dst = np.zeros(e_cap, np.int32)
    edge_attr = np.zeros((e_cap, edim), np.float32)
    edge_mask = np.zeros(e_cap, np.float32)
    n_nodes = np.zeros(g, np.int32)  # padded graph slots stay 0

    n_off = 0
    e_off = 0
    for i, ga in enumerate(graphs):
        nn, ne = ga.n_nodes, ga.n_edges
        node_feat[n_off : n_off + nn] = ga.node_feat
        node_graph[n_off : n_off + nn] = i
        node_mask[n_off : n_off + nn] = 1.0
        base_mask[n_off : n_off + ga.n_base_nodes] = 1.0
        edge_src[e_off : e_off + ne] = ga.edge_src + n_off
        edge_dst[e_off : e_off + ne] = ga.edge_dst + n_off
        edge_attr[e_off : e_off + ne] = ga.edge_attr
        edge_mask[e_off : e_off + ne] = 1.0
        n_nodes[i] = nn
        n_off += nn
        e_off += ne

    return GraphBatch(
        node_feat=jnp.asarray(node_feat),
        node_graph=jnp.asarray(node_graph),
        node_mask=jnp.asarray(node_mask),
        base_mask=jnp.asarray(base_mask),
        edge_src=jnp.asarray(edge_src),
        edge_dst=jnp.asarray(edge_dst),
        edge_attr=jnp.asarray(edge_attr),
        edge_mask=jnp.asarray(edge_mask),
        n_nodes=jnp.asarray(n_nodes),
        num_graphs=g,
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
