"""Shared batched-inference engine for the embedding pipelines.

Replaces the reference's per-graph CPU worker pools and dynamic GPU
batches (generate_embeddings.py:112-162) with:

- host-side vectorized preprocessing (NumPy + optional C++ scanner),
  optionally fanned out over processes for very large inputs,
- size-ordered greedy packing into bucketed padded batches, so XLA
  compiles a handful of (node_cap, edge_cap, graph_cap) program variants
  and reuses them across the whole corpus,
- jitted forward passes on whatever accelerator JAX selected (TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import numpy as np

from ginfinity_tpu.graphs.batching import (
    GraphBatch,
    batch_graphs,
    bucket_sizes,
    plan_batches,
    _round_capacity,
)
from ginfinity_tpu.graphs.build import GraphArrays, build_graph_arrays
from ginfinity_tpu.graphs.dotbracket import pair_table
from ginfinity_tpu.models.checkpoint import load_checkpoint
from ginfinity_tpu.models.gine import GINConfig, GINModel


@dataclasses.dataclass
class PreprocessResult:
    graphs: list[GraphArrays]
    kept_indices: list[int]  # positions in the input list that were valid
    skipped: list[tuple[int, str]]  # (position, reason)


def preprocess_structures(
    structures: Sequence[str],
    sequences: Sequence[str] | None = None,
    graph_encoding: str = "standard",
    seq_weight: float = 0.0,
    feature_dim: int | None = None,
) -> PreprocessResult:
    """Validate + build graph arrays for a list of structures."""
    graphs: list[GraphArrays] = []
    kept: list[int] = []
    skipped: list[tuple[int, str]] = []
    for i, s in enumerate(structures):
        if not isinstance(s, str) or pair_table(s, strict=False) is None:
            skipped.append((i, "invalid_dot_bracket"))
            continue
        seq = sequences[i] if sequences is not None else None
        if seq is not None and not isinstance(seq, str):
            seq = None
        try:
            ga = build_graph_arrays(
                s, seq, seq_weight=seq_weight, graph_encoding=graph_encoding,
                feature_dim=feature_dim,
            )
        except ValueError:
            skipped.append((i, "graph_build_failed"))
            continue
        graphs.append(ga)
        kept.append(i)
    return PreprocessResult(graphs, kept, skipped)


def adapt_feature_dim(graphs: Sequence[GraphArrays], feature_dim: int) -> list[GraphArrays]:
    """Truncate/zero-pad node features to a checkpoint's expected width.

    Needed for legacy checkpoints: the reference's packaged weights have
    node_feature_dim=3, predating the 4-feature builder (SURVEY.md C23);
    the reference itself cannot run them against its current featurizer.
    """
    out = []
    for g in graphs:
        f = g.node_feat
        if f.shape[1] == feature_dim:
            out.append(g)
            continue
        if f.shape[1] > feature_dim:
            f = f[:, :feature_dim]
        else:
            f = np.pad(f, ((0, 0), (0, feature_dim - f.shape[1])))
        out.append(dataclasses.replace(g, node_feat=np.ascontiguousarray(f)))
    return out


def adapt_graphs_to_model(graphs: Sequence[GraphArrays], cfg) -> list[GraphArrays]:
    """Feature-dim adaptation plus edge-layout mapping for forgi models.

    Standard-encoded window graphs (4-dim edge attrs ``[adj, bp, fwd,
    bwd]``) feeding a forgi checkpoint map into the forgi 7-dim edge
    layout (adj/bp -> cols 0/1, fwd/bwd -> cols 5/6; utils.py:498-531)
    and the forgi node layout with ``is_base=1`` for base rows — the
    reference's window generator only builds standard graphs
    (generate_windows.py:69), so this is the faithful embedding of
    window graphs into a forgi model's feature space."""
    forgi = (cfg.graph_encoding or "standard").lower() == "forgi"
    out = []
    for g in graphs:
        f, ea = g.node_feat, g.edge_attr
        if forgi and f.shape[1] <= 8 < cfg.node_feature_dim:
            nf = np.zeros((f.shape[0], cfg.node_feature_dim), np.float32)
            c = min(f.shape[1], 8)
            nf[:, :c] = f[:, :c]
            nf[: g.n_base_nodes, 8] = 1.0
            f = nf
        if ea.shape[1] == 4 and cfg.edge_feature_dim == 7:
            na = np.zeros((ea.shape[0], 7), np.float32)
            na[:, :2] = ea[:, :2]
            na[:, 5:7] = ea[:, 2:4]
            ea = na
        if f is not g.node_feat or ea is not g.edge_attr:
            g = dataclasses.replace(
                g,
                node_feat=np.ascontiguousarray(f),
                edge_attr=np.ascontiguousarray(ea),
            )
        out.append(g)
    return adapt_feature_dim(out, cfg.node_feature_dim)


class InferenceEngine:
    """Bucketed batched inference over a trained GIN model.

    Pass a ``mesh`` (e.g. ``make_data_mesh()``) to shard the stacked
    batch groups over the mesh's 'data' axis — corpus embedding then
    scales linearly with chip count (params replicated, no collectives
    on the forward path)."""

    def __init__(self, model: GINModel, max_nodes_per_batch: int = 8192,
                 max_graphs_per_batch: int = 256, mesh=None):
        from ginfinity_tpu.utils.jaxinit import start_backend_warmup

        start_backend_warmup()  # overlap backend bring-up with batch prep
        self.model = model
        self.max_nodes_per_batch = max_nodes_per_batch
        self.max_graphs_per_batch = max_graphs_per_batch
        self.mesh = mesh

    @classmethod
    def from_checkpoint(cls, path: str, precision: str = "highest", **kw) -> "InferenceEngine":
        config, params, state, _ = load_checkpoint(path)
        if precision != "highest":
            config = config.with_precision(precision)
        return cls(GINModel(config, params, state), **kw)

    @property
    def config(self) -> GINConfig:
        return self.model.config

    def _plan(self, graphs: Sequence[GraphArrays]) -> list[list[int]]:
        return plan_batches(
            graphs, self.max_nodes_per_batch, self.max_graphs_per_batch
        )

    def _make_wire(self, graphs: Sequence[GraphArrays]):
        from ginfinity_tpu.graphs.batching import batch_graphs_wire

        total_nodes = sum(g.n_nodes for g in graphs)
        total_edges = sum(g.n_edges for g in graphs)
        n_cap, e_cap = bucket_sizes(total_nodes, total_edges)
        g_cap = _round_capacity(len(graphs))
        wire = batch_graphs_wire(graphs, n_cap, e_cap, g_cap)
        if wire is None:  # codebook overflow or >u16 capacities
            return batch_graphs(graphs, n_cap, e_cap, g_cap)
        return wire

    def _stacked_groups(self, graphs: Sequence[GraphArrays]):
        """Pack batches in the compressed wire format, group equal-shape
        batches and stack their leaves along a leading axis.  One group =
        one host->device transfer per tensor + one ``lax.map`` program
        over all its batches — transfers over a remote-TPU tunnel are
        bandwidth-bound, so fewer/smaller payloads dominate end-to-end
        throughput."""
        groups: dict[tuple, list] = {}
        for idxs in self._plan(graphs):
            chunk = [graphs[i] for i in idxs]
            batch = self._make_wire(chunk)
            key = (type(batch).__name__, batch.node_feat.shape[0],
                   batch.edge_src.shape[0], batch.num_graphs)
            groups.setdefault(key, []).append((idxs, chunk, batch))
        for key, items in groups.items():
            is_wire = key[0] == "WireBatch"
            # plain-GraphBatch fallback groups dispatch per batch — the
            # stack would be a pure wasted host memcpy there
            stacked = (
                jax.tree.map(
                    lambda *xs: np.stack(xs), *[b for _, _, b in items]
                )
                if is_wire
                else None
            )
            yield is_wire, items, stacked

    def embed_graphs(
        self,
        graphs: Sequence[GraphArrays],
        progress: Callable[[int], None] | None = None,
    ) -> np.ndarray:
        """Graph embeddings [len(graphs), output_dim], in input order."""
        out = np.zeros((len(graphs), self.config.output_dim), np.float32)
        pending = []
        for is_wire, items, stacked in self._stacked_groups(graphs):
            if is_wire and self.mesh is not None:
                d = self.mesh.devices.size
                n = len(items)
                pad = (-n) % d
                if pad:  # repeat the last batch to a device multiple
                    stacked = jax.tree.map(
                        lambda x: np.concatenate([x, np.repeat(x[-1:], pad, axis=0)]),
                        stacked,
                    )
                dev = self.model.forward_stacked_sharded(stacked, self.mesh)
                pending.append((items, dev))  # padded tail rows are ignored
            elif is_wire:
                pending.append((items, self.model.forward_stacked(stacked)))
            else:  # fallback path: per-batch dispatch of plain GraphBatches
                for idxs, _, batch in items:
                    pending.append(([(idxs, None, None)], self.model.forward_once(batch)[None]))
            if progress:
                progress(sum(len(idxs) for idxs, _, _ in items))
        for items, dev in pending:
            emb = np.asarray(dev)  # [n_batches, G_cap, D]
            for k, (idxs, _, _) in enumerate(items):
                out[idxs] = emb[k, : len(idxs)]
        return out

    def node_embeddings(
        self,
        graphs: Sequence[GraphArrays],
        base_only: bool = True,
        progress: Callable[[int], None] | None = None,
    ) -> list[np.ndarray]:
        """Per-graph [L_i, D] node-embedding matrices, in input order.

        ``base_only`` drops forgi meta-nodes (reference
        generate_node_embeddings.py:132-182 base-node filtering)."""
        results: list[np.ndarray | None] = [None] * len(graphs)
        pending: list = []

        def drain_one():
            items, dev = pending.pop(0)
            xs = np.asarray(dev)  # [n_batches, N_pad, D]
            for k, (idxs, chunk, _) in enumerate(items):
                off = 0
                for m, gi in enumerate(idxs):
                    n = chunk[m].n_nodes
                    take = chunk[m].n_base_nodes if base_only else n
                    results[gi] = xs[k, off : off + take].copy()
                    off += n

        for is_wire, items, stacked in self._stacked_groups(graphs):
            if is_wire:
                pending.append((items, self.model.nodes_stacked(stacked)))
            else:
                for idxs, chunk, batch in items:
                    pending.append(
                        ([(idxs, chunk, None)], self.model.get_node_embeddings(batch)[None])
                    )
            # node outputs are [B, N_pad, D] — a whole corpus of them
            # resident at once can exhaust HBM, so bound the in-flight
            # groups (draining the OLDEST overlaps its download with the
            # newer groups' still-running compute)
            while len(pending) > 2:
                drain_one()
            if progress:
                progress(sum(len(idxs) for idxs, _, _ in items))
        while pending:
            drain_one()
        return results  # type: ignore[return-value]
