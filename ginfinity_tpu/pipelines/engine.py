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


class InferenceEngine:
    """Bucketed batched inference over a trained GIN model."""

    def __init__(self, model: GINModel, max_nodes_per_batch: int = 8192,
                 max_graphs_per_batch: int = 256):
        self.model = model
        self.max_nodes_per_batch = max_nodes_per_batch
        self.max_graphs_per_batch = max_graphs_per_batch

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "InferenceEngine":
        config, params, state, _ = load_checkpoint(path)
        return cls(GINModel(config, params, state), **kw)

    @property
    def config(self) -> GINConfig:
        return self.model.config

    def _plan(self, graphs: Sequence[GraphArrays]) -> list[list[int]]:
        order = sorted(range(len(graphs)), key=lambda i: graphs[i].n_nodes)
        batches: list[list[int]] = []
        cur: list[int] = []
        cur_nodes = 0
        for i in order:
            n = graphs[i].n_nodes
            if cur and (
                cur_nodes + n > self.max_nodes_per_batch
                or len(cur) >= self.max_graphs_per_batch
            ):
                batches.append(cur)
                cur, cur_nodes = [], 0
            cur.append(i)
            cur_nodes += n
        if cur:
            batches.append(cur)
        return batches

    def _make_batch(self, graphs: Sequence[GraphArrays]) -> GraphBatch:
        total_nodes = sum(g.n_nodes for g in graphs)
        total_edges = sum(g.n_edges for g in graphs)
        n_cap, e_cap = bucket_sizes(total_nodes, total_edges)
        g_cap = _round_capacity(len(graphs))
        return batch_graphs(graphs, n_cap, e_cap, g_cap)

    def embed_graphs(
        self,
        graphs: Sequence[GraphArrays],
        progress: Callable[[int], None] | None = None,
    ) -> np.ndarray:
        """Graph embeddings [len(graphs), output_dim], in input order."""
        out = np.zeros((len(graphs), self.config.output_dim), np.float32)
        for idxs in self._plan(graphs):
            chunk = [graphs[i] for i in idxs]
            batch = self._make_batch(chunk)
            emb = np.asarray(self.model.forward_once(batch))[: len(chunk)]
            out[idxs] = emb
            if progress:
                progress(len(idxs))
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
        for idxs in self._plan(graphs):
            chunk = [graphs[i] for i in idxs]
            batch = self._make_batch(chunk)
            x = np.asarray(self.model.get_node_embeddings(batch))
            off = 0
            for k, gi in enumerate(idxs):
                n = chunk[k].n_nodes
                take = chunk[k].n_base_nodes if base_only else n
                results[gi] = x[off : off + take].copy()
                off += n
            if progress:
                progress(len(idxs))
        return results  # type: ignore[return-value]
