"""``ginfinity-generate-windows`` — sliding-window subgraphs.

Reference CLI parity: src/ginfinity/scripts/generate_windows.py, with the
O(n*L) networkx subgraph loop replaced by index arithmetic on the pair
table.  Semantics preserved exactly:

- windows of length L at every start offset (generate_windows.py:32-53),
- ``--keep-paired-neighbors`` pulls out-of-window pairing partners in as
  isolated nodes whose backbone ('adjacent') edges are cut,
- node features come from the *full* structure (loop metadata and paired
  flags are computed before slicing, generate_windows.py:69),
- low-complexity mask: fraction of '('+')' characters in the window's
  substring below ``--mask-threshold`` -> skip (generate_windows.py:19-30),
- the adjacent-base-pair quirk: a pair (i, i+1) is an 'adjacent' edge in
  the reference graph (simple-graph overwrite), so such partners are NOT
  pulled in and such edges are cut with the backbone.

Storage: ``windows_graphs.npz`` (flat arrays per window id) +
``windows_metadata.tsv`` — same metadata schema as the reference's
``windows_graphs.pt``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

from ginfinity_tpu.graphs.build import (
    GraphArrays,
    _directed_both_ways,
    standard_node_features,
)
from ginfinity_tpu.graphs.dotbracket import pair_table
from ginfinity_tpu.utils.io import log_information, setup_and_read_input


def window_starts_mask(structure: str, L: int, mask_threshold: float) -> np.ndarray:
    """Vectorized low-complexity filter: keep[start] is True when the
    window passes the paired-fraction threshold."""
    n = len(structure)
    n_windows = n - L + 1
    if n_windows <= 0:
        return np.zeros(0, dtype=bool)
    if mask_threshold <= 0:
        return np.ones(n_windows, dtype=bool)
    codes = np.frombuffer(structure.encode("latin-1"), dtype=np.uint8)
    paired = ((codes == ord("(")) | (codes == ord(")"))).astype(np.int32)
    csum = np.concatenate(([0], np.cumsum(paired)))
    counts = csum[L:] - csum[:-L]
    return (counts / L) >= mask_threshold


def slice_window(
    pt: np.ndarray,
    full_feat: np.ndarray,
    start: int,
    L: int,
    keep_paired_neighbors: bool = True,
) -> GraphArrays:
    """Extract one window subgraph as flat arrays (all NumPy ops)."""
    n = pt.shape[0]
    idx = np.arange(n, dtype=np.int32)
    in_win = np.zeros(n, dtype=bool)
    in_win[start : start + L] = True
    # Real base-pair edges exclude backbone-adjacent pairs (see module doc).
    bp_real = (pt >= 0) & (np.abs(pt - idx) != 1)

    if keep_paired_neighbors:
        pulled = idx[in_win & bp_real & ~in_win[np.clip(pt, 0, n - 1)]]
        outside = np.unique(pt[pulled])
        nodes = np.sort(np.concatenate([idx[in_win], outside.astype(np.int32)]))
    else:
        nodes = idx[in_win]

    keep_mask = np.zeros(n, dtype=bool)
    keep_mask[nodes] = True
    local = np.full(n, -1, dtype=np.int32)
    local[nodes] = np.arange(nodes.shape[0], dtype=np.int32)

    # Backbone edges: (i-1, i) with both endpoints inside the window
    # (outside-pulled nodes lose their adjacent edges).
    bb_i = idx[(idx >= start + 1) & (idx < start + L)]
    bb_src, bb_dst = local[bb_i], local[bb_i - 1]
    # Also adjacent edges that *represent* adjacent base pairs (i, i+1) are
    # already covered by the backbone rule above.

    # Base pairs with both endpoints kept.
    bp_i = idx[bp_real & (idx < pt) & keep_mask & keep_mask[np.clip(pt, 0, n - 1)]]
    bp_src, bp_dst = local[bp_i], local[pt[bp_i]]

    src = np.concatenate([bb_src, bp_src])
    dst = np.concatenate([bb_dst, bp_dst])
    attr2 = np.zeros((src.shape[0], 2), np.float32)
    attr2[: bb_src.shape[0], 0] = 1.0
    attr2[bb_src.shape[0] :, 1] = 1.0
    s, d, attr = _directed_both_ways(src, dst, attr2)

    return GraphArrays(
        node_feat=full_feat[nodes],
        edge_src=s.astype(np.int32),
        edge_dst=d.astype(np.int32),
        edge_attr=attr,
        n_nodes=int(nodes.shape[0]),
        n_base_nodes=int(nodes.shape[0]),
    )


def structure_to_windows(
    structure: str,
    L: int,
    keep_paired_neighbors: bool = True,
    mask_threshold: float = 0.0,
    seq_weight: float = 0.0,
    sequence: str | None = None,
) -> list[tuple[int, GraphArrays]]:
    pt = pair_table(structure, strict=False)
    if pt is None or pt.shape[0] < L:
        return []
    full_feat = standard_node_features(pt, sequence, seq_weight)
    keep = window_starts_mask(structure, L, mask_threshold)
    return [
        (start, slice_window(pt, full_feat, start, L, keep_paired_neighbors))
        for start in np.nonzero(keep)[0]
    ]


# --------------------------------------------------------------------------
# Storage
# --------------------------------------------------------------------------


def save_windows_graphs(path: str, graph_map: dict[str, GraphArrays]):
    """Packed columnar npz: every graph's arrays concatenate into ONE
    member per field plus offset tables.  The previous one-member-per-
    graph layout cost a zip member read per array (138k reads / 250 s
    to load a 23k-window corpus); this loads in under a second."""
    wids = list(graph_map.keys())
    if not wids:
        np.savez_compressed(path, manifest=np.array([], dtype=str))
        return
    graphs = list(graph_map.values())
    node_offsets = np.zeros(len(graphs) + 1, np.int64)
    edge_offsets = np.zeros(len(graphs) + 1, np.int64)
    for k, g in enumerate(graphs):
        node_offsets[k + 1] = node_offsets[k] + g.node_feat.shape[0]
        edge_offsets[k + 1] = edge_offsets[k] + g.edge_src.shape[0]
    np.savez_compressed(
        path,
        manifest=np.array(wids),
        node_offsets=node_offsets,
        edge_offsets=edge_offsets,
        node_feat=np.concatenate([g.node_feat for g in graphs]),
        edge_src=np.concatenate([g.edge_src for g in graphs]),
        edge_dst=np.concatenate([g.edge_dst for g in graphs]),
        edge_attr=np.concatenate([g.edge_attr for g in graphs]),
        nb=np.array([[g.n_nodes, g.n_base_nodes] for g in graphs], np.int32),
    )


def save_windows_graphs_pt(path: str, graph_map: dict[str, GraphArrays]):
    """Reference-format archive: a dict of PyG ``Data`` objects written
    with ``torch.save`` (generate_windows.py:171) so reference tooling
    can consume windows generated here.  Uses the pickle-compatible
    stand-in classes from graphs.pyg_compat when torch_geometric is not
    installed — the file unpickles as real Data objects in a PyG
    environment."""
    import torch

    from ginfinity_tpu.graphs.pyg_compat import ensure_pyg

    tgd = ensure_pyg()
    out = {}
    for wid, g in graph_map.items():
        data = tgd.Data(
            x=torch.from_numpy(np.ascontiguousarray(g.node_feat, np.float32)),
            edge_index=torch.from_numpy(
                np.ascontiguousarray(
                    np.stack([g.edge_src, g.edge_dst]).astype(np.int64)
                )
            ),
            edge_attr=torch.from_numpy(np.ascontiguousarray(g.edge_attr, np.float32)),
        )
        base_mask = torch.zeros(g.n_nodes, dtype=torch.bool)
        base_mask[: g.n_base_nodes] = True
        data.base_node_mask = base_mask
        data.num_base_nodes = int(g.n_base_nodes)
        data.graph_encoding = "standard"
        out[wid] = data
    torch.save(out, path)


def load_windows_graphs(path: str) -> dict[str, GraphArrays]:
    if path.endswith(".pt"):  # reference torch format
        return _load_torch_windows(path)
    out: dict[str, GraphArrays] = {}
    with np.load(path) as z:
        wids = [str(w) for w in z["manifest"]]
        if not wids:
            return out
        if "node_offsets" in z.files:  # packed columnar format
            no = z["node_offsets"]
            eo = z["edge_offsets"]
            feat = z["node_feat"]
            src = z["edge_src"]
            dst = z["edge_dst"]
            attr = z["edge_attr"]
            nb = z["nb"]
            for k, wid in enumerate(wids):
                ns, ne = no[k], no[k + 1]
                es, ee = eo[k], eo[k + 1]
                out[wid] = GraphArrays(
                    node_feat=feat[ns:ne],
                    edge_src=src[es:ee],
                    edge_dst=dst[es:ee],
                    edge_attr=attr[es:ee],
                    n_nodes=int(nb[k, 0]),
                    n_base_nodes=int(nb[k, 1]),
                )
            return out
        # legacy one-member-per-graph layout (r1 archives)
        for k, wid in enumerate(wids):
            nb = z[f"g{k}_nb"]
            out[wid] = GraphArrays(
                node_feat=z[f"g{k}_feat"],
                edge_src=z[f"g{k}_src"],
                edge_dst=z[f"g{k}_dst"],
                edge_attr=z[f"g{k}_attr"],
                n_nodes=int(nb[0]),
                n_base_nodes=int(nb[1]),
            )
    return out


def _base_mask_from_data(data, x: np.ndarray) -> np.ndarray:
    """Boolean base-node mask for a foreign PyG ``Data``, with the
    reference's fallback ladder (generate_node_embeddings.py:132-182):
    ``base_node_mask`` attr -> ``num_base_nodes`` prefix -> forgi
    feature-indicator heuristic (is_base column sits just before the
    7-way forgi-type one-hot) -> all nodes."""
    n = x.shape[0]
    mask = getattr(data, "base_node_mask", None)
    if mask is not None:
        m = np.asarray(mask).reshape(-1).astype(bool)
        if m.size == n:
            return m
    nb = getattr(data, "num_base_nodes", None)
    if nb is not None:
        m = np.zeros(n, bool)
        m[: min(int(nb), n)] = True
        return m
    from ginfinity_tpu.graphs.build import FORGI_NODE_TYPES

    if x.ndim == 2 and x.shape[1] >= 9 + len(FORGI_NODE_TYPES):
        return x[:, x.shape[1] - len(FORGI_NODE_TYPES) - 1] > 0.5
    return np.ones(n, bool)


def _load_torch_windows(path: str) -> dict[str, GraphArrays]:
    """Read a windows_graphs.pt (reference format).  torch_geometric
    itself is not required: graphs.pyg_compat installs pickle-compatible
    stand-ins for the PyG classes inside the archive.

    ``GraphArrays`` keeps base nodes as a prefix; when a foreign archive's
    base mask is not a prefix (possible for hand-built forgi graphs), the
    nodes are stably permuted base-first and edge indices remapped — the
    base rows keep their original relative order, so downstream output
    matches the reference's ``node_x[mask]`` filtering exactly."""
    import torch

    from ginfinity_tpu.graphs.pyg_compat import ensure_pyg

    ensure_pyg()
    raw = torch.load(path, weights_only=False)
    out = {}
    for wid, data in raw.items():
        x = data.x.numpy().astype(np.float32)
        ei = data.edge_index.numpy().astype(np.int32)
        ea = data.edge_attr.numpy().astype(np.float32)
        m = _base_mask_from_data(data, x)
        nb = int(m.sum())
        src, dst = ei[0], ei[1]
        if nb < x.shape[0] and not m[:nb].all():  # non-prefix mask
            order = np.argsort(~m, kind="stable")  # base nodes first
            inv = np.empty_like(order)
            inv[order] = np.arange(order.size, dtype=order.dtype)
            x = x[order]
            src = inv[src].astype(np.int32)
            dst = inv[dst].astype(np.int32)
        out[wid] = GraphArrays(x, src, dst, ea, x.shape[0], nb)
    return out


# --------------------------------------------------------------------------
# CLI
# --------------------------------------------------------------------------


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Generate windowed subgraphs from RNA structures (TPU-native)."
    )
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output-dir", type=str, default="windows_output")
    parser.add_argument("--id-column", type=str, required=True)
    parser.add_argument("--structure-column-name", type=str, default="secondary_structure")
    parser.add_argument("--L", type=int, required=True)
    parser.add_argument("--keep-paired-neighbors", action="store_true")
    parser.add_argument("--mask-threshold", type=float, default=0.0)
    parser.add_argument("--keep-cols", type=str, default=None)
    parser.add_argument("--num-workers", type=int, default=1,
                        help="Reference CLI compatibility (slicing is vectorized).")
    parser.add_argument("--format", choices=["npz", "pt", "both"], default="npz",
                        help="Archive format: 'npz' (packed columnar, fast "
                             "load), 'pt' (reference windows_graphs.pt, "
                             "consumable by reference tooling), or 'both'.")
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    graphs_npz = os.path.join(args.output_dir, "windows_graphs.npz")
    graphs_pt = os.path.join(args.output_dir, "windows_graphs.pt")
    meta_tsv = os.path.join(args.output_dir, "windows_metadata.tsv")
    args.output = meta_tsv  # for setup_and_read_input

    df, log_path, propagate = setup_and_read_input(args, need_model=False)

    graph_map: dict[str, GraphArrays] = {}
    meta_list = []
    for _, row in df.iterrows():
        struct = row[args.structure_column_name]
        if not isinstance(struct, str):
            if not args.quiet:
                print(f"Skipping {row[args.id_column]}: not a string")
            log_information(log_path,
                            {"skipped_not_a_string": f"ID {row[args.id_column]}"})
            continue
        if pair_table(struct, strict=False) is None:
            # surface malformed rows like embed.py does — a silent []
            # from structure_to_windows hides which IDs were dropped
            if not args.quiet:
                print(f"Skipping {row[args.id_column]}: invalid dot-bracket")
            log_information(
                log_path,
                {"skipped_invalid_dot_bracket": f"ID {row[args.id_column]}"},
            )
            continue
        windows = structure_to_windows(
            struct, args.L, args.keep_paired_neighbors, args.mask_threshold
        )
        other = {c: row[c] for c in propagate if c in row}
        for start, g in windows:
            if int(g.edge_src.max(initial=-1)) >= g.n_nodes:
                raise RuntimeError(f"Bad window at {row[args.id_column]}_{start}")
            wid = f"{row[args.id_column]}_{start}"
            graph_map[wid] = g
            meta_list.append(
                {
                    "window_id": wid,
                    args.id_column: row[args.id_column],
                    "window_start": int(start),
                    "window_end": int(start) + args.L - 1,
                    "seq_len": len(struct),
                    **other,
                }
            )

    saved_paths = {}
    if args.format in ("npz", "both"):
        save_windows_graphs(graphs_npz, graph_map)
        saved_paths["graphs"] = graphs_npz
    if args.format in ("pt", "both"):
        save_windows_graphs_pt(graphs_pt, graph_map)
        saved_paths["graphs_pt"] = graphs_pt
    leading = ["window_id", args.id_column, "window_start", "window_end", "seq_len"]
    # no structure long enough -> header-only metadata, not a crash
    meta_df = pd.DataFrame(meta_list, columns=leading if not meta_list else None)
    others = [c for c in meta_df.columns if c not in leading]
    meta_df = meta_df[leading + others]
    meta_df.to_csv(meta_tsv, sep="\t", index=False, na_rep="NaN")
    if not args.quiet:
        for p in saved_paths.values():
            print(f"Saved {len(graph_map)} graphs to {p}")
        print(f"Saved metadata to {meta_tsv}")
    log_information(
        log_path,
        {**saved_paths, "metadata": meta_tsv, "n_windows": len(meta_df)},
        "Summary",
    )


if __name__ == "__main__":
    main()
