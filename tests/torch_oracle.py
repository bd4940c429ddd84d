"""Independent torch oracle of the reference model's forward pass.

Implements the documented PyG-layer math (GINEConv / GraphNorm /
global pools / Set2Set) in plain torch so the JAX model can be verified
against the actual packaged ``.pth`` weights without torch_geometric.
This is a test-only oracle: the production path is pure JAX.
"""

import numpy as np
import torch
import torch.nn.functional as F


def run_oracle(ckpt_path, node_feats, edge_srcs, edge_dsts, edge_attrs, mode="graph"):
    """Forward a list of graphs (one batch) through the reference math.

    Args are per-graph numpy arrays. Returns pooled graph embeddings
    [G, out] (mode='graph') or the concatenated normalized node
    embeddings (mode='nodes').
    """
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    md = ckpt["metadata"]
    sd = {k: v.float() for k, v in ckpt["state_dict"].items()}
    n_layers = md["gin_layers"]
    dropout = md["dropout"]
    mlp1_idx = 3 if dropout > 0 else 2

    # Flat batch
    xs, srcs, dsts, eattrs, gids = [], [], [], [], []
    off = 0
    for g, (x, es, ed, ea) in enumerate(zip(node_feats, edge_srcs, edge_dsts, edge_attrs)):
        xs.append(torch.from_numpy(np.asarray(x, np.float32)))
        srcs.append(torch.from_numpy(np.asarray(es, np.int64)) + off)
        dsts.append(torch.from_numpy(np.asarray(ed, np.int64)) + off)
        eattrs.append(torch.from_numpy(np.asarray(ea, np.float32)))
        gids.append(torch.full((x.shape[0],), g, dtype=torch.int64))
        off += x.shape[0]
    x = torch.cat(xs)
    src = torch.cat(srcs)
    dst = torch.cat(dsts)
    ea = torch.cat(eattrs)
    batch = torch.cat(gids)
    G = len(node_feats)

    def scatter_add(vals, index, size):
        out = torch.zeros(size, vals.shape[1], dtype=vals.dtype)
        return out.index_add_(0, index, vals)

    def scatter_mean(vals, index, size):
        s = scatter_add(vals, index, size)
        cnt = torch.zeros(size, 1).index_add_(0, index, torch.ones(len(index), 1))
        return s / cnt.clamp(min=1)

    # node encoder
    x = x @ sd["node_encoder.weight"].T + sd["node_encoder.bias"]

    for i in range(n_layers):
        h_in = x
        # GINEConv: msg = relu(x_src + lin(edge_attr)); aggr add at dst
        e = ea @ sd[f"convs.{i}.lin.weight"].T + sd[f"convs.{i}.lin.bias"]
        msg = F.relu(x[src] + e)
        agg = scatter_add(msg, dst, x.shape[0])
        eps = sd[f"convs.{i}.eps"]
        h = (1 + eps) * x + agg
        h = F.relu(h @ sd[f"convs.{i}.nn.0.weight"].T + sd[f"convs.{i}.nn.0.bias"])
        h = F.relu(h @ sd[f"convs.{i}.nn.{mlp1_idx}.weight"].T + sd[f"convs.{i}.nn.{mlp1_idx}.bias"])
        # GraphNorm (PyG): out = w * (x - mean*a) / sqrt(var(out) + 1e-5) + b
        if md.get("norm_type", "none") == "graph":
            mean = scatter_mean(h, batch, G)
            out = h - mean[batch] * sd[f"norms.{i}.mean_scale"]
            var = scatter_mean(out * out, batch, G)
            std = (var + 1e-5).sqrt()
            h = sd[f"norms.{i}.weight"] * out / std[batch] + sd[f"norms.{i}.bias"]
        if md.get("use_residual", False) and h_in.shape == h.shape:
            h = h + h_in
        x = h

    def node_norm(x):
        nm = md.get("node_embed_norm", "none")
        eps = md.get("eps", 1e-6)
        if nm.startswith("zscore"):
            x = (x - sd["node_mu"]) / (sd["node_sigma"] + eps)
        if nm.endswith("l2") or nm == "l2":
            x = x / torch.linalg.norm(x, dim=1, keepdim=True).clamp(min=eps)
        return x

    if mode == "raw_nodes":  # pre-norm embeddings (fit_node_stats input)
        return x.numpy()

    if mode == "nodes":
        return node_norm(x).numpy()

    if md.get("normalize_nodes_before_pool", False):
        x = node_norm(x)

    pool = md.get("pooling_type", "global_add_pool")
    if pool == "global_mean_pool":
        pooled = scatter_mean(x, batch, G)
    else:
        pooled = scatter_add(x, batch, G)
    out = pooled @ sd["fc.weight"].T + sd["fc.bias"]
    return out.numpy()
