"""Checkpoint I/O.

Two formats:

1. **Native** ``.npz``-based self-describing checkpoints (metadata JSON +
   flat arrays) — fast, torch-free, used by the TPU training loop.
2. **Reference-compatible** ``.pth`` import/export, reading/writing the
   exact ``{metadata, state_dict}`` schema of the reference
   (model/gin_model.py:157-195), including its key-layout quirks: the
   second conv-MLP linear lives at ``nn.3`` when dropout > 0 (a Dropout
   module occupies ``nn.2``; gin_model.py:102-112) and at ``nn.2``
   otherwise.  Torch ``[out, in]`` kernels are transposed to JAX
   ``[in, out]``.
"""

from __future__ import annotations

import io
import json
import os
import zipfile

import jax.numpy as jnp
import numpy as np

from ginfinity_tpu.models.gine import GINConfig, Params, State


# --------------------------------------------------------------------------
# Native format
# --------------------------------------------------------------------------


def _flatten(prefix: str, tree, out: dict):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}.{k}" if prefix else str(k), v, out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(f"{prefix}.{i}", v, out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: dict):
    root: dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_checkpoint(
    path: str,
    config: GINConfig,
    params: Params,
    state: State,
    extra_metadata: dict | None = None,
):
    """Write a native checkpoint (single zip: metadata.json + arrays.npz)."""
    flat: dict = {}
    _flatten("params", params, flat)
    _flatten("state", state, flat)
    md = config.to_metadata()
    if extra_metadata:
        md = {**md, "extra": extra_metadata}
    buf = io.BytesIO()
    np.savez(buf, **flat)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("metadata.json", json.dumps(md))
        z.writestr("arrays.npz", buf.getvalue())


def load_checkpoint(path: str) -> tuple[GINConfig, Params, State, dict]:
    if path.endswith(".pth") or path.endswith(".pt"):
        return import_torch_checkpoint(path)
    with zipfile.ZipFile(path, "r") as z:
        md = json.loads(z.read("metadata.json"))
        with np.load(io.BytesIO(z.read("arrays.npz"))) as npz:
            flat = {k: npz[k] for k in npz.files}
    tree = _unflatten(flat)
    # Native metadata always contains every field, so the loader fallbacks
    # inside from_metadata never fire for our own checkpoints.
    config = GINConfig.from_metadata({k: v for k, v in md.items() if k != "extra"})
    return config, tree["params"], tree["state"], md.get("extra", {})


# --------------------------------------------------------------------------
# Reference .pth interop
# --------------------------------------------------------------------------


def _mlp1_key(i: int, dropout: float) -> str:
    return f"convs.{i}.nn.{3 if dropout > 0 else 2}"


def import_torch_checkpoint(path: str) -> tuple[GINConfig, Params, State, dict]:
    """Load a reference ``.pth`` checkpoint into (config, params, state).

    Applies the loader's metadata fallbacks (gin_model.py:158-184)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    metadata = dict(ckpt["metadata"])
    sd = {k: np.asarray(v.detach().cpu().numpy()) for k, v in ckpt["state_dict"].items()}
    config = GINConfig.from_metadata(metadata)

    def lin(prefix: str) -> dict:
        return {
            "kernel": jnp.asarray(sd[f"{prefix}.weight"].T),
            "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        }

    params: Params = {"node_encoder": lin("node_encoder")}
    convs = []
    norms = []
    for i in range(config.gin_layers):
        convs.append(
            {
                "eps": jnp.asarray(sd[f"convs.{i}.eps"]).reshape(1),
                "mlp0": lin(f"convs.{i}.nn.0"),
                "mlp1": lin(_mlp1_key(i, config.dropout)),
                "edge_lin": lin(f"convs.{i}.lin"),
            }
        )
        if config.norm_type == "graph":
            norms.append(
                {
                    "weight": jnp.asarray(sd[f"norms.{i}.weight"]),
                    "bias": jnp.asarray(sd[f"norms.{i}.bias"]),
                    "mean_scale": jnp.asarray(sd[f"norms.{i}.mean_scale"]),
                }
            )
        elif config.norm_type == "batch":
            norms.append(
                {
                    "weight": jnp.asarray(sd[f"norms.{i}.module.weight"]),
                    "bias": jnp.asarray(sd[f"norms.{i}.module.bias"]),
                }
            )
        elif config.norm_type == "layer":
            norms.append(
                {
                    "weight": jnp.asarray(sd[f"norms.{i}.weight"]),
                    "bias": jnp.asarray(sd[f"norms.{i}.bias"]),
                }
            )
        else:
            norms.append({})
    params["convs"] = convs
    params["norms"] = norms
    if config.pooling_type == "set2set":
        params["set2set"] = {
            "w_ih": jnp.asarray(sd["pooling.lstm.weight_ih_l0"]),
            "w_hh": jnp.asarray(sd["pooling.lstm.weight_hh_l0"]),
            "b_ih": jnp.asarray(sd["pooling.lstm.bias_ih_l0"]),
            "b_hh": jnp.asarray(sd["pooling.lstm.bias_hh_l0"]),
        }
    params["fc"] = lin("fc")

    state: State = {
        "node_mu": jnp.asarray(sd["node_mu"]),
        "node_sigma": jnp.asarray(sd["node_sigma"]),
    }
    if config.norm_type == "batch":
        state["batch_norms"] = [
            {
                "running_mean": jnp.asarray(sd[f"norms.{i}.module.running_mean"]),
                "running_var": jnp.asarray(sd[f"norms.{i}.module.running_var"]),
            }
            for i in range(config.gin_layers)
        ]
    extra = {k: ckpt[k] for k in ("epoch",) if k in ckpt}
    return config, params, state, extra


def export_torch_checkpoint(
    path: str,
    config: GINConfig,
    params: Params,
    state: State,
    epoch: int | None = None,
):
    """Write a checkpoint the reference's ``GINModel.load_from_checkpoint``
    can consume (same state-dict key layout)."""
    import torch

    sd: dict = {}

    def put_lin(prefix: str, p: dict):
        sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(p["kernel"]).T.copy())
        sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(p["bias"]).copy())

    sd["node_mu"] = torch.from_numpy(np.asarray(state["node_mu"]).copy())
    sd["node_sigma"] = torch.from_numpy(np.asarray(state["node_sigma"]).copy())
    put_lin("node_encoder", params["node_encoder"])
    for i, conv in enumerate(params["convs"]):
        sd[f"convs.{i}.eps"] = torch.from_numpy(np.asarray(conv["eps"]).reshape(1).copy())
        put_lin(f"convs.{i}.nn.0", conv["mlp0"])
        put_lin(_mlp1_key(i, config.dropout), conv["mlp1"])
        put_lin(f"convs.{i}.lin", conv["edge_lin"])
    for i, norm in enumerate(params["norms"]):
        if config.norm_type == "graph":
            sd[f"norms.{i}.weight"] = torch.from_numpy(np.asarray(norm["weight"]).copy())
            sd[f"norms.{i}.bias"] = torch.from_numpy(np.asarray(norm["bias"]).copy())
            sd[f"norms.{i}.mean_scale"] = torch.from_numpy(np.asarray(norm["mean_scale"]).copy())
        elif config.norm_type == "layer":
            sd[f"norms.{i}.weight"] = torch.from_numpy(np.asarray(norm["weight"]).copy())
            sd[f"norms.{i}.bias"] = torch.from_numpy(np.asarray(norm["bias"]).copy())
        elif config.norm_type == "batch":
            sd[f"norms.{i}.module.weight"] = torch.from_numpy(np.asarray(norm["weight"]).copy())
            sd[f"norms.{i}.module.bias"] = torch.from_numpy(np.asarray(norm["bias"]).copy())
            bn = state["batch_norms"][i]
            sd[f"norms.{i}.module.running_mean"] = torch.from_numpy(
                np.asarray(bn["running_mean"]).copy()
            )
            sd[f"norms.{i}.module.running_var"] = torch.from_numpy(
                np.asarray(bn["running_var"]).copy()
            )
            sd[f"norms.{i}.module.num_batches_tracked"] = torch.tensor(0)
    if config.pooling_type == "set2set":
        s2s = params["set2set"]
        sd["pooling.lstm.weight_ih_l0"] = torch.from_numpy(np.asarray(s2s["w_ih"]).copy())
        sd["pooling.lstm.weight_hh_l0"] = torch.from_numpy(np.asarray(s2s["w_hh"]).copy())
        sd["pooling.lstm.bias_ih_l0"] = torch.from_numpy(np.asarray(s2s["b_ih"]).copy())
        sd["pooling.lstm.bias_hh_l0"] = torch.from_numpy(np.asarray(s2s["b_hh"]).copy())
    put_lin("fc", params["fc"])

    ckpt = {"metadata": config.to_metadata(), "state_dict": sd}
    if epoch is not None:
        ckpt["epoch"] = epoch
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(ckpt, path)
