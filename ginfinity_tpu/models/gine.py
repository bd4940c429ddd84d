"""GINE encoder (Graph Isomorphism Network with edge features), TPU-native.

Functionally equivalent to the reference ``GINModel``
(model/gin_model.py:19-300) so that reference ``.pth`` weights import
losslessly, but built as pure JAX functions over flat padded
:class:`~ginfinity_tpu.graphs.batching.GraphBatch` tensors:

- message passing = gather + masked ``segment_sum`` (XLA-fused; the
  reference relies on torch-scatter CUDA kernels here),
- graph-aware norms = masked segment statistics,
- everything jit/pjit-compatible: static shapes, no Python control flow
  on traced values.

Layer semantics (PyG parity):
  GINEConv:  ``out = MLP((1 + eps) * x + sum_{j->i} relu(x_j + W_e e_ji + b_e))``
  GraphNorm: ``y = w * (x - a * mean_g) / sqrt(var_g(x - a * mean_g) + 1e-5) + b``
  node_embed_norm 'zscore_l2': z-score with persistent mu/sigma buffers,
  then row L2 (model/gin_model.py:266-275 order).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ginfinity_tpu.graphs.batching import GraphBatch
from ginfinity_tpu.graphs.build import FORGI_NODE_TYPES

Params = dict
State = dict

_NORM_EPS = 1e-5  # PyG GraphNorm/LayerNorm/InstanceNorm/BatchNorm eps


@dataclasses.dataclass(frozen=True)
class GINConfig:
    """Model hyperparameters; mirrors the reference checkpoint ``metadata``
    schema (model/gin_model.py:69-85) so checkpoints round-trip."""

    hidden_dims: tuple[int, ...]
    output_dim: int
    graph_encoding: str = "standard"
    dropout: float = 0.05
    pooling_type: str = "global_add_pool"
    node_embed_norm: str = "none"  # {none,l2,zscore,zscore_l2}
    eps: float = 1e-6
    norm_type: str = "graph"  # {none,batch,graph,layer,instance}
    use_residual: bool = True
    normalize_nodes_before_pool: bool = False
    node_feature_dim: int = 4
    edge_feature_dim: int = 4
    gin_eps: float = 0.0
    train_eps: bool = True
    seq_weight: float = 0.0
    # "highest" = full-f32 MXU passes (retrieval-identical parity with the
    # reference; the TPU default bf16 pass loses rank order for
    # near-equidistant neighbours).  "bf16" = single bf16 pass with f32
    # accumulation — the idiomatic ~2x throughput mode.  Not part of the
    # checkpoint metadata (a runtime choice, not a model property).
    matmul_precision: str = "highest"

    @property
    def gin_layers(self) -> int:
        return len(self.hidden_dims)

    def with_precision(self, precision: str) -> "GINConfig":
        if precision not in ("highest", "bf16"):
            raise ValueError(f"matmul_precision must be 'highest' or 'bf16', got {precision!r}")
        return dataclasses.replace(self, matmul_precision=precision)

    @staticmethod
    def create(
        hidden_dim: int | list[int] | tuple[int, ...],
        output_dim: int,
        gin_layers: int = 1,
        graph_encoding: str = "standard",
        node_feature_dim: int | None = None,
        edge_feature_dim: int | None = None,  # None = derive from encoding
        **kw: Any,
    ) -> "GINConfig":
        """Constructor with the reference's defaulting rules
        (model/gin_model.py:40-66)."""
        if isinstance(hidden_dim, (int, float)):
            hidden_dims = (int(hidden_dim),) * gin_layers
        else:
            hidden_dim = list(hidden_dim)
            if len(hidden_dim) not in (1, gin_layers):
                raise ValueError(
                    f"hidden_dim list must be of length 1 or {gin_layers}, got {len(hidden_dim)}"
                )
            hidden_dims = tuple(hidden_dim * gin_layers if len(hidden_dim) == 1 else hidden_dim)
        if node_feature_dim is None:
            node_feature_dim = (
                2 + 2 + 4 + 1 + len(FORGI_NODE_TYPES) if graph_encoding == "forgi" else 4
            )
        if edge_feature_dim is None:
            edge_feature_dim = 7 if graph_encoding == "forgi" else 4
        return GINConfig(
            hidden_dims=hidden_dims,
            output_dim=output_dim,
            graph_encoding=graph_encoding,
            node_feature_dim=int(node_feature_dim),
            edge_feature_dim=int(edge_feature_dim),
            **kw,
        )

    @staticmethod
    def from_metadata(md: dict) -> "GINConfig":
        """Reconstruct from checkpoint metadata using the *loader's*
        fallback defaults (model/gin_model.py:158-184 — note these differ
        from constructor defaults: norm_type->'none', use_residual->False)."""
        node_feature_dim = md.get("node_feature_dim")
        edge_feature_dim = md.get("edge_feature_dim")
        if edge_feature_dim is None:
            edge_feature_dim = 4 if node_feature_dim is not None else 2
        hidden = md["hidden_dims"] if "hidden_dims" in md else md["hidden_dim"]
        cfg = GINConfig.create(
            hidden_dim=hidden,
            output_dim=md["output_dim"],
            gin_layers=md.get("gin_layers", len(hidden) if isinstance(hidden, list) else 1),
            graph_encoding=md.get("graph_encoding", "standard"),
            dropout=md.get("dropout", 0.05),
            pooling_type=md.get("pooling_type", "global_add_pool"),
            node_embed_norm=md.get("node_embed_norm", "none"),
            eps=md.get("eps", 1e-6),
            norm_type=md.get("norm_type", "none"),
            use_residual=md.get("use_residual", False),
            normalize_nodes_before_pool=md.get("normalize_nodes_before_pool", False),
            node_feature_dim=node_feature_dim,
            edge_feature_dim=edge_feature_dim,
            gin_eps=md.get("gin_eps", 0.0),
            train_eps=md.get("train_eps", True),
            seq_weight=float(md.get("seq_weight", 0.0) or 0.0),
        )
        return cfg

    def to_metadata(self) -> dict:
        return {
            "hidden_dims": list(self.hidden_dims),
            "output_dim": self.output_dim,
            "graph_encoding": self.graph_encoding,
            "gin_layers": self.gin_layers,
            "dropout": self.dropout,
            "pooling_type": self.pooling_type,
            "node_embed_norm": self.node_embed_norm,
            "eps": self.eps,
            "norm_type": self.norm_type,
            "use_residual": self.use_residual,
            "normalize_nodes_before_pool": self.normalize_nodes_before_pool,
            "node_feature_dim": self.node_feature_dim,
            "edge_feature_dim": self.edge_feature_dim,
            "gin_eps": self.gin_eps,
            "train_eps": self.train_eps,
            "seq_weight": self.seq_weight,
        }


# --------------------------------------------------------------------------
# Parameter initialization (matches torch defaults: Kaiming-uniform linear
# init with fan_in bounds so randomly-initialized training behaves like the
# reference's).
# --------------------------------------------------------------------------


def _init_linear(key, fan_in: int, fan_out: int) -> dict:
    k1, k2 = jax.random.split(key)
    limit = float(np.sqrt(1.0 / fan_in))
    a = float(np.sqrt(5.0))
    gain = float(np.sqrt(2.0 / (1.0 + a * a)))
    w_limit = gain * float(np.sqrt(3.0 / fan_in))
    return {
        "kernel": jax.random.uniform(k1, (fan_in, fan_out), jnp.float32, -w_limit, w_limit),
        "bias": jax.random.uniform(k2, (fan_out,), jnp.float32, -limit, limit),
    }


def init_params(key: jax.Array, config: GINConfig) -> tuple[Params, State]:
    keys = jax.random.split(key, 4 + 4 * config.gin_layers)
    ki = iter(range(len(keys)))
    params: Params = {
        "node_encoder": _init_linear(keys[next(ki)], config.node_feature_dim, config.hidden_dims[0])
    }
    convs = []
    norms = []
    for i in range(config.gin_layers):
        in_dim = config.hidden_dims[i - 1] if i > 0 else config.hidden_dims[0]
        out_dim = config.hidden_dims[i]
        convs.append(
            {
                "eps": jnp.full((1,), config.gin_eps, jnp.float32),
                "mlp0": _init_linear(keys[next(ki)], in_dim, out_dim),
                "mlp1": _init_linear(keys[next(ki)], out_dim, out_dim),
                "edge_lin": _init_linear(keys[next(ki)], config.edge_feature_dim, in_dim),
            }
        )
        if config.norm_type in ("graph",):
            norms.append(
                {
                    "weight": jnp.ones(out_dim, jnp.float32),
                    "bias": jnp.zeros(out_dim, jnp.float32),
                    "mean_scale": jnp.ones(out_dim, jnp.float32),
                }
            )
        elif config.norm_type in ("batch", "layer"):
            norms.append(
                {"weight": jnp.ones(out_dim, jnp.float32), "bias": jnp.zeros(out_dim, jnp.float32)}
            )
        else:  # none / instance (PyG InstanceNorm default affine=False)
            norms.append({})
    params["convs"] = convs
    params["norms"] = norms

    last = config.hidden_dims[-1]
    if config.pooling_type == "set2set":
        params["set2set"] = _init_lstm(keys[next(ki)], 2 * last, last)
        params["fc"] = _init_linear(keys[next(ki)], 2 * last, config.output_dim)
    else:
        params["fc"] = _init_linear(keys[next(ki)], last, config.output_dim)

    state: State = {
        "node_mu": jnp.zeros(last, jnp.float32),
        "node_sigma": jnp.ones(last, jnp.float32),
    }
    if config.norm_type == "batch":
        state["batch_norms"] = [
            {
                "running_mean": jnp.zeros(config.hidden_dims[i], jnp.float32),
                "running_var": jnp.ones(config.hidden_dims[i], jnp.float32),
            }
            for i in range(config.gin_layers)
        ]
    return params, state


def _init_lstm(key, input_size: int, hidden_size: int) -> dict:
    k = jax.random.split(key, 4)
    limit = float(np.sqrt(1.0 / hidden_size))
    shape_ih = (4 * hidden_size, input_size)
    shape_hh = (4 * hidden_size, hidden_size)
    u = lambda kk, sh: jax.random.uniform(kk, sh, jnp.float32, -limit, limit)
    return {
        "w_ih": u(k[0], shape_ih),
        "w_hh": u(k[1], shape_hh),
        "b_ih": u(k[2], (4 * hidden_size,)),
        "b_hh": u(k[3], (4 * hidden_size,)),
    }


# --------------------------------------------------------------------------
# Masked segment helpers
# --------------------------------------------------------------------------


def _graph_counts(batch: GraphBatch) -> jnp.ndarray:
    """Real-node count per graph (+ trash segment), shape [G+1]."""
    return jax.ops.segment_sum(batch.node_mask, batch.node_graph, num_segments=batch.num_graphs + 1)


def _segment_mean(x, batch: GraphBatch, counts=None):
    """Per-graph mean over real nodes; returns [G+1, F]."""
    if counts is None:
        counts = _graph_counts(batch)
    s = jax.ops.segment_sum(
        x * batch.node_mask[:, None], batch.node_graph, num_segments=batch.num_graphs + 1
    )
    return s / jnp.maximum(counts, 1.0)[:, None]


# --------------------------------------------------------------------------
# Norm layers (PyG parity; see module docstring)
# --------------------------------------------------------------------------


def _graph_norm(x, p, batch: GraphBatch):
    counts = _graph_counts(batch)
    mean = _segment_mean(x, batch, counts)
    out = x - mean[batch.node_graph] * p["mean_scale"]
    var = _segment_mean(out * out, batch, counts)
    std = jnp.sqrt(var + _NORM_EPS)
    return p["weight"] * out / std[batch.node_graph] + p["bias"]


def _layer_norm_graph(x, p, batch: GraphBatch):
    # PyG LayerNorm(mode='graph'): stats over all node-feature entries per graph.
    counts = _graph_counts(batch) * x.shape[1]
    s = jax.ops.segment_sum(
        jnp.sum(x, axis=1) * batch.node_mask, batch.node_graph, num_segments=batch.num_graphs + 1
    )
    mean = s / jnp.maximum(counts, 1.0)
    xc = x - mean[batch.node_graph][:, None]
    v = jax.ops.segment_sum(
        jnp.sum(xc * xc, axis=1) * batch.node_mask,
        batch.node_graph,
        num_segments=batch.num_graphs + 1,
    )
    var = v / jnp.maximum(counts, 1.0)
    out = xc / jnp.sqrt(var + _NORM_EPS)[batch.node_graph][:, None]
    return out * p["weight"] + p["bias"]


def _instance_norm(x, batch: GraphBatch):
    counts = _graph_counts(batch)
    mean = _segment_mean(x, batch, counts)
    xc = x - mean[batch.node_graph]
    var = _segment_mean(xc * xc, batch, counts)
    return xc / jnp.sqrt(var[batch.node_graph] + _NORM_EPS)


def _batch_norm(x, p, bn_state, batch: GraphBatch, train: bool):
    if train:
        n = jnp.maximum(jnp.sum(batch.node_mask), 1.0)
        mean = jnp.sum(x * batch.node_mask[:, None], axis=0) / n
        xc = x - mean
        var = jnp.sum(xc * xc * batch.node_mask[:, None], axis=0) / n
        momentum = 0.1
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new_state = {
            "running_mean": (1 - momentum) * bn_state["running_mean"] + momentum * mean,
            "running_var": (1 - momentum) * bn_state["running_var"] + momentum * unbiased,
        }
    else:
        mean = bn_state["running_mean"]
        var = bn_state["running_var"]
        new_state = bn_state
    out = (x - mean) / jnp.sqrt(var + _NORM_EPS) * p["weight"] + p["bias"]
    return out, new_state


# --------------------------------------------------------------------------
# Forward pieces
# --------------------------------------------------------------------------


# On TPU, float32 matmuls default to bfloat16 passes; the encoder is tiny
# (hidden dims ~128-512) and HBM-bound, so full-f32 MXU precision costs
# little and is required for retrieval-identical parity with the reference.
# config.matmul_precision="bf16" selects single-pass bf16 (f32 accumulate)
# for speed runs; being a GINConfig field it participates in every jit key,
# so flipping it always retraces.
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "bf16": jax.lax.Precision.DEFAULT,
}


def _prec(config: GINConfig):
    return _PRECISIONS[config.matmul_precision]


def _dense(x, p, precision):
    return jnp.dot(x, p["kernel"], precision=precision) + p["bias"]


def _dropout(x, rate: float, rng, train: bool):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def encode_nodes(
    config: GINConfig,
    params: Params,
    state: State,
    batch: GraphBatch,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
) -> tuple[jnp.ndarray, State]:
    """Run the GINE stack; returns raw node embeddings [N_pad, D] and
    (possibly updated) state.  Mirrors ``GINModel._encode_graph``
    (model/gin_model.py:244-264)."""
    prec = _prec(config)
    x = _dense(batch.node_feat, params["node_encoder"], prec)
    new_bns = []
    n_layers = config.gin_layers
    if train and rng is not None:
        layer_rngs = jax.random.split(rng, 2 * n_layers)
    for i in range(n_layers):
        conv = params["convs"][i]
        h_in = x

        # GINEConv message passing
        edge_emb = _dense(batch.edge_attr, conv["edge_lin"], prec)
        msg = jax.nn.relu(x[batch.edge_src] + edge_emb) * batch.edge_mask[:, None]
        agg = jax.ops.segment_sum(msg, batch.edge_dst, num_segments=batch.num_nodes_padded)
        eps = conv["eps"] if config.train_eps else jax.lax.stop_gradient(conv["eps"])
        h = (1.0 + eps) * x + agg

        # 2-layer MLP with optional inner dropout (gin_model.py:102-112)
        h = jax.nn.relu(_dense(h, conv["mlp0"], prec))
        if train and config.dropout > 0 and rng is not None:
            h = _dropout(h, config.dropout, layer_rngs[2 * i], train)
        h = jax.nn.relu(_dense(h, conv["mlp1"], prec))

        # Norm
        nt = config.norm_type
        np_ = params["norms"][i]
        if nt == "graph":
            h = _graph_norm(h, np_, batch)
        elif nt == "layer":
            h = _layer_norm_graph(h, np_, batch)
        elif nt == "instance":
            h = _instance_norm(h, batch)
        elif nt == "batch":
            h, bns = _batch_norm(h, np_, state["batch_norms"][i], batch, train)
            new_bns.append(bns)

        # Per-layer dropout (gin_model.py:115,261)
        if train and config.dropout > 0 and rng is not None:
            h = _dropout(h, config.dropout, layer_rngs[2 * i + 1], train)

        # Residual when shapes match (gin_model.py:262-264)
        if config.use_residual and h_in.shape == h.shape:
            h = h + h_in
        x = h

    new_state = dict(state)
    if new_bns:
        new_state["batch_norms"] = new_bns
    return x, new_state


def apply_node_norm(config: GINConfig, state: State, x: jnp.ndarray) -> jnp.ndarray:
    """Post-hoc node-embedding normalization (model/gin_model.py:266-275):
    zscore (buffers) first, then row L2."""
    mode = config.node_embed_norm
    if mode == "none":
        return x
    if mode.startswith("zscore"):
        x = (x - state["node_mu"]) / (state["node_sigma"] + config.eps)
    if mode.endswith("l2") or mode == "l2":
        norms = jnp.linalg.norm(x, axis=1, keepdims=True)
        x = x / jnp.maximum(norms, config.eps)
    return x


def _set2set(params, x, batch: GraphBatch, precision, processing_steps: int = 2):
    """Set2Set pooling (PyG semantics) with a manually-unrolled torch-layout
    LSTM; processing_steps=2 as in the reference (gin_model.py:119)."""
    p = params["set2set"]
    g1 = batch.num_graphs + 1
    d = x.shape[1]
    q_star = jnp.zeros((g1, 2 * d), x.dtype)
    h = jnp.zeros((g1, d), x.dtype)
    c = jnp.zeros((g1, d), x.dtype)
    neg_inf = jnp.finfo(x.dtype).min
    for _ in range(processing_steps):
        gates = (
            jnp.dot(q_star, p["w_ih"].T, precision=precision)
            + p["b_ih"]
            + jnp.dot(h, p["w_hh"].T, precision=precision)
            + p["b_hh"]
        )
        gi, gf, gg, go = jnp.split(gates, 4, axis=1)
        c = jax.nn.sigmoid(gf) * c + jax.nn.sigmoid(gi) * jnp.tanh(gg)
        h = jax.nn.sigmoid(go) * jnp.tanh(c)
        q = h
        e = jnp.sum(x * q[batch.node_graph], axis=1)
        e = jnp.where(batch.node_mask > 0, e, neg_inf)
        emax = jax.ops.segment_max(e, batch.node_graph, num_segments=g1)
        a = jnp.exp(e - emax[batch.node_graph]) * batch.node_mask
        asum = jax.ops.segment_sum(a, batch.node_graph, num_segments=g1)
        a = a / jnp.maximum(asum[batch.node_graph], 1e-16)
        r = jax.ops.segment_sum(a[:, None] * x, batch.node_graph, num_segments=g1)
        q_star = jnp.concatenate([q, r], axis=1)
    return q_star


def pool_and_project(
    config: GINConfig, params: Params, x: jnp.ndarray, batch: GraphBatch
) -> jnp.ndarray:
    """Graph pooling + final projection (gin_model.py:286-288).
    Returns [G, output_dim] (trash segment dropped)."""
    if config.pooling_type == "set2set":
        pooled = _set2set(params, x, batch, _prec(config))
    else:
        pooled = jax.ops.segment_sum(
            x * batch.node_mask[:, None], batch.node_graph, num_segments=batch.num_graphs + 1
        )
        if config.pooling_type == "global_mean_pool":
            counts = _graph_counts(batch)
            pooled = pooled / jnp.maximum(counts, 1.0)[:, None]
    out = _dense(pooled, params["fc"], _prec(config))
    return out[: batch.num_graphs]


def get_node_embeddings(
    config: GINConfig,
    params: Params,
    state: State,
    batch: GraphBatch,
    *,
    apply_norm: bool = True,
    train: bool = False,
    rng: jax.Array | None = None,
) -> tuple[jnp.ndarray, State]:
    x, new_state = encode_nodes(config, params, state, batch, train=train, rng=rng)
    if apply_norm:
        x = apply_node_norm(config, state, x)
    return x, new_state


def forward_once(
    config: GINConfig,
    params: Params,
    state: State,
    batch: GraphBatch,
    *,
    normalize_nodes_before_pool: bool | None = None,
    train: bool = False,
    rng: jax.Array | None = None,
) -> tuple[jnp.ndarray, State]:
    """Graph embeddings [G, output_dim] (gin_model.py:290-294)."""
    if normalize_nodes_before_pool is None:
        normalize_nodes_before_pool = config.normalize_nodes_before_pool
    x, new_state = get_node_embeddings(
        config, params, state, batch, apply_norm=normalize_nodes_before_pool, train=train, rng=rng
    )
    return pool_and_project(config, params, x, batch), new_state


def fit_node_stats(
    config: GINConfig, params: Params, state: State, batches
) -> State:
    """Streaming mu/sigma fit over raw node embeddings
    (gin_model.py:206-230)."""
    s = None
    ss = None
    n = 0.0
    fwd = jax.jit(lambda p, st, b: encode_nodes(config, p, st, b)[0])
    for b in batches:
        x = fwd(params, state, b)
        m = np.asarray(b.node_mask)
        xa = np.asarray(x) * m[:, None]
        if s is None:
            s = xa.sum(axis=0)
            ss = (xa * xa).sum(axis=0)
        else:
            s += xa.sum(axis=0)
            ss += (xa * xa).sum(axis=0)
        n += float(m.sum())
    if n == 0:
        raise RuntimeError("No nodes seen while fitting node stats.")
    mu = s / n
    var = np.clip(ss / n - mu * mu, 0.0, None)
    sigma = np.sqrt(var + config.eps)
    sigma = np.maximum(sigma, config.eps)
    new_state = dict(state)
    new_state["node_mu"] = jnp.asarray(mu, jnp.float32)
    new_state["node_sigma"] = jnp.asarray(sigma, jnp.float32)
    return new_state


class GINModel:
    """Convenience bundle (config, params, state) with jitted inference.

    The pure functions above are the real API (use them inside pjit /
    custom training loops); this class mirrors the reference's object
    surface for pipelines and tests.
    """

    def __init__(self, config: GINConfig, params: Params, state: State):
        self.config = config
        self.params = params
        self.state = state
        self._jit_forward = jax.jit(
            lambda p, s, b: forward_once(config, p, s, b)[0]
        )
        self._jit_nodes = jax.jit(
            lambda p, s, b, apply_norm: get_node_embeddings(
                config, p, s, b, apply_norm=apply_norm
            )[0],
            static_argnums=(3,),
        )
        # Stacked variants: batches stacked on a leading axis run as one
        # program via lax.map (one transfer per tensor for a whole corpus
        # chunk; per-batch dispatch over a remote-TPU link is RPC-bound).
        from ginfinity_tpu.graphs.batching import decode_wire

        self._sharded_cache: dict = {}
        self._jit_forward_stacked = jax.jit(
            lambda p, s, bs: jax.lax.map(
                lambda b: forward_once(config, p, s, decode_wire(b))[0], bs
            )
        )
        self._jit_nodes_stacked = jax.jit(
            lambda p, s, bs: jax.lax.map(
                lambda b: get_node_embeddings(config, p, s, decode_wire(b))[0], bs
            )
        )

    @classmethod
    def create(cls, key: jax.Array, config: GINConfig) -> "GINModel":
        params, state = init_params(key, config)
        return cls(config, params, state)

    def forward_once(self, batch: GraphBatch) -> jnp.ndarray:
        return self._jit_forward(self.params, self.state, batch)

    def get_node_embeddings(self, batch: GraphBatch, apply_norm: bool = True) -> jnp.ndarray:
        return self._jit_nodes(self.params, self.state, batch, apply_norm)

    def forward_stacked(self, stacked) -> jnp.ndarray:
        """Forward a stack of equal-shape WireBatches: [B, G_cap, out_dim]."""
        return self._jit_forward_stacked(self.params, self.state, stacked)

    def nodes_stacked(self, stacked) -> jnp.ndarray:
        return self._jit_nodes_stacked(self.params, self.state, stacked)

    def forward_stacked_sharded(self, stacked, mesh) -> jnp.ndarray:
        """Data-parallel variant: the stacked leading axis shards over the
        mesh's 'data' axis (params replicated); each chip runs its slice
        of batches.  The leading axis must be divisible by the mesh size
        (pad with a repeated batch and drop the tail)."""
        key = ("fwd", mesh)
        fn = self._sharded_cache.get(key)
        if fn is None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ginfinity_tpu.graphs.batching import decode_wire

            cfg = self.config
            fn = jax.jit(
                lambda p, s, bs: jax.lax.map(
                    lambda b: forward_once(cfg, p, s, decode_wire(b))[0], bs
                ),
                in_shardings=(
                    NamedSharding(mesh, P()),
                    NamedSharding(mesh, P()),
                    NamedSharding(mesh, P("data")),
                ),
                out_shardings=NamedSharding(mesh, P("data")),
            )
            self._sharded_cache[key] = fn
        return fn(self.params, self.state, stacked)
