"""Data-parallel training step and loop primitives.

The reference trains single-device with a Python loop over PyG batches
(train_model.py:1136-1226).  Here the train step is one jitted program:
forward + loss + grad, with gradients ``pmean``-reduced over the mesh's
``data`` axis inside ``shard_map`` — the TPU-native replacement for the
DDP the reference never had (SURVEY.md §2.3).  The model is ~0.7M params
so parameters/optimizer state are replicated; only batches shard.

Loss modes (train_model.py:1147-1172):
  triplet:    TripletMarginLoss(margin=1, p=2) on (a, p, n) embeddings
  regression: MSE(1 - cos(a, p), target)
  alignment:  AlignmentContrastiveLoss on gathered node subsets
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from ginfinity_tpu.graphs.batching import GraphBatch
from ginfinity_tpu.models.gine import (
    GINConfig,
    Params,
    State,
    forward_once,
    get_node_embeddings,
)
from ginfinity_tpu.training.losses import (
    AlignmentLossConfig,
    alignment_contrastive_loss,
)


@struct.dataclass
class TripletBatch:
    anchor: GraphBatch
    positive: GraphBatch
    negative: GraphBatch
    mask: jnp.ndarray  # [G] 1.0 for real triplets


@struct.dataclass
class PairBatch:
    anchor: GraphBatch
    positive: GraphBatch
    target: jnp.ndarray  # [G]
    mask: jnp.ndarray  # [G]


@struct.dataclass
class AlignmentBatch:
    graphs: GraphBatch
    node_idx: jnp.ndarray  # [M] indices into the padded node array
    labels: jnp.ndarray  # [M] int32
    graph_ids: jnp.ndarray  # [M] int32
    categories: jnp.ndarray  # [M] int32
    valid: jnp.ndarray  # [M] float32


@struct.dataclass
class TrainState:
    params: Params
    model_state: State
    opt_state: optax.OptState
    step: jnp.ndarray

    @classmethod
    def create(cls, params, model_state, optimizer):
        return cls(
            params=params,
            model_state=model_state,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )


# -- loss adapters -----------------------------------------------------------


def triplet_loss_fn(margin: float = 1.0):
    def fn(cfg: GINConfig, params, mstate, batch: TripletBatch, rng):
        r = jax.random.split(rng, 3) if rng is not None else (None, None, None)
        train = rng is not None
        a, s1 = forward_once(cfg, params, mstate, batch.anchor, train=train, rng=r[0])
        p, s2 = forward_once(cfg, params, s1, batch.positive, train=train, rng=r[1])
        n, s3 = forward_once(cfg, params, s2, batch.negative, train=train, rng=r[2])
        d_ap = jnp.sqrt(jnp.sum((a - p) ** 2, axis=1) + 1e-6)
        d_an = jnp.sqrt(jnp.sum((a - n) ** 2, axis=1) + 1e-6)
        per = jnp.maximum(d_ap - d_an + margin, 0.0)
        loss = jnp.sum(per * batch.mask) / jnp.maximum(jnp.sum(batch.mask), 1.0)
        return loss, s3

    return fn


def regression_loss_fn():
    def fn(cfg: GINConfig, params, mstate, batch: PairBatch, rng):
        r = jax.random.split(rng, 2) if rng is not None else (None, None)
        train = rng is not None
        a, s1 = forward_once(cfg, params, mstate, batch.anchor, train=train, rng=r[0])
        p, s2 = forward_once(cfg, params, s1, batch.positive, train=train, rng=r[1])
        an = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-8)
        pn = p / jnp.maximum(jnp.linalg.norm(p, axis=1, keepdims=True), 1e-8)
        pred = 1.0 - jnp.sum(an * pn, axis=1)
        sq = (pred - batch.target) ** 2
        loss = jnp.sum(sq * batch.mask) / jnp.maximum(jnp.sum(batch.mask), 1.0)
        return loss, s2

    return fn


def alignment_loss_fn(loss_cfg: AlignmentLossConfig = AlignmentLossConfig()):
    def fn(cfg: GINConfig, params, mstate, batch: AlignmentBatch, rng):
        # Node embeddings with the post-hoc norm applied, as the reference
        # does in its alignment batch loss (train_model.py:379-386 uses
        # get_node_embeddings which applies node_embed_norm).
        x, s1 = get_node_embeddings(
            cfg, params, mstate, batch.graphs, apply_norm=True,
            train=rng is not None, rng=rng,
        )
        sub = x[batch.node_idx]
        loss = alignment_contrastive_loss(
            sub, batch.labels, batch.graph_ids, batch.categories, batch.valid, loss_cfg
        )
        return loss, s1

    return fn


# -- train step --------------------------------------------------------------


def make_train_step(
    model_config: GINConfig,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable,
    mesh: Mesh | None = None,
):
    """Build the jitted train step.

    Single device: ``step(ts, batch, rng) -> (ts, loss)``.
    With ``mesh``: same signature, but every array leaf of ``batch`` must
    carry a leading ``mesh.devices.size`` axis (one sub-batch per device);
    gradients and loss are pmean-reduced over ICI.
    """

    def step_core(ts: TrainState, batch, rng):
        if mesh is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            batch = jax.tree.map(lambda x: jnp.squeeze(x, 0), batch)

        def lf(p):
            return loss_fn(model_config, p, ts.model_state, batch, rng)

        (loss, new_mstate), grads = jax.value_and_grad(lf, has_aux=True)(ts.params)
        if mesh is not None:
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, "data"), grads)
            loss = jax.lax.pmean(loss, "data")
            new_mstate = jax.tree.map(lambda s: jax.lax.pmean(s, "data"), new_mstate)
        updates, new_opt = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        new_ts = TrainState(
            params=new_params,
            model_state=new_mstate,
            opt_state=new_opt,
            step=ts.step + 1,
        )
        return new_ts, loss

    if mesh is None:
        return jax.jit(step_core, donate_argnums=(0,))

    sharded = jax.shard_map(
        step_core,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step(model_config: GINConfig, loss_fn: Callable, mesh: Mesh | None = None):
    """Loss-only step (no dropout, no grads) for validation."""

    def eval_core(ts: TrainState, batch, rng):
        if mesh is not None:
            batch = jax.tree.map(lambda x: jnp.squeeze(x, 0), batch)
        loss, _ = loss_fn_eval(model_config, ts.params, ts.model_state, batch)
        if mesh is not None:
            loss = jax.lax.pmean(loss, "data")
        return loss

    def loss_fn_eval(cfg, params, mstate, batch):
        # re-run the training loss without rng (train=False path inside
        # forward is selected by rng=None)
        return loss_fn(cfg, params, mstate, batch, None)

    if mesh is None:
        return jax.jit(eval_core)
    return jax.jit(
        jax.shard_map(
            eval_core,
            mesh=mesh,
            in_specs=(P(), P("data"), P()),
            out_specs=P(),
            check_vma=False,
        )
    )


class EarlyStopping:
    """Patience/min-delta tracker keeping the best params
    (training/early_stopping.py:5-37 semantics)."""

    def __init__(self, patience: int = 5, min_delta: float = 0.001):
        self.patience = patience
        self.min_delta = min_delta
        self.counter = 0
        self.best_loss: float | None = None
        self.early_stop = False
        self.best_params = None
        self.best_model_state = None

    def __call__(self, val_loss: float, ts: TrainState):
        if self.best_loss is None or val_loss < self.best_loss - self.min_delta:
            self.best_loss = val_loss
            # device_get: the train step donates its TrainState, so device
            # references into old params would be invalidated
            self.best_params = jax.device_get(ts.params)
            self.best_model_state = jax.device_get(ts.model_state)
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
