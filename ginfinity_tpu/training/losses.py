"""Training losses, as fixed-shape masked array ops.

Semantics follow the reference exactly:

- triplet: ``nn.TripletMarginLoss(margin, p=2)`` (training/triplet_loss.py)
- regression: MSE between embedding distance head outputs and targets
- alignment-contrastive (training/alignment_loss.py:61-307): positive
  ``mean(1 - cos)`` over cross-graph same-label conserved pairs, plus a
  supervised InfoNCE over a node subset with temperature-scaled cosine
  logits, where non-matching-label pairs (including intra-graph) are
  negatives, plus an optional soft margin penalty on negative sims.
  NOTE the margin compares against the TEMPERATURE-SCALED similarities
  (cos/T), exactly like the reference (alignment_loss.py:250 builds
  sim_matrix already divided by temperature and :302-304 thresholds
  that) — a "cosine-scale" margin value must be divided by T.

The reference mines pairs and samples negatives dynamically on device
(dynamic shapes); here the *subset selection* happens on the host
(seeded, see training/data.py) and the device sees fixed-size
``[M]``-shaped label/graph/category/mask arrays -> everything under jit
is static-shaped mask algebra.

The reference's secondary negative subsampling (``max_negatives`` with
an 85% hard-negative quota, alignment_loss.py:213-243) is applied at
batch-assembly time on the host — see
:func:`ginfinity_tpu.training.data.subsample_negatives` — so the device
loss below always sees the already-selected subset.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def triplet_loss(anchor, positive, negative, margin: float = 1.0, eps: float = 1e-6):
    """torch.nn.TripletMarginLoss(margin, p=2) semantics (with its eps
    inside the norm for gradient stability at 0)."""
    d_ap = jnp.sqrt(jnp.sum((anchor - positive) ** 2, axis=1) + eps)
    d_an = jnp.sqrt(jnp.sum((anchor - negative) ** 2, axis=1) + eps)
    return jnp.mean(jnp.maximum(d_ap - d_an + margin, 0.0))


def regression_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


@dataclasses.dataclass(frozen=True)
class AlignmentLossConfig:
    margin: float = 0.0
    temperature: float = 0.1
    eps: float = 1e-8


def alignment_contrastive_loss(
    embeddings: jnp.ndarray,  # [M, D] gathered subset node embeddings
    labels: jnp.ndarray,  # [M] int32 alignment labels
    graph_ids: jnp.ndarray,  # [M] int32
    categories: jnp.ndarray,  # [M] int32 (0-5; <3 = conserved)
    valid: jnp.ndarray,  # [M] float32 (0 for padding)
    cfg: AlignmentLossConfig = AlignmentLossConfig(),
) -> jnp.ndarray:
    x = embeddings / jnp.maximum(
        jnp.linalg.norm(embeddings, axis=1, keepdims=True), cfg.eps
    )
    m = x.shape[0]
    cos = x @ x.T  # [M, M]

    vpair = (valid[:, None] > 0) & (valid[None, :] > 0)
    not_diag = ~jnp.eye(m, dtype=bool)
    same_label = labels[:, None] == labels[None, :]
    same_graph = graph_ids[:, None] == graph_ids[None, :]
    conserved = categories < 3
    cons_pair = conserved[:, None] & conserved[None, :]

    positive_mask = same_label & (~same_graph) & cons_pair & vpair & not_diag
    negative_mask = (~same_label) & vpair & not_diag

    n_pos = jnp.sum(positive_mask)
    has_pos = n_pos > 0

    # positive term: mean(1 - cos) over positive pairs
    pos_loss = jnp.sum(jnp.where(positive_mask, 1.0 - cos, 0.0)) / jnp.maximum(n_pos, 1)

    # InfoNCE with temperature-scaled cosine logits
    logits = cos / jnp.maximum(cfg.temperature, 1e-8)
    valid_mask = positive_mask | negative_mask
    neg_inf = jnp.finfo(logits.dtype).min
    masked = jnp.where(valid_mask, logits, neg_inf)
    row_max = jnp.max(masked, axis=1, keepdims=True)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    exp = jnp.where(valid_mask, jnp.exp(masked - row_max), 0.0)
    logsumexp = jnp.log(jnp.maximum(jnp.sum(exp, axis=1, keepdims=True), 1e-38)) + row_max
    log_probs = logits - logsumexp
    nce = -jnp.sum(jnp.where(positive_mask, log_probs, 0.0)) / jnp.maximum(n_pos, 1)

    # soft margin penalty on (scaled) negative similarities
    if cfg.margin > 0.0:
        n_neg = jnp.maximum(jnp.sum(negative_mask), 1)
        penalty = jnp.sum(jnp.where(negative_mask, jnp.maximum(logits - cfg.margin, 0.0), 0.0)) / n_neg
        nce = nce + penalty

    total = pos_loss + nce
    return jnp.where(has_pos, total, 0.0)
