"""Pallas TPU kernel: the ENTIRE aligned window encoder in one program.

The aligned fused path (fast_windows._forward_windows_aligned) is
activation-traffic bound: each of the 6 GINE layers makes several HBM
round-trips over the [C, 2L, H] activation slab (BASELINE.md roofline,
~37 ms/layer on the bench corpus).  This kernel holds a block of CB
windows VMEM-resident across ALL layers — message shifts, the base-pair
one-hot matmul, both MLP matmuls, GraphNorm, residuals, the zscore_l2
node norm, pooling, and the fc head — so each activation leaves VMEM
exactly once (as the pooled embedding).

Scope: the packaged flagship config family (standard encoding,
GraphNorm, residual, zscore_l2 + normalize-before-pool, mean/add pool,
H=128) — gated by :func:`pallas_windows_ok`; other configs use the XLA
path.  On by default (``GINFINITY_PALLAS_WINDOWS=0`` opts out); parity
verified on TPU to 1.5e-6 max abs vs the XLA path at HIGHEST matmul
precision, and in interpret mode on CPU (tests/test_pallas_windows.py).
Measured: 76.7k vs 55.7k emb/s device-only on the bench corpus.

Replaces (reference): the device hot loop of gin_model.py:244-264 for
the window pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CB = 8  # windows per kernel block


def pallas_windows_ok(config) -> bool:
    return (
        config.norm_type == "graph"
        and config.use_residual
        and config.pooling_type in ("global_add_pool", "global_mean_pool")
        and config.node_embed_norm in ("none", "l2", "zscore", "zscore_l2")
        and len(set(config.hidden_dims)) == 1
        and config.hidden_dims[0] == 128
        and config.output_dim == 128
    )


def _kernel(x0_ref, jloc_ref, bp_ref, pull_ref, fwdw_ref, fwdp_ref,
            mlp_w_ref, mlp_b_ref, eb_ref, gn_ref, zs_ref, fc_ref,
            out_ref, *, L, n_layers, mean_pool, norm_mode, precision):
    f32 = jnp.float32
    # f32 inputs on the MXU default to a bf16 pass; parity with the XLA
    # path's HIGHEST precision needs it set explicitly (measured 8.8e-3
    # max abs embedding error without it)
    mm = dict(preferred_element_type=f32, precision=precision)
    H = 128
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    m_next = (pos <= L - 2).astype(f32)
    m_prev = (pos >= 1).astype(f32)

    for w in range(_CB):
        x = x0_ref[w]                        # [2L, H] f32
        jl = jloc_ref[w, :L]                 # [L] i32
        bp = bp_ref[w, :L][:, None]          # [L, 1] f32
        pulled = pull_ref[w, :L][:, None]
        fwdw = fwdw_ref[w, :L][:, None]
        fwdp = fwdp_ref[w, :L][:, None]
        # one-hot partner matrix (static across layers)
        G = (col_ids == jl[:, None]).astype(f32) * bp
        mask = jnp.concatenate(
            [jnp.ones((L, 1), f32), pulled], axis=0
        )                                    # [2L, 1]
        cnt = jnp.float32(L) + jnp.sum(pulled)

        for i in range(n_layers):
            h_in = x
            eb_next = eb_ref[i, 0][None, :]
            eb_prev = eb_ref[i, 1][None, :]
            eb_f = eb_ref[i, 2][None, :]
            eb_b = eb_ref[i, 3][None, :]
            xw = x[:L]
            xp = x[L:]
            zrow = jnp.zeros((1, H), f32)
            x_next = jnp.concatenate([xw[1:], zrow], axis=0)
            x_prev = jnp.concatenate([zrow, xw[:-1]], axis=0)
            agg_w = (
                jnp.maximum(x_next + eb_next, 0.0) * m_next
                + jnp.maximum(x_prev + eb_prev, 0.0) * m_prev
            )
            xj = jnp.dot(G, xw, **mm)
            e_w = fwdw * eb_f + (1.0 - fwdw) * eb_b
            agg_w = agg_w + jnp.maximum(xj + e_w, 0.0) * bp
            agg_w = agg_w + jnp.maximum(xp + e_w, 0.0) * pulled
            e_p = fwdp * eb_f + (1.0 - fwdp) * eb_b
            agg_p = jnp.maximum(xw + e_p, 0.0) * pulled
            agg = jnp.concatenate([agg_w, agg_p], axis=0)

            one_plus_eps = gn_ref[i, 3][None, :]
            h = one_plus_eps * x + agg
            h = jnp.maximum(
                jnp.dot(h, mlp_w_ref[2 * i], **mm)
                + mlp_b_ref[2 * i, 0][None, :], 0.0,
            )
            h = jnp.maximum(
                jnp.dot(h, mlp_w_ref[2 * i + 1], **mm)
                + mlp_b_ref[2 * i + 1, 0][None, :], 0.0,
            )
            # GraphNorm over this window's nodes
            mean = jnp.sum(h * mask, axis=0, keepdims=True) / cnt
            out = h - mean * gn_ref[i, 2][None, :]
            var = jnp.sum(out * out * mask, axis=0, keepdims=True) / cnt
            h = (
                gn_ref[i, 0][None, :] * out * jax.lax.rsqrt(var + 1e-5)
                + gn_ref[i, 1][None, :]
            )
            x = h + h_in

        # node norm before pooling (zscore and/or l2, per norm_mode)
        if norm_mode in ("zscore", "zscore_l2"):
            x = (x - zs_ref[0][None, :]) / (zs_ref[1][None, :] + 1e-6)
        if norm_mode in ("l2", "zscore_l2"):
            nrm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
            x = x / jnp.maximum(nrm, 1e-6)
        pooled = jnp.sum(x * mask, axis=0, keepdims=True)   # [1, H]
        if mean_pool:
            pooled = pooled / cnt
        out_ref[w] = (
            jnp.dot(pooled, fc_ref[:H], **mm) + fc_ref[H][None, :]
        )[0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "n_layers", "mean_pool", "norm_mode", "precision", "interpret"
    ),
)
def _pallas_forward(x0, jloc, bp, pulled, fwdw, fwdp, mlp_w, mlp_b, eb, gn,
                    zs, fc, L, n_layers, mean_pool, norm_mode,
                    precision="highest", interpret=False):
    C = x0.shape[0]
    H = 128
    grid = (C // _CB,)

    def win_spec(feat_shape):
        return pl.BlockSpec(
            (_CB,) + feat_shape, lambda i: (i,) + (0,) * len(feat_shape),
            memory_space=pltpu.VMEM,
        )

    def full_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    kernel = functools.partial(
        _kernel, L=L, n_layers=n_layers, mean_pool=mean_pool,
        norm_mode=norm_mode,
        precision=(
            jax.lax.Precision.HIGHEST
            if precision == "highest"
            else jax.lax.Precision.DEFAULT
        ),
    )
    Lp = jloc.shape[1]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            win_spec((2 * L, H)),
            win_spec((Lp,)),
            win_spec((Lp,)),
            win_spec((Lp,)),
            win_spec((Lp,)),
            win_spec((Lp,)),
            full_spec(mlp_w.shape),
            full_spec(mlp_b.shape),
            full_spec(eb.shape),
            full_spec(gn.shape),
            full_spec(zs.shape),
            full_spec(fc.shape),
        ],
        out_specs=win_spec((H,)),
        out_shape=jax.ShapeDtypeStruct((C, H), jnp.float32),
        interpret=interpret,
    )(x0, jloc, bp, pulled, fwdw, fwdp, mlp_w, mlp_b, eb, gn, zs, fc)


def pack_params(config, params, state):
    """Host/XLA-side packing of model parameters into the kernel's
    VMEM-friendly layouts (done once per call; tiny)."""
    from ginfinity_tpu.models.gine import _dense, _prec

    prec = _prec(config)
    n = config.gin_layers
    H = 128
    mlp_w = jnp.stack(
        [params["convs"][i][k]["kernel"] for i in range(n) for k in ("mlp0", "mlp1")]
    )
    mlp_b = jnp.stack(
        [
            jnp.zeros((8, H), jnp.float32).at[0].set(
                params["convs"][i][k]["bias"]
            )
            for i in range(n)
            for k in ("mlp0", "mlp1")
        ]
    )
    # [adj_from_next, adj_from_prev, bp_fwd, bp_bwd] in the model's edge
    # layout (standard 4-dim or forgi 7-dim)
    from ginfinity_tpu.graphs.build import window_edge_const_rows

    attrs = jnp.asarray(
        window_edge_const_rows(config.edge_feature_dim), jnp.float32
    )
    eb = jnp.stack(
        [
            jnp.zeros((8, H), jnp.float32).at[:4].set(
                _dense(attrs, params["convs"][i]["edge_lin"], prec)
            )
            for i in range(n)
        ]
    )
    gn = jnp.stack(
        [
            jnp.zeros((8, H), jnp.float32)
            .at[0].set(params["norms"][i]["weight"])
            .at[1].set(params["norms"][i]["bias"])
            .at[2].set(params["norms"][i]["mean_scale"])
            .at[3].set(
                jnp.broadcast_to(1.0 + params["convs"][i]["eps"], (H,))
            )
            for i in range(n)
        ]
    )
    zs = (
        jnp.zeros((8, H), jnp.float32)
        .at[0].set(jnp.asarray(state.get("node_mu", jnp.zeros(H))))
        .at[1].set(jnp.asarray(state.get("node_sigma", jnp.ones(H))))
    )
    fc = jnp.concatenate(
        [params["fc"]["kernel"], params["fc"]["bias"][None, :]], axis=0
    )  # [H+1, H]
    return mlp_w, mlp_b, eb, gn, zs, fc


def forward_windows_pallas(config, params, state, x0, j_local, bp_in, pulled,
                           fwd_into_w, fwd_into_p, L, interpret=False):
    """Kernel entry: x0 [C, 2L, H] post-node-encoder activations; the
    [C, L] mask/index arrays are padded to 128 lanes here."""
    C = x0.shape[0]
    pad = 128 - L if L < 128 else (-L) % 128
    if pad:
        padw = lambda a: jnp.pad(a, ((0, 0), (0, pad)))
    else:
        padw = lambda a: a
    packs = pack_params(config, params, state)
    return _pallas_forward(
        x0, padw(j_local).astype(jnp.int32), padw(bp_in), padw(pulled),
        padw(fwd_into_w), padw(fwd_into_p), *packs,
        L=L, n_layers=config.gin_layers,
        mean_pool=config.pooling_type == "global_mean_pool",
        norm_mode=(
            config.node_embed_norm
            if config.normalize_nodes_before_pool
            else "none"
        ),
        precision=config.matmul_precision,
        interpret=interpret,
    )
