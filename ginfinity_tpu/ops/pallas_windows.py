"""Pallas TPU kernel: the ENTIRE aligned window encoder in one program.

The aligned fused path (fast_windows._forward_windows_aligned) is
activation-traffic bound: each GINE layer makes several HBM round-trips
over the [C, 2L, H] activation slab (BASELINE.md roofline, ~37 ms/layer
on the bench corpus).  This kernel holds a block of CB windows
VMEM-resident across ALL layers — message shifts, the base-pair one-hot
matmul, both MLP matmuls, GraphNorm, residuals, the zscore_l2 node
norm, pooling, and the fc head — so each activation leaves VMEM exactly
once (as the pooled embedding).

Scope: GraphNorm models with every layer width and the output dim a
multiple of 128 (MXU lane width) — gated by :func:`pallas_windows_ok`.
Layer widths may DIFFER per layer (e.g. the flagship alignment-training
config's 256,512,512,512 -> 512); residuals apply per layer exactly
when the in/out widths match, as in the XLA path.  The windows-per-
block CB adapts to the widest layer so weights + activations fit the
~16 MB VMEM (``_pick_cb``); configs that cannot fit even one window
fall back to the XLA path (forward returns None).  On by default
(``GINFINITY_PALLAS_WINDOWS=0`` opts out); parity verified on TPU to
1.5e-6 max abs vs the XLA path at HIGHEST matmul precision, and in
interpret mode on CPU (tests/test_pallas_windows.py).
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

# VMEM budget for the block-size heuristic: ~16 MB/core, minus slack for
# Mosaic's own scratch and the double-buffered input pipeline
_VMEM_BUDGET = 13 * 2**20


def layer_dims(config) -> tuple[tuple[int, int], ...]:
    """(in_width, out_width) per GINE layer — the same rule as
    models/gine.py init_params (layer 0 reads the node-encoder width)."""
    hd = config.hidden_dims
    return tuple(
        (hd[i - 1] if i > 0 else hd[0], hd[i]) for i in range(config.gin_layers)
    )


def pallas_windows_ok(config) -> bool:
    return (
        config.norm_type == "graph"
        and config.pooling_type in ("global_add_pool", "global_mean_pool")
        and config.node_embed_norm in ("none", "l2", "zscore", "zscore_l2")
        and all(h % 128 == 0 for h in config.hidden_dims)
        and config.output_dim % 128 == 0
    )


def _pick_cb(dims, out_dim: int, L: int) -> int | None:
    """Largest windows-per-block in {8,4,2,1} whose weights + live
    activations fit the VMEM budget; None = no fit, use the XLA path.

    Weights are full-block (resident once); the x0 input block is
    double-buffered by the grid pipeline; ~5 activation-sized arrays are
    live at the widest layer (x, h_in, h, agg halves), plus the [L, L]
    one-hot partner matrix per window."""
    wbytes = 4 * sum(di * do + do * do + 2 * 8 * do + 8 * di + 8 * do
                     for di, do in dims)
    h_last = dims[-1][1]
    wbytes += 4 * ((h_last + 1) * out_dim + 8 * h_last)
    h0 = dims[0][0]
    maxd = max(max(di, do) for di, do in dims)
    for cb in (8, 4, 2, 1):
        act = 4 * cb * (2 * L) * (2 * h0 + 5 * maxd) + 4 * cb * L * L
        if wbytes + act <= _VMEM_BUDGET:
            return cb
    return None


def _kernel(*refs, L, dims, mean_pool, norm_mode, use_res, precision, cb,
            eps):
    x0_ref, jloc_ref, bp_ref, pull_ref, fwdw_ref, fwdp_ref = refs[:6]
    n_layers = len(dims)
    lrefs = refs[6:6 + 5 * n_layers]
    zs_ref, fc_ref, out_ref = refs[6 + 5 * n_layers:]
    f32 = jnp.float32
    # f32 inputs on the MXU default to a bf16 pass; parity with the XLA
    # path's HIGHEST precision needs it set explicitly (measured 8.8e-3
    # max abs embedding error without it)
    mm = dict(preferred_element_type=f32, precision=precision)
    h_last = dims[-1][1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    m_next = (pos <= L - 2).astype(f32)
    m_prev = (pos >= 1).astype(f32)

    for w in range(cb):
        x = x0_ref[w]                        # [2L, h0] f32
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

        for i, (din, dout) in enumerate(dims):
            w0_ref, w1_ref, bb_ref, eb_ref, gn_ref = lrefs[5 * i:5 * i + 5]
            h_in = x
            eb_next = eb_ref[0][None, :]
            eb_prev = eb_ref[1][None, :]
            eb_f = eb_ref[2][None, :]
            eb_b = eb_ref[3][None, :]
            one_plus_eps = eb_ref[4][None, :]
            xw = x[:L]
            xp = x[L:]
            zrow = jnp.zeros((1, din), f32)
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

            h = one_plus_eps * x + agg
            h = jnp.maximum(
                jnp.dot(h, w0_ref[...], **mm) + bb_ref[0, 0][None, :], 0.0
            )
            h = jnp.maximum(
                jnp.dot(h, w1_ref[...], **mm) + bb_ref[1, 0][None, :], 0.0
            )
            # GraphNorm over this window's nodes
            mean = jnp.sum(h * mask, axis=0, keepdims=True) / cnt
            out = h - mean * gn_ref[2][None, :]
            var = jnp.sum(out * out * mask, axis=0, keepdims=True) / cnt
            h = (
                gn_ref[0][None, :] * out * jax.lax.rsqrt(var + 1e-5)
                + gn_ref[1][None, :]
            )
            x = h + h_in if (use_res and din == dout) else h

        # node norm before pooling (zscore and/or l2, per norm_mode);
        # eps is the checkpoint's config.eps — models/gine.py
        # apply_node_norm uses the same value, keeping parity for
        # checkpoints with a non-default epsilon
        if norm_mode in ("zscore", "zscore_l2"):
            x = (x - zs_ref[0][None, :]) / (zs_ref[1][None, :] + eps)
        if norm_mode in ("l2", "zscore_l2"):
            nrm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
            x = x / jnp.maximum(nrm, eps)
        pooled = jnp.sum(x * mask, axis=0, keepdims=True)   # [1, h_last]
        if mean_pool:
            pooled = pooled / cnt
        out_ref[w] = (
            jnp.dot(pooled, fc_ref[:h_last], **mm) + fc_ref[h_last][None, :]
        )[0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "dims", "mean_pool", "norm_mode", "use_res", "precision",
        "interpret", "cb", "eps",
    ),
)
def _pallas_forward(x0, jloc, bp, pulled, fwdw, fwdp, *packs, L, dims,
                    mean_pool, norm_mode, use_res, precision="highest",
                    interpret=False, cb=8, eps=1e-6):
    C = x0.shape[0]
    h0 = dims[0][0]
    out_dim = packs[-1].shape[1]
    grid = (C // cb,)

    def win_spec(feat_shape):
        return pl.BlockSpec(
            (cb,) + feat_shape, lambda i: (i,) + (0,) * len(feat_shape),
            memory_space=pltpu.VMEM,
        )

    def full_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    kernel = functools.partial(
        _kernel, L=L, dims=dims, mean_pool=mean_pool, norm_mode=norm_mode,
        use_res=use_res, cb=cb, eps=eps,
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
            win_spec((2 * L, h0)),
            win_spec((Lp,)),
            win_spec((Lp,)),
            win_spec((Lp,)),
            win_spec((Lp,)),
            win_spec((Lp,)),
        ] + [full_spec(a.shape) for a in packs],
        out_specs=win_spec((out_dim,)),
        out_shape=jax.ShapeDtypeStruct((C, out_dim), jnp.float32),
        interpret=interpret,
    )(x0, jloc, bp, pulled, fwdw, fwdp, *packs)


def pack_params(config, params, state):
    """Host/XLA-side packing of model parameters into the kernel's
    VMEM-friendly layouts (done once per call; tiny).  Per layer:
    mlp0/mlp1 kernels, the two biases stacked [2, 8, dout] (row 0 of
    each 8-row pad is live), edge rows [8, din] (rows 0-3 = the four
    constant edge-class embeddings, row 4 = 1+eps), GraphNorm rows
    [8, dout] (weight, bias, mean_scale); then the zscore stats and the
    fc head [h_last+1, out_dim]."""
    from ginfinity_tpu.graphs.build import window_edge_const_rows
    from ginfinity_tpu.models.gine import _dense, _prec

    prec = _prec(config)
    dims = layer_dims(config)
    # [adj_from_next, adj_from_prev, bp_fwd, bp_bwd] in the model's edge
    # layout (standard 4-dim or forgi 7-dim)
    attrs = jnp.asarray(
        window_edge_const_rows(config.edge_feature_dim), jnp.float32
    )
    packs = []
    for i, (din, dout) in enumerate(dims):
        conv = params["convs"][i]
        bb = (
            jnp.zeros((2, 8, dout), jnp.float32)
            .at[0, 0].set(conv["mlp0"]["bias"])
            .at[1, 0].set(conv["mlp1"]["bias"])
        )
        eb = (
            jnp.zeros((8, din), jnp.float32)
            .at[:4].set(_dense(attrs, conv["edge_lin"], prec))
            .at[4].set(jnp.broadcast_to(1.0 + conv["eps"], (din,)))
        )
        gn = (
            jnp.zeros((8, dout), jnp.float32)
            .at[0].set(params["norms"][i]["weight"])
            .at[1].set(params["norms"][i]["bias"])
            .at[2].set(params["norms"][i]["mean_scale"])
        )
        packs += [conv["mlp0"]["kernel"], conv["mlp1"]["kernel"], bb, eb, gn]
    h_last = dims[-1][1]
    zs = (
        jnp.zeros((8, h_last), jnp.float32)
        .at[0].set(jnp.asarray(state.get("node_mu", jnp.zeros(h_last))))
        .at[1].set(jnp.asarray(state.get("node_sigma", jnp.ones(h_last))))
    )
    fc = jnp.concatenate(
        [params["fc"]["kernel"], params["fc"]["bias"][None, :]], axis=0
    )  # [h_last+1, out_dim]
    return tuple(packs) + (zs, fc)


def forward_windows_pallas(config, params, state, x0, j_local, bp_in, pulled,
                           fwd_into_w, fwd_into_p, L, interpret=False):
    """Kernel entry: x0 [C, 2L, h0] post-node-encoder activations; the
    [C, L] mask/index arrays are padded to 128 lanes here.  Returns None
    when no block size fits VMEM (caller uses the XLA path)."""
    dims = layer_dims(config)
    cb = _pick_cb(dims, config.output_dim, L)
    if cb is None or x0.shape[0] % cb != 0:
        return None
    pad = 128 - L if L < 128 else (-L) % 128
    if pad:
        padw = lambda a: jnp.pad(a, ((0, 0), (0, pad)))
    else:
        padw = lambda a: a
    packs = pack_params(config, params, state)
    return _pallas_forward(
        x0, padw(j_local).astype(jnp.int32), padw(bp_in), padw(pulled),
        padw(fwd_into_w), padw(fwd_into_p), *packs,
        L=L, dims=dims,
        mean_pool=config.pooling_type == "global_mean_pool",
        norm_mode=(
            config.node_embed_norm
            if config.normalize_nodes_before_pool
            else "none"
        ),
        use_res=config.use_residual,
        precision=config.matmul_precision,
        interpret=interpret,
        cb=cb,
        eps=float(config.eps),
    )
