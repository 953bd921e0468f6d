"""Backward pass for the fused EdgeTransition kernel (custom VJP).

Forward saves only the kernel inputs; the backward kernel rematerializes the
two hidden activations per pair tile in VMEM and produces input gradients plus
weight/bias/LayerNorm gradients. Cross-tile weight-gradient accumulation uses
the TPU grid's sequential execution: the accumulator blocks map every program
to the same output block, initialized at the first program and added to
thereafter.

Wired up via `fused_edge_transition_vjp` (jax.custom_vjp); equivalence with
`jax.grad` of the XLA EdgeTransition is pinned in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pepflowww_tpu.models import pallas_edge
from pepflowww_tpu.models.pallas_common import edge_row_tile, resolve_interpret


def _bwd_kernel(edge_ref, node_ref, mask_ref, g_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                ln_scale_ref, ln_bias_ref,
                d_edge_ref, d_node_ref, d_w1_ref, d_b1_ref, d_w2_ref, d_b2_ref,
                d_w3_ref, d_b3_ref, d_scale_ref, d_bias_ref,
                *, k_i: int, L: int, CZ: int, CB: int, Hd: int, eps: float):
    f32 = jnp.float32
    # GEMM inputs run in the forward's compute dtype (bf16 in production —
    # fp32 feeds the v5e MXU at 1/4 rate and tripled this kernel's runtime;
    # it also matches the values the bf16 forward actually produced).
    cd = w1_ref.dtype
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    first_p = pl.program_id(1) == 0

    # Loads/broadcasts in fp32 (a bf16 (K_I, 1, CB) broadcast intermediate is
    # a packed-sublane shape cast Mosaic cannot lower); GEMM inputs cast to cd.
    e = edge_ref[0].astype(f32)                       # (P, CZ)
    node = node_ref[0].astype(f32)                    # (L, CB)
    i0 = pl.multiple_of(pl.program_id(1) * k_i, k_i)
    node_i = node_ref[0, pl.ds(i0, k_i), :].astype(f32)
    # Pair-mask tile (K_I, L) of the (B, L, L) outer-product mask
    # (see pallas_edge._kernel for why it is not flattened to (B, L², 1)).
    # Applied on a (K_I, L, CZ) view — a (K_I, L)->(K_I*L, 1) reshape would be
    # a lane->sublane cast Mosaic cannot lower.
    mask3 = mask_ref[0].astype(f32)                   # (K_I, L)
    g = g_ref[0].astype(f32)                          # (P, CZ)

    P = k_i * L
    ni_b = jnp.broadcast_to(node_i[:, None, :], (k_i, L, CB)).reshape(P, CB)
    nj_b = jnp.broadcast_to(node[None, :, :], (k_i, L, CB)).reshape(P, CB)
    x_cat = jnp.concatenate([e, ni_b, nj_b], axis=-1)  # (P, Hd), fp32
    Hp = w1_ref.shape[-1]
    if Hp != Hd:
        # Hidden width padded to the next 128 multiple (full MXU lanes);
        # padded channels stay exactly zero through ReLU and the residual.
        x_pad = jnp.concatenate(
            [x_cat, jnp.zeros((P, Hp - Hd), x_cat.dtype)], axis=-1
        )
    else:
        x_pad = x_cat
    x_cat_c = x_cat.astype(cd)                        # (P, Hd) — w1 input

    w1 = w1_ref[:]
    w2 = w2_ref[:]
    w3 = w3_ref[:]

    # ---- recompute forward (GEMMs in cd, accumulation/statistics fp32) ----
    a1 = jnp.dot(x_cat_c, w1, preferred_element_type=f32) + b1_ref[:].astype(f32)
    h1 = jax.nn.relu(a1)
    a2 = jnp.dot(h1.astype(cd), w2, preferred_element_type=f32) + b2_ref[:].astype(f32)
    h2 = jax.nn.relu(a2)
    r = h2 + x_pad
    o = jnp.dot(r.astype(cd), w3, preferred_element_type=f32) + b3_ref[:].astype(f32)
    mu = jnp.mean(o, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(o - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y = (o - mu) * inv

    # ---- backward ----
    CZo = g.shape[-1]
    g_out = (g.reshape(k_i, L, CZo) * mask3[:, :, None]).reshape(k_i * L, CZo)
    scale = ln_scale_ref[:].astype(f32)
    d_scale = jnp.sum(g_out * y, axis=0, keepdims=True)
    d_bias = jnp.sum(g_out, axis=0, keepdims=True)
    dy = g_out * scale
    # LayerNorm backward (per row over the feature axis of width CZ)
    m1 = jnp.mean(dy, axis=-1, keepdims=True)
    m2 = jnp.mean(dy * y, axis=-1, keepdims=True)
    do = (dy - m1 - y * m2) * inv

    do_c = do.astype(cd)
    dr = jnp.dot(do_c, w3.T, preferred_element_type=f32)
    d_w3 = jnp.dot(r.astype(cd).T, do_c, preferred_element_type=f32)
    d_b3 = jnp.sum(do, axis=0, keepdims=True)

    da2 = dr * (a2 > 0)
    da2_c = da2.astype(cd)
    d_w2 = jnp.dot(h1.astype(cd).T, da2_c, preferred_element_type=f32)
    d_b2 = jnp.sum(da2, axis=0, keepdims=True)
    dh1 = jnp.dot(da2_c, w2.T, preferred_element_type=f32)

    da1 = dh1 * (a1 > 0)
    da1_c = da1.astype(cd)
    d_w1 = jnp.dot(x_cat_c.T, da1_c, preferred_element_type=f32)
    d_b1 = jnp.sum(da1, axis=0, keepdims=True)
    # input grad: first-layer path (w1 rows span only the real features)
    # plus the residual path (real channels of dr)
    dx = jnp.dot(da1_c, w1.T, preferred_element_type=f32)[:, :Hd] + dr[:, :Hd]

    d_edge_ref[0] = dx[:, :CZ].reshape(k_i, L, CZ).astype(d_edge_ref.dtype)
    # node grads: sum the i-contribution over j and the j-contribution over i
    d_ni = jnp.sum(dx[:, CZ:CZ + CB].reshape(k_i, L, CB), axis=1)     # (K_I, CB)
    d_nj = jnp.sum(dx[:, CZ + CB:].reshape(k_i, L, CB), axis=0)       # (L, CB)

    @pl.when(first_p)
    def _():
        d_node_ref[0] = jnp.zeros_like(d_node_ref[0])

    d_node_ref[0, pl.ds(i0, k_i), :] += d_ni.astype(d_node_ref.dtype)
    d_node_ref[0] += d_nj.astype(d_node_ref.dtype)

    @pl.when(first)
    def _():
        d_w1_ref[...] = jnp.zeros_like(d_w1_ref)
        d_b1_ref[...] = jnp.zeros_like(d_b1_ref)
        d_w2_ref[...] = jnp.zeros_like(d_w2_ref)
        d_b2_ref[...] = jnp.zeros_like(d_b2_ref)
        d_w3_ref[...] = jnp.zeros_like(d_w3_ref)
        d_b3_ref[...] = jnp.zeros_like(d_b3_ref)
        d_scale_ref[...] = jnp.zeros_like(d_scale_ref)
        d_bias_ref[...] = jnp.zeros_like(d_bias_ref)

    d_w1_ref[...] += d_w1.astype(d_w1_ref.dtype)
    d_b1_ref[...] += d_b1.astype(d_b1_ref.dtype)
    d_w2_ref[...] += d_w2.astype(d_w2_ref.dtype)
    d_b2_ref[...] += d_b2.astype(d_b2_ref.dtype)
    d_w3_ref[...] += d_w3.astype(d_w3_ref.dtype)
    d_b3_ref[...] += d_b3.astype(d_b3_ref.dtype)
    d_scale_ref[...] += d_scale.astype(d_scale_ref.dtype)
    d_bias_ref[...] += d_bias.astype(d_bias_ref.dtype)


def edge_transition_bwd(edge, node_bias, node_mask, params, g,
                        eps: float = 1e-5, k_i=None, dtype=jnp.float32,
                        interpret: bool | None = None):
    """Gradients of the fused EdgeTransition w.r.t. (edge, node_bias, params).

    `dtype` is the GEMM-input dtype (the forward's compute dtype); gradients
    accumulate in fp32 regardless.
    """
    interpret = resolve_interpret(interpret)
    B, L, _, CZ = edge.shape
    CB = node_bias.shape[-1]
    Hd = CZ + 2 * CB

    if k_i is None:
        # Tile sweep (profiled on v5e at flagship dims, padded hidden):
        # 512 rows -> 2.06 ms, 1024 -> 1.73, 2048 -> 1.67 per call; 2048 still
        # fits the 16 MB scoped-vmem limit with the bf16 GEMM-input interior
        # at CZ=64 — wider models scale the row budget down proportionally.
        k_i = edge_row_tile(L, CZ)
    if k_i is None:
        raise ValueError(
            f"no Mosaic-legal row tile within the VMEM budget at L={L} "
            f"CZ={CZ}; callers must pre-check pallas_common.edge_row_tile "
            "and use the XLA path")
    grid = (B, L // k_i)
    tile_p = k_i * L

    f32 = jnp.float32
    edge_flat = edge.reshape(B, L * L, CZ)
    nm = node_mask.astype(f32)
    pair_mask = nm[:, :, None] * nm[:, None, :]
    g_flat = g.reshape(B, L * L, CZ)  # native dtype; upcast per tile in VMEM

    # Pad the hidden width to the next 128 multiple so the big GEMMs use full
    # MXU lanes (mirrors the forward kernel); padded-channel grads crop below.
    Hp = ((Hd + 127) // 128) * 128
    w1 = params["k1"].astype(dtype)
    b1 = params["b1"].reshape(1, -1).astype(f32)
    w2 = params["k2"].astype(dtype)
    b2 = params["b2"].reshape(1, -1).astype(f32)
    w3 = params["k3"].astype(dtype)
    if Hp != Hd:
        pad = Hp - Hd
        w1 = jnp.pad(w1, ((0, 0), (0, pad)))
        b1 = jnp.pad(b1, ((0, 0), (0, pad)))
        w2 = jnp.pad(w2, ((0, pad), (0, pad)))
        b2 = jnp.pad(b2, ((0, 0), (0, pad)))
        w3 = jnp.pad(w3, ((0, pad), (0, 0)))

    kernel = functools.partial(_bwd_kernel, k_i=k_i, L=L, CZ=CZ, CB=CB, Hd=Hd,
                               eps=eps)
    full = lambda *i: (0, 0)

    out_shapes = (
        jax.ShapeDtypeStruct((B, L, L, CZ), edge.dtype),  # d_edge
        jax.ShapeDtypeStruct((B, L, CB), f32),       # d_node
        jax.ShapeDtypeStruct((Hd, Hp), f32),         # d_w1
        jax.ShapeDtypeStruct((1, Hp), f32),
        jax.ShapeDtypeStruct((Hp, Hp), f32),         # d_w2
        jax.ShapeDtypeStruct((1, Hp), f32),
        jax.ShapeDtypeStruct((Hp, CZ), f32),         # d_w3
        jax.ShapeDtypeStruct((1, CZ), f32),
        jax.ShapeDtypeStruct((1, CZ), f32),          # d_scale
        jax.ShapeDtypeStruct((1, CZ), f32),          # d_bias
    )
    out_specs = (
        pl.BlockSpec((1, k_i, L, CZ), lambda b, p: (b, p, 0, 0)),
        pl.BlockSpec((1, L, CB), lambda b, p: (b, 0, 0)),
        pl.BlockSpec((Hd, Hp), full), pl.BlockSpec((1, Hp), full),
        pl.BlockSpec((Hp, Hp), full), pl.BlockSpec((1, Hp), full),
        pl.BlockSpec((Hp, CZ), full), pl.BlockSpec((1, CZ), full),
        pl.BlockSpec((1, CZ), full), pl.BlockSpec((1, CZ), full),
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_p, CZ), lambda b, p: (b, p, 0)),
            pl.BlockSpec((1, L, CB), lambda b, p: (b, 0, 0)),
            pl.BlockSpec((1, k_i, L), lambda b, p: (b, p, 0)),
            pl.BlockSpec((1, tile_p, CZ), lambda b, p: (b, p, 0)),
            pl.BlockSpec((Hd, Hp), full), pl.BlockSpec((1, Hp), full),
            pl.BlockSpec((Hp, Hp), full), pl.BlockSpec((1, Hp), full),
            pl.BlockSpec((Hp, CZ), full), pl.BlockSpec((1, CZ), full),
            pl.BlockSpec((1, CZ), full), pl.BlockSpec((1, CZ), full),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        edge_flat.astype(dtype), node_bias.astype(dtype), pair_mask,
        g_flat,
        w1, b1, w2, b2, w3,
        params["b3"].reshape(1, -1).astype(f32),
        params["ln_scale"].reshape(1, -1).astype(f32),
        params["ln_bias"].reshape(1, -1).astype(f32),
    )
    (d_edge, d_node, d_w1, d_b1, d_w2, d_b2, d_w3, d_b3, d_scale, d_bias) = outs
    d_params = {
        "k1": d_w1[:, :Hd], "b1": d_b1[0, :Hd],
        "k2": d_w2[:Hd, :Hd], "b2": d_b2[0, :Hd],
        "k3": d_w3[:Hd], "b3": d_b3[0],
        "ln_scale": d_scale[0], "ln_bias": d_bias[0],
    }
    return d_edge, d_node, d_params


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_edge_transition_vjp(edge, node_bias, node_mask, params,
                              dtype=jnp.bfloat16, interpret=None):
    return pallas_edge.fused_edge_transition(
        edge, node_bias, node_mask, params, dtype=dtype, interpret=interpret
    )


def _fwd(edge, node_bias, node_mask, params, dtype, interpret):
    out = pallas_edge.fused_edge_transition(
        edge, node_bias, node_mask, params, dtype=dtype, interpret=interpret
    )
    return out, (edge, node_bias, node_mask, params)


def _bwd(dtype, interpret, res, g):
    edge, node_bias, node_mask, params = res
    d_edge, d_node, d_params = edge_transition_bwd(
        edge, node_bias, node_mask, params, g=g, dtype=dtype, interpret=interpret
    )
    return (d_edge.astype(edge.dtype), d_node.astype(node_bias.dtype), None, d_params)


fused_edge_transition_vjp.defvjp(_fwd, _bwd)
