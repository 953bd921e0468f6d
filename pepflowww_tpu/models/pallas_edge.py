"""Fused EdgeTransition Pallas kernel.

The pair-feature MLP (ipa_pytorch.py:209-248) is the sampler's bandwidth
bottleneck: per block it streams L²-pair activations of width 192 through HBM
four times (first layer, second layer, residual concat, final projection).
This kernel runs the whole chain — factorized concat matmul, two ReLU layers,
residual, output projection, LayerNorm, pair mask — on VMEM-resident tiles of
pairs, so HBM sees only the 64-wide input read and the 64-wide output write
(~12x less traffic than the XLA graph).

Layout: pairs (i, j) flatten to P = L² rows, tiled TILE_P = K_I·L rows per
program (K_I consecutive i values, all j). The node-bias contributions are
computed on the (K_I + L) node rows and broadcast in-kernel — they never touch
HBM at pair resolution. The final Linear's kernel is split the same way as the
first layer's, so the residual-concat term folds into four small matmuls.

Weights arrive in compute dtype; accumulation and LayerNorm statistics are
fp32. Matches the XLA EdgeTransition to bf16 tolerance (tests/test_pallas.py);
used on the inference path (`use_pallas` in IPAConfig) — training takes the
XLA graph (autodiff).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pepflowww_tpu.models.pallas_common import edge_row_tile, resolve_interpret


def _quant_rows(x, limit=127.0):
    """Symmetric per-row int8 quantization of a (P, N) fp32 tile.

    Returns (q_int8, row_scale_f32[P, 1]); all-zero rows get scale 0 (their
    products dequantize to exact 0)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    inv = jnp.where(amax > 0, limit / amax, 0.0)
    q = jnp.round(x * inv).astype(jnp.int8)
    return q, amax / limit


def _kernel(edge_ref, node_ref, mask_ref,
            w1e_ref, w1i_ref, w1j_ref, b1_ref,
            w2_ref, b2_ref,
            w3h_ref, w3e_ref, w3i_ref, w3j_ref, b3_ref,
            ln_scale_ref, ln_bias_ref,
            *refs, k_i: int, L: int, eps: float, quant_int8: bool,
            int8_w3: bool = True, readout: bool = False):
    if quant_int8:
        # w2/w3h arrive int8 with per-output-channel scales (quantized once
        # outside; XLA hoists that out of the sampler's scan — the weights
        # are loop-invariant).
        if int8_w3:
            w2s_ref, w3hs_ref, *refs = refs
        else:
            w2s_ref, *refs = refs
    if readout:
        kb_ref, bb_ref, kdz_ref, bdz_ref, out_ref, b_out_ref, pz_out_ref = refs
    else:
        (out_ref,) = refs
    f32 = jnp.float32
    e = edge_ref[0]              # (TILE_P, CZ)
    node = node_ref[0]           # (L, CB) — all nodes of this batch row
    i0 = pl.multiple_of(pl.program_id(1) * k_i, k_i)
    node_i = node_ref[0, pl.ds(i0, k_i), :]             # (K_I, CB) ref slice

    # First layer, factorized (cf. models/ipa.py::_FactorizedConcatDense).
    y_e = jnp.dot(e, w1e_ref[:], preferred_element_type=f32)          # (TILE_P, H)
    y_i = jnp.dot(node_i, w1i_ref[:], preferred_element_type=f32)     # (K_I, H)
    y_j = jnp.dot(node, w1j_ref[:], preferred_element_type=f32)       # (L, H)
    H = y_e.shape[-1]
    y_i_b = jnp.broadcast_to(y_i[:, None, :], (k_i, L, H)).reshape(k_i * L, H)
    y_j_b = jnp.broadcast_to(y_j[None, :, :], (k_i, L, H)).reshape(k_i * L, H)
    h = jax.nn.relu(y_e + y_i_b + y_j_b + b1_ref[:].astype(f32))

    if quant_int8:
        # The two Hp-wide GEMMs (85% of kernel FLOPs) on the int8 MXU:
        # dynamic per-row activation scales x static per-channel weight
        # scales, int32 accumulation. See PERF.md: the quantize passes cost
        # more than the int8 MXU saves at these dims (opt-in only).
        hq, hs = _quant_rows(h)
        acc = jnp.dot(hq, w2_ref[:], preferred_element_type=jnp.int32)
        h = jax.nn.relu(
            acc.astype(f32) * hs * w2s_ref[:].astype(f32)
            + b2_ref[:].astype(f32)
        )
    else:
        h = jax.nn.relu(
            jnp.dot(h.astype(w2_ref.dtype), w2_ref[:], preferred_element_type=f32)
            + b2_ref[:].astype(f32)
        )

    # Final projection of (h + concat), with the concat term factorized too.
    if quant_int8 and int8_w3:
        hq3, hs3 = _quant_rows(h)
        acc3 = jnp.dot(hq3, w3h_ref[:], preferred_element_type=jnp.int32)
        o = acc3.astype(f32) * hs3 * w3hs_ref[:].astype(f32)
    else:
        o = jnp.dot(h.astype(w3h_ref.dtype), w3h_ref[:], preferred_element_type=f32)
    o = o + jnp.dot(e, w3e_ref[:], preferred_element_type=f32)
    oi = jnp.dot(node_i, w3i_ref[:], preferred_element_type=f32)      # (K_I, CZ)
    oj = jnp.dot(node, w3j_ref[:], preferred_element_type=f32)        # (L, CZ)
    CZ = o.shape[-1]
    o = o + jnp.broadcast_to(oi[:, None, :], (k_i, L, CZ)).reshape(k_i * L, CZ)
    o = o + jnp.broadcast_to(oj[None, :, :], (k_i, L, CZ)).reshape(k_i * L, CZ)
    o = o + b3_ref[:].astype(f32)

    # LayerNorm over the feature axis (fp32 statistics).
    mu = jnp.mean(o, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(o - mu), axis=-1, keepdims=True)
    o = (o - mu) * jax.lax.rsqrt(var + eps)
    o = o * ln_scale_ref[:].astype(f32) + ln_bias_ref[:].astype(f32)

    # Pair mask arrives as a (K_I, L) tile of the (B, L, L) outer-product mask
    # — the old (B, L², 1) flattening tile-padded its unit lane dim 128x
    # (measured 0.19 ms/step of reshape plus 5 padded DMAs per denoise).
    pair = mask_ref[0].astype(f32)                      # (K_I, L)
    o = o.reshape(k_i, L, -1) * pair[:, :, None]
    out_ref[0] = o.astype(out_ref.dtype)                # (K_I, L, CZ) block

    if readout:
        # Pair-resident readout of the NEXT block's linear_b / down_z while
        # the output tile is still in VMEM — the two IPA pair GEMMs otherwise
        # re-read the whole (B, L, L, CZ) tensor from HBM (2x 33 MB/block at
        # flagship dims). Emitted pre-transposed — b as (H, i, j), pair_z as
        # (dz4, i, j) — which is the orientation their consumers (the logit
        # bias add and the j-contracting o_pair dot) want, and which keeps
        # the lane dim at L instead of tile-padding an 8/16-wide one 16x.
        # The dot_general contracts the weight's input axis against the
        # tile's feature axis so the transposed result needs no VPU shuffle.
        # Emitted as (·, K_I·L) flat-lane tiles — splitting the lane dim
        # in-kernel is a Mosaic-illegal shape cast; the caller bitcast-
        # reshapes (B, ·, L²) -> (B, ·, L, L) for free in XLA.
        ob = o.reshape(k_i * L, -1).astype(out_ref.dtype)
        bt = jax.lax.dot_general(
            kb_ref[:], ob, (((0,), (1,)), ((), ())),
            preferred_element_type=f32)                 # (H_ipa, K_I*L)
        bt = bt + bb_ref[:].astype(f32).reshape(-1, 1)
        b_out_ref[0] = bt.astype(b_out_ref.dtype)
        pzt = jax.lax.dot_general(
            kdz_ref[:], ob, (((0,), (1,)), ((), ())),
            preferred_element_type=f32)                 # (dz4, K_I*L)
        pzt = pzt + bdz_ref[:].astype(f32).reshape(-1, 1)
        pz_out_ref[0] = pzt.astype(pz_out_ref.dtype)


def _quant_cols(w):
    """Symmetric per-output-channel int8 quantization of a (K, N) weight."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)   # (1, N)
    inv = jnp.where(amax > 0, 127.0 / amax, 0.0)
    return jnp.round(w * inv).astype(jnp.int8), amax / 127.0


def fused_edge_transition(
    edge: jax.Array,        # (B, L, L, CZ)
    node_bias: jax.Array,   # (B, L, CB) — output of the initial node Linear
    node_mask: jax.Array,   # (B, L) — pair mask is its outer product
    params: dict,           # flax EdgeTransition params (Linear_1..3, LayerNorm_0)
    num_layers: int = 2,
    dtype=jnp.bfloat16,
    eps: float = 1e-5,  # torch LayerNorm default, matches the XLA path
    k_i: Optional[int] = None,
    quant_int8: bool = False,
    int8_w3: bool = True,
    interpret: bool | None = None,
    readout: Optional[tuple] = None,
) -> jax.Array:
    """Apply the fused kernel; numerically equivalent to the XLA EdgeTransition
    (post node-bias Linear) at compute precision `dtype`.

    `quant_int8`: the two Hp-wide GEMMs run int8xint8->int32 on the MXU with
    dynamic per-row activation scales and static per-channel weight scales;
    the 64-wide edge/node contractions, accumulation, LayerNorm and mask stay
    in `dtype`/fp32. Quality is oracle-gated (tests/test_sampler_parity.py
    int8 profile) and forward-only. MEASURED SLOWER than bf16 on v5e at the
    flagship dims (0.74 vs 0.60 ms/call; the in-kernel row-max/round/convert
    VPU passes cost more than the int8 MXU saves — PERF.md "int8 pair
    kernels"): kept opt-in for chips/dims where the balance shifts, NOT the
    default serving profile."""
    interpret = resolve_interpret(interpret)
    assert num_layers == 2, "kernel fuses the 2-layer reference configuration"
    B, L, _, CZ = edge.shape
    CB = node_bias.shape[-1]
    Hd = CZ + 2 * CB

    w1 = params["k1"].astype(dtype)
    b1 = params["b1"].reshape(1, -1)
    w2 = params["k2"].astype(dtype)
    b2 = params["b2"].reshape(1, -1)
    w3 = params["k3"].astype(dtype)
    b3 = params["b3"].reshape(1, -1)
    ln_scale = params["ln_scale"].reshape(1, -1)
    ln_bias = params["ln_bias"].reshape(1, -1)

    # Zero-pad the hidden width to the next 128 multiple so the two big GEMMs
    # run on fully aligned MXU tiles (ReLU(0)=0 keeps the math identical).
    Hp = ((Hd + 127) // 128) * 128
    if Hp != Hd:
        pad = Hp - Hd
        w1 = jnp.pad(w1, ((0, 0), (0, pad)))
        b1 = jnp.pad(b1, ((0, 0), (0, pad)))
        w2 = jnp.pad(w2, ((0, pad), (0, pad)))
        b2 = jnp.pad(b2, ((0, 0), (0, pad)))
        w3 = jnp.pad(w3, ((0, pad), (0, 0)))

    w1e, w1i, w1j = w1[:CZ], w1[CZ:CZ + CB], w1[CZ + CB:]
    w3e, w3i, w3j = w3[:CZ], w3[CZ:CZ + CB], w3[CZ + CB:]
    w3h = w3

    w2s = w3hs = None
    if quant_int8:
        # quantize from the ORIGINAL fp32 weights (not the bf16 casts)
        w2q = jnp.pad(params["k2"], ((0, Hp - Hd), (0, Hp - Hd))) if Hp != Hd else params["k2"]
        w2, w2s = _quant_cols(w2q)
        if int8_w3:
            w3q = jnp.pad(params["k3"], ((0, Hp - Hd), (0, 0))) if Hp != Hd else params["k3"]
            w3h, w3hs = _quant_cols(w3q)

    if k_i is None:
        # ~2048 pair rows per tile keeps every intermediate comfortably in
        # VMEM at the flagship CZ=64; tile sweeps (512..4096 rows) measured
        # within ±3% end-to-end, with 2048 best. Wider models scale the row
        # budget down (the 2x-width probe's CZ=128 backward overflowed the
        # 16 MB scoped-vmem limit at 2048 rows).
        k_i = edge_row_tile(L, CZ)
    if k_i is None:
        raise ValueError(
            f"no Mosaic-legal row tile within the VMEM budget at L={L} "
            f"CZ={CZ}; callers must pre-check pallas_common.edge_row_tile "
            "and use the XLA path")
    assert L % k_i == 0, (L, k_i)
    grid = (B, L // k_i)
    tile_p = k_i * L

    edge_flat = edge.reshape(B, L * L, CZ).astype(dtype)
    nm = node_mask.astype(dtype)
    pair_mask = nm[:, :, None] * nm[:, None, :]         # (B, L, L), lane dim L
    node_bias = node_bias.astype(dtype)

    kernel = functools.partial(_kernel, k_i=k_i, L=L, eps=eps,
                               quant_int8=quant_int8, int8_w3=int8_w3,
                               readout=readout is not None)

    full = lambda *idx: (0, 0)
    in_specs = [
        pl.BlockSpec((1, tile_p, CZ), lambda b, p: (b, p, 0)),
        pl.BlockSpec((1, L, CB), lambda b, p: (b, 0, 0)),
        pl.BlockSpec((1, k_i, L), lambda b, p: (b, p, 0)),
        # weights: whole-array blocks, identical for every program
        pl.BlockSpec((CZ, Hp), full), pl.BlockSpec((CB, Hp), full),
        pl.BlockSpec((CB, Hp), full), pl.BlockSpec((1, Hp), full),
        pl.BlockSpec((Hp, Hp), full), pl.BlockSpec((1, Hp), full),
        pl.BlockSpec((Hp, CZ), full), pl.BlockSpec((CZ, CZ), full),
        pl.BlockSpec((CB, CZ), full), pl.BlockSpec((CB, CZ), full),
        pl.BlockSpec((1, CZ), full),
        pl.BlockSpec((1, CZ), full), pl.BlockSpec((1, CZ), full),
    ]
    operands = [
        edge_flat, node_bias, pair_mask,
        w1e, w1i, w1j, b1, w2, b2, w3h, w3e, w3i, w3j, b3, ln_scale, ln_bias,
    ]
    if quant_int8:
        in_specs += [pl.BlockSpec((1, Hp), full)]
        operands += [w2s]
        if int8_w3:
            in_specs += [pl.BlockSpec((1, CZ), full)]
            operands += [w3hs]

    # 4-D output blocks: emitting (B, L², CZ) + reshape made XLA assign a
    # batch-minor layout to the custom-call result at B=128 (B exactly
    # fills a lane tile) and copy the full pair tensor 5x/step.
    out_specs = [pl.BlockSpec((1, k_i, L, CZ), lambda b, p: (b, p, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((B, L, L, CZ), dtype)]
    if readout is not None:
        kb, bb, kdz, bdz = readout
        H_ipa, DZ = kb.shape[1], kdz.shape[1]
        in_specs += [
            pl.BlockSpec((CZ, H_ipa), full), pl.BlockSpec((1, H_ipa), full),
            pl.BlockSpec((CZ, DZ), full), pl.BlockSpec((1, DZ), full),
        ]
        operands += [kb.astype(dtype), bb.reshape(1, -1),
                     kdz.astype(dtype), bdz.reshape(1, -1)]
        out_specs += [
            pl.BlockSpec((1, H_ipa, tile_p), lambda b, p: (b, 0, p)),
            pl.BlockSpec((1, DZ, tile_p), lambda b, p: (b, 0, p)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((B, H_ipa, L * L), dtype),
            jax.ShapeDtypeStruct((B, DZ, L * L), dtype),
        ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if readout is not None else out_specs[0],
        out_shape=out_shape if readout is not None else out_shape[0],
        interpret=interpret,
    )(*operands)
    if readout is not None:
        z_out, bflat, pzflat = out
        return (z_out,
                bflat.reshape(B, -1, L, L),    # row-major split: free bitcast
                pzflat.reshape(B, -1, L, L))
    return out
