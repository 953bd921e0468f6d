"""Invariant Point Attention trunk blocks.

TPU-first re-implementation of the reference trunk components
(`models_con/ipa_pytorch.py` in Ced3-han/PepFlowww — itself modified OpenFold):

* InvariantPointAttention (AF2 Alg. 22 with pair bias, softplus head weights
  and the c_z/4 pair readout, ipa_pytorch.py:251-484)
* StructureModuleTransition (:184-206)
* EdgeTransition (:209-248)
* BackboneUpdate 6-D update head (:544-571)
* a torch-compatible post-LN TransformerEncoder (ga.py:52-62)

Performance notes:
* All attention math is batched einsums over static shapes (MXU-tiled).
* Point attention uses the ||q||²+||k||²-2qk expansion instead of
  materializing the reference's (B, L, L, H, P, 3) displacement tensor
  (ipa_pytorch.py:407) — the dominant HBM traffic in the block.
* `dtype=bfloat16` runs every large matmul in bf16 with fp32 accumulation
  (params stay fp32); frame geometry, softmax logits, and layer norms stay
  fp32.
* EdgeTransition's first layer is computed factorized: the kernel slices for
  the two broadcast node-bias blocks multiply (B, L, c) activations instead
  of the (B, L, L, 2c) concat — ~2/3 fewer L² FLOPs in that layer with
  bit-identical parameters (residual and later layers unchanged).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pepflowww_tpu.models.layers import INITIALIZERS, Linear
from pepflowww_tpu.ops import rot9

Dtype = Any


def _dense(x, kernel, bias, dt):
    """nn.Dense-equivalent on raw kernel/bias arrays (same dot_general and
    dtype-promotion semantics as Linear(dtype=dt))."""
    if dt is not None:
        x, kernel, bias = x.astype(dt), kernel.astype(dt), bias.astype(dt)
    return jnp.einsum("...f,fk->...k", x, kernel) + bias


class StructureModuleTransition(nn.Module):
    c: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, s):
        s_initial = s
        s = nn.relu(Linear(self.c, init="relu", dtype=self.dtype)(s))
        s = nn.relu(Linear(self.c, init="relu", dtype=self.dtype)(s))
        s = Linear(self.c, init="final", dtype=self.dtype)(s)
        s = (s + s_initial).astype(jnp.float32)
        return nn.LayerNorm(epsilon=1e-5)(s)


class _DenseParams(nn.Module):
    """Bare kernel/bias container named like a Dense so the parameter tree
    (`.../Dense_0/{kernel,bias}`) matches the non-factorized layout."""

    features: int
    in_features: int
    init: str = "relu"

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", INITIALIZERS[self.init], (self.in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class _NamedDenseParams(nn.Module):
    """Wrapper giving the `Linear_k/Dense_0/{kernel,bias}` tree path while
    exposing the raw arrays (shared between the XLA and Pallas paths)."""

    features: int
    in_features: int
    init: str = "relu"

    @nn.compact
    def __call__(self):
        return _DenseParams(self.features, self.in_features, self.init,
                            name="Dense_0")()


class _LayerNormParams(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return scale, bias


class EdgeTransition(nn.Module):
    """Pair-feature MLP (ipa_pytorch.py:209-248).

    Holds its parameters as raw arrays (tree-compatible with a stack of Dense
    layers) so the same weights drive either the XLA graph or the fused Pallas
    kernel (`use_pallas`, inference path).
    """

    node_embed_size: int
    edge_embed_in: int
    edge_embed_out: int
    num_layers: int = 2
    node_dilation: int = 2
    dtype: Optional[Dtype] = None
    use_pallas: bool = False
    quant_int8: bool = False  # serving-only int8 pair GEMMs (forward kernel)

    @nn.compact
    def __call__(self, node_embed, edge_embed, node_mask=None,
                 fused_readout=None):
        """node_mask: (B, L); the pair mask is its outer product. Taking the
        node-level mask (not a materialized (B, L, L) one) lets the fused
        kernel form it in VMEM — an HBM pair mask's unit lane dim tile-pads
        128x on TPU (measured 0.19 ms/step of pure reshape at B=L=64).

        fused_readout: optional (kb, bb, kdz, bdz) — the NEXT block's
        linear_b / down_z weights. When given, this layer also returns the
        pair-resident readouts (b as (B, H, L, L), pair_z as (B, c_z/4, L,
        L)) computed from the output while it is still in VMEM (Pallas path)
        or via plain GEMMs (fallback), and the return value becomes
        ``(out, (b, pair_z))``. Forward-only — the sampler sets this; the
        training path must not (no VJP through the fused kernel)."""
        assert self.num_layers == 2
        c_bias = self.node_embed_size // self.node_dilation
        c_edge = self.edge_embed_in
        hidden = c_bias * 2 + c_edge
        cdt = self.dtype or jnp.float32

        k0, b0 = _NamedDenseParams(c_bias, self.node_embed_size, "relu", name="Linear_0")()
        k1, b1 = _NamedDenseParams(hidden, hidden, "relu", name="Linear_1")()
        k2, b2 = _NamedDenseParams(hidden, hidden, "relu", name="Linear_2")()
        k3, b3 = _NamedDenseParams(self.edge_embed_out, hidden, "final", name="Linear_3")()
        ln_scale, ln_bias = _LayerNormParams(self.edge_embed_out, name="LayerNorm_0")()

        node_bias = (
            jnp.einsum("blc,cf->blf", node_embed.astype(cdt), k0.astype(cdt))
            + b0.astype(cdt)
        )
        B, L, _ = node_bias.shape

        use_pallas = self.use_pallas and not self.is_initializing()
        if use_pallas:
            # Shapes with no Mosaic-legal row tile inside the VMEM budget
            # (wide CZ x large L, ADVICE r3) take the XLA graph instead.
            from pepflowww_tpu.models.pallas_common import edge_row_tile, warn_no_tile

            if edge_row_tile(L, c_edge) is None:
                warn_no_tile("fused_edge_transition", L, c_edge)
                use_pallas = False
        if use_pallas:
            mask = node_mask if node_mask is not None else jnp.ones((B, L))
            p = {"k1": k1, "b1": b1, "k2": k2, "b2": b2, "k3": k3, "b3": b3,
                 "ln_scale": ln_scale, "ln_bias": ln_bias}
            kdtype = cdt if self.dtype is not None else jnp.float32
            if self.quant_int8 or fused_readout is not None:
                # Forward-only kernel (no VJP): the int8 serving profile
                # and/or the pair-resident readout epilogue. The sampler
                # never differentiates; training configs must not reach here.
                from pepflowww_tpu.models.pallas_edge import fused_edge_transition

                res = fused_edge_transition(
                    edge_embed, node_bias, mask, p,
                    dtype=kdtype,
                    quant_int8=self.quant_int8,
                    readout=fused_readout,
                )
                if fused_readout is not None:
                    out, bro, pzo = res
                    return out, (bro, pzo)
                return res
            from pepflowww_tpu.models.pallas_edge_bwd import fused_edge_transition_vjp

            out = fused_edge_transition_vjp(
                edge_embed, node_bias, mask, p,
                cdt if self.dtype is not None else jnp.float32,
            )
            return out

        # ---- XLA path ----
        def factorized(kernel, bias, edge, node, acc_dtype):
            k = kernel.astype(cdt)
            y_e = jnp.einsum("bijc,cf->bijf", edge.astype(cdt), k[:c_edge],
                             preferred_element_type=acc_dtype)
            y_i = jnp.einsum("bic,cf->bif", node, k[c_edge:c_edge + c_bias])
            y_j = jnp.einsum("bjc,cf->bjf", node, k[c_edge + c_bias:])
            return y_e + y_i[:, :, None, :] + y_j[:, None, :, :] + bias.astype(cdt)

        x = nn.relu(factorized(k1, b1, edge_embed, node_bias, cdt))
        x = nn.relu(
            jnp.einsum("bijc,cf->bijf", x, k2.astype(cdt),
                       preferred_element_type=cdt) + b2.astype(cdt)
        )
        # Residual adds the concatenated input (ipa_pytorch.py:240-243);
        # the final projection of (x + concat) factorizes the same way.
        out = jnp.einsum("bijc,cf->bijf", x, k3.astype(cdt),
                         preferred_element_type=cdt)
        out = out + factorized(k3, b3, edge_embed, node_bias, cdt)

        out = out.astype(jnp.float32)
        mu = jnp.mean(out, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(out - mu), axis=-1, keepdims=True)
        out = (out - mu) * jax.lax.rsqrt(var + 1e-5)  # torch LayerNorm default eps
        out = out * ln_scale + ln_bias
        if node_mask is not None:
            edge_mask = node_mask[:, :, None] * node_mask[:, None, :]
            out = out * edge_mask[..., None].astype(out.dtype)
        # Keep the inter-block L² pair tensor in compute precision: it is the
        # biggest recurring HBM load (read by linear_b/down_z and the next
        # EdgeTransition every block); the LN statistics above stay fp32.
        out = out.astype(self.dtype) if self.dtype is not None else out
        if fused_readout is not None:
            # Kernel-less fallback (no Mosaic-legal tile / use_pallas off):
            # same readout contract, plain GEMMs + transposes.
            kb, bb, kdz, bdz = fused_readout
            bro = jnp.transpose(_dense(out, kb, bb, self.dtype), (0, 3, 1, 2))
            pzo = jnp.transpose(_dense(out, kdz, bdz, self.dtype), (0, 3, 1, 2))
            return out, (bro, pzo)
        return out


class BackboneUpdate(nn.Module):
    """6-D [(1,x,y,z) quat | translation] update head (ipa_pytorch.py:544-571).
    Kept fp32 — it feeds frame composition."""

    c_s: int

    @nn.compact
    def __call__(self, s):
        return Linear(6, init="final")(s.astype(jnp.float32))


class InvariantPointAttention(nn.Module):
    """AF2 Algorithm 22 (ipa_pytorch.py:251-484).

    Args mirror the reference ipa config: c_s, c_z, c_hidden, no_heads,
    no_qk_points, no_v_points.
    """

    c_s: int
    c_z: int
    c_hidden: int
    no_heads: int
    no_qk_points: int
    no_v_points: int
    inf: float = 1e5
    eps: float = 1e-8
    dtype: Optional[Dtype] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, s, z=None, R=None, t=None, mask=None, readouts=None,
                 readout_params_only=False):
        """
        Args:
            s: (B, L, c_s) single repr
            z: (B, L, L, c_z) pair repr
            R, t: backbone frames — either (B, L, 3, 3) / (B, L, 3) arrays or
                plane-form tuples (rot9.to9 / rot9.t_to3). The trunk passes
                planes (TPU tile layouts for (…, 3, 3) tensors waste ~28x the
                HBM bytes; see ops/rot9.py); array inputs are kept for API
                compatibility and converted here.
            mask: (B, L)
            readouts: optional pre-computed (b, pair_z) in transposed form —
                b (B, H, L, L), pair_z (B, c_z/4, L, L) — from the previous
                EdgeTransition's pair-resident readout epilogue. When given,
                this layer skips its own GEMMs over z.
            readout_params_only: create/return the raw (kb, bb, kdz, bdz)
                linear_b / down_z weights and do nothing else — the trunk
                hands these to the PREVIOUS block's EdgeTransition kernel.
        Returns:
            (B, L, c_s) update
        """
        H, C = self.no_heads, self.c_hidden
        Pq, Pv = self.no_qk_points, self.no_v_points
        dt = self.dtype

        # The pair readouts and the output projection hold their parameters
        # raw (tree-identical to Linear/Dense_0 — convert.py depends on the
        # names) so the production path can merge/split the GEMMs around them
        # without touching the checkpoint format.
        dz4 = self.c_z // 4
        # Input width follows the ACTUAL pair tensor (like nn.Dense shape
        # inference did): the first block's z is the embedder output whose
        # width (edge_embed_size) may differ from c_z. The params-only path
        # (blocks >= 1, whose z always comes from an EdgeTransition) is
        # c_z-wide by construction.
        zw = z.shape[-1] if z is not None else self.c_z
        kb, bb_ = _NamedDenseParams(H, zw, "default", name="linear_b")()
        kdz, bdz = _NamedDenseParams(dz4, zw, "default", name="down_z")()
        if readout_params_only:
            return kb, bb_, kdz, bdz

        if isinstance(R, (tuple, list)):
            r9 = tuple(R)
            t3 = tuple(t) if isinstance(t, (tuple, list)) else rot9.t_to3(t)
        else:
            r9 = rot9.to9(R.astype(jnp.float32))
            t3 = rot9.t_to3(t.astype(jnp.float32))
        B, L, _ = s.shape

        q_flat = Linear(H * C, name="linear_q", dtype=dt)(s)
        kv_flat = Linear(2 * H * C, name="linear_kv", dtype=dt)(s)
        qp_flat = Linear(H * Pq * 3, name="linear_q_points", dtype=dt)(s)
        kv_pts_flat = Linear(H * (Pq + Pv) * 3, name="linear_kv_points", dtype=dt)(s)

        cat_w = H * C + 4 * H * Pv + H * dz4
        kout, bout = _NamedDenseParams(self.c_s, cat_w, "final", name="linear_out")()

        head_weights = jax.nn.softplus(
            self.param(
                "head_weights",
                nn.initializers.constant(0.541324854612918),  # softplus⁻¹(1)
                (H,),
            )
        ) * math.sqrt(1.0 / (3 * (Pq * 9.0 / 2)))

        # Pair-tensor readouts: b (attention bias, H lanes) and pair_z (the
        # c_z/4 value readout). Separate GEMMs on purpose: a merged 24-lane
        # GEMM + lane slices measured NET NEGATIVE (+0.5 ms/step of layout
        # copies on the slices and an extra async copy of z itself — PERF.md
        # round-4 "output-path fusion A/B"). `b_t`/`pz_t` hold the transposed
        # forms the consumers want; the kernel epilogue supplies them
        # directly, the self-computed path transposes lazily at use.
        if readouts is not None:
            b_t, pz_t = readouts            # (B, H, L, L), (B, dz4, L, L)
            b = pair_z = None
        else:
            b = _dense(z, kb, bb_, dt)      # (B, L, L, H)
            pair_z = _dense(z, kdz, bdz, dt)
            b_t = jnp.transpose(b, (0, 3, 1, 2))
            pz_t = None

        if self.use_pallas and not self.is_initializing():
            # Fully fused interior (pallas_ipa2.py): frame transforms, logits,
            # point term, softmax and all three aggregations in one kernel
            # with a hand-written backward. Measured SLOWER than the XLA path
            # at the benchmark dims (PERF.md "The IPA kernel battle") — this
            # branch is the opt-in kernel, not the default.
            from pepflowww_tpu.models.pallas_ipa2 import fused_ipa2_vjp

            # The reference packs points as [x | y | z] blocks of H*P lanes
            # (ipa_pytorch.py:362-366) -> (B, H, 3, L, P) head-major planes.
            qp5 = jnp.transpose(
                qp_flat.reshape(B, L, 3, H, Pq), (0, 3, 2, 1, 4))
            kvp5 = jnp.transpose(
                kv_pts_flat.reshape(B, L, 3, H, Pq + Pv), (0, 3, 2, 1, 4))
            # Key-column mask only (the XLA branch masks the full mask_i *
            # mask_j outer product): outputs on PADDED QUERY ROWS diverge
            # between the two paths. Harmless — padded rows are masked
            # downstream and tests compare valid rows only — but know it
            # when diffing the branches row-by-row (ADVICE r2).
            maskb = (self.inf * (mask.astype(jnp.float32) - 1.0))[:, None, :]
            sw = jnp.sqrt(head_weights).reshape(1, H)
            R_mat = rot9.from9(r9)
            o, o_pt_xyz, o_pt_norm, o_pair = fused_ipa2_vjp(
                q_flat, kv_flat, qp5, kvp5,
                R_mat.astype(jnp.float32).reshape(B, L, 9), rot9.t_from3(t3),
                b_t, pair_z if pair_z is not None
                else jnp.transpose(pz_t, (0, 2, 3, 1)),
                maskb, sw, self.eps,
            )
            o_feats = jnp.concatenate([o, o_pt_xyz, o_pt_norm, o_pair], axis=-1)
            return _dense(o_feats, kout, bout, dt)
        else:
            kv = kv_flat.reshape(B, L, H, 2 * C)
            k, v = kv[..., :C], kv[..., C:]
            q = q_flat.reshape(B, L, H, C)

            # Point q/k/v in the global frame — fp32 geometry, coordinate-
            # major slab form. The reference packs point projections as
            # [x | y | z] blocks (ipa_pytorch.py:362-366), which is exactly
            # the layout rot9.rotate_points consumes: the rotation becomes
            # nine full-lane (B, L, H·P) multiplies instead of einsums over
            # trailing-3 tensors whose T(4,128) tiles waste ~28x HBM traffic
            # (the round-2 "trailing-3 copies" finding, fixed structurally).
            P = Pq + Pv
            gqx, gqy, gqz = rot9.rotate_points(r9, t3, qp_flat.astype(jnp.float32))
            gkx, gky, gkz = rot9.rotate_points(r9, t3, kv_pts_flat.astype(jnp.float32))
            kx = gkx.reshape(B, L, H, P)
            ky = gky.reshape(B, L, H, P)
            kz = gkz.reshape(B, L, H, P)

            # Head-major (d, p)-minor dot operands: the point-attention
            # contractions run as real (B, H)-batched MXU dots over 3P lanes
            # instead of VPU multiply-reduce over (B, L, H, P, 3) (measured
            # ~4x on the qk term at flagship dims).
            q3p = jnp.concatenate(
                [gqx.reshape(B, L, H, Pq), gqy.reshape(B, L, H, Pq),
                 gqz.reshape(B, L, H, Pq)], axis=-1)          # (B, L, H, 3Pq)
            k3p = jnp.concatenate(
                [kx[..., :Pq], ky[..., :Pq], kz[..., :Pq]], axis=-1)
            v3p = jnp.concatenate(
                [kx[..., Pq:], ky[..., Pq:], kz[..., Pq:]], axis=-1)  # (B,L,H,3Pv)

            a = jnp.einsum("bihc,bjhc->bhij", q, k,
                           preferred_element_type=jnp.float32) * math.sqrt(1.0 / (3 * C))
            a = a + math.sqrt(1.0 / 3) * b_t.astype(jnp.float32)

            # Point attention: -w/2 * sum_p ||q_ip - k_jp||², via the square
            # expansion to avoid the (B, L, L, H, P, 3) intermediate. Point
            # geometry must stay ~fp32 through the MXU: HIGHEST (6-pass) on
            # the fp32 parity path; HIGH (3-pass, ~19 mantissa bits — error
            # ~2^-18 relative vs the ~1e-2 logit accuracy the softmax needs)
            # on the bf16 production path, where HIGHEST measured 2x the cost
            # for no observable effect on the trained-oracle statistics.
            pt_prec = (jax.lax.Precision.HIGHEST if dt is None
                       else jax.lax.Precision.HIGH)
            q_sq = jnp.sum(jnp.square(q3p), axis=-1)  # (B, L, H)
            k_sq = jnp.sum(jnp.square(k3p), axis=-1)
            qk = jnp.einsum("bihc,bjhc->bhij", q3p, k3p,
                            precision=pt_prec,
                            preferred_element_type=jnp.float32)
            pt_att = (
                q_sq.transpose(0, 2, 1)[:, :, :, None]
                + k_sq.transpose(0, 2, 1)[:, :, None, :]
                - 2.0 * qk
            )
            pt_att = pt_att * head_weights[None, :, None, None] * (-0.5)

            square_mask = self.inf * (mask[:, :, None] * mask[:, None, :] - 1.0)
            a = a + pt_att + square_mask[:, None, :, :]
            a = jax.nn.softmax(a, axis=-1)

            if dt is not None:
                # Production (bf16) output path. Two structural moves vs the
                # parity path below (PERF.md round-4 traces):
                #  1. every output piece stays in its natural 4-D (B, L, H, ·)
                #     dot layout — no reshape-to-flat copies;
                #  2. linear_out is computed as a sum of per-piece GEMMs
                #     against row slices of the SAME kernel (bit-compatible
                #     parameters, K-dim reassociation only) — the 1536-wide
                #     concat plus its bf16 casts measured ~0.3 ms/step.
                # (A third move — merging the scalar/point aggregations into
                # one dot over concatenated value lanes — measured NET
                # NEGATIVE: XLA relayouts the 164-lane output, +0.26 ms.)
                a_c = a.astype(dt)
                o4 = jnp.einsum("bhij,bjhc->bihc", a_c, v,
                                preferred_element_type=jnp.float32)
                oo = jnp.einsum("bhij,bjhc->bihc", a, v3p,
                                precision=pt_prec,
                                preferred_element_type=jnp.float32)
                dxp = oo[..., :Pv] - t3[0][..., None, None]
                dyp = oo[..., Pv:2 * Pv] - t3[1][..., None, None]
                dzp = oo[..., 2 * Pv:] - t3[2][..., None, None]
                rr = [p[..., None, None] for p in r9]
                lx4 = rr[0] * dxp + rr[3] * dyp + rr[6] * dzp
                ly4 = rr[1] * dxp + rr[4] * dyp + rr[7] * dzp
                lz4 = rr[2] * dxp + rr[5] * dyp + rr[8] * dzp
                on4 = jnp.sqrt(lx4 * lx4 + ly4 * ly4 + lz4 * lz4 + self.eps)
                if pz_t is not None:
                    # j-contraction along the lane dim of the kernel-emitted
                    # (B, dz4, L, L) layout — no relayout of pair_z needed.
                    op4 = jnp.einsum("bhij,bdij->bihd", a_c, pz_t,
                                     preferred_element_type=jnp.float32)
                else:
                    op4 = jnp.einsum("bhij,bijd->bihd", a_c, pair_z,
                                     preferred_element_type=jnp.float32)
                # Row slices follow the reference concat order
                # (ipa_pytorch.py:475): o | o_pt x | y | z | norms | pair.
                kd = kout.astype(dt)
                s0 = H * C
                s1, s2, s3, s4 = (s0 + H * Pv, s0 + 2 * H * Pv,
                                  s0 + 3 * H * Pv, s0 + 4 * H * Pv)
                f32 = jnp.float32
                y = (jnp.einsum("blhc,hcf->blf", o4.astype(dt),
                                kd[:s0].reshape(H, C, self.c_s),
                                preferred_element_type=f32)
                     + jnp.einsum("blhp,hpf->blf", lx4.astype(dt),
                                  kd[s0:s1].reshape(H, Pv, self.c_s),
                                  preferred_element_type=f32)
                     + jnp.einsum("blhp,hpf->blf", ly4.astype(dt),
                                  kd[s1:s2].reshape(H, Pv, self.c_s),
                                  preferred_element_type=f32)
                     + jnp.einsum("blhp,hpf->blf", lz4.astype(dt),
                                  kd[s2:s3].reshape(H, Pv, self.c_s),
                                  preferred_element_type=f32)
                     + jnp.einsum("blhp,hpf->blf", on4.astype(dt),
                                  kd[s3:s4].reshape(H, Pv, self.c_s),
                                  preferred_element_type=f32)
                     + jnp.einsum("blhd,hdf->blf", op4.astype(dt),
                                  kd[s4:].reshape(H, dz4, self.c_s),
                                  preferred_element_type=f32))
                return (y + bout).astype(dt)

            # fp32 parity path — structure unchanged (separate HIGHEST point
            # aggregation from the fp32 attention matrix, reference-ordered
            # concat, single output GEMM).
            a_c = a
            o = jnp.einsum("bhij,bjhc->bihc", a_c, v,
                           preferred_element_type=jnp.float32).reshape(B, L, H * C)
            o3p = jnp.einsum("bhij,bjhc->bihc", a, v3p,
                             precision=pt_prec,
                             preferred_element_type=jnp.float32)  # fp32 geometry
            ox = o3p[..., :Pv].reshape(B, L, H * Pv)
            oy = o3p[..., Pv:2 * Pv].reshape(B, L, H * Pv)
            oz = o3p[..., 2 * Pv:].reshape(B, L, H * Pv)
            lx, ly, lz = rot9.unrotate_points(r9, t3, ox, oy, oz)
            o_pt_norm = jnp.sqrt(lx * lx + ly * ly + lz * lz + self.eps)

            if pz_t is not None:
                o_pair = jnp.einsum("bhij,bdij->bihd", a_c, pz_t,
                                    preferred_element_type=jnp.float32)
            else:
                o_pair = jnp.einsum("bhij,bijd->bihd", a_c, pair_z,
                                    preferred_element_type=jnp.float32)
            o_pair = o_pair.reshape(B, L, -1)

        # Concat layout matches the reference (ipa_pytorch.py:475): scalar out,
        # then the x/y/z coordinate blocks of o_pt (d-major — exactly the
        # lx/ly/lz slabs), point norms (h, p), pair readout.
        o_feats = jnp.concatenate(
            [o, lx, ly, lz, o_pt_norm, o_pair], axis=-1)
        return _dense(o_feats, kout, bout, None)


class TorchTransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer with batch_first, post-LN, ReLU FF
    (ga.py:53-60). `key_padding_mask` semantics: padded *keys* are excluded."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        B, L, D = x.shape
        h = self.nhead
        hd = D // h
        dt = self.dtype

        qkv = nn.Dense(3 * D, kernel_init=nn.initializers.xavier_uniform(),
                       dtype=dt, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, h, hd)
        k = k.reshape(B, L, h, hd)
        v = v.reshape(B, L, h, hd)

        logits = jnp.einsum("bihd,bjhd->bhij", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        if key_padding_mask is not None:
            neg = jnp.asarray(-1e9, logits.dtype)
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        attn_c = attn.astype(dt) if dt is not None else attn
        out = jnp.einsum("bhij,bjhd->bihd", attn_c, v,
                         preferred_element_type=jnp.float32).reshape(B, L, D)
        out = Linear(D, init="torch", name="out_proj", dtype=dt)(out)

        x = nn.LayerNorm(epsilon=1e-5, name="norm1")((x + out).astype(jnp.float32))
        ff = Linear(D, init="torch", name="linear2", dtype=dt)(
            nn.relu(Linear(self.dim_feedforward, init="torch", name="linear1",
                           dtype=dt)(x))
        )
        return nn.LayerNorm(epsilon=1e-5, name="norm2")((x + ff).astype(jnp.float32))


class TorchTransformerEncoder(nn.Module):
    d_model: int
    nhead: int
    num_layers: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        for i in range(self.num_layers):
            x = TorchTransformerEncoderLayer(
                self.d_model, self.nhead, self.d_model, dtype=self.dtype,
                name=f"layers_{i}",
            )(x, key_padding_mask)
        return x
