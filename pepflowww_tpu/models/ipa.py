"""Invariant Point Attention trunk blocks.

TPU-first re-implementation of the reference trunk components
(`models_con/ipa_pytorch.py` in Ced3-han/PepFlowww — itself modified OpenFold):

* InvariantPointAttention (AF2 Alg. 22 with pair bias, softplus head weights
  and the c_z/4 pair readout, ipa_pytorch.py:251-484)
* StructureModuleTransition (:184-206)
* EdgeTransition (:209-248)
* BackboneUpdate 6-D update head (:544-571)
* a torch-compatible post-LN TransformerEncoder (ga.py:52-62)

All attention math is expressed as batched einsums over static shapes so XLA
tiles it onto the MXU; the point attention uses the ||q||²+||k||²-2qk expansion
rather than materializing the (B, L, L, H, P, 3) displacement tensor the
reference builds (ipa_pytorch.py:407), cutting the dominant HBM traffic.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pepflowww_tpu.models.layers import Linear
from pepflowww_tpu.ops import frames


class StructureModuleTransition(nn.Module):
    c: int

    @nn.compact
    def __call__(self, s):
        s_initial = s
        s = nn.relu(Linear(self.c, init="relu")(s))
        s = nn.relu(Linear(self.c, init="relu")(s))
        s = Linear(self.c, init="final")(s)
        s = s + s_initial
        return nn.LayerNorm()(s)


class EdgeTransition(nn.Module):
    node_embed_size: int
    edge_embed_in: int
    edge_embed_out: int
    num_layers: int = 2
    node_dilation: int = 2

    @nn.compact
    def __call__(self, node_embed, edge_embed):
        bias_embed_size = self.node_embed_size // self.node_dilation
        node_embed = Linear(bias_embed_size, init="relu")(node_embed)
        B, L, _ = node_embed.shape
        edge_bias = jnp.concatenate(
            [
                jnp.broadcast_to(node_embed[:, :, None, :], (B, L, L, bias_embed_size)),
                jnp.broadcast_to(node_embed[:, None, :, :], (B, L, L, bias_embed_size)),
            ],
            axis=-1,
        )
        hidden_size = bias_embed_size * 2 + self.edge_embed_in
        edge_embed = jnp.concatenate([edge_embed, edge_bias], axis=-1)
        x = edge_embed
        for _ in range(self.num_layers):
            x = nn.relu(Linear(hidden_size, init="relu")(x))
        edge_embed = Linear(self.edge_embed_out, init="final")(x + edge_embed)
        return nn.LayerNorm()(edge_embed)


class BackboneUpdate(nn.Module):
    """6-D [(1,x,y,z) quat | translation] update head (ipa_pytorch.py:544-571)."""

    c_s: int

    @nn.compact
    def __call__(self, s):
        return Linear(6, init="final")(s)


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

    @nn.compact
    def __call__(self, s, z, R, t, mask):
        """
        Args:
            s: (B, L, c_s) single repr
            z: (B, L, L, c_z) pair repr
            R, t: (B, L, 3, 3) / (B, L, 3) backbone frames
            mask: (B, L)
        Returns:
            (B, L, c_s) update
        """
        B, L, _ = s.shape
        H, C = self.no_heads, self.c_hidden
        Pq, Pv = self.no_qk_points, self.no_v_points

        q = Linear(H * C, name="linear_q")(s).reshape(B, L, H, C)
        kv = Linear(2 * H * C, name="linear_kv")(s).reshape(B, L, H, 2 * C)
        k, v = kv[..., :C], kv[..., C:]

        # Point q/k/v in global frame. The reference packs points as
        # (..., H*P, 3) via a split-stack (ipa_pytorch.py:362-366): the layer
        # output is [x-block | y-block | z-block], so reshape accordingly.
        def to_points(x, P):
            x = x.reshape(B, L, 3, H * P)            # [3 coord blocks, H*P each]
            x = jnp.swapaxes(x, -1, -2)              # (B, L, H*P, 3)
            return frames.local_to_global(R, t, x).reshape(B, L, H, P, 3)

        q_pts = to_points(Linear(H * Pq * 3, name="linear_q_points")(s), Pq)
        kv_pts_flat = Linear(H * (Pq + Pv) * 3, name="linear_kv_points")(s)
        kv_pts = kv_pts_flat.reshape(B, L, 3, H * (Pq + Pv))
        kv_pts = jnp.swapaxes(kv_pts, -1, -2)
        kv_pts = frames.local_to_global(R, t, kv_pts).reshape(B, L, H, Pq + Pv, 3)
        k_pts, v_pts = kv_pts[..., :Pq, :], kv_pts[..., Pq:, :]

        # Scalar attention + pair bias.
        b = Linear(H, name="linear_b")(z)  # (B, L, L, H)
        a = jnp.einsum("bihc,bjhc->bhij", q, k) * math.sqrt(1.0 / (3 * C))
        a = a + math.sqrt(1.0 / 3) * jnp.transpose(b, (0, 3, 1, 2))

        # Point attention: -w/2 * sum_p ||q_ip - k_jp||², via the square
        # expansion to avoid the (B, L, L, H, P, 3) intermediate.
        head_weights = jax.nn.softplus(
            self.param(
                "head_weights",
                nn.initializers.constant(0.541324854612918),  # softplus⁻¹(1)
                (H,),
            )
        ) * math.sqrt(1.0 / (3 * (Pq * 9.0 / 2)))
        q_sq = jnp.sum(jnp.square(q_pts), axis=-1)              # (B, L, H, P)
        k_sq = jnp.sum(jnp.square(k_pts), axis=-1)
        qk = jnp.einsum("bihpc,bjhpc->bhij", q_pts, k_pts)      # (B, H, L, L)
        pt_att = (
            jnp.sum(q_sq, axis=-1).transpose(0, 2, 1)[:, :, :, None]
            + jnp.sum(k_sq, axis=-1).transpose(0, 2, 1)[:, :, None, :]
            - 2.0 * qk
        )
        # per-head weighting folds into the summed distance
        pt_att = pt_att * head_weights[None, :, None, None] * (-0.5)

        square_mask = self.inf * (mask[:, :, None] * mask[:, None, :] - 1.0)
        a = a + pt_att + square_mask[:, None, :, :]
        a = jax.nn.softmax(a, axis=-1)

        # Outputs.
        o = jnp.einsum("bhij,bjhc->bihc", a, v).reshape(B, L, H * C)
        o_pt = jnp.einsum("bhij,bjhpc->bihpc", a, v_pts)        # (B, L, H, Pv, 3)
        o_pt = frames.global_to_local(R, t, o_pt.reshape(B, L, H * Pv, 3))
        o_pt_norm = jnp.sqrt(jnp.sum(jnp.square(o_pt), axis=-1) + self.eps)  # (B, L, H*Pv)

        pair_z = Linear(self.c_z // 4, name="down_z")(z)        # (B, L, L, c_z/4)
        o_pair = jnp.einsum("bhij,bijd->bihd", a, pair_z).reshape(B, L, -1)

        # Concat layout matches the reference (ipa_pytorch.py:475): scalar out,
        # then the x/y/z coordinate blocks of o_pt, point norms, pair readout.
        o_pt_xyz = jnp.swapaxes(o_pt, -1, -2).reshape(B, L, 3 * H * Pv)
        o_feats = jnp.concatenate([o, o_pt_xyz, o_pt_norm, o_pair], axis=-1)
        return Linear(self.c_s, init="final", name="linear_out")(o_feats)


class TorchTransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer with batch_first, post-LN, ReLU FF
    (ga.py:53-60). `key_padding_mask` semantics: padded *keys* are excluded."""

    d_model: int
    nhead: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        B, L, D = x.shape
        h = self.nhead
        hd = D // h

        qkv_kernel = nn.initializers.xavier_uniform()
        qkv = nn.Dense(3 * D, kernel_init=qkv_kernel, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, h, hd)
        k = k.reshape(B, L, h, hd)
        v = v.reshape(B, L, h, hd)

        logits = jnp.einsum("bihd,bjhd->bhij", q, k) / math.sqrt(hd)
        if key_padding_mask is not None:
            neg = jnp.asarray(-1e9, logits.dtype)
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, L, D)
        out = Linear(D, init="torch", name="out_proj")(out)

        x = nn.LayerNorm(name="norm1")(x + out)
        ff = Linear(D, init="torch", name="linear2")(
            nn.relu(Linear(self.dim_feedforward, init="torch", name="linear1")(x))
        )
        return nn.LayerNorm(name="norm2")(x + ff)


class TorchTransformerEncoder(nn.Module):
    d_model: int
    nhead: int
    num_layers: int

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        for i in range(self.num_layers):
            x = TorchTransformerEncoderLayer(
                self.d_model, self.nhead, self.d_model, name=f"layers_{i}"
            )(x, key_padding_mask)
        return x
