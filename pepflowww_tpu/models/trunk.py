"""GAEncoder — the geometric-attention denoising trunk.

Re-implements `models_con/ga.py` from the reference: mixes node features with
current-sequence / time / torsion-angle embeddings, runs num_blocks of
{IPA → LayerNorm → seq transformer → zero-init projection → transition →
6-D backbone frame update → edge transition}, and reads out predicted frames,
torsion angles (wrapped to [0, 2π)) and sequence logits.
"""

from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax.numpy as jnp

from pepflowww_tpu.models.layers import AngularEncoding, Linear, MLP, get_time_embedding
from pepflowww_tpu.models.ipa import (
    BackboneUpdate,
    EdgeTransition,
    InvariantPointAttention,
    StructureModuleTransition,
    TorchTransformerEncoder,
)
from pepflowww_tpu.ops import rot9
from pepflowww_tpu.parallel import tp


@dataclasses.dataclass(frozen=True)
class IPAConfig:
    """Mirrors configs/learn_angle.yaml:5-15. `dtype` selects the compute
    precision of the heavy matmuls (None = fp32, "bfloat16" for TPU speed);
    parameters, geometry, softmax and layer norms always stay fp32."""

    c_s: int = 128
    c_z: int = 64
    c_hidden: int = 128
    no_heads: int = 8
    no_qk_points: int = 8
    no_v_points: int = 12
    seq_tfmr_num_heads: int = 4
    seq_tfmr_num_layers: int = 2
    num_blocks: int = 6
    dtype: str | None = None
    use_pallas: bool = False
    # Selects the fully fused IPA interior (models/pallas_ipa2.py: in-kernel
    # frame transforms + attention + hand-written backward). Correct and
    # gradient-tested, but measured SLOWER than the XLA einsum path at the
    # benchmark dims (see PERF.md "The IPA kernel battle"): the interior is
    # instruction-latency bound and XLA's batched einsums win. Kept opt-in
    # for future chips/dims where the balance shifts.
    use_pallas_ipa: bool = False
    # int8 pair GEMMs in the EdgeTransition kernels (dynamic per-row
    # activation scaling, forward-only — never set for training). Correct
    # and oracle-gated, but MEASURED SLOWER than bf16 on v5e at the flagship
    # dims (PERF.md "int8 pair kernels": quantize VPU passes outweigh the
    # int8 MXU saving). Opt-in for future chips/dims only.
    quant_int8: bool = False

    def __post_init__(self):
        if self.quant_int8 and not self.use_pallas:
            # The int8 branch lives inside the fused Pallas kernel; without
            # use_pallas it would silently run the plain XLA path and the
            # oracle-gated int8 quality claim wouldn't cover what actually
            # ran (ADVICE r3).
            raise ValueError(
                "IPAConfig(quant_int8=True) requires use_pallas=True — the "
                "int8 pair GEMMs exist only in the fused EdgeTransition kernel")

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype in ("bfloat16", "bf16") else None


class GAEncoder(nn.Module):
    """ga.py:15-126."""

    cfg: IPAConfig

    @nn.compact
    def __call__(self, t, rotmats_t, trans_t, angles_t, seqs_t, node_embed,
                 edge_embed, generate_mask, res_mask,
                 fused_pair_readout=False):
        """fused_pair_readout: sampler-only. Each EdgeTransition kernel also
        emits the NEXT block's linear_b/down_z readouts from its VMEM-resident
        output tile (pallas_edge.py), skipping two full HBM re-reads of the
        (B, L, L, c_z) pair tensor per block. Forward-only (no VJP) — the
        training path must leave it False."""
        cfg = self.cfg
        B, L = seqs_t.shape

        node_mask = res_mask.astype(node_embed.dtype)

        # Mix in current sequence, time, and current torsion angles (ga.py:94).
        angles_embedder = AngularEncoding(num_funcs=12)
        seq_embed = nn.Embed(
            22, cfg.c_s, embedding_init=nn.initializers.normal(1.0),
            name="current_seq_embedder",
        )(seqs_t)
        t_embed = get_time_embedding(t[:, 0], cfg.c_s, max_positions=2056)
        t_embed = jnp.broadcast_to(t_embed[:, None, :], (B, L, cfg.c_s))
        ang_embed = angles_embedder(angles_t).reshape(B, L, -1)
        cdt = cfg.compute_dtype
        node_embed = MLP((cfg.c_s, cfg.c_s), name="res_feat_mixer", dtype=cdt)(
            jnp.concatenate([node_embed, seq_embed, t_embed, ang_embed], axis=-1)
        ).astype(jnp.float32)
        node_embed = node_embed * node_mask[..., None]

        # Frames run in plane form through the block stack (ops/rot9.py): a
        # (B, L, 3, 3) tensor's T(4,128) tiles waste ~28x HBM traffic on every
        # frame op of every block. Array inputs (the training/API path) are
        # converted once here; the sampler passes planes straight through and
        # gets planes back (rot_is_planes), so the 100-step scan never
        # materializes a (B, L, 3, 3) rotation.
        rot_is_planes = isinstance(rotmats_t, (tuple, list))
        R = tuple(rotmats_t) if rot_is_planes else rot9.to9(rotmats_t.astype(jnp.float32))
        tr = (tuple(trans_t) if isinstance(trans_t, (tuple, list))
              else rot9.t_to3(trans_t.astype(jnp.float32)))
        # Pair-row TP (parallel/tp.py): outside a tp_shard scope these are
        # identity; inside, every (B, I, J, c) tensor shards its query rows
        # on the model mesh axis and GSPMD keeps all L² compute local.
        edge_embed = tp.pair_constraint(edge_embed)
        ipas = [
            InvariantPointAttention(
                cfg.c_s, cfg.c_z, cfg.c_hidden, cfg.no_heads,
                cfg.no_qk_points, cfg.no_v_points, dtype=cdt,
                use_pallas=cfg.use_pallas_ipa, name=f"ipa_{b}",
            )
            for b in range(cfg.num_blocks)
        ]
        readouts = None
        for b in range(cfg.num_blocks):
            ipa_embed = ipas[b](node_embed, edge_embed, R, tr, node_mask,
                                readouts=readouts)
            ipa_embed = ipa_embed * node_mask[..., None]
            node_embed = nn.LayerNorm(epsilon=1e-5, name=f"ipa_ln_{b}")(node_embed + ipa_embed)
            seq_tfmr_out = TorchTransformerEncoder(
                cfg.c_s, cfg.seq_tfmr_num_heads, cfg.seq_tfmr_num_layers,
                dtype=cdt, name=f"seq_tfmr_{b}",
            )(node_embed, key_padding_mask=(node_mask < 0.5))
            node_embed = node_embed + Linear(cfg.c_s, init="final", name=f"post_tfmr_{b}")(seq_tfmr_out)
            node_embed = StructureModuleTransition(cfg.c_s, dtype=cdt, name=f"node_transition_{b}")(node_embed)
            node_embed = node_embed * node_mask[..., None]
            update = BackboneUpdate(cfg.c_s, name=f"bb_update_{b}")(node_embed * node_mask[..., None])
            R, tr = rot9.compose_q_update(R, tr, update, update_mask=node_mask)

            if b < cfg.num_blocks - 1:
                et = EdgeTransition(
                    node_embed_size=cfg.c_s, edge_embed_in=cfg.c_z,
                    edge_embed_out=cfg.c_z, dtype=cdt,
                    use_pallas=cfg.use_pallas, quant_int8=cfg.quant_int8,
                    name=f"edge_transition_{b}",
                )
                if fused_pair_readout:
                    ro_w = ipas[b + 1](None, readout_params_only=True)
                    edge_embed, readouts = et(
                        node_embed, edge_embed, node_mask=node_mask,
                        fused_readout=ro_w)
                else:
                    edge_embed = et(node_embed, edge_embed, node_mask=node_mask)
                edge_embed = tp.pair_constraint(edge_embed)

        # Rotations come back in the caller's form (planes stay planes so the
        # sampler's scan never builds a (B, L, 3, 3) tensor); translations are
        # always re-stacked to (B, L, 3) — they are small and every consumer
        # (Euler update, losses) is vector-shaped.
        pred_rotmats1 = R if rot_is_planes else rot9.from9(R)
        pred_trans1 = rot9.t_from3(tr)
        pred_seqs1_prob = MLP((cfg.c_s, cfg.c_s, 20), name="seq_net")(node_embed)
        pred_angles1 = MLP((cfg.c_s, cfg.c_s, 5), name="angle_net")(node_embed)
        pred_angles1 = jnp.mod(pred_angles1, 2 * math.pi)  # bound to [0, 2π)

        return pred_rotmats1, pred_trans1, pred_angles1, pred_seqs1_prob
