"""FlowModel — multi-modal flow matching over frames, torsions and sequence.

Re-implements `models_con/flow_model.py` from the reference
(Ced3-han/PepFlowww) as a flax module with three entry methods:

* ``encode``   — build backbone frames + node/edge features from a batch
                 (flow_model.py:75-93)
* ``denoise``  — one GAEncoder pass predicting x̂₁ for all modalities
* ``loss``     — the training objective: sample t, corrupt all modalities,
                 denoise once, compute the 6 losses (flow_model.py:111-227)

Sampling (the Euler ODE) lives in :mod:`pepflowww_tpu.sampling` as a jit'd
``lax.scan`` over timesteps.

Randomness is explicit: ``loss`` consumes the ``corruption`` RNG stream.
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp

from pepflowww_tpu import constants as C
from pepflowww_tpu.models.embed import EdgeEmbedder, NodeEmbedder
from pepflowww_tpu.models.trunk import GAEncoder, IPAConfig
from pepflowww_tpu.ops import allatom, simplex, so3, torus
from pepflowww_tpu.ops.frames import construct_3d_basis


@dataclasses.dataclass(frozen=True)
class InterpolantConfig:
    """configs/learn_angle.yaml:16-34."""

    min_t: float = 1e-2
    t_normalization_clip: float = 0.9
    sample_structure: bool = True
    sample_sequence: bool = True
    rots_exp_rate: float = 10.0
    trans_sigma: float = 1.0
    num_classes: int = 20
    simplex_value: float = 5.0
    num_timesteps: int = 100


@dataclasses.dataclass(frozen=True)
class FlowModelConfig:
    node_embed_size: int = 128
    edge_embed_size: int = 64
    ipa: IPAConfig = dataclasses.field(default_factory=IPAConfig)
    interpolant: InterpolantConfig = dataclasses.field(default_factory=InterpolantConfig)


class FlowModel(nn.Module):
    cfg: FlowModelConfig

    def setup(self):
        cdt = self.cfg.ipa.compute_dtype
        self.node_embedder = NodeEmbedder(self.cfg.node_embed_size, dtype=cdt)
        self.edge_embedder = EdgeEmbedder(
            self.cfg.edge_embed_size, dtype=cdt, use_pallas=self.cfg.ipa.use_pallas
        )
        self.ga_encoder = GAEncoder(self.cfg.ipa)

    # ------------------------------------------------------------------
    def encode(self, batch):
        """flow_model.py:75-93."""
        icfg = self.cfg.interpolant
        pos = batch["pos_heavyatom"]
        rotmats_1 = construct_3d_basis(
            pos[:, :, C.BBHeavyAtom.CA], pos[:, :, C.BBHeavyAtom.C], pos[:, :, C.BBHeavyAtom.N]
        )
        trans_1 = pos[:, :, C.BBHeavyAtom.CA]
        seqs_1 = batch["aa"]
        angles_1 = batch["torsion_angle"]

        context_mask = jnp.logical_and(
            batch["mask_heavyatom"][:, :, C.BBHeavyAtom.CA],
            ~batch["generate_mask"],
        )
        structure_mask = context_mask if icfg.sample_structure else None
        sequence_mask = context_mask if icfg.sample_sequence else None
        node_embed = self.node_embedder(
            batch["aa"], batch["res_nb"], batch["chain_nb"], pos,
            batch["mask_heavyatom"], structure_mask=structure_mask,
            sequence_mask=sequence_mask,
        )
        edge_embed = self.edge_embedder(
            batch["aa"], batch["res_nb"], batch["chain_nb"], pos,
            batch["mask_heavyatom"], structure_mask=structure_mask,
            sequence_mask=sequence_mask,
        )
        return rotmats_1, trans_1, angles_1, seqs_1, node_embed, edge_embed

    # ------------------------------------------------------------------
    def denoise(self, t, rotmats_t, trans_t, angles_t, seqs_t, node_embed,
                edge_embed, generate_mask, res_mask, fused_pair_readout=False):
        return self.ga_encoder(
            t, rotmats_t, trans_t, angles_t, seqs_t, node_embed, edge_embed,
            generate_mask.astype(jnp.int32), res_mask.astype(jnp.int32),
            fused_pair_readout=fused_pair_readout,
        )

    # ------------------------------------------------------------------
    def seq_to_simplex(self, seqs):
        icfg = self.cfg.interpolant
        return simplex.seq_to_simplex(seqs, icfg.simplex_value, icfg.num_classes)

    @staticmethod
    def zero_center_part(pos, gen_mask, res_mask):
        """Center positions on the generated region (flow_model.py:95-106)."""
        g = gen_mask[..., None].astype(pos.dtype)
        center = jnp.sum(pos * g, axis=1) / (
            jnp.sum(gen_mask.astype(pos.dtype), axis=-1, keepdims=True) + 1e-8
        )
        pos = pos - center[:, None, :]
        return pos * res_mask[..., None].astype(pos.dtype), center[:, None, :]

    # ------------------------------------------------------------------
    def loss_pre(self, batch):
        """Everything in the training objective BEFORE the denoise call
        (flow_model.py:111-163): encode, t sampling and the corruption of
        all modalities. Returns the denoiser inputs plus the loss targets
        as one dict, so the pipeline-parallel step (parallel/pp.py) can run
        the trunk between ``loss_pre`` and ``loss_post`` with the exact RNG
        stream and math of :meth:`loss` (which is literally this function
        + denoise + ``loss_post``)."""
        icfg = self.cfg.interpolant
        k = icfg.simplex_value
        B, L = batch["aa"].shape

        gen_mask = batch["generate_mask"].astype(jnp.float32)
        res_mask = batch["res_mask"].astype(jnp.float32)

        rotmats_1, trans_1, angles_1, seqs_1, node_embed, edge_embed = self.encode(batch)

        # Data is pre-centered on the peptide centroid at preprocessing, so the
        # reference's zero-centering of trans_1 is a no-op (flow_model.py:120-121).
        trans_1_c = trans_1
        seqs_1_simplex = self.seq_to_simplex(seqs_1)

        key = self.make_rng("corruption")
        k_t, k_trans, k_rot, k_ang, k_seq, k_seqsamp, k_predsamp = jax.random.split(key, 7)

        t = jax.random.uniform(k_t, (B, 1))
        t = t * (1 - 2 * icfg.min_t) + icfg.min_t

        gm1 = batch["generate_mask"][..., None]
        gm2 = batch["generate_mask"][..., None, None]

        if icfg.sample_structure:
            trans_0 = jax.random.normal(k_trans, (B, L, 3)) * icfg.trans_sigma
            trans_0_c, _ = self.zero_center_part(trans_0, gen_mask, res_mask)
            trans_t = (1 - t[..., None]) * trans_0_c + t[..., None] * trans_1_c
            trans_t_c = jnp.where(gm1, trans_t, trans_1_c)

            rotmats_0 = so3.uniform_so3(k_rot, (B, L))
            rotmats_t = so3.geodesic_t(t[..., None], rotmats_1, rotmats_0)
            rotmats_t = jnp.where(gm2, rotmats_t, rotmats_1)

            angles_0 = torus.random_uniform(k_ang, angles_1.shape, dtype=angles_1.dtype)
            angles_t = torus.geodesic_t(t[..., None], angles_1, angles_0)
            angles_t = jnp.where(gm1, angles_t, angles_1)
        else:
            trans_t_c, rotmats_t, angles_t = trans_1_c, rotmats_1, angles_1

        if icfg.sample_sequence:
            seqs_0_simplex = k * jax.random.normal(k_seq, seqs_1_simplex.shape)
            seqs_t_simplex = (1 - t[..., None]) * seqs_0_simplex + t[..., None] * seqs_1_simplex
            seqs_t_simplex = jnp.where(gm1, seqs_t_simplex, seqs_1_simplex)
            seqs_t_prob = jax.nn.softmax(seqs_t_simplex, axis=-1)
            seqs_t = simplex.sample_from(k_seqsamp, seqs_t_prob)
            seqs_t = jnp.where(batch["generate_mask"], seqs_t, seqs_1)
        else:
            seqs_t = seqs_1

        # Stop-gradient through the corruption (reference wraps it in no_grad).
        trans_t_c = jax.lax.stop_gradient(trans_t_c)
        rotmats_t = jax.lax.stop_gradient(rotmats_t)
        angles_t = jax.lax.stop_gradient(angles_t)
        seqs_t = jax.lax.stop_gradient(seqs_t)

        return {
            # denoiser inputs
            "t": t, "rotmats_t": rotmats_t, "trans_t_c": trans_t_c,
            "angles_t": angles_t, "seqs_t": seqs_t,
            "node_embed": node_embed, "edge_embed": edge_embed,
            # loss targets / RNG for loss_post
            "rotmats_1": rotmats_1, "trans_1_c": trans_1_c,
            "angles_1": angles_1, "seqs_1": seqs_1,
            "k_predsamp": k_predsamp,
        }

    def loss_post(self, batch, pre, denoised):
        """The 6 losses given the denoiser outputs (flow_model.py:164-227).
        ``pre`` is :meth:`loss_pre`'s dict; ``denoised`` is the 4-tuple the
        trunk returns. Uses no parameters and no implicit RNG (the
        prediction-sampling key was drawn in loss_pre), so the
        pipeline-parallel step can call it outside the pipelined region."""
        icfg = self.cfg.interpolant
        gen_mask = batch["generate_mask"].astype(jnp.float32)

        t = pre["t"]
        rotmats_t, angles_t = pre["rotmats_t"], pre["angles_t"]
        rotmats_1, trans_1_c = pre["rotmats_1"], pre["trans_1_c"]
        angles_1, seqs_1 = pre["angles_1"], pre["seqs_1"]
        k_predsamp = pre["k_predsamp"]
        gm1 = batch["generate_mask"][..., None]

        pred_rotmats_1, pred_trans_1, pred_angles_1, pred_seqs_1_prob = denoised
        pred_seqs_1 = simplex.sample_from(
            k_predsamp, jax.nn.softmax(pred_seqs_1_prob, axis=-1)
        )
        pred_seqs_1 = jnp.where(batch["generate_mask"], pred_seqs_1, jnp.clip(seqs_1, 0, 19))
        pred_trans_1_c = pred_trans_1  # zero-center implicitly learned

        norm_scale = 1.0 / (1.0 - jnp.minimum(t[..., None], icfg.t_normalization_clip))
        gen_sum = jnp.sum(gen_mask, axis=-1) + 1e-8

        # Translation VF loss.
        trans_loss = jnp.sum(
            jnp.square(pred_trans_1_c - trans_1_c) * gen_mask[..., None], axis=(-1, -2)
        ) / gen_sum
        trans_loss = jnp.mean(trans_loss)

        # Rotation VF loss.
        gt_rot_vf = so3.calc_rot_vf(rotmats_t, rotmats_1)
        pred_rot_vf = so3.calc_rot_vf(rotmats_t, pred_rotmats_1)
        rot_loss = jnp.sum(
            jnp.square((gt_rot_vf - pred_rot_vf) * norm_scale) * gen_mask[..., None],
            axis=(-1, -2),
        ) / gen_sum
        rot_loss = jnp.mean(rot_loss)

        # Backbone-atom aux loss.
        gt_bb = allatom.bb3_atoms(trans_1_c, rotmats_1)
        pred_bb = allatom.bb3_atoms(pred_trans_1_c, pred_rotmats_1)
        bb_atom_loss = jnp.sum(
            jnp.square(gt_bb - pred_bb) * gen_mask[..., None, None], axis=(-1, -2, -3)
        ) / gen_sum
        bb_atom_loss = jnp.mean(bb_atom_loss)

        # Sequence CE loss.
        labels = jnp.clip(seqs_1, 0, 19)
        logp = jax.nn.log_softmax(pred_seqs_1_prob, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        seqs_loss = jnp.sum(ce * gen_mask, axis=-1) / gen_sum
        seqs_loss = jnp.mean(seqs_loss)

        # Angle VF loss, masked by the predicted sequence's valid torsions
        # (flow_model.py:200-209): "you don't know the aa type when generating".
        angle_mask_loss = allatom.torsions_mask_for(pred_seqs_1)  # (B, L, 5)
        angle_mask_loss = jnp.concatenate([angle_mask_loss, angle_mask_loss], axis=-1)
        angle_mask_loss = jnp.logical_and(gm1, angle_mask_loss > 0.5)
        ang_sum = jnp.sum(angle_mask_loss, axis=(-1, -2)) + 1e-8

        gt_av = torus.logmap(angles_t, angles_1)
        gt_av_vec = jnp.concatenate([jnp.sin(gt_av), jnp.cos(gt_av)], axis=-1)
        pred_av = torus.logmap(angles_t, pred_angles_1)
        pred_av_vec = jnp.concatenate([jnp.sin(pred_av), jnp.cos(pred_av)], axis=-1)
        angle_loss = jnp.sum(
            jnp.square((gt_av_vec - pred_av_vec) * norm_scale) * angle_mask_loss,
            axis=(-1, -2),
        ) / ang_sum
        angle_loss = jnp.mean(angle_loss)

        # Torsion aux loss (direct sin/cos regression).
        a1_vec = jnp.concatenate([jnp.sin(angles_1), jnp.cos(angles_1)], axis=-1)
        p1_vec = jnp.concatenate([jnp.sin(pred_angles_1), jnp.cos(pred_angles_1)], axis=-1)
        torsion_loss = jnp.sum(
            jnp.square(p1_vec - a1_vec) * angle_mask_loss, axis=(-1, -2)
        ) / ang_sum
        torsion_loss = jnp.mean(torsion_loss)

        return {
            "trans_loss": trans_loss,
            "rot_loss": rot_loss,
            "bb_atom_loss": bb_atom_loss,
            "seqs_loss": seqs_loss,
            "angle_loss": angle_loss,
            "torsion_loss": torsion_loss,
        }

    def loss(self, batch):
        """Training objective (flow_model.py:111-227). Uses the 'corruption'
        RNG stream for t / noise / discrete sampling."""
        pre = self.loss_pre(batch)
        denoised = self.denoise(
            pre["t"], pre["rotmats_t"], pre["trans_t_c"], pre["angles_t"],
            pre["seqs_t"], pre["node_embed"], pre["edge_embed"],
            batch["generate_mask"], batch["res_mask"],
        )
        return self.loss_post(batch, pre, denoised)

    def __call__(self, batch):
        return self.loss(batch)
