"""Per-residue and pair featurizers.

Re-implements `models_con/node.py` and `models_con/edge.py` from the reference
with TPU-friendly formulations: the 22-way scattered local-coordinate feature
becomes a one-hot outer product (no advanced indexing), and the 15x15
inter-atom distance block is expressed as fused elementwise ops that XLA can
keep in registers.

Both featurizers implement the reference's leakage masks exactly: at training
time the to-be-generated region's sequence is replaced by UNK and its
structure-derived features are zeroed (node.py:54-93, edge.py:62-97).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pepflowww_tpu import constants as C
from pepflowww_tpu.ops import frames
from pepflowww_tpu.ops.dihedrals import get_backbone_dihedral_angles, pairwise_dihedrals
from pepflowww_tpu.models.layers import (AngularEncoding, EmbedDenseGrad, MLP,
                                          _take_dense_grad)
from pepflowww_tpu.parallel import tp


class NodeEmbedder(nn.Module):
    """Per-residue features -> (B, L, feat_dim) (node.py:9-105)."""

    feat_dim: int
    max_num_atoms: int = C.MAX_NUM_HEAVYATOMS
    max_aa_types: int = C.MAX_AA_TYPES
    dtype: object = None

    @nn.compact
    def __call__(self, aa, res_nb, chain_nb, pos_atoms, mask_atoms,
                 structure_mask: Optional[jax.Array] = None,
                 sequence_mask: Optional[jax.Array] = None):
        N, L = aa.shape
        mask_residue = mask_atoms[:, :, C.BBHeavyAtom.CA]

        pos_atoms = pos_atoms[:, :, : self.max_num_atoms]
        mask_atoms = mask_atoms[:, :, : self.max_num_atoms]

        if sequence_mask is not None:
            aa = jnp.where(sequence_mask, aa, jnp.full_like(aa, C.AA.UNK))
        aa_feat = nn.Embed(
            self.max_aa_types, self.feat_dim,
            embedding_init=nn.initializers.normal(1.0),
        )(aa)

        # Local backbone-frame coordinates of all atoms.
        R = frames.construct_3d_basis(
            pos_atoms[:, :, C.BBHeavyAtom.CA],
            pos_atoms[:, :, C.BBHeavyAtom.C],
            pos_atoms[:, :, C.BBHeavyAtom.N],
        )
        t = pos_atoms[:, :, C.BBHeavyAtom.CA]
        crd = frames.global_to_local(R, t, pos_atoms)  # (N, L, A, 3)
        crd = jnp.where(mask_atoms[..., None], crd, 0.0)

        # 22-way scattered coordinates as a one-hot outer product
        # (node.py:70-75 without the (N,L,22,15,3) boolean expand).
        aa_onehot = jax.nn.one_hot(aa, self.max_aa_types, dtype=crd.dtype)  # (N, L, 22)
        crd_flat = crd.reshape(N, L, self.max_num_atoms * 3)
        crd_feat = (aa_onehot[..., None] * crd_flat[:, :, None, :]).reshape(
            N, L, self.max_aa_types * self.max_num_atoms * 3
        )
        if structure_mask is not None:
            crd_feat = crd_feat * structure_mask[:, :, None]

        # Backbone dihedral features.
        dihed_embed = AngularEncoding()
        bb_dihedral, mask_bb_dihed = get_backbone_dihedral_angles(
            pos_atoms, chain_nb=chain_nb, res_nb=res_nb, mask=mask_residue
        )
        dihed_feat = dihed_embed(bb_dihedral[..., None]) * mask_bb_dihed[..., None]
        dihed_feat = dihed_feat.reshape(N, L, -1)
        if structure_mask is not None:
            # Avoid leakage via dihedrals of anchor residues (node.py:84-93).
            dihed_mask = jnp.logical_and(
                structure_mask,
                jnp.logical_and(
                    jnp.roll(structure_mask, 1, axis=1),
                    jnp.roll(structure_mask, -1, axis=1),
                ),
            )
            dihed_feat = dihed_feat * dihed_mask[:, :, None]

        out = MLP((self.feat_dim * 2, self.feat_dim, self.feat_dim, self.feat_dim),
                  dtype=self.dtype)(
            jnp.concatenate([aa_feat, crd_feat, dihed_feat], axis=-1)
        ).astype(jnp.float32)
        return out * mask_residue[:, :, None]


class _NamedEmbeddingParams(nn.Module):
    """Raw embedding table with the nn.Embed tree path ({name}/embedding)."""

    num_embeddings: int
    features: int
    embedding_init: object = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self):
        return self.param(
            "embedding", self.embedding_init, (self.num_embeddings, self.features)
        )


class _DistMLPParams(nn.Module):
    """distance_embed MLP params (Linear_0/Linear_1 tree paths)."""

    feat: int
    in_dim: int

    @nn.compact
    def __call__(self):
        from pepflowww_tpu.models.ipa import _NamedDenseParams

        k1, b1 = _NamedDenseParams(self.feat, self.in_dim, "torch", name="Linear_0")()
        k2, b2 = _NamedDenseParams(self.feat, self.feat, "torch", name="Linear_1")()
        return k1, b1, k2, b2


class EdgeEmbedder(nn.Module):
    """Pair features -> (B, L, L, feat_dim) (edge.py:11-112)."""

    feat_dim: int
    max_num_atoms: int = C.MAX_NUM_HEAVYATOMS
    max_aa_types: int = C.MAX_AA_TYPES
    max_relpos: int = 32
    dtype: object = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, aa, res_nb, chain_nb, pos_atoms, mask_atoms,
                 structure_mask: Optional[jax.Array] = None,
                 sequence_mask: Optional[jax.Array] = None):
        N, L = aa.shape
        A = self.max_num_atoms
        pos_atoms = pos_atoms[:, :, :A]
        mask_atoms = mask_atoms[:, :, :A]

        mask_residue = mask_atoms[:, :, C.BBHeavyAtom.CA]
        # Pair-row TP (parallel/tp.py): constrain the (N, L, L) intermediates
        # at their producers so under a `tp_shard` scope GSPMD forms ALL of
        # the embedder's L² work row-sharded (broadcast locally from the tiny
        # gathered (N, L) node tensors) instead of building it batch-sharded
        # and rematerializing at the trunk's edge_embed constraint. Identity
        # outside the scope — the DP/single-device graphs are unchanged.
        mask_pair = tp.pair_constraint(
            mask_residue[:, :, None] * mask_residue[:, None, :])
        pair_structure_mask = (
            tp.pair_constraint(
                structure_mask[:, :, None] * structure_mask[:, None, :])
            if structure_mask is not None
            else None
        )

        if sequence_mask is not None:
            aa = jnp.where(sequence_mask, aa, jnp.full_like(aa, C.AA.UNK))
        aa_pair = tp.pair_constraint(
            aa[:, :, None] * self.max_aa_types + aa[:, None, :])  # (N, L, L)
        feat_aapair = EmbedDenseGrad(
            self.max_aa_types**2, self.feat_dim,
            embedding_init=nn.initializers.normal(1.0), name="aa_pair_embed",
        )(aa_pair)

        # Relative positions, gated by same-chain.
        same_chain = tp.pair_constraint(
            chain_nb[:, :, None] == chain_nb[:, None, :])
        relpos = tp.pair_constraint(jnp.clip(
            res_nb[:, :, None] - res_nb[:, None, :], -self.max_relpos, self.max_relpos
        ))
        feat_relpos = EmbedDenseGrad(
            2 * self.max_relpos + 1, self.feat_dim,
            embedding_init=nn.initializers.normal(1.0), name="relpos_embed",
            dtype=self.dtype,
        )(relpos + self.max_relpos) * same_chain[..., None]

        # 15x15 inter-atom distance gaussians with learned per-aa-pair coefs.
        # Raw params (nn.Embed/MLP-compatible tree paths) shared between the
        # fused Pallas kernel and the XLA graph.
        cdt = self.dtype or jnp.float32
        V = self.max_aa_types**2
        table = _NamedEmbeddingParams(V, A * A, name="aapair_to_distcoef")()
        dk1, db1, dk2, db2 = _DistMLPParams(self.feat_dim, A * A,
                                            name="distance_embed")()

        use_pallas = self.use_pallas and not self.is_initializing()
        if use_pallas:
            # No Mosaic-legal tile within the VMEM budget at this (L, width)
            # -> XLA graph for this shape (ADVICE r3: the old fallback could
            # silently exceed the scoped-vmem budget at wide-F x large-L).
            from pepflowww_tpu.models.pallas_common import dist_row_tile, warn_no_tile

            if dist_row_tile(L, self.feat_dim) is None:
                warn_no_tile("fused_distance_embed", L, self.feat_dim)
                use_pallas = False
        if use_pallas:
            from pepflowww_tpu.models.pallas_dist import fused_distance_embed_vjp

            pm = (pair_structure_mask if pair_structure_mask is not None
                  else jnp.ones((N, L, L)))
            feat_dist = fused_distance_embed_vjp(
                pos_atoms * C.ANG_TO_NM_SCALE, mask_atoms,
                aa_pair.astype(jnp.int32), pm,
                table, dk1, db1, dk2, db2,
                cdt if self.dtype is not None else jnp.float32,
            ).astype(jnp.float32)
        else:
            # The (N, L, L, 225) intermediates run in the compute dtype: at
            # fp32 they are ~240 MB each and dominated the training step's
            # HBM traffic (profiled ~4 ms/step of copies/converts at B=L=64).
            pos_c = pos_atoms.astype(cdt)
            d2 = jnp.sum(
                jnp.square(pos_c[:, :, None, :, None] - pos_c[:, None, :, None, :]),
                axis=-1,
            ).reshape(N, L, L, A * A) * jnp.asarray(C.ANG_TO_NM_SCALE**2, cdt)
            coef = _take_dense_grad(table, aa_pair, V)
            c = jax.nn.softplus(coef).astype(cdt)
            d_gauss = jnp.exp(-c * d2)
            mask_atom_pair = (
                mask_atoms[:, :, None, :, None] * mask_atoms[:, None, :, None, :]
            ).reshape(N, L, L, A * A).astype(cdt)
            x = (d_gauss * mask_atom_pair).astype(cdt)
            h = nn.relu(jnp.einsum("bijc,cf->bijf", x, dk1.astype(cdt)) + db1.astype(cdt))
            feat_dist = nn.relu(
                jnp.einsum("bijc,cf->bijf", h, dk2.astype(cdt)) + db2.astype(cdt)
            )
            feat_dist = feat_dist.astype(jnp.float32)
            if pair_structure_mask is not None:
                feat_dist = feat_dist * pair_structure_mask[..., None]

        # Inter-residue phi/psi dihedrals.
        dihed = tp.pair_constraint(pairwise_dihedrals(pos_atoms))  # (N, L, L, 2)
        feat_dihed = AngularEncoding(name="dihedral_embed")(dihed)
        if pair_structure_mask is not None:
            feat_dihed = feat_dihed * pair_structure_mask[..., None]

        feat_all = jnp.concatenate(
            [feat_aapair, feat_relpos, feat_dist, feat_dihed], axis=-1
        )
        feat_all = MLP((self.feat_dim, self.feat_dim, self.feat_dim),
                       dtype=self.dtype, name="out_mlp")(feat_all).astype(jnp.float32)
        return feat_all * mask_pair[..., None]
