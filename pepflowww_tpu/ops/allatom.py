"""All-atom structure build: torsion extraction and AF2-Alg.24 reconstruction.

Vectorized JAX re-design of the reference's per-residue Python loops
(`models_con/torsion.py` in Ced3-han/PepFlowww) and of the backbone
reconstruction in `pepflow/modules/common/geometry.py:446-522`. Everything is
static-shaped, gathers are table lookups constant-folded by XLA, and the whole
module is jit/vmap/grad-safe.

Conventions: positions in Å; angles in [0, 2π); `aa` int tokens 0-19 canonical,
20 UNK, 21 PAD; `pos15` uses the 15-slot heavy-atom layout (OXT last) while the
rigid-group tables use the AF2 atom14 layout (first 14 slots, no OXT).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

from pepflowww_tpu import constants as C
from pepflowww_tpu.ops import frames
from pepflowww_tpu.ops.dihedrals import (
    dihedral_from_four_points_raw,
    get_backbone_dihedral_angles,
)

TWO_PI = 2.0 * jnp.pi


# ---------------------------------------------------------------------------
# Torsion extraction (reference torsion.py:13-65, vectorized)
# ---------------------------------------------------------------------------
def get_torsion_angles(pos15: jax.Array, aa: jax.Array):
    """Extract (psi, chi1..chi4) per residue.

    Args:
        pos15: (..., L, 15, 3) heavy-atom positions.
        aa: (..., L) residue tokens.
    Returns:
        torsion: (..., L, 5) angles in [0, 2π), zeros where invalid.
        torsion_mask: (..., L, 5) bool.

    Validity matches the reference: a chi is valid iff it is chemically defined
    for the residue type AND its raw dihedral is finite (degenerate/missing
    atoms at the origin produce NaNs which are masked, torsion.py:55); UNK/PAD
    residues are all-invalid (torsion.py:56-58).
    """
    aa_safe = jnp.clip(aa, 0, C.NUM_AA_TYPES - 1)

    # psi from N, CA, C, O of the same residue (torsion.py:44-45).
    psi_raw = dihedral_from_four_points_raw(
        pos15[..., 0, :], pos15[..., 1, :], pos15[..., 2, :], pos15[..., 3, :]
    )

    # chi via table-driven gathers: (21, 4, 4) atom slots, -1 -> slot 0 + mask.
    chi_idx = jnp.asarray(C.CHI_ATOM_INDICES)[aa_safe]          # (..., L, 4, 4)
    chi_defined = jnp.asarray(C.CHI_ANGLES_MASK)[aa_safe] > 0    # (..., L, 4)
    chi_idx_safe = jnp.maximum(chi_idx, 0)

    # Gather the four atom positions per chi: (..., L, 4, 4, 3).
    p = jnp.take_along_axis(
        pos15[..., None, :, :],
        chi_idx_safe[..., :, :, None].astype(jnp.int32),
        axis=-2,
    )
    chi_raw = dihedral_from_four_points_raw(
        p[..., 0, :], p[..., 1, :], p[..., 2, :], p[..., 3, :]
    )  # (..., L, 4)

    raw = jnp.concatenate([psi_raw[..., None], chi_raw], axis=-1)  # (..., L, 5)
    defined = jnp.concatenate(
        [jnp.ones_like(chi_defined[..., :1]), chi_defined], axis=-1
    )
    finite = jnp.isfinite(raw)
    is_canonical = (aa < C.AA.UNK)[..., None]
    mask = defined & finite & is_canonical

    torsion = jnp.where(mask, raw, 0.0)
    torsion = jnp.mod(jnp.nan_to_num(torsion, posinf=0.0, neginf=0.0), TWO_PI)
    return torsion, mask


def torsions_mask_for(aa: jax.Array) -> jax.Array:
    """(..., 5) float validity of [psi, chi1..4] per token (torsion.py:230-232).

    Indexable by tokens up to PAD=21; UNK/PAD rows are zero.
    """
    return jnp.asarray(C.TORSIONS_MASK)[jnp.clip(aa, 0, 21)]


def heavyatom_mask_for(aa: jax.Array) -> jax.Array:
    """(..., 15) bool generated-structure atom mask (excl. OXT)
    (torsion.py:122-138 get_heavyatom_mask)."""
    return jnp.asarray(C.HEAVYATOM_MASK_GEN)[jnp.clip(aa, 0, 21)]


# ---------------------------------------------------------------------------
# Full-atom reconstruction (reference torsion.py:67-226, AF2 Alg. 24)
# ---------------------------------------------------------------------------
def _x_axis_rotation(angles: jax.Array) -> jax.Array:
    """Rotation about the +x axis for each angle: (..., 3, 3)
    (torsion.py:67-92)."""
    sin, cos = jnp.sin(angles), jnp.cos(angles)
    one = jnp.ones_like(sin)
    zero = jnp.zeros_like(sin)
    row0 = jnp.stack([one, zero, zero], axis=-1)
    row1 = jnp.stack([zero, cos, -sin], axis=-1)
    row2 = jnp.stack([zero, sin, cos], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def full_atom_reconstruction(R_bb: jax.Array, t_bb: jax.Array, angles: jax.Array, aa: jax.Array):
    """Compose backbone→psi→chi1..chi4 frames and place all 14 heavy atoms.

    Args:
        R_bb: (B, L, 3, 3); t_bb: (B, L, 3); angles: (B, L, 5) in [0, 2π);
        aa: (B, L) tokens.
    Returns:
        pos14: (B, L, 14, 3); R_frames: (B, L, 6, 3, 3); t_frames: (B, L, 6, 3)
        with frame order [bb, psi, chi1, chi2, chi3, chi4].
    """
    aa_safe = jnp.clip(aa, 0, C.NUM_AA_TYPES - 1)
    rots = _x_axis_rotation(angles)  # (B, L, 5, 3, 3)

    rg_R = jnp.asarray(C.RIGID_GROUP_ROTATION)[aa_safe]         # (B, L, 8, 3, 3)
    rg_t = jnp.asarray(C.RIGID_GROUP_TRANSLATION)[aa_safe]      # (B, L, 8, 3)
    atom_group = jnp.asarray(C.HEAVYATOM_TO_RIGID_GROUP)[aa_safe]   # (B, L, 14)
    atom_pos = jnp.asarray(C.HEAVYATOM_RIGID_GROUP_POSITIONS)[aa_safe]  # (B, L, 14, 3)

    zeros = jnp.zeros_like(t_bb)

    def chain(parent, frame_idx, rot):
        return frames.compose_chain(
            [parent, (rg_R[:, :, frame_idx], rg_t[:, :, frame_idx]), (rot, zeros)]
        )

    Rt_psi = chain((R_bb, t_bb), C.PSI_FRAME, rots[:, :, 0])
    Rt_chi1 = chain((R_bb, t_bb), C.CHI1_FRAME, rots[:, :, 1])
    Rt_chi2 = chain(Rt_chi1, C.CHI2_FRAME, rots[:, :, 2])
    Rt_chi3 = chain(Rt_chi2, C.CHI3_FRAME, rots[:, :, 3])
    Rt_chi4 = chain(Rt_chi3, C.CHI4_FRAME, rots[:, :, 4])

    R_frames = jnp.stack([R_bb, Rt_psi[0], Rt_chi1[0], Rt_chi2[0], Rt_chi3[0], Rt_chi4[0]], axis=2)
    t_frames = jnp.stack([t_bb, Rt_psi[1], Rt_chi1[1], Rt_chi2[1], Rt_chi3[1], Rt_chi4[1]], axis=2)

    # Per-atom frame gather over the 8-frame order [bb, omega, phi, psi, chi1..4].
    R_all = jnp.stack([R_bb, R_bb, R_bb, Rt_psi[0], Rt_chi1[0], Rt_chi2[0], Rt_chi3[0], Rt_chi4[0]], axis=2)
    t_all = jnp.stack([t_bb, t_bb, t_bb, Rt_psi[1], Rt_chi1[1], Rt_chi2[1], Rt_chi3[1], Rt_chi4[1]], axis=2)

    idx = atom_group.astype(jnp.int32)
    R_atom = jnp.take_along_axis(R_all, idx[..., None, None], axis=2)  # (B, L, 14, 3, 3)
    t_atom = jnp.take_along_axis(t_all, idx[..., None], axis=2)        # (B, L, 14, 3)

    pos14 = _einsum("blaij,blaj->blai", R_atom, atom_pos) + t_atom
    return pos14, R_frames, t_frames


def full_atom_to_pos15(pos14: jax.Array) -> jax.Array:
    """Pad atom14 positions to the 15-slot layout (OXT slot zeroed)."""
    return jnp.concatenate([pos14, jnp.zeros_like(pos14[..., :1, :])], axis=-2)


# Mapping from the 15-slot heavy-atom layout to AF2's atom37 layout, built
# from the shared atom-name tables (interop with AF2-family eval tooling;
# cf. reference data/all_atom.py compute_backbone's atom14->atom37 shuffle).
_ATOM37_NAMES = [
    "N", "CA", "C", "CB", "O", "CG", "CG1", "CG2", "OG", "OG1", "SG", "CD",
    "CD1", "CD2", "ND1", "ND2", "OD1", "OD2", "SD", "CE", "CE1", "CE2", "CE3",
    "NE", "NE1", "NE2", "OE1", "OE2", "CH2", "NH1", "NH2", "OH", "CZ", "CZ2",
    "CZ3", "NZ", "OXT",
]


def _build_pos15_to_atom37():
    import numpy as np

    idx = np.full((C.MAX_AA_TYPES, 37), -1, dtype=np.int32)
    for r in range(C.NUM_AA_TYPES):
        for slot, name in enumerate(C.HEAVYATOM_NAMES[r]):
            if name and name in _ATOM37_NAMES:
                idx[r, _ATOM37_NAMES.index(name)] = slot
    return idx


_POS15_TO_ATOM37 = _build_pos15_to_atom37()


def pos15_to_atom37(pos15: jax.Array, aa: jax.Array):
    """Scatter 15-slot positions into the AF2 atom37 layout.

    Returns (atom37 positions (..., L, 37, 3), atom37 mask (..., L, 37)).
    """
    table = jnp.asarray(_POS15_TO_ATOM37)[jnp.clip(aa, 0, C.MAX_AA_TYPES - 1)]
    safe = jnp.maximum(table, 0)
    gathered = jnp.take_along_axis(pos15, safe[..., None].astype(jnp.int32), axis=-2)
    valid = (table >= 0)[..., None]
    return jnp.where(valid, gathered, 0.0), valid[..., 0]


# ---------------------------------------------------------------------------
# Backbone-only reconstruction (reference geometry.py:446-522)
# ---------------------------------------------------------------------------
def reconstruct_backbone(R: jax.Array, t: jax.Array, aa: jax.Array, chain_nb, res_nb, mask):
    """Place idealized N/CA/C by frame, then O via the psi frame.

    Returns (B, L, 4, 3).
    """
    aa_safe = jnp.clip(aa, 0, 20)
    bb_coords = jnp.asarray(C.BACKBONE_ATOM_COORDINATES)[aa_safe]  # (B, L, 3, 3)
    oxy_coord = jnp.asarray(C.BB_OXYGEN_COORDINATE)[aa_safe]       # (B, L, 3)

    bb_pos = frames.local_to_global(R, t, bb_coords)  # (B, L, 3, 3)

    bb_dihedral, _ = get_backbone_dihedral_angles(bb_pos, chain_nb, res_nb, mask)
    psi = bb_dihedral[..., 2]

    R_psi = _x_axis_rotation(psi)
    R_psi, t_psi = frames.compose_chain([(R, t), (R_psi, jnp.zeros_like(t))])
    O_pos = frames.local_to_global(R_psi, t_psi, oxy_coord[..., None, :])  # (B, L, 1, 3)

    return jnp.concatenate([bb_pos, O_pos], axis=2)


def reconstruct_backbone_partially(pos_ctx, R_new, t_new, aa, chain_nb, res_nb, mask_atoms, mask_recons):
    """Splice reconstructed backbones into a context structure
    (geometry.py:492-522). Returns (pos_new, mask_new)."""
    A = mask_atoms.shape[-1]
    mask_res = mask_atoms[:, :, C.BBHeavyAtom.CA]
    pos_recons = reconstruct_backbone(R_new, t_new, aa, chain_nb, res_nb, mask_res)
    pad = jnp.zeros(pos_recons.shape[:2] + (A - 4, 3), pos_recons.dtype)
    pos_recons = jnp.concatenate([pos_recons, pad], axis=2)

    m = mask_recons[:, :, None, None]
    pos_new = jnp.where(m, pos_recons, pos_ctx)

    bb_atoms = jnp.zeros_like(mask_atoms).at[:, :, :4].set(True)
    mask_new = jnp.where(mask_recons[:, :, None], bb_atoms, mask_atoms)
    return pos_new, mask_new


# ---------------------------------------------------------------------------
# Backbone N/CA/C for the aux loss (reference all_atom.py:39-45)
# ---------------------------------------------------------------------------
def bb3_atoms(trans: jax.Array, rotmats: jax.Array) -> jax.Array:
    """N/CA/C global positions of idealized ALA backbones: (B, L, 3, 3).

    Equals the reference's `to_atom37(trans, rots)[:, :, :3]`: with aatype=ALA
    and psi irrelevant to the first three atoms, compute_backbone reduces to
    R · ideal + t over the AF2 atom14 group-0 coordinates.
    """
    ideal = jnp.asarray(C.BB3_IDEAL_COORDS)  # (3, 3)
    return _einsum("blij,aj->blai", rotmats, ideal) + trans[:, :, None, :]
