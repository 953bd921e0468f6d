"""Dihedral angles and chain topology flags.

Re-implements the live dihedral machinery of the reference
(`pepflow/modules/common/geometry.py:296-418` and
`pepflow/modules/common/topology.py`) in vectorized JAX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pepflowww_tpu.constants import BBHeavyAtom


def dihedral_from_four_points(p0, p1, p2, p3) -> jax.Array:
    """Signed dihedral of four points (geometry.py:296-313).

    Unlike the reference (which divides by exact norms, yielding NaNs on the
    degenerate geometry of padded rows and relying on a per-step NaN-gradient
    rescue, train.py:136-139), the normalizations carry a tiny eps so both the
    value and its gradient stay finite; for real geometry (bond lengths ~Å)
    the difference is O(1e-10).
    """
    v0 = p2 - p1
    v1 = p0 - p1
    v2 = p3 - p2
    u1 = jnp.cross(v0, v1)
    n1 = u1 / jnp.sqrt(jnp.sum(jnp.square(u1), axis=-1, keepdims=True) + 1e-20)
    u2 = jnp.cross(v0, v2)
    n2 = u2 / jnp.sqrt(jnp.sum(jnp.square(u2), axis=-1, keepdims=True) + 1e-20)
    sgn = jnp.sign(jnp.sum(jnp.cross(v1, v2) * v0, axis=-1))
    dihed = sgn * jnp.arccos(jnp.clip(jnp.sum(n1 * n2, axis=-1), -0.999999, 0.999999))
    return jnp.nan_to_num(dihed)


def dihedral_from_four_points_raw(p0, p1, p2, p3) -> jax.Array:
    """As above but without NaN sanitization — degenerate inputs yield NaN.

    Needed by torsion extraction, whose validity mask is defined by finiteness
    (cf. reference models_con/torsion.py:13-29,55).
    """
    v0 = p2 - p1
    v1 = p0 - p1
    v2 = p3 - p2
    u1 = jnp.cross(v0, v1)
    n1 = u1 / jnp.linalg.norm(u1, axis=-1, keepdims=True)
    u2 = jnp.cross(v0, v2)
    n2 = u2 / jnp.linalg.norm(u2, axis=-1, keepdims=True)
    sgn = jnp.sign(jnp.sum(jnp.cross(v1, v2) * v0, axis=-1))
    return sgn * jnp.arccos(jnp.clip(jnp.sum(n1 * n2, axis=-1), -0.999999, 0.999999))


def get_consecutive_flag(chain_nb, res_nb, mask) -> jax.Array:
    """Whether residue i is bonded to residue i+1: (B, L-1) (topology.py:5-17)."""
    d_res_nb = jnp.abs(res_nb[:, 1:] - res_nb[:, :-1])
    same_chain = chain_nb[:, 1:] == chain_nb[:, :-1]
    consec = (d_res_nb == 1) & same_chain
    return consec & mask[:, :-1].astype(bool)


def get_terminus_flag(chain_nb, res_nb, mask):
    """(N_term_flag, C_term_flag), each (B, L) (topology.py:20-24)."""
    consec = get_consecutive_flag(chain_nb, res_nb, mask)
    not_consec = jnp.logical_not(consec)
    pad_true = jnp.ones_like(not_consec[:, :1])
    n_term = jnp.concatenate([pad_true, not_consec], axis=1)
    c_term = jnp.concatenate([not_consec, pad_true], axis=1)
    return n_term, c_term


def get_backbone_dihedral_angles(pos_atoms, chain_nb, res_nb, mask):
    """Omega/Phi/Psi angles and masks, (B, L, 3) each (geometry.py:352-390)."""
    pos_N = pos_atoms[:, :, BBHeavyAtom.N]
    pos_CA = pos_atoms[:, :, BBHeavyAtom.CA]
    pos_C = pos_atoms[:, :, BBHeavyAtom.C]

    n_term, c_term = get_terminus_flag(chain_nb, res_nb, mask)
    omega_mask = jnp.logical_not(n_term)
    phi_mask = jnp.logical_not(n_term)
    psi_mask = jnp.logical_not(c_term)

    zero_col = jnp.zeros_like(pos_N[:, :1, 0])
    omega = jnp.concatenate(
        [zero_col, dihedral_from_four_points(pos_CA[:, :-1], pos_C[:, :-1], pos_N[:, 1:], pos_CA[:, 1:])],
        axis=1,
    )
    phi = jnp.concatenate(
        [zero_col, dihedral_from_four_points(pos_C[:, :-1], pos_N[:, 1:], pos_CA[:, 1:], pos_C[:, 1:])],
        axis=1,
    )
    psi = jnp.concatenate(
        [dihedral_from_four_points(pos_N[:, :-1], pos_CA[:, :-1], pos_C[:, :-1], pos_N[:, 1:]), zero_col],
        axis=1,
    )

    mask_bb_dihed = jnp.stack([omega_mask, phi_mask, psi_mask], axis=-1)
    bb_dihedral = jnp.stack([omega, phi, psi], axis=-1) * mask_bb_dihed
    return bb_dihedral, mask_bb_dihed


def pairwise_dihedrals(pos_atoms) -> jax.Array:
    """Inter-residue Phi/Psi angles, (B, L, L, 2) (geometry.py:393-418).

    ir_phi[i, j] = dihedral(C_i, N_j, CA_j, C_j)
    ir_psi[i, j] = dihedral(N_i, CA_i, C_i, N_j)
    """
    pos_N = pos_atoms[:, :, BBHeavyAtom.N]
    pos_CA = pos_atoms[:, :, BBHeavyAtom.CA]
    pos_C = pos_atoms[:, :, BBHeavyAtom.C]

    ir_phi = dihedral_from_four_points(
        pos_C[:, :, None],
        pos_N[:, None, :],
        pos_CA[:, None, :],
        pos_C[:, None, :],
    )
    ir_psi = dihedral_from_four_points(
        pos_N[:, :, None],
        pos_CA[:, :, None],
        pos_C[:, :, None],
        pos_N[:, None, :],
    )
    return jnp.stack([ir_phi, ir_psi], axis=-1)
