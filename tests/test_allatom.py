"""Parity tests for dihedrals, torsion extraction, all-atom reconstruction."""

import jax.numpy as jnp
import numpy as np

from pepflowww_tpu.ops import allatom, dihedrals


def test_backbone_dihedrals_parity(golden):
    g = golden("dihedrals")
    bbd, bbd_mask = dihedrals.get_backbone_dihedral_angles(
        jnp.asarray(g["pos_atoms"]), jnp.asarray(g["chain_nb"]),
        jnp.asarray(g["res_nb"]), jnp.asarray(g["res_mask"]),
    )
    np.testing.assert_allclose(np.asarray(bbd), g["bb_dihedral"], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(bbd_mask), g["bb_dihedral_mask"])


def test_pairwise_dihedrals_parity(golden):
    g = golden("dihedrals")
    out = dihedrals.pairwise_dihedrals(jnp.asarray(g["pos_atoms"]))
    np.testing.assert_allclose(np.asarray(out), g["pairwise"], atol=1e-4)


def test_full_atom_reconstruction_parity(golden):
    g = golden("full_atom")
    pos14, R_frames, t_frames = allatom.full_atom_reconstruction(
        jnp.asarray(g["R_bb"]), jnp.asarray(g["t_bb"]),
        jnp.asarray(g["angles"]), jnp.asarray(g["aa"]),
    )
    np.testing.assert_allclose(np.asarray(pos14), g["pos14"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(R_frames), g["R_frames"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_frames), g["t_frames"], atol=2e-4)


def test_torsion_extraction_parity(golden):
    g = golden("torsion_extract")
    tor, tor_mask = allatom.get_torsion_angles(
        jnp.asarray(g["pos15"])[None], jnp.asarray(g["aa"])[None]
    )
    tor, tor_mask = np.asarray(tor)[0], np.asarray(tor_mask)[0]
    np.testing.assert_array_equal(tor_mask, g["torsion_mask"])
    # Compare angles where valid, modulo 2π.
    valid = g["torsion_mask"].astype(bool)
    diff = np.arctan2(
        np.sin(tor[valid] - g["torsion"][valid]),
        np.cos(tor[valid] - g["torsion"][valid]),
    )
    np.testing.assert_allclose(diff, np.zeros_like(diff), atol=1e-3)


def test_torsion_roundtrip(golden):
    """Angles -> full-atom -> extracted angles: chi exact; psi off by exactly π.

    The π offset on psi is reference behavior (verified against the torch
    implementation): the dataset psi convention is the N-CA-C-O dihedral
    (torsion.py:44-45) while the psi rigid-group frame (constants.py:724-729)
    interprets its rotation with a π offset. Both pipelines are internally
    consistent; we reproduce the quirk bit-for-bit.
    """
    g = golden("full_atom")
    pos14 = jnp.asarray(g["pos14"])
    pos15 = allatom.full_atom_to_pos15(pos14)
    tor, tor_mask = allatom.get_torsion_angles(pos15, jnp.asarray(g["aa"]))
    valid = np.asarray(tor_mask) & (np.asarray(allatom.torsions_mask_for(jnp.asarray(g["aa"]))) > 0.5)
    ang = np.asarray(g["angles"])
    diff = np.arctan2(np.sin(np.asarray(tor) - ang), np.cos(np.asarray(tor) - ang))
    chi_ok = np.abs(diff[..., 1:][valid[..., 1:]])
    assert chi_ok.max() < 1e-2
    psi_diff = np.abs(diff[..., 0][valid[..., 0]])
    assert np.all(np.abs(psi_diff - np.pi) < 1e-2)


def test_reconstruct_backbone_parity(golden):
    g = golden("reconstruct_backbone")
    bb = allatom.reconstruct_backbone(
        jnp.asarray(g["R"]), jnp.asarray(g["t"]), jnp.asarray(g["aa"]),
        jnp.asarray(g["chain_nb"]), jnp.asarray(g["res_nb"]), jnp.asarray(g["mask"]),
    )
    np.testing.assert_allclose(np.asarray(bb), g["bb_pos"], atol=2e-4)


def test_bb3_parity(golden):
    g = golden("bb3")
    out = allatom.bb3_atoms(jnp.asarray(g["trans"]), jnp.asarray(g["rots"]))
    np.testing.assert_allclose(np.asarray(out), g["bb3"], atol=1e-5)


def test_tables_parity(golden):
    g = golden("tables_check")
    from pepflowww_tpu import constants as C

    np.testing.assert_array_equal(C.TORSIONS_MASK, g["torsions_mask"])
    mask = allatom.heavyatom_mask_for(jnp.asarray(g["aa"]))
    np.testing.assert_array_equal(np.asarray(mask), g["heavy_mask"])


def test_pos15_to_atom37(golden):
    g = golden("full_atom")
    import jax.numpy as jnp
    pos15 = allatom.full_atom_to_pos15(jnp.asarray(g["pos14"]))
    a37, mask37 = allatom.pos15_to_atom37(pos15, jnp.asarray(g["aa"]))
    assert a37.shape == pos15.shape[:2] + (37, 3)
    # N/CA/C land in slots 0/1/2; O in slot 4 (AF2 order)
    np.testing.assert_allclose(np.asarray(a37)[..., 0, :], np.asarray(pos15)[..., 0, :])
    np.testing.assert_allclose(np.asarray(a37)[..., 1, :], np.asarray(pos15)[..., 1, :])
    np.testing.assert_allclose(np.asarray(a37)[..., 4, :], np.asarray(pos15)[..., 3, :])
    # every slot of the 15-atom layout (incl. OXT) maps exactly once
    from pepflowww_tpu import constants as C
    n_expected = C.HEAVYATOM_MASK[np.asarray(g["aa"])].sum()
    assert np.asarray(mask37).sum() == n_expected
