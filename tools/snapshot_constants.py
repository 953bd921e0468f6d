"""Snapshot chemical-constant tables (pure data) from the reference implementation.

Run once with /root/reference on disk; writes pepflowww_tpu/ops/_tables.npz.
The tables are AlphaFold2/diffab chemical facts (atom layouts, chi definitions,
idealized coordinates, rigid-group frames) — data, not code. Sources:
  /root/reference/pepflow/modules/protein/constants.py (enums + builders)
  /root/reference/data/residue_constants.py (AF2 atom14 tables)
"""
import sys
import numpy as np

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402
from pepflow.modules.protein import constants as C  # noqa: E402
from data import residue_constants as rc  # noqa: E402

out = {}

# --- 15-atom (heavyatom) layout ------------------------------------------------
# per-restype heavy atom name table -> encode presence mask + name list as bytes
names22 = []
heavy_mask = np.zeros((22, 15), dtype=bool)
for i in range(22):
    if i <= 20:
        names = C.restype_to_heavyatom_names[C.AA(i)] if i <= 20 else [""] * 15
    else:
        names = [""] * 15
    names22.append(",".join(names))
    heavy_mask[i] = np.array([n != "" for n in names])
out["heavyatom_names"] = np.array(names22)
out["heavyatom_mask"] = heavy_mask          # includes OXT slot
# mask used for generation (excludes OXT), cf. models_con/torsion.py:122-124
gen_mask = np.zeros((22, 15), dtype=bool)
for i in range(21):
    names = C.restype_to_heavyatom_names[C.AA(i)]
    gen_mask[i] = np.array([n != "" and n != "OXT" for n in names])
out["heavyatom_mask_gen"] = gen_mask

# --- chi / torsion tables -----------------------------------------------------
out["chi_angles_mask"] = np.array([C.chi_angles_mask[C.AA(i)] for i in range(21)], dtype=np.float32)  # (21,4)
# torsions_mask (22,5): [psi ok] + chi mask, cf. models_con/torsion.py:230-232
tm = np.zeros((22, 5), dtype=np.float32)
for i in range(21):
    tm[i] = np.array([1.0] + [float(x) for x in C.chi_angles_mask[C.AA(i)]])
out["torsions_mask"] = tm
# chi atom indices into the 15-atom layout: (21, 4, 4), -1 where undefined
chi_idx = np.full((21, 4, 4), -1, dtype=np.int32)
for i in range(20):
    aa = C.AA(i)
    for ci, four in enumerate(C.chi_angles_atoms[aa]):
        for k, name in enumerate(four):
            chi_idx[i, ci, k] = C.restype_to_heavyatom_names[aa].index(name)
out["chi_atom_indices"] = chi_idx

# --- rigid group tables (frame composition, Alg 24) ---------------------------
out["rigid_group_rotation"] = C.restype_rigid_group_rotation.numpy()        # (21,8,3,3)
out["rigid_group_translation"] = C.restype_rigid_group_translation.numpy()  # (21,8,3)
out["heavyatom_to_rigid_group"] = C.restype_heavyatom_to_rigid_group.numpy()        # (21,14)
out["heavyatom_rigid_group_positions"] = C.restype_heavyatom_rigid_group_positions.numpy()  # (21,14,3)

# --- idealized backbone coords (diffab) ---------------------------------------
out["backbone_atom_coordinates"] = C.backbone_atom_coordinates_tensor.numpy()  # (21,3,3)
out["bb_oxygen_coordinate"] = C.bb_oxygen_coordinate_tensor.numpy()            # (21,3)

# --- AF2 atom14 tables (for bb_atom aux loss path, data/all_atom.py:33-36) ----
out["af2_atom14_rigid_group_positions"] = np.array(rc.restype_atom14_rigid_group_positions, dtype=np.float32)  # (21,14,3)
out["af2_rigid_group_default_frame"] = np.array(rc.restype_rigid_group_default_frame, dtype=np.float32)        # (21,8,4,4)
out["af2_atom14_mask"] = np.array(rc.restype_atom14_mask, dtype=np.float32)     # (21,14)
out["af2_atom14_to_rigid_group"] = np.array(rc.restype_atom14_to_rigid_group, dtype=np.int32)  # (21,14)

np.savez_compressed("pepflowww_tpu/ops/_tables.npz", **out)
print("wrote pepflowww_tpu/ops/_tables.npz with", len(out), "tables")
for k, v in out.items():
    print(f"  {k}: {getattr(v, 'shape', None)} {getattr(v, 'dtype', None)}")
