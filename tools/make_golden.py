"""Generate golden parity fixtures from the reference implementation.

Runs the reference's torch ops (/root/reference, CPU) on seeded random inputs
and snapshots inputs+outputs to tests/golden/*.npz. The JAX rebuild's tests
compare against these fixtures, so they stay valid even when the reference is
not on disk.

Usage: python tools/make_golden.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

torch.manual_seed(0)
np.random.seed(0)

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
os.makedirs(OUT_DIR, exist_ok=True)


def save(name, **arrays):
    path = os.path.join(OUT_DIR, f"{name}.npz")
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})
    print(f"wrote {path}: " + ", ".join(f"{k}{tuple(np.asarray(v).shape)}" for k, v in arrays.items()))


def rand_rotmats(shape, kind="generic"):
    from scipy.spatial.transform import Rotation

    n = int(np.prod(shape))
    if kind == "generic":
        R = Rotation.random(n, random_state=42).as_matrix()
    elif kind == "small":
        vec = np.random.randn(n, 3)
        vec = vec / np.linalg.norm(vec, axis=-1, keepdims=True)
        vec = vec * np.random.uniform(1e-9, 1e-4, (n, 1))
        R = Rotation.from_rotvec(vec).as_matrix()
    elif kind == "near_pi":
        vec = np.random.randn(n, 3)
        vec = vec / np.linalg.norm(vec, axis=-1, keepdims=True)
        vec = vec * np.random.uniform(np.pi - 5e-3, np.pi - 1e-7, (n, 1))
        R = Rotation.from_rotvec(vec).as_matrix()
    return R.reshape(tuple(shape) + (3, 3)).astype(np.float32)


# ---------------------------------------------------------------- so3
from data import so3_utils  # noqa: E402

mats = np.concatenate(
    [rand_rotmats((64,)), rand_rotmats((32,), "small"), rand_rotmats((32,), "near_pi")]
)
mats_t = torch.tensor(mats)
rotvec = so3_utils.rotmat_to_rotvec(mats_t)
roundtrip = so3_utils.rotvec_to_rotmat(rotvec)
base = torch.tensor(rand_rotmats((128,)))
vf = so3_utils.calc_rot_vf(base, mats_t)
t = torch.rand(128, 1)
geo = so3_utils.geodesic_t(t, mats_t, base)
vecs = torch.randn(128, 3) * torch.tensor(np.random.uniform(0, 4, (128, 1)), dtype=torch.float32)
exp_of_vec = so3_utils.rotvec_to_rotmat(vecs)
save(
    "so3",
    mats=mats, rotvec=rotvec, roundtrip=roundtrip,
    base=base, vf=vf, t=t.numpy(), geo=geo,
    vecs=vecs, exp_of_vec=exp_of_vec,
)

# ---------------------------------------------------------------- torus
import models_con.torus as torus  # noqa: E402

a = torch.rand(64, 5) * 2 * np.pi
b = torch.rand(64, 5) * 2 * np.pi
tt = torch.rand(64, 1)
save(
    "torus",
    a=a, b=b, t=tt,
    logmap=torus.tor_logmap(a, b),
    geodesic=torus.tor_geodesic_t(tt, a, b),
)

# ---------------------------------------------------------------- frames/geometry
from pepflow.modules.common import geometry  # noqa: E402

B, L, A = 2, 16, 15
center = torch.randn(B, L, 3) * 5
p1 = center + torch.randn(B, L, 3)
p2 = center + torch.randn(B, L, 3)
R = geometry.construct_3d_basis(center, p1, p2)
pts = torch.randn(B, L, A, 3) * 3
local = geometry.global_to_local(R, center, pts)
glob = geometry.local_to_global(R, center, local)
q6 = torch.randn(B, L, 3)
quat_R = geometry.quaternion_1ijk_to_rotation_matrix(q6)
rep6 = torch.randn(B, L, 6)
rep6_R = geometry.repr_6d_to_rotation_matrix(rep6)
save(
    "frames",
    center=center, p1=p1, p2=p2, R=R, pts=pts, local=local, glob=glob,
    q_vec=q6, quat_R=quat_R, rep6=rep6, rep6_R=rep6_R,
)

# compose_q_update_vec parity (openfold Rigid). data/utils.py imports
# torch_scatter (absent here); create the Rigid directly instead.
from openfold.utils import rigid_utils as ru  # noqa: E402

rots = torch.tensor(rand_rotmats((B, L)))
trans = torch.randn(B, L, 3) * 4
update = torch.randn(B, L, 6) * 0.3
mask = (torch.rand(B, L) > 0.3).float()[..., None]
rigid = ru.Rigid(rots=ru.Rotation(rot_mats=rots), trans=trans)
new_rigid = rigid.compose_q_update_vec(update, mask)
save(
    "rigid_update",
    rots=rots, trans=trans, update=update, mask=mask[..., 0],
    new_rots=new_rigid.get_rots().get_rot_mats(),
    new_trans=new_rigid.get_trans(),
)

# backbone dihedrals + pairwise
chain_nb = torch.zeros(B, L, dtype=torch.long)
chain_nb[:, L // 2:] = 1
res_nb = torch.cat([torch.arange(1, L // 2 + 1), torch.arange(1, L - L // 2 + 1)]).repeat(B, 1)
res_mask = torch.ones(B, L).bool()
pos_atoms = torch.randn(B, L, A, 3) * 3
bbd, bbd_mask = geometry.get_backbone_dihedral_angles(pos_atoms, chain_nb, res_nb, res_mask)
pair_dihed = geometry.pairwise_dihedrals(pos_atoms)
save(
    "dihedrals",
    pos_atoms=pos_atoms, chain_nb=chain_nb, res_nb=res_nb, res_mask=res_mask,
    bb_dihedral=bbd, bb_dihedral_mask=bbd_mask, pairwise=pair_dihed,
)

# ---------------------------------------------------------------- all-atom
from models_con import torsion as ref_torsion  # noqa: E402
from pepflow.modules.protein import constants as ref_C  # noqa: E402

aa = torch.randint(0, 20, (B, L))
R_bb = torch.tensor(rand_rotmats((B, L)))
t_bb = torch.randn(B, L, 3) * 8
angles = torch.rand(B, L, 5) * 2 * np.pi
pos14, R_frames, t_frames = ref_torsion.full_atom_reconstruction(R_bb, t_bb, angles, aa)
save(
    "full_atom",
    aa=aa, R_bb=R_bb, t_bb=t_bb, angles=angles,
    pos14=pos14, R_frames=R_frames, t_frames=t_frames,
)

# torsion extraction from the reconstructed structure (single item)
pos15 = torch.cat([pos14, torch.zeros(B, L, 1, 3)], dim=2)
tor0, tor0_mask = ref_torsion.get_torsion_angle(pos15[0], aa[0])
save("torsion_extract", pos15=pos15[0], aa=aa[0], torsion=tor0, torsion_mask=tor0_mask)

# backbone reconstruction
bb_pos = geometry.reconstruct_backbone(R_bb, t_bb, aa, chain_nb, res_nb, res_mask)
save(
    "reconstruct_backbone",
    R=R_bb, t=t_bb, aa=aa, chain_nb=chain_nb, res_nb=res_nb, mask=res_mask,
    bb_pos=bb_pos,
)

# bb3 atoms for the aux loss (to_atom37[:, :, :3]).
# data/all_atom.py transitively imports Bio and torch_scatter which are not in
# this image; stub them (none of their symbols are on the to_atom37 path).
import types  # noqa: E402

for name in ["Bio", "Bio.PDB", "Bio.PDB.Chain"]:
    mod = types.ModuleType(name)
    sys.modules.setdefault(name, mod)
sys.modules["Bio.PDB"].PDBParser = object
sys.modules["Bio.PDB"].MMCIFParser = object
sys.modules["Bio.PDB.Chain"].Chain = object
ts_mod = types.ModuleType("torch_scatter")
ts_mod.scatter_add = None
ts_mod.scatter = None
sys.modules.setdefault("torch_scatter", ts_mod)

from data import all_atom  # noqa: E402

bb3 = all_atom.to_atom37(t_bb, R_bb)[:, :, :3]
save("bb3", trans=t_bb, rots=R_bb, bb3=bb3)

# heavyatom masks + torsions mask tables
save(
    "tables_check",
    torsions_mask=ref_torsion.torsions_mask,
    heavy_mask=ref_torsion.get_heavyatom_mask(aa),
    aa=aa,
)
print("done")
