"""Chemical constants and static tables.

Mirrors the data layer of the reference implementation
(`pepflow/modules/protein/constants.py` in Ced3-han/PepFlowww): the 21-way
amino-acid vocabulary (+UNK, +PAD), the 15-slot heavy-atom layout, chi-angle
definitions, AF2-style rigid-group frames and idealized coordinates.

The numeric tables are loaded from ``ops/_tables.npz`` which was snapshotted
once from the reference's table *builders* (see ``tools/snapshot_constants.py``)
to eliminate transcription risk; they are chemical facts, not code.

All tables are plain numpy arrays. Under ``jax.jit`` they are closed over as
constants and constant-folded by XLA, so there is no runtime table upload cost.
"""

from __future__ import annotations

import enum
import os

import numpy as np

# ---------------------------------------------------------------------------
# Scalars (cf. reference constants.py:6-9,91-93)
# ---------------------------------------------------------------------------
NM_TO_ANG_SCALE = 10.0
ANG_TO_NM_SCALE = 1.0 / NM_TO_ANG_SCALE

PAD_RESIDUE_INDEX = 21
MAX_NUM_HEAVYATOMS = 15
NUM_AA_TYPES = 21          # 20 canonical + UNK
NUM_AA_CLASSES = 20        # flow-matched sequence classes
MAX_AA_TYPES = 22          # embedding vocabulary: 20 + UNK + PAD

# Frame indices into the 8-slot rigid-group axis
# (cf. reference constants.py:44-50)
BACKBONE_FRAME = 0
OMEGA_FRAME = 1
PHI_FRAME = 2
PSI_FRAME = 3
CHI1_FRAME, CHI2_FRAME, CHI3_FRAME, CHI4_FRAME = 4, 5, 6, 7


class AA(enum.IntEnum):
    """Amino-acid vocabulary, index-compatible with the reference AA enum
    (reference constants.py:53-71)."""

    ALA = 0; CYS = 1; ASP = 2; GLU = 3; PHE = 4
    GLY = 5; HIS = 6; ILE = 7; LYS = 8; LEU = 9
    MET = 10; ASN = 11; PRO = 12; GLN = 13; ARG = 14
    SER = 15; THR = 16; VAL = 17; TRP = 18; TYR = 19
    UNK = 20

    @classmethod
    def _missing_(cls, value):
        if isinstance(value, str) and len(value) == 3:
            name = NON_STANDARD_RESIDUE_SUBSTITUTIONS.get(value, value)
            if name in cls.__members__:
                return cls.__members__[name]
        elif isinstance(value, str) and len(value) == 1:
            if value in RESSYMB_TO_RESINDEX:
                return cls(RESSYMB_TO_RESINDEX[value])
        return super()._missing_(value)

    def __str__(self) -> str:
        return self.name

    @classmethod
    def is_aa(cls, value) -> bool:
        return (
            value in RESSYMB_TO_RESINDEX
            or value in NON_STANDARD_RESIDUE_SUBSTITUTIONS
            or value in cls.__members__
        )


class BBHeavyAtom(enum.IntEnum):
    """Backbone heavy-atom slots in the 15-atom layout
    (reference constants.py:88)."""

    N = 0; CA = 1; C = 2; O = 3; CB = 4; OXT = 14


RESSYMB_TO_RESINDEX = {
    'A': 0, 'C': 1, 'D': 2, 'E': 3, 'F': 4,
    'G': 5, 'H': 6, 'I': 7, 'K': 8, 'L': 9,
    'M': 10, 'N': 11, 'P': 12, 'Q': 13, 'R': 14,
    'S': 15, 'T': 16, 'V': 17, 'W': 18, 'Y': 19,
    'X': 20,
}
RESINDEX_TO_RESSYMB = {v: k for k, v in RESSYMB_TO_RESINDEX.items()}

# PDB chemical-component remapping of modified residues onto their canonical
# parents (standard table, cf. reference constants.py:14-31).
NON_STANDARD_RESIDUE_SUBSTITUTIONS = {
    '2AS': 'ASP', '3AH': 'HIS', '5HP': 'GLU', 'ACL': 'ARG', 'AGM': 'ARG',
    'AIB': 'ALA', 'ALM': 'ALA', 'ALO': 'THR', 'ALY': 'LYS', 'ARM': 'ARG',
    'ASA': 'ASP', 'ASB': 'ASP', 'ASK': 'ASP', 'ASL': 'ASP', 'ASQ': 'ASP',
    'AYA': 'ALA', 'BCS': 'CYS', 'BHD': 'ASP', 'BMT': 'THR', 'BNN': 'ALA',
    'BUC': 'CYS', 'BUG': 'LEU', 'C5C': 'CYS', 'C6C': 'CYS', 'CAS': 'CYS',
    'CCS': 'CYS', 'CEA': 'CYS', 'CGU': 'GLU', 'CHG': 'ALA', 'CLE': 'LEU',
    'CME': 'CYS', 'CSD': 'ALA', 'CSO': 'CYS', 'CSP': 'CYS', 'CSS': 'CYS',
    'CSW': 'CYS', 'CSX': 'CYS', 'CXM': 'MET', 'CY1': 'CYS', 'CY3': 'CYS',
    'CYG': 'CYS', 'CYM': 'CYS', 'CYQ': 'CYS', 'DAH': 'PHE', 'DAL': 'ALA',
    'DAR': 'ARG', 'DAS': 'ASP', 'DCY': 'CYS', 'DGL': 'GLU', 'DGN': 'GLN',
    'DHA': 'ALA', 'DHI': 'HIS', 'DIL': 'ILE', 'DIV': 'VAL', 'DLE': 'LEU',
    'DLY': 'LYS', 'DNP': 'ALA', 'DPN': 'PHE', 'DPR': 'PRO', 'DSN': 'SER',
    'DSP': 'ASP', 'DTH': 'THR', 'DTR': 'TRP', 'DTY': 'TYR', 'DVA': 'VAL',
    'EFC': 'CYS', 'FLA': 'ALA', 'FME': 'MET', 'GGL': 'GLU', 'GL3': 'GLY',
    'GLZ': 'GLY', 'GMA': 'GLU', 'GSC': 'GLY', 'HAC': 'ALA', 'HAR': 'ARG',
    'HIC': 'HIS', 'HIP': 'HIS', 'HMR': 'ARG', 'HPQ': 'PHE', 'HTR': 'TRP',
    'HYP': 'PRO', 'IAS': 'ASP', 'IIL': 'ILE', 'IYR': 'TYR', 'KCX': 'LYS',
    'LLP': 'LYS', 'LLY': 'LYS', 'LTR': 'TRP', 'LYM': 'LYS', 'LYZ': 'LYS',
    'MAA': 'ALA', 'MEN': 'ASN', 'MHS': 'HIS', 'MIS': 'SER', 'MLE': 'LEU',
    'MPQ': 'GLY', 'MSA': 'GLY', 'MSE': 'MET', 'MVA': 'VAL', 'NEM': 'HIS',
    'NEP': 'HIS', 'NLE': 'LEU', 'NLN': 'LEU', 'NLP': 'LEU', 'NMC': 'GLY',
    'OAS': 'SER', 'OCS': 'CYS', 'OMT': 'MET', 'PAQ': 'TYR', 'PCA': 'GLU',
    'PEC': 'CYS', 'PHI': 'PHE', 'PHL': 'PHE', 'PR3': 'CYS', 'PRR': 'ALA',
    'PTR': 'TYR', 'PYX': 'CYS', 'SAC': 'SER', 'SAR': 'GLY', 'SCH': 'CYS',
    'SCS': 'CYS', 'SCY': 'CYS', 'SEL': 'SER', 'SEP': 'SER', 'SET': 'SER',
    'SHC': 'CYS', 'SHR': 'LYS', 'SMC': 'CYS', 'SOC': 'CYS', 'STY': 'TYR',
    'SVA': 'SER', 'TIH': 'ALA', 'TPL': 'TRP', 'TPO': 'THR', 'TPQ': 'ALA',
    'TRG': 'LYS', 'TRO': 'TRP', 'TYB': 'TYR', 'TYI': 'TYR', 'TYQ': 'TYR',
    'TYS': 'TYR', 'TYY': 'TYR',
    'ALA': 'ALA', 'CYS': 'CYS', 'ASP': 'ASP', 'GLU': 'GLU', 'PHE': 'PHE',
    'GLY': 'GLY', 'HIS': 'HIS', 'ILE': 'ILE', 'LYS': 'LYS', 'LEU': 'LEU',
    'MET': 'MET', 'ASN': 'ASN', 'PRO': 'PRO', 'GLN': 'GLN', 'ARG': 'ARG',
    'SER': 'SER', 'THR': 'THR', 'VAL': 'VAL', 'TRP': 'TRP', 'TYR': 'TYR',
    'UNK': 'UNK',
}

# ---------------------------------------------------------------------------
# Numeric tables (snapshotted data; see module docstring)
# ---------------------------------------------------------------------------
_TABLES_PATH = os.path.join(os.path.dirname(__file__), "ops", "_tables.npz")
_T = np.load(_TABLES_PATH, allow_pickle=False)

#: (22, 15) bool — which of the 15 heavy-atom slots exist per restype (incl OXT)
HEAVYATOM_MASK: np.ndarray = _T["heavyatom_mask"]
#: (22, 15) bool — atom slots used when *generating* structures (excludes OXT),
#: cf. reference torsion.py:122-124
HEAVYATOM_MASK_GEN: np.ndarray = _T["heavyatom_mask_gen"]
#: per-restype heavy atom names; list of 22 lists of 15 strings
HEAVYATOM_NAMES = [s.split(",") for s in _T["heavyatom_names"].tolist()]

#: (21, 4) float32 — which chi angles exist per restype
CHI_ANGLES_MASK: np.ndarray = _T["chi_angles_mask"]
#: (22, 5) float32 — [psi, chi1..4] validity per restype (UNK/PAD rows zero),
#: cf. reference torsion.py:230-232
TORSIONS_MASK: np.ndarray = _T["torsions_mask"]
#: (21, 4, 4) int32 — heavy-atom slot indices of the 4 atoms defining each chi,
#: -1 where the chi is undefined
CHI_ATOM_INDICES: np.ndarray = _T["chi_atom_indices"]

#: (21, 8, 3, 3) / (21, 8, 3) — rigid-group frame (R, t) of each torsion frame
#: relative to its parent (AF2 Alg. 24 tables)
RIGID_GROUP_ROTATION: np.ndarray = _T["rigid_group_rotation"]
RIGID_GROUP_TRANSLATION: np.ndarray = _T["rigid_group_translation"]
#: (21, 14) int — owning rigid group of each atom14 slot
HEAVYATOM_TO_RIGID_GROUP: np.ndarray = _T["heavyatom_to_rigid_group"].astype(np.int32)
#: (21, 14, 3) — idealized atom coordinates within their rigid group
HEAVYATOM_RIGID_GROUP_POSITIONS: np.ndarray = _T["heavyatom_rigid_group_positions"]

#: (21, 3, 3) — idealized N/CA/C local coordinates (diffab tables)
BACKBONE_ATOM_COORDINATES: np.ndarray = _T["backbone_atom_coordinates"]
#: (21, 3) — idealized O coordinate in the psi frame
BB_OXYGEN_COORDINATE: np.ndarray = _T["bb_oxygen_coordinate"]

#: AF2 atom14 tables used by the bb-atom aux loss path
#: (cf. reference data/all_atom.py:33-36)
AF2_ATOM14_RIGID_GROUP_POSITIONS: np.ndarray = _T["af2_atom14_rigid_group_positions"]
AF2_ATOM14_MASK: np.ndarray = _T["af2_atom14_mask"]
AF2_ATOM14_TO_RIGID_GROUP: np.ndarray = _T["af2_atom14_to_rigid_group"]

#: (3, 3) — idealized local N/CA/C coordinates of ALA in the AF2 atom14 frame;
#: this is exactly what `to_atom37(trans, rots)[:, :, :3]` resolves to in the
#: reference (all_atom.py:39-45 with aatype=0), used by the bb-atom aux loss.
BB3_IDEAL_COORDS: np.ndarray = AF2_ATOM14_RIGID_GROUP_POSITIONS[0, :3].astype(np.float32)
