"""Stub the optional deps missing from this image so /root/reference imports.

The reference transitively imports Biopython, torch_scatter, lmdb, easydict,
wandb, omegaconf and tqdm; none are needed for the model forward pass.
"""

import sys
import types


def install():
    sys.path.insert(0, "/root/reference")

    for name in [
        "Bio", "Bio.PDB", "Bio.PDB.Chain", "Bio.PDB.PDBExceptions",
        "Bio.PDB.Residue", "Bio.PDB.PDBParser", "Bio.PDB.MMCIFParser",
        "Bio.PDB.StructureBuilder", "Bio.SeqUtils",
    ]:
        sys.modules.setdefault(name, types.ModuleType(name))

    class _PDBConstructionException(Exception):
        pass

    bio = sys.modules["Bio"]
    pdb = sys.modules["Bio.PDB"]
    pdb.PDBParser = object
    pdb.MMCIFParser = object
    pdb.Selection = object
    pdb.PDBIO = object
    pdb.StructureBuilder = object
    pdb.PDBExceptions = sys.modules["Bio.PDB.PDBExceptions"]
    sys.modules["Bio.PDB.PDBExceptions"].PDBConstructionException = _PDBConstructionException
    sys.modules["Bio.PDB.Chain"].Chain = object
    sys.modules["Bio.PDB.Residue"].Residue = object
    sys.modules["Bio.PDB.StructureBuilder"].StructureBuilder = object
    sys.modules["Bio.PDB.PDBParser"].PDBParser = object
    sys.modules["Bio.PDB.MMCIFParser"].MMCIFParser = object
    sys.modules["Bio.SeqUtils"].seq1 = lambda x: x
    bio.BiopythonWarning = Warning
    bio.PDB = pdb

    for extra in ["torch_scatter", "lmdb", "easydict", "wandb", "omegaconf"]:
        if extra in sys.modules:
            continue
        try:
            __import__(extra)
        except ImportError:
            sys.modules[extra] = types.ModuleType(extra)

    if not hasattr(sys.modules["easydict"], "EasyDict"):
        class EasyDict(dict):
            def __getattr__(self, k):
                v = self[k]
                return EasyDict(v) if isinstance(v, dict) else v

            def __setattr__(self, k, v):
                self[k] = v

        sys.modules["easydict"].EasyDict = EasyDict
    if not hasattr(sys.modules["omegaconf"], "OmegaConf"):
        sys.modules["omegaconf"].OmegaConf = object
    if not hasattr(sys.modules["torch_scatter"], "scatter_add"):
        sys.modules["torch_scatter"].scatter_add = None
        sys.modules["torch_scatter"].scatter = None
    if not hasattr(sys.modules["wandb"], "init"):
        sys.modules["wandb"].init = lambda **kw: None
        sys.modules["wandb"].log = lambda *a, **kw: None

    # models_con/pep_dataloader.py opens a hard-coded cluster path at import
    # time; flow_model only needs its PepDataset symbol.
    if "models_con.pep_dataloader" not in sys.modules:
        import models_con  # namespace package under /root/reference

        fake = types.ModuleType("models_con.pep_dataloader")
        fake.PepDataset = object
        fake.preprocess_structure = None
        sys.modules["models_con.pep_dataloader"] = fake
        models_con.pep_dataloader = fake
