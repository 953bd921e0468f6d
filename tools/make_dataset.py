#!/usr/bin/env python
"""Build a PepMerge-style structure directory from complex PDBs.

Re-implements the reference's offline dataset-construction notebook
(`playgrounds/merge.ipynb`): for each receptor–peptide complex, write
`<out>/<id>/{peptide.pdb,pocket.pdb}` where the pocket is every receptor
residue with any heavy atom within `--cutoff` Å (default 10) of the peptide.

Input layouts supported:
  * a directory of PDB files with `--peptide_chain` naming the peptide chain
  * a TSV manifest: `id<TAB>pdb_path<TAB>peptide_chain`

Usage:
    python tools/make_dataset.py --pdbs raw/ --peptide_chain B --out Data/PepMerge_new
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pepflowww_tpu import constants as C
from pepflowww_tpu.data.collate import mask_select_data
from pepflowww_tpu.data.pdb import parse_pdb, save_pdb


def extract_pocket(complex_data: dict, pep_mask: np.ndarray, cutoff: float):
    """Receptor residues with any heavy atom within cutoff of any peptide atom."""
    pos = complex_data["pos_heavyatom"]
    mask = complex_data["mask_heavyatom"]
    pep_atoms = pos[pep_mask][mask[pep_mask]]           # (Npep_atoms, 3)
    rec_idx = np.flatnonzero(~pep_mask)
    near = np.zeros(len(pep_mask), dtype=bool)
    for ri in rec_idx:
        atoms = pos[ri][mask[ri]]
        if atoms.size == 0:
            continue
        d2 = np.square(atoms[:, None, :] - pep_atoms[None, :, :]).sum(-1)
        if (d2 <= cutoff**2).any():
            near[ri] = True
    return near


def process(complex_id: str, pdb_path: str, peptide_chain: str, out_dir: str,
            cutoff: float, min_len: int = 3, max_len: int = 25) -> bool:
    data, _ = parse_pdb(pdb_path)
    if data is None:
        return False
    pep_mask = np.asarray([c == peptide_chain for c in data["chain_id"]])
    n_pep = int(pep_mask.sum())
    if not (min_len <= n_pep <= max_len):
        return False
    pocket_mask = extract_pocket(data, pep_mask, cutoff)
    if pocket_mask.sum() == 0:
        return False

    cdir = os.path.join(out_dir, complex_id)
    os.makedirs(cdir, exist_ok=True)
    save_pdb(mask_select_data(data, pep_mask), os.path.join(cdir, "peptide.pdb"))
    save_pdb(mask_select_data(data, pocket_mask), os.path.join(cdir, "pocket.pdb"))
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pdbs", help="directory of complex PDB files")
    ap.add_argument("--manifest", help="TSV: id, pdb_path, peptide_chain")
    ap.add_argument("--peptide_chain", default="B")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cutoff", type=float, default=10.0)
    args = ap.parse_args()

    tasks = []
    if args.manifest:
        with open(args.manifest) as f:
            for line in f:
                cid, path, chain = line.strip().split("\t")
                tasks.append((cid, path, chain))
    elif args.pdbs:
        for name in sorted(os.listdir(args.pdbs)):
            if name.endswith(".pdb"):
                tasks.append((name[:-4], os.path.join(args.pdbs, name), args.peptide_chain))
    else:
        ap.error("need --pdbs or --manifest")

    ok = 0
    for cid, path, chain in tasks:
        try:
            ok += bool(process(cid, path, chain, args.out, args.cutoff))
        except Exception as e:  # noqa: BLE001 — per-complex isolation
            print(f"[{cid}] failed: {e}", file=sys.stderr)
    print(f"wrote {ok}/{len(tasks)} complexes to {args.out}")


if __name__ == "__main__":
    main()
