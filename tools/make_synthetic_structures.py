#!/usr/bin/env python
"""Write a PepMerge-style structure directory of synthetic complexes.

Each complex gets `<out>/<id>/{peptide.pdb,pocket.pdb}` with varied peptide
(3-25) and pocket sizes, exercising the real preprocessing + length-bucketed
loading path (PepDataset -> RecordStore -> DataLoader) without PepMerge.

Usage: python tools/make_synthetic_structures.py --out /tmp/structs --n 40
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--min_rec", type=int, default=15)
    ap.add_argument("--max_rec", type=int, default=110)
    ap.add_argument("--raw", action="store_true",
                    help="write one RAW complex PDB per id (receptor chain B "
                         "+ peptide chain A in a single file) instead of the "
                         "pre-split peptide.pdb/pocket.pdb pair — the input "
                         "layout tools/make_dataset.py consumes, so the full "
                         "merge.ipynb-equivalent pocket@10A carve can run on "
                         "synthetic data (round-3 rehearsal)")
    args = ap.parse_args()

    from pepflowww_tpu.data.pdb import save_pdb
    from pepflowww_tpu.data.synthetic import make_complex, make_raw_complex

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.n):
        pep_len = int(rng.integers(3, 26))
        rec_len = int(rng.integers(args.min_rec, args.max_rec + 1))
        gen = make_raw_complex if args.raw else make_complex
        item = gen(rng, pep_len=pep_len, rec_len=rec_len,
                   complex_id=f"synth_{i:04d}")
        sel = item["generate_mask"]

        def subset(keep):
            return {
                k: (v[keep] if isinstance(v, np.ndarray)
                    else [x for x, s in zip(v, keep) if s])
                for k, v in item.items()
                if k not in ("id", "generate_mask", "torsion_angle",
                             "torsion_angle_mask")
            }

        if args.raw:
            # single complex file; make_complex's receptor is a chain walk,
            # so its far end genuinely falls outside the 10 A pocket cutoff
            save_pdb(subset(np.ones_like(sel)),
                     os.path.join(args.out, f"synth_{i:04d}.pdb"))
        else:
            cdir = os.path.join(args.out, f"synth_{i:04d}")
            os.makedirs(cdir, exist_ok=True)
            save_pdb(subset(sel), os.path.join(cdir, "peptide.pdb"))
            save_pdb(subset(~sel), os.path.join(cdir, "pocket.pdb"))
    print(f"wrote {args.n} complexes under {args.out}")


if __name__ == "__main__":
    main()
