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
    args = ap.parse_args()

    from pepflowww_tpu.data.pdb import save_pdb
    from pepflowww_tpu.data.synthetic import make_complex

    rng = np.random.default_rng(args.seed)
    for i in range(args.n):
        pep_len = int(rng.integers(3, 26))
        rec_len = int(rng.integers(args.min_rec, args.max_rec + 1))
        item = make_complex(rng, pep_len=pep_len, rec_len=rec_len,
                            complex_id=f"synth_{i:04d}")
        cdir = os.path.join(args.out, f"synth_{i:04d}")
        os.makedirs(cdir, exist_ok=True)
        sel = item["generate_mask"]

        def subset(keep):
            return {
                k: (v[keep] if isinstance(v, np.ndarray)
                    else [x for x, s in zip(v, keep) if s])
                for k, v in item.items()
                if k not in ("id", "generate_mask", "torsion_angle",
                             "torsion_angle_mask")
            }

        save_pdb(subset(sel), os.path.join(cdir, "peptide.pdb"))
        save_pdb(subset(~sel), os.path.join(cdir, "pocket.pdb"))
    print(f"wrote {args.n} complexes under {args.out}")


if __name__ == "__main__":
    main()
