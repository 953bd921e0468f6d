#!/usr/bin/env python
"""Sampling CLI: generate peptides for complexes and write full-atom PDBs.

Covers the reference's `models_con/sample.py` (backbone-only and full-atom
trajectory -> PDB conversion) and the generation half of
`models_con/inference.py`: for each test complex, replicate x num_samples,
run the 100-step ODE, reconstruct all atoms, write one PDB per sample plus an
outputs.csv of online metrics.

Usage:
    python sample.py --ckpt logs/run/checkpoints/20000 \
        --structure_dir Data/PepMerge_new --dataset_dir Data/cache \
        --dataset_name pep_pocket_test --out results/ --num_samples 16
    python sample.py --torch_ckpt model1.pt --synthetic --out results/
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="configs/learn_angle.yaml")
    ap.add_argument("--ckpt", type=str, default=None, help="orbax checkpoint dir")
    ap.add_argument("--torch_ckpt", type=str, default=None, help="reference .pt checkpoint")
    ap.add_argument("--out", type=str, default="./results")
    ap.add_argument("--num_samples", type=int, default=16)
    ap.add_argument("--num_steps", type=int, default=100)
    ap.add_argument("--seed", type=int, default=114514)
    ap.add_argument("--sample_bb", type=int, default=1)
    ap.add_argument("--sample_ang", type=int, default=1)
    ap.add_argument("--sample_seq", type=int, default=1)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--structure_dir", type=str, default=None)
    ap.add_argument("--dataset_dir", type=str, default=None)
    ap.add_argument("--dataset_name", type=str, default="pep_pocket_test")
    ap.add_argument("--max_complexes", type=int, default=None)
    ap.add_argument("--dp", action="store_true",
                    help="shard sampling over all local devices")
    ap.add_argument("--tp", type=int, default=0,
                    help="tensor-parallel factor: shard the L² pair tensors "
                         "over this many devices on a 2-D (data, model) mesh "
                         "(pair-row sharding, parallel/tp.py) for models/"
                         "lengths whose pair activations exceed one chip's "
                         "HBM; remaining devices data-parallel")
    ap.add_argument("--platform", type=str, default=None,
                    help="force a jax platform (e.g. cpu — the axon TPU "
                         "plugin ignores JAX_PLATFORMS, so this sets the "
                         "config knob, same as train.py)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from pepflowww_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from pepflowww_tpu import metrics as M
    from pepflowww_tpu import sampling
    from pepflowww_tpu.data.collate import device_batch, pad_and_collate, replicate_item
    from pepflowww_tpu.inference import reconstruct_full_atom_outputs, write_sample_pdbs
    from pepflowww_tpu.models.flow import FlowModel
    from pepflowww_tpu.training.config import load_config

    model_cfg, cfg, _ = load_config(args.config)
    model = FlowModel(model_cfg)

    # ---- items ----
    if args.synthetic:
        from pepflowww_tpu.data.synthetic import make_complex

        rng = np.random.default_rng(args.seed)
        items = [make_complex(rng, pep_len=12, rec_len=48, complex_id=f"synth{i}")
                 for i in range(args.max_complexes or 4)]
    else:
        from pepflowww_tpu.data.dataset import PepDataset

        ds = PepDataset(args.structure_dir, args.dataset_dir, name=args.dataset_name)
        n = len(ds) if args.max_complexes is None else min(len(ds), args.max_complexes)
        items = [ds[i] for i in range(n)]

    # ---- params ----
    example = device_batch(pad_and_collate(replicate_item(items[0], 2)))
    example = {k: jnp.asarray(v) for k, v in example.items()}
    key = jax.random.PRNGKey(args.seed)
    params = jax.jit(model.init)({"params": key, "corruption": key}, example)["params"]
    if args.torch_ckpt:
        from pepflowww_tpu.convert import load_torch_checkpoint

        params = load_torch_checkpoint(args.torch_ckpt)
    elif args.ckpt:
        from pepflowww_tpu.training import checkpoints as ckpt_lib
        from pepflowww_tpu.training.optim import make_optimizer

        tx = make_optimizer(dict(cfg.train["optimizer"]), cfg.train["max_grad_norm"])
        restored = ckpt_lib.restore_checkpoint(
            args.ckpt, {"params": params, "opt_state": tx.init(params),
                        "scheduler": {"best": 0.0, "num_bad": 0}, "iteration": 0}
        )
        params = restored["params"]

    os.makedirs(args.out, exist_ok=True)
    rows = []
    sampler_cache = {}
    for item in items:
        batch_np = pad_and_collate(replicate_item(item, args.num_samples))
        batch = {k: jnp.asarray(v) for k, v in device_batch(batch_np).items()}
        L = batch["aa"].shape[1]
        if L not in sampler_cache:
            if args.tp:
                from pepflowww_tpu.parallel.tp import make_mesh_2d

                n_dev = len(jax.devices())
                assert n_dev % args.tp == 0, (n_dev, args.tp)
                sampler_cache[L] = sampling.make_tp_sampler(
                    model, make_mesh_2d(n_dev // args.tp, args.tp),
                    num_steps=args.num_steps,
                    sample_bb=bool(args.sample_bb),
                    sample_ang=bool(args.sample_ang),
                    sample_seq=bool(args.sample_seq),
                )
            elif args.dp:
                from pepflowww_tpu.parallel.mesh import make_mesh

                # Pallas profile -> shard_map path (keeps the fused kernels
                # per chip on a pod); XLA profile -> automatic SPMD
                # (sampling.make_best_dp_sampler docstring).
                sampler_cache[L] = sampling.make_best_dp_sampler(
                    model, make_mesh(), num_steps=args.num_steps,
                    sample_bb=bool(args.sample_bb),
                    sample_ang=bool(args.sample_ang),
                    sample_seq=bool(args.sample_seq),
                )
            else:
                sampler_cache[L] = sampling.make_sampler(
                    model, num_steps=args.num_steps, sample_bb=bool(args.sample_bb),
                    sample_ang=bool(args.sample_ang), sample_seq=bool(args.sample_seq),
                )
        key, k = jax.random.split(key)
        out = sampler_cache[L](params, batch, k)
        m = M.evaluate_sample(out, batch)
        for s in range(args.num_samples):
            rows.append({
                "id": item["id"], "sample": s,
                "ca_rmsd": float(m["ca_rmsd"][s]),
                "ca_rmsd_aligned": float(m["ca_rmsd_aligned"][s]),
                "aar": float(m["aar"][s]),
                "tm_score": float(m["tm_score"][s]),
            })
        write_sample_pdbs(out, batch_np, os.path.join(args.out, item["id"]))
        print(f"{item['id']}: rmsd={m['ca_rmsd'].mean():.2f} aar={m['aar'].mean():.3f}")

    with open(os.path.join(args.out, "outputs.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} rows to {os.path.join(args.out, 'outputs.csv')}")

    # Paper-table aggregation (the reference does this in its notebooks).
    import json

    from pepflowww_tpu.metrics import summarize_outputs

    summary = summarize_outputs(rows)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    ov = summary["overall"]
    print("summary: " + " ".join(
        f"{k}={v:.3f}" if isinstance(v, float) else f"{k}={v}"
        for k, v in sorted(ov.items())))


if __name__ == "__main__":
    main()
