#!/usr/bin/env python
"""Train-MFU / sampler-pps width sweep on the real chip (PERF.md scaling
story; VERDICT r3 item 2).

Sweeps the flagship architecture at 1x/2x/4x/8x channel width (c_s, c_z,
c_hidden scale together; heads/points fixed) and reports per-width train
step time, samples/sec, compiled-FLOPs MFU against the chip's bf16 peak,
and sampler pps. Widths whose activations exceed one chip's HBM drop the
batch size (noted in the row); beyond that the TP pair-row axis
(parallel/tp.py, tests/test_tp.py) is the framework's path — not
measurable here with one real chip.

Usage: python tools/width_sweep.py [--widths 1,2,4,8] [--out artifacts/width_sweep.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # repo-root bench.py: _make_batch, _compiled_flops, _peak_tflops


def run_width(width: int, batch: int):
    import jax
    import jax.numpy as jnp

    from pepflowww_tpu.models.flow import FlowModel, FlowModelConfig
    from pepflowww_tpu.models.trunk import IPAConfig
    from pepflowww_tpu.training.optim import make_optimizer
    from pepflowww_tpu.training.train_step import make_train_step
    from pepflowww_tpu import sampling

    cfg = FlowModelConfig(
        node_embed_size=128 * width,
        edge_embed_size=64 * width,
        ipa=IPAConfig(
            c_s=128 * width, c_z=64 * width, c_hidden=128 * width,
            no_heads=8, no_qk_points=8, no_v_points=12,
            seq_tfmr_num_heads=8 if width > 1 else 4, seq_tfmr_num_layers=2,
            num_blocks=6, dtype="bfloat16", use_pallas=True,
        ),
    )
    model = FlowModel(cfg)
    b = bench._make_batch(batch, bench.PEP_LEN, bench.REC_LEN, bench.PAD_TO)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)({"params": key, "corruption": key}, b)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    tx = make_optimizer({"type": "adam", "lr": 5e-4}, max_grad_norm=100.0)
    opt_state = tx.init(params)
    weights = {"trans_loss": 0.5, "rot_loss": 0.5, "bb_atom_loss": 0.25,
               "seqs_loss": 1.0, "angle_loss": 1.0, "torsion_loss": 0.5}
    step = make_train_step(model, tx, weights, donate=False)

    p, s, m = step(params, opt_state, b, jax.random.PRNGKey(0))
    np.asarray(m["loss"])  # compile + sync
    reps = 6
    t0 = time.perf_counter()
    for i in range(reps):
        p, s, m = step(p, s, b, jax.random.PRNGKey(1 + i))
    np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / reps
    flops = bench._compiled_flops(step, params, opt_state, b, jax.random.PRNGKey(0))
    peak = bench._peak_tflops() or 197.0
    mfu = (flops / dt) / (peak * 1e12) if flops else None

    # Sampler pps at this width (20-step ODE scaled to the 100-step rate).
    fn = sampling.make_sampler(model, num_steps=20)
    np.asarray(fn(params, b, jax.random.PRNGKey(9))["trans"])
    t0 = time.perf_counter()
    np.asarray(fn(params, b, jax.random.PRNGKey(10))["trans"])
    pps100 = batch / ((time.perf_counter() - t0) * 5.0)

    return {
        "width": width, "batch": batch, "params": n_params,
        "train_step_ms": round(dt * 1e3, 1),
        "train_samples_per_sec": round(batch / dt, 1),
        "train_mfu": round(mfu, 4) if mfu else None,
        "sampler_pps_100step": round(pps100, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="1,2,4,8")
    ap.add_argument("--batch", default="64,64,32,8",
                    help="per-width batch (drops where HBM requires)")
    ap.add_argument("--out", default="artifacts/width_sweep.json")
    args = ap.parse_args()

    widths = [int(w) for w in args.widths.split(",")]
    batches = [int(b) for b in args.batch.split(",")]
    rows = []
    for w, bsz in zip(widths, batches):
        try:
            row = run_width(w, bsz)
        except Exception as e:  # OOM etc. — record and continue
            row = {"width": w, "batch": bsz, "error": repr(e)[:200]}
        rows.append(row)
        print(json.dumps(row))
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
