#!/usr/bin/env python
"""Benchmark: sampling + training throughput for the flagship FlowModel.

Headline metric: sampled peptides/sec/chip for the 100-step Euler ODE at the
reference's benchmark recipe — full codesign (backbone + torsions + sequence),
B=64 complexes, L=64 (48-residue pocket + 12-residue peptide), 100 ODE steps
(configs/learn_angle.yaml:33, models_con/inference.py:47-48).

Also measured and reported in the same JSON object (BASELINE.json configs
2-4; VERDICT r1 item 7):
  * sampling pps at the L=96 and L=128 length buckets,
  * training samples/sec/chip (loss + grad + adam, learn_angle recipe),
  * training-step model FLOP utilization (MFU) from XLA's compiled cost
    analysis against the chip's advertised bf16 peak — an honest utilization
    figure that does not depend on a flattering baseline. (Sampling MFU is
    not reported: XLA's cost analysis counts a lax.scan body once regardless
    of trip count, so the 100-step ODE's FLOPs can't be read off the
    compiled program.)

Baseline: the same workload run through the reference's torch implementation
on this machine's CPU (the only reference hardware available here;
BASELINE.json's `published` is empty — the A100 path is unmeasurable in this
image). The measured torch number is cached in BENCH_BASELINE.json after the
first run. `vs_baseline` is ours / torch-cpu; read it together with `mfu`.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH = 64
REC_LEN = 48
PEP_LEN = 12
PAD_TO = 64
NUM_STEPS = 100
#: Advertised bf16 peak of the bench chip (TPU v5e: 197 TFLOP/s). PERF.md
#: validates this roofline on this exact platform with a 4096^3 matmul.
PEAK_TFLOPS = 197.0
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")


def _flagship_model():
    from pepflowww_tpu.models.flow import FlowModel, FlowModelConfig
    from pepflowww_tpu.models.trunk import IPAConfig

    # Production TPU path: bf16 matmuls (fp32 params/geometry/softmax) +
    # fused Pallas kernels; numerics validated in tests/test_bf16.py,
    # tests/test_pallas.py.
    return FlowModel(FlowModelConfig(ipa=IPAConfig(dtype="bfloat16", use_pallas=True)))


def _make_batch(batch_size, pep_len, rec_len, pad_to):
    import jax.numpy as jnp

    from pepflowww_tpu.data.collate import device_batch
    from pepflowww_tpu.data.synthetic import make_batch

    rng = np.random.default_rng(0)
    b = device_batch(
        make_batch(rng, batch_size=batch_size, pep_len=pep_len, rec_len=rec_len, pad_to=pad_to)
    )
    return {k: jnp.asarray(v) for k, v in b.items()}


def _compiled_flops(fn, *args) -> float | None:
    """Total FLOPs of the jitted computation, from XLA's cost analysis."""
    try:
        import jax

        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"]) if ca and "flops" in ca else None
    except Exception:
        return None


def bench_sampling(model, params, pep_len, rec_len, pad_to, batch, reps=3):
    """peptides/sec at one length bucket."""
    import jax

    from pepflowww_tpu import sampling

    b = _make_batch(batch, pep_len, rec_len, pad_to)
    fn = sampling.make_sampler(model, num_steps=NUM_STEPS)
    # warmup/compile; force a device->host fetch (block_until_ready alone does
    # not reliably synchronize on the remote-TPU axon platform)
    np.asarray(fn(params, b, jax.random.PRNGKey(1))["trans"])

    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(params, b, jax.random.PRNGKey(2 + i))
        np.asarray(out["trans"])  # sync: small copy, negligible
    dt = (time.perf_counter() - t0) / reps
    # (no cost-analysis lowering here: scan bodies are counted once by XLA,
    # and a second full compile of the 100-step program costs minutes)
    return batch / dt


def bench_training(model, params, reps=10):
    """(samples/sec, step ms, achieved flops/sec or None), learn_angle recipe."""
    import jax

    from pepflowww_tpu.training.optim import make_optimizer
    from pepflowww_tpu.training.train_step import make_train_step

    b = _make_batch(BATCH, PEP_LEN, REC_LEN, PAD_TO)
    tx = make_optimizer({"type": "adam", "lr": 5e-4, "weight_decay": 0.0,
                         "beta1": 0.9, "beta2": 0.999}, max_grad_norm=100.0)
    opt_state = tx.init(params)
    weights = {"trans_loss": 0.5, "rot_loss": 0.5, "bb_atom_loss": 0.25,
               "seqs_loss": 1.0, "angle_loss": 1.0, "torsion_loss": 0.5}
    step = make_train_step(model, tx, weights)

    p, s = params, opt_state
    p, s, m = step(p, s, b, jax.random.PRNGKey(0))
    np.asarray(m["loss"])  # compile + sync

    t0 = time.perf_counter()
    for i in range(reps):
        p, s, m = step(p, s, b, jax.random.PRNGKey(1 + i))
    np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / reps
    flops = _compiled_flops(step, params, opt_state, b, jax.random.PRNGKey(0))
    return BATCH / dt, dt * 1e3, (flops / dt if flops else None)


def bench_ours() -> dict:
    import jax

    model = _flagship_model()
    b0 = _make_batch(BATCH, PEP_LEN, REC_LEN, PAD_TO)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)({"params": key, "corruption": key}, b0)["params"]

    pps64 = bench_sampling(model, params, PEP_LEN, REC_LEN, PAD_TO, BATCH)
    pps96 = bench_sampling(model, params, 16, 80, 96, BATCH, reps=2)
    pps128 = bench_sampling(model, params, 20, 108, 128, BATCH, reps=2)
    train_sps, step_ms, train_fps = bench_training(model, params)

    peak = PEAK_TFLOPS * 1e12
    return {
        "pps": pps64,
        "sampling_pps": {"L64_B64": round(pps64, 2), "L96_B64": round(pps96, 2),
                         "L128_B64": round(pps128, 2)},
        "train_samples_per_sec": round(train_sps, 1),
        "train_step_ms": round(step_ms, 2),
        "mfu": {
            "train": round(train_fps / peak, 4) if train_fps else None,
            "peak_tflops_assumed": PEAK_TFLOPS,
        },
    }


def bench_reference_torch_cpu() -> float | None:
    """Measure the reference implementation (torch, CPU) on the same workload.

    Returns peptides/sec or None if the reference tree is unavailable.
    """
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["reference_torch_cpu_peptides_per_sec"]
    if not os.path.isdir("/root/reference"):
        return None
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        import ref_stubs

        ref_stubs.install()

        import torch

        from models_con.flow_model import FlowModel as RefFlowModel  # noqa: E402

        class _D(dict):
            __getattr__ = dict.__getitem__

        cfg = _D(
            encoder=_D(node_embed_size=128, edge_embed_size=64,
                       ipa=_D(c_s=128, c_z=64, c_hidden=128, no_heads=8, no_qk_points=8,
                              no_v_points=12, seq_tfmr_num_heads=4, seq_tfmr_num_layers=2,
                              num_blocks=6, stop_grad=False)),
            interpolant=_D(min_t=1e-2, t_normalization_clip=0.9, sample_sequence=True,
                           sample_structure=True,
                           rots=_D(exp_rate=10), trans=_D(sigma=1.0),
                           seqs=_D(num_classes=20, simplex_value=5.0),
                           sampling=_D(num_timesteps=NUM_STEPS)),
        )
        torch.manual_seed(0)
        model = RefFlowModel(cfg).eval()

        from pepflowww_tpu.data.collate import device_batch
        from pepflowww_tpu.data.synthetic import make_batch

        rng = np.random.default_rng(0)
        nb = device_batch(
            make_batch(rng, batch_size=BATCH, pep_len=PEP_LEN, rec_len=REC_LEN, pad_to=PAD_TO)
        )
        tb = {}
        for k, v in nb.items():
            if isinstance(v, np.ndarray):
                t = torch.from_numpy(np.ascontiguousarray(v))
                if t.dtype in (torch.int32,):
                    t = t.long()
                tb[k] = t

        # The reference ODE's per-step cost is constant; measure a 10-step run
        # and scale to the 100-step workload so the baseline finishes in
        # minutes on CPU rather than an hour.
        ref_steps = 10
        with torch.no_grad():
            t0 = time.perf_counter()
            model.sample(tb, num_steps=ref_steps)
            dt = time.perf_counter() - t0
        pps = BATCH / (dt * (NUM_STEPS / ref_steps))
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"reference_torch_cpu_peptides_per_sec": pps,
                       "note": ("reference FlowModel.sample, torch CPU, B=64 L=64; "
                                f"measured at {ref_steps} steps, scaled to {NUM_STEPS}")}, f)
        return pps
    except Exception as e:  # reference not runnable here — record why
        print(f"# reference baseline unavailable: {e.__class__.__name__}: {e}", file=sys.stderr)
        return None


def main():
    ours = bench_ours()
    ref = bench_reference_torch_cpu()
    vs = (ours["pps"] / ref) if ref else 1.0
    print(json.dumps({
        "metric": "sampled peptides/sec/chip (100-step ODE, B=64, L=64, full codesign)",
        "value": round(ours["pps"], 3),
        "unit": "peptides/sec",
        "vs_baseline": round(vs, 3),
        "baseline": ("reference torch FlowModel.sample on host CPU"
                     if ref else "none available (vs_baseline=1.0)"),
        "baseline_value": round(ref, 3) if ref else None,
        "sampling_pps": ours["sampling_pps"],
        "train_samples_per_sec": ours["train_samples_per_sec"],
        "train_step_ms": ours["train_step_ms"],
        "mfu": ours["mfu"],
    }))


if __name__ == "__main__":
    main()
