#!/usr/bin/env python
"""Benchmark: sampled peptides/sec/chip for the 100-step Euler ODE.

Runs the flagship FlowModel (learn_angle.yaml dimensions) on whatever
accelerator JAX exposes (the driver runs this on a real TPU chip), doing
full codesign sampling (backbone + torsions + sequence) for a batch of 64
complexes at L=64 (48-residue pocket + 12-residue peptide), 100 ODE steps —
the reference's benchmark recipe (configs/learn_angle.yaml:33,
models_con/inference.py:47-48).

Baseline: the same workload run through the reference's torch implementation
on this machine's CPU (the only reference hardware available here;
BASELINE.json's `published` is empty). The measured torch number is cached in
BENCH_BASELINE.json after the first run. `vs_baseline` is ours / torch-cpu.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "peptides/sec/chip", "vs_baseline": N}
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
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")


def bench_ours() -> float:
    import jax
    import jax.numpy as jnp

    from pepflowww_tpu import sampling
    from pepflowww_tpu.data.collate import device_batch
    from pepflowww_tpu.data.synthetic import make_batch
    from pepflowww_tpu.models.flow import FlowModel, FlowModelConfig

    rng = np.random.default_rng(0)
    batch = device_batch(
        make_batch(rng, batch_size=BATCH, pep_len=PEP_LEN, rec_len=REC_LEN, pad_to=PAD_TO)
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    from pepflowww_tpu.models.trunk import IPAConfig

    # Production TPU path: bf16 matmuls (fp32 params/geometry/softmax);
    # numerics validated against fp32 in tests/test_bf16.py.
    model = FlowModel(FlowModelConfig(ipa=IPAConfig(dtype="bfloat16", use_pallas=True)))
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)({"params": key, "corruption": key}, batch)["params"]

    fn = sampling.make_sampler(model, num_steps=NUM_STEPS)
    # warmup/compile; force a device->host fetch (block_until_ready alone does
    # not reliably synchronize on the remote-TPU axon platform)
    np.asarray(fn(params, batch, jax.random.PRNGKey(1))["trans"])

    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(params, batch, jax.random.PRNGKey(2 + i))
        np.asarray(out["trans"])  # sync: (64, 64, 3) copy, negligible
    dt = (time.perf_counter() - t0) / reps
    return BATCH / dt


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
    vs = (ours / ref) if ref else 1.0
    print(json.dumps({
        "metric": "sampled peptides/sec/chip (100-step ODE, B=64, L=64, full codesign)",
        "value": round(ours, 3),
        "unit": "peptides/sec",
        "vs_baseline": round(vs, 3),
        "baseline": ("reference torch FlowModel.sample on host CPU"
                     if ref else "none available (vs_baseline=1.0)"),
        "baseline_value": round(ref, 3) if ref else None,
    }))


if __name__ == "__main__":
    main()
