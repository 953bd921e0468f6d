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
  * training-step AND sampling model FLOP utilization (MFU) from XLA's
    compiled cost analysis against the chip's advertised bf16 peak. XLA
    counts a lax.scan body once regardless of trip count, so the sampler's
    FLOPs are assembled from separately-lowered pieces: encode once +
    `num_steps` denoiser calls (the scan runs num_steps-1 steps and one
    final t=1 prediction follows — sampling.py:165-171).

Baselines:
  * measured: the same workload through the reference torch implementation
    on this machine's CPU (the only reference hardware available here;
    cached in BENCH_BASELINE.json). `vs_baseline` is ours / torch-cpu.
  * estimated: the reference on an NVIDIA A100 (the hardware class the
    reference targets, README.md:17 "CUDA >= 11.7"). No A100 exists in this
    image (zero egress), so the denominator is a roofline estimate from the
    SAME model FLOPs this bench measures: see `_a100_estimate` and
    BASELINE.md "A100 denominator" for the assumptions. `vs_a100_estimate`
    is the driver's north-star margin (target >= 5x).

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
#: Advertised bf16 peak TFLOP/s by device kind. The v5e figure is validated
#: on this exact platform with a 4096^3 matmul (PERF.md "Profiler findings").
#: MFU is reported as null on chips not in this table rather than silently
#: computed against the wrong peak (ADVICE r2).
PEAK_TFLOPS_BY_KIND = {
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5e": 197.0,
    "TPU v5": 459.0,        # v5p
    "TPU v5p": 459.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,   # v6e (Trillium)
    "TPU v6e": 918.0,
}
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")


def _peak_tflops() -> "float | None":
    """bf16 peak of the local chip from jax.devices()[0].device_kind."""
    import jax

    kind = jax.devices()[0].device_kind
    # device_kind strings carry a core index suffix on some platforms
    # (e.g. "TPU v5 lite0" over the axon tunnel) — match by prefix.
    for k, v in sorted(PEAK_TFLOPS_BY_KIND.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(k):
            return v
    return None


def _flagship_model(use_pallas: bool = True):
    from pepflowww_tpu.models.flow import FlowModel, FlowModelConfig
    from pepflowww_tpu.models.trunk import IPAConfig

    # Production TPU path: bf16 matmuls (fp32 params/geometry/softmax) +
    # fused Pallas kernels; numerics validated in tests/test_bf16.py,
    # tests/test_pallas.py. use_pallas=False is the same graph without the
    # fused kernels — the profile the automatic-SPMD multi-device factories
    # trace on a real pod (parallel/tp.py::xla_profile_model); both profiles
    # share one param tree (test_convert.py::test_param_tree_matches).
    return FlowModel(FlowModelConfig(ipa=IPAConfig(dtype="bfloat16", use_pallas=use_pallas)))


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


def _sampler_flops(model, params, b) -> float | None:
    """Model FLOPs of one full sampling call (encode + NUM_STEPS denoiser
    calls), assembled from separately-lowered pieces because XLA's cost
    analysis counts a lax.scan body once regardless of trip count.

    Slightly conservative: the per-step Euler/simplex/re-masking math
    (sampling.py:124-161) is not counted, so reported sampler MFU is a
    small underestimate.
    """
    import jax
    import jax.numpy as jnp

    def encode(p, batch):
        return model.apply({"params": p}, batch, method="encode")

    enc_flops = _compiled_flops(encode, params, b)
    if enc_flops is None:
        return None
    rot1, tr1, ang1, seq1, node_embed, edge_embed = jax.jit(encode)(params, b)
    B = b["aa"].shape[0]
    t = jnp.zeros((B, 1), dtype=jnp.float32)

    def denoise(p, t, rot, tr, ang, seq, ne, ee, gm, rm):
        return model.apply({"params": p}, t, rot, tr, ang, seq, ne, ee, gm, rm,
                           method="denoise")

    dn_flops = _compiled_flops(
        denoise, params, t, rot1, tr1, ang1, seq1, node_embed, edge_embed,
        b["generate_mask"], b["res_mask"],
    )
    if dn_flops is None:
        return None
    # scan runs NUM_STEPS-1 steps + one final t=1 prediction (sampling.py:165-171)
    return enc_flops + NUM_STEPS * dn_flops


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

    from pepflowww_tpu.utils.misc import enable_compilation_cache

    # Compile-time only — the cached executable is byte-identical to a
    # fresh compile, so measured step times are unaffected.
    enable_compilation_cache()

    model = _flagship_model()
    b0 = _make_batch(BATCH, PEP_LEN, REC_LEN, PAD_TO)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)({"params": key, "corruption": key}, b0)["params"]

    pps64 = bench_sampling(model, params, PEP_LEN, REC_LEN, PAD_TO, BATCH)
    pps96 = bench_sampling(model, params, 16, 80, 96, BATCH, reps=2)
    pps128 = bench_sampling(model, params, 20, 108, 128, BATCH, reps=2)
    # The pod-fallback number (VERDICT r4 what's-weak #2): the XLA-graph
    # (no-Pallas) sampler is what the automatic-SPMD multi-device factories
    # trace on a real pod. parallel/manual.py keeps the kernels for --dp via
    # shard_map, but the TP/FSDP-sharded paths still run this graph — so its
    # per-chip throughput is a recorded number, not an unknown.
    pps64_xla = bench_sampling(_flagship_model(use_pallas=False), params,
                               PEP_LEN, REC_LEN, PAD_TO, BATCH, reps=2)
    # before bench_training: the train step donates params, deleting them
    sflops = _sampler_flops(model, params, b0)
    train_sps, step_ms, train_fps = bench_training(model, params)
    sample_fps = sflops * pps64 / BATCH if sflops else None  # flops/sec achieved

    peak_tf = _peak_tflops()
    peak = peak_tf * 1e12 if peak_tf else None
    return {
        "pps": pps64,
        "sampling_pps": {"L64_B64": round(pps64, 2), "L96_B64": round(pps96, 2),
                         "L128_B64": round(pps128, 2)},
        "sampling_pps_xla": round(pps64_xla, 2),
        "train_samples_per_sec": round(train_sps, 1),
        "train_step_ms": round(step_ms, 2),
        "sampler_flops_per_batch": sflops,
        "mfu": {
            "train": round(train_fps / peak, 4) if train_fps and peak else None,
            "sample": round(sample_fps / peak, 4) if sample_fps and peak else None,
            "peak_tflops_assumed": peak_tf,
        },
    }


def _reference_model_and_batch(batch_size: int):
    """Reference torch FlowModel (flagship learn_angle dims) + matching batch."""
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
        make_batch(rng, batch_size=batch_size, pep_len=PEP_LEN, rec_len=REC_LEN,
                   pad_to=PAD_TO)
    )
    tb = {}
    for k, v in nb.items():
        if isinstance(v, np.ndarray):
            t = torch.from_numpy(np.ascontiguousarray(v))
            if t.dtype in (torch.int32,):
                t = t.long()
            tb[k] = t
    return model, tb


def _baseline_cache() -> dict:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    return {}


def _save_baseline_cache(d: dict):
    with open(BASELINE_CACHE, "w") as f:
        json.dump(d, f)


def bench_reference_torch_cpu() -> float | None:
    """Measure the reference implementation (torch, CPU) on the same workload.

    Returns peptides/sec or None if the reference tree is unavailable.
    """
    cache = _baseline_cache()
    if "reference_torch_cpu_peptides_per_sec" in cache:
        return cache["reference_torch_cpu_peptides_per_sec"]
    if not os.path.isdir("/root/reference"):
        return None
    try:
        import torch

        model, tb = _reference_model_and_batch(BATCH)
        # The reference ODE's per-step cost is constant; measure a 10-step run
        # and scale to the 100-step workload so the baseline finishes in
        # minutes on CPU rather than an hour.
        ref_steps = 10
        with torch.no_grad():
            t0 = time.perf_counter()
            model.sample(tb, num_steps=ref_steps)
            dt = time.perf_counter() - t0
        pps = BATCH / (dt * (NUM_STEPS / ref_steps))
        cache["reference_torch_cpu_peptides_per_sec"] = pps
        cache["note"] = ("reference FlowModel.sample, torch CPU, B=64 L=64; "
                         f"measured at {ref_steps} steps, scaled to {NUM_STEPS}")
        _save_baseline_cache(cache)
        return pps
    except Exception as e:  # reference not runnable here — record why
        print(f"# reference baseline unavailable: {e.__class__.__name__}: {e}", file=sys.stderr)
        return None


def reference_ops_per_step() -> int | None:
    """Count the reference sampler's dispatched aten ops per ODE step.

    The op count is hardware-independent (same dispatch sequence on CPU and
    A100), so it can be measured in this image and used as the kernel-launch
    term of the A100 estimate. Measured at B=2 (op count does not depend on
    batch size) as the difference between a 3-step and a 2-step sample() run.
    Cached in BENCH_BASELINE.json.
    """
    cache = _baseline_cache()
    if "reference_aten_ops_per_ode_step" in cache:
        return cache["reference_aten_ops_per_ode_step"]
    if not os.path.isdir("/root/reference"):
        return None
    try:
        import torch
        from torch.profiler import ProfilerActivity, profile

        model, tb = _reference_model_and_batch(2)

        def count(num_steps: int) -> int:
            with torch.no_grad():
                with profile(activities=[ProfilerActivity.CPU]) as prof:
                    model.sample(tb, num_steps=num_steps)
            return sum(1 for e in prof.events() if e.name.startswith("aten::"))

        n = count(3) - count(2)
        cache["reference_aten_ops_per_ode_step"] = n
        _save_baseline_cache(cache)
        return n
    except Exception as e:
        print(f"# reference op count unavailable: {e.__class__.__name__}: {e}",
              file=sys.stderr)
        return None


#: A100 estimate constants — see BASELINE.md "A100 denominator" for sources.
A100_TF32_PEAK = 156e12      # dense TF32 TFLOP/s (A100 datasheet)
A100_MFU_GENEROUS = 0.15     # generous eager-torch MFU on a c_s=128/L=64 model
CUDA_LAUNCH_US = 4.0         # per-kernel launch overhead, optimistic end


def a100_estimate(sampler_flops_per_batch: float | None,
                  ops_per_step: int | None) -> dict | None:
    """Estimated reference-on-A100 sampling throughput (peptides/sec) at the
    benchmark workload (B=64, L=64, 100-step ODE).

    Two independent lower bounds on per-batch time, both deliberately generous
    to the reference (BASELINE.md records the assumptions):
      * FLOP term: the measured model FLOPs at A100_MFU_GENEROUS of TF32 peak.
        (The reference never calls autocast; TF32 is its best matmul path.)
      * launch term: the measured aten-op count per ODE step at CUDA_LAUNCH_US
        per kernel, assuming perfect 1 aten op = 1 kernel and zero Python
        dispatch cost. Ignores the reference's per-step .cpu() sync
        (flow_model.py:313), which serializes launch gaps in practice.
    The estimate takes max(flop_term, launch_term); the ceiling is the pure
    FLOP roofline at 100% peak (unachievable).
    """
    if sampler_flops_per_batch is None:
        return None
    flop_s = sampler_flops_per_batch / (A100_TF32_PEAK * A100_MFU_GENEROUS)
    out = {
        "a100_tf32_peak_tflops": A100_TF32_PEAK / 1e12,
        "assumed_mfu": A100_MFU_GENEROUS,
        "flop_term_pps": round(BATCH / flop_s, 2),
        "ceiling_pps_100pct_peak": round(
            BATCH / (sampler_flops_per_batch / A100_TF32_PEAK), 2),
    }
    t = flop_s
    if ops_per_step is not None:
        launch_s = NUM_STEPS * ops_per_step * CUDA_LAUNCH_US * 1e-6
        out["aten_ops_per_step"] = ops_per_step
        out["launch_term_pps"] = round(BATCH / launch_s, 2)
        t = max(t, launch_s)
        # sensitivity: the realistic mid-range per-op figure (BASELINE.md)
        launch_8us = NUM_STEPS * ops_per_step * 8e-6
        out["estimate_pps_8us_per_op"] = round(BATCH / max(flop_s, launch_8us), 2)
    out["estimate_pps"] = round(BATCH / t, 2)
    return out


def main():
    ours = bench_ours()
    ref = bench_reference_torch_cpu()
    a100 = a100_estimate(ours.get("sampler_flops_per_batch"), reference_ops_per_step())
    vs = (ours["pps"] / ref) if ref else 1.0
    print(json.dumps({
        "metric": "sampled peptides/sec/chip (100-step ODE, B=64, L=64, full codesign)",
        "value": round(ours["pps"], 3),
        "unit": "peptides/sec",
        "vs_baseline": round(vs, 3),
        "baseline": ("reference torch FlowModel.sample on host CPU"
                     if ref else "none available (vs_baseline=1.0)"),
        "baseline_value": round(ref, 3) if ref else None,
        "vs_a100_estimate": (round(ours["pps"] / a100["estimate_pps"], 2)
                             if a100 else None),
        "vs_a100_estimate_8us": (
            round(ours["pps"] / a100["estimate_pps_8us_per_op"], 2)
            if a100 and "estimate_pps_8us_per_op" in a100 else None),
        "a100_estimate": a100,
        "sampling_pps": ours["sampling_pps"],
        "sampling_pps_xla": ours["sampling_pps_xla"],
        "train_samples_per_sec": ours["train_samples_per_sec"],
        "train_step_ms": ours["train_step_ms"],
        "mfu": ours["mfu"],
    }))


if __name__ == "__main__":
    main()
