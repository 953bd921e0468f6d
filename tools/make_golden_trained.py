"""Trained-weights sampler-parity fixture (VERDICT r1 item 2).

Round 1 pinned sampler semantics against a RANDOM-INIT reference model whose
output statistics are near-degenerate — a subtly wrong exp-rate or re-masking
bug could hide inside the tolerances. This script produces a TRAINED oracle:

1. trains the reference FlowModel (torch, CPU, 2-block flagship dims) for a
   few hundred Adam steps on a fixed batch of synthetic complexes (the
   reference's own 6-loss objective and learn_angle.yaml weights,
   cf. /root/reference/train.py:116-146),
2. runs the reference Euler sampler (models_con/flow_model.py:229-374) with
   the trained weights over NUM_SAMPLES replicas of a held complex,
3. records the final-step statistics + the trained state_dict + the batch to
   tests/golden/sampler_stats_trained.npz.

tests/test_sampler_parity.py::test_trained_sampler_statistics then converts
the trained checkpoint (pepflowww_tpu/convert.py) and requires the JAX
sampler's RMSD/AAR/rotation statistics to land inside 2-sigma bounds of the
reference spread. Training makes the statistics sharp: CA deviation drops
toward the data and AAR rises well above 1/20, so schedule or masking bugs
move the means outside the bounds.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
import ref_stubs

ref_stubs.install()

import torch  # noqa: E402

torch.manual_seed(11)

from easydict import EasyDict  # noqa: E402
from models_con.flow_model import FlowModel as RefFlowModel  # noqa: E402

NUM_BLOCKS = int(os.environ.get("NUM_BLOCKS", 2))
NUM_SAMPLES = 64  # r3: was 24; 64x4 pooled runs tighten the SEM ~1.6x
NUM_STEPS = 25
TRAIN_STEPS = int(os.environ.get("TRAIN_STEPS", 2000))
#: output fixture name; NUM_BLOCKS=6 writes the production-depth oracle
OUT_NAME = os.environ.get(
    "OUT_NAME",
    "sampler_stats_trained" if NUM_BLOCKS == 2 else f"sampler_stats_trained{NUM_BLOCKS}",
)
LOSS_WEIGHTS = {  # configs/learn_angle.yaml:37-43
    "trans_loss": 0.5, "rot_loss": 0.5, "bb_atom_loss": 0.25,
    "seqs_loss": 1.0, "angle_loss": 1.0, "torsion_loss": 0.5,
}

cfg = EasyDict(
    {
        "encoder": {
            "node_embed_size": 128,
            "edge_embed_size": 64,
            "ipa": {
                "c_s": 128, "c_z": 64, "c_hidden": 128, "no_heads": 8,
                "no_qk_points": 8, "no_v_points": 12, "seq_tfmr_num_heads": 4,
                "seq_tfmr_num_layers": 2, "num_blocks": NUM_BLOCKS, "stop_grad": False,
            },
        },
        "interpolant": {
            "min_t": 1e-2, "t_normalization_clip": 0.9, "sample_sequence": True,
            "sample_structure": True,
            "rots": {"exp_rate": 10}, "trans": {"sigma": 1.0},
            "seqs": {"num_classes": 20, "simplex_value": 5.0},
            "sampling": {"num_timesteps": NUM_STEPS},
        },
    }
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from pepflowww_tpu.data.collate import (device_batch, pad_and_collate,  # noqa: E402
                                        replicate_item)
from pepflowww_tpu.data.synthetic import make_complex  # noqa: E402


def to_torch(nb):
    tb = {}
    for k, v in nb.items():
        if isinstance(v, np.ndarray):
            t = torch.from_numpy(np.ascontiguousarray(v))
            if t.dtype == torch.int32:
                t = t.long()
            tb[k] = t
    return tb


rng = np.random.default_rng(21)
# Train on 4 synthetic complexes; sample on replicas of the first one, so the
# trained model has memorized the target and the sampler statistics are sharp.
train_items = [make_complex(rng, pep_len=8, rec_len=16, complex_id=f"t{i}")
               for i in range(4)]
train_batch = to_torch(device_batch(pad_and_collate(train_items, pad_to=24)))

model = RefFlowModel(cfg)
opt = torch.optim.Adam(model.parameters(), lr=3e-4)

resume = os.environ.get("RESUME_SD")
if resume:
    # Re-derive statistics from an already-trained fixture (the sampling
    # protocol below changed, or more seeds are wanted) without retraining.
    prev = np.load(resume)
    model.load_state_dict(
        {k[4:]: torch.from_numpy(prev[k]) for k in prev.files
         if k.startswith("sd::")})
    TRAIN_STEPS = int(prev["train_steps"])

model.train()
for it in range(1, 0 if resume else TRAIN_STEPS + 1):
    opt.zero_grad()
    losses = model(train_batch)
    loss = sum(LOSS_WEIGHTS[k] * v for k, v in losses.items() if k in LOSS_WEIGHTS)
    loss.backward()
    torch.nn.utils.clip_grad_norm_(model.parameters(), 100.0)
    opt.step()
    if it % 25 == 0 or it == 1:
        detail = " ".join(f"{k}={float(v):.3f}" for k, v in sorted(losses.items()))
        print(f"step {it:4d} loss {float(loss):8.3f} | {detail}", flush=True)

PARAM_KEYS = {k for k, _ in model.named_parameters()}
if os.environ.get("FP16_SD"):
    # Halve the fixture size at deep configs: round trained parameters
    # through fp16 BEFORE the reference statistics are sampled, so the
    # stored fp16 state_dict reproduces exactly the weights that generated
    # the recorded statistics (same scheme as make_golden_model.py).
    with torch.no_grad():
        model.load_state_dict({
            k: (v.half().float() if k in PARAM_KEYS else v)
            for k, v in model.state_dict().items()
        })

model.eval()


def sample_stats(item, seeds):
    """Pool final-step statistics over several sampling runs: the reference
    draws its SO(3) init noise from scipy via the numpy GLOBAL rng
    (pepflow/modules/so3/dist.py:40-45), so a single torch seed does not pin
    its output distribution; the run-to-run spread of the per-run mean is
    comparable to the SEM over replicas. Pooling len(seeds) x NUM_SAMPLES
    runs makes the recorded spread honest."""
    nb = device_batch(pad_and_collate(replicate_item(item, NUM_SAMPLES), pad_to=24))
    tb = to_torch(nb)
    gen = nb["generate_mask"].astype(bool)
    acc = {k: [] for k in ("ca_dev", "rot_dev", "aar", "trans_norm", "ang_mean")}
    for seed in seeds:
        torch.manual_seed(seed)
        np.random.seed(seed)
        with torch.no_grad():
            final = model.sample(tb, num_steps=NUM_STEPS)[-1]
        trans = final["trans"].numpy()
        trans_1 = final["trans_1"].numpy()
        rot = final["rotmats"].numpy()
        rot_1 = final["rotmats_1"].numpy()
        seqs = final["seqs"].numpy()
        seqs_1 = final["seqs_1"].numpy()
        angles = final["angles"].numpy()
        acc["ca_dev"].append(np.sqrt((np.square(trans - trans_1).sum(-1) * gen).sum(-1) / gen.sum(-1)))
        acc["rot_dev"].append(np.sqrt((np.square(rot - rot_1).sum((-1, -2)) * gen).sum(-1) / gen.sum(-1)))
        acc["aar"].append(((seqs == seqs_1) * gen).sum(-1) / gen.sum(-1))
        acc["trans_norm"].append(np.sqrt((np.square(trans).sum(-1) * gen).sum(-1) / gen.sum(-1)))
        acc["ang_mean"].append((np.abs(angles).mean(-1) * gen).sum(-1) / gen.sum(-1))
    return nb, {k: np.concatenate(v) for k, v in acc.items()}


SEEDS = (5, 6, 7, 8)
nb, stats = sample_stats(train_items[0], SEEDS)

# Second, HELD-OUT complex (VERDICT r2 item 7): the model never saw it, so
# its statistics probe generalization-regime sampler behavior (broader CA
# spread, lower AAR) — a bias that happens to cancel on the memorized
# complex cannot also cancel here.
held_out = make_complex(rng, pep_len=10, rec_len=14, complex_id="h0")
nb2, stats2 = sample_stats(held_out, (9, 10, 11, 12))

out = {
    "num_blocks": np.int32(NUM_BLOCKS),
    "num_steps": np.int32(NUM_STEPS),
    "num_samples": np.int32(len(SEEDS) * NUM_SAMPLES),
    "train_steps": np.int32(TRAIN_STEPS),
    **stats,
    **{f"h_{k}": v for k, v in stats2.items()},
}
for k, v in nb.items():
    if isinstance(v, np.ndarray):
        out[f"batch_{k}"] = v
for k, v in nb2.items():
    if isinstance(v, np.ndarray):
        out[f"batchh_{k}"] = v
for k, v in model.state_dict().items():
    a = v.numpy()
    out[f"sd::{k}"] = (
        a.astype(np.float16)
        if os.environ.get("FP16_SD") and k in PARAM_KEYS
        else a
    )

path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                    f"{OUT_NAME}.npz")
np.savez_compressed(path, **out)
print(f"wrote {path} ({os.path.getsize(path)/1e6:.1f} MB)")
for label, s in (("trained", stats), ("held-out", stats2)):
    for k in ("ca_dev", "rot_dev", "aar", "trans_norm"):
        print(f"{label} {k} mean/std:", float(np.mean(s[k])), float(np.std(s[k])))
