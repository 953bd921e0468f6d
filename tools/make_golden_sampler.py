"""End-to-end sampler-semantics fixture: reference Euler ODE statistics.

Runs the reference's FlowModel.sample (torch, CPU) with a seeded random-init
model on a synthetic batch and records distributional statistics of the final
trajectory step. The JAX sampler with the SAME (converted) weights must land
inside the recorded spread — this pins the *sampler* semantics (exp-rate
rotation schedule, per-step context re-masking, torsion-validity zeroing,
simplex integration against the initial noise, the extra t=1 prediction),
which single-pass denoise parity cannot see.

RNG streams differ between torch and JAX, so the comparison is statistical:
mean/std of CA deviation, rotation Frobenius distance, angle magnitudes, AAR
over num_samples replicas.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
import ref_stubs

ref_stubs.install()

import torch  # noqa: E402

torch.manual_seed(7)

from easydict import EasyDict  # noqa: E402
from models_con.flow_model import FlowModel as RefFlowModel  # noqa: E402

NUM_BLOCKS = 2
NUM_SAMPLES = 24
NUM_STEPS = 25

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

model = RefFlowModel(cfg).eval()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from pepflowww_tpu.data.collate import device_batch, pad_and_collate, replicate_item  # noqa: E402
from pepflowww_tpu.data.synthetic import make_complex  # noqa: E402

rng = np.random.default_rng(21)
item = make_complex(rng, pep_len=8, rec_len=16, complex_id="golden")
nb = device_batch(pad_and_collate(replicate_item(item, NUM_SAMPLES), pad_to=24))
tb = {}
for k, v in nb.items():
    if isinstance(v, np.ndarray):
        t = torch.from_numpy(np.ascontiguousarray(v))
        if t.dtype == torch.int32:
            t = t.long()
        tb[k] = t

with torch.no_grad():
    traj = model.sample(tb, num_steps=NUM_STEPS)
final = traj[-1]

gen = nb["generate_mask"].astype(bool)


def _stats(x):
    return float(np.mean(x)), float(np.std(x))


trans = final["trans"].numpy()
trans_1 = final["trans_1"].numpy()
rot = final["rotmats"].numpy()
rot_1 = final["rotmats_1"].numpy()
seqs = final["seqs"].numpy()
seqs_1 = final["seqs_1"].numpy()
angles = final["angles"].numpy()

ca_dev = np.sqrt(
    (np.square(trans - trans_1).sum(-1) * gen).sum(-1) / gen.sum(-1)
)
rot_dev = np.sqrt(
    (np.square(rot - rot_1).sum((-1, -2)) * gen).sum(-1) / gen.sum(-1)
)
aar = ((seqs == seqs_1) * gen).sum(-1) / gen.sum(-1)
trans_norm = np.sqrt((np.square(trans).sum(-1) * gen).sum(-1) / gen.sum(-1))
ang_mean = (np.abs(angles).mean(-1) * gen).sum(-1) / gen.sum(-1)

out = {
    "num_blocks": np.int32(NUM_BLOCKS),
    "num_steps": np.int32(NUM_STEPS),
    "num_samples": np.int32(NUM_SAMPLES),
    "ca_dev": ca_dev, "rot_dev": rot_dev, "aar": aar,
    "trans_norm": trans_norm, "ang_mean": ang_mean,
}
for k, v in nb.items():
    if isinstance(v, np.ndarray):
        out[f"batch_{k}"] = v
for k, v in model.state_dict().items():
    out[f"sd::{k}"] = v.numpy()

path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "sampler_stats.npz")
np.savez_compressed(path, **out)
print(f"wrote {path} ({os.path.getsize(path)/1e6:.1f} MB)")
print("ref ca_dev mean/std:", _stats(ca_dev))
print("ref rot_dev mean/std:", _stats(rot_dev))
print("ref aar mean/std:", _stats(aar))
print("ref trans_norm mean/std:", _stats(trans_norm))
