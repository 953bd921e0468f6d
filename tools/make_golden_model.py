"""Full-model parity fixture: reference FlowModel forward with saved weights.

Builds the reference torch FlowModel at flagship width, runs:
  * NodeEmbedder / EdgeEmbedder on a synthetic batch (training-mode masks)
  * GAEncoder denoising pass on corrupted inputs
and snapshots {state_dict, batch, intermediate inputs, outputs} to
tests/golden/model_parity{suffix}.npz. The JAX test converts the state_dict
with pepflowww_tpu.convert and must reproduce the outputs.

Two fixtures are committed:
  * model_parity.npz   — num_blocks=2 (small, fp32 weights; round-1 fixture)
  * model_parity6.npz  — num_blocks=6, the EXACT production depth of
    learn_angle.yaml:10 / model1.pt (VERDICT r2 item 2: the converter's
    per-block key mapping and the 5-chained EdgeTransitions are exercised at
    the real shape). To keep the fixture ~13 MB instead of ~27, the weights
    are rounded through float16 BEFORE the reference forward runs and stored
    as float16 — the reference outputs in the fixture are computed from the
    same rounded weights the test converts, so parity stays exact-semantics.

Usage: python tools/make_golden_model.py [--num_blocks 6 --fp16_weights]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
import ref_stubs

ref_stubs.install()

import torch  # noqa: E402

torch.manual_seed(0)

from models_con.flow_model import FlowModel as RefFlowModel  # noqa: E402
from easydict import EasyDict  # noqa: E402 (stubbed or real)

ap = argparse.ArgumentParser()
ap.add_argument("--num_blocks", type=int, default=2)
ap.add_argument("--fp16_weights", action="store_true",
                help="round weights through fp16 before the forward and store fp16")
ap.add_argument("--out", default=None,
                help="fixture name (default model_parity for nb=2, model_parity6 for nb=6)")
args = ap.parse_args()

NUM_BLOCKS = args.num_blocks

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
            "sampling": {"num_timesteps": 100},
        },
    }
)

model = RefFlowModel(cfg).eval()

PARAM_KEYS = {k for k, _ in model.named_parameters()}
if args.fp16_weights:
    # Round every PARAMETER through fp16, then run the fp32 forward on the
    # rounded values; the stored fp16 state_dict reproduces these exact fp32
    # values on load (fp16 -> fp32 is exact). Buffers (constant tables like
    # AngularEncoding freq_bands) stay untouched fp32 — export_state_dict
    # re-emits them as recomputed constants, so rounding them would break the
    # exact round-trip test while saving nothing (they are tiny).
    with torch.no_grad():
        sd16 = {
            k: (v.half().float() if k in PARAM_KEYS else v)
            for k, v in model.state_dict().items()
        }
        model.load_state_dict(sd16)

# Synthetic batch via our own generator (numpy -> torch).
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from pepflowww_tpu.data.collate import device_batch  # noqa: E402
from pepflowww_tpu.data.synthetic import make_batch  # noqa: E402

rng = np.random.default_rng(3)
nb = device_batch(make_batch(rng, batch_size=2, pep_len=6, rec_len=10, pad_to=16))
tb = {}
for k, v in nb.items():
    if isinstance(v, np.ndarray):
        t = torch.from_numpy(np.ascontiguousarray(v))
        if t.dtype == torch.int32:
            t = t.long()
        tb[k] = t

with torch.no_grad():
    rotmats_1, trans_1, angles_1, seqs_1, node_embed, edge_embed = model.encode(tb)

    B, L = tb["aa"].shape
    tt = torch.rand(B, 1) * 0.8 + 0.1
    g = torch.Generator().manual_seed(1)
    rot_noise = torch.randn(B, L, 3, generator=g) * 0.3
    from data import so3_utils

    rotmats_t = so3_utils.geodesic_t(0.5, rotmats_1, so3_utils.rotvec_to_rotmat(rot_noise))
    trans_t = trans_1 + torch.randn(B, L, 3, generator=g)
    angles_t = (angles_1 + torch.rand(B, L, 5, generator=g)) % (2 * np.pi)
    seqs_t = torch.randint(0, 20, (B, L), generator=g)

    pred = model.ga_encoder(
        tt, rotmats_t, trans_t, angles_t, seqs_t, node_embed, edge_embed,
        tb["generate_mask"].long(), tb["res_mask"].long(),
    )

out = {
    "num_blocks": np.int32(NUM_BLOCKS),
    "t": tt.numpy(),
    "rotmats_1": rotmats_1.numpy(), "trans_1": trans_1.numpy(),
    "angles_1": angles_1.numpy(), "seqs_1": seqs_1.numpy(),
    "node_embed": node_embed.numpy(), "edge_embed": edge_embed.numpy(),
    "rotmats_t": rotmats_t.numpy(), "trans_t": trans_t.numpy(),
    "angles_t": angles_t.numpy(), "seqs_t": seqs_t.numpy(),
    "pred_rotmats": pred[0].numpy(), "pred_trans": pred[1].numpy(),
    "pred_angles": pred[2].numpy(), "pred_seq_logits": pred[3].numpy(),
}
for k, v in nb.items():
    if isinstance(v, np.ndarray):
        out[f"batch_{k}"] = v
for k, v in model.state_dict().items():
    a = v.numpy()
    out[f"sd::{k}"] = (
        a.astype(np.float16) if args.fp16_weights and k in PARAM_KEYS else a
    )

name = args.out or ("model_parity" if NUM_BLOCKS == 2 else f"model_parity{NUM_BLOCKS}")
path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", f"{name}.npz")
np.savez_compressed(path, **out)
size_mb = os.path.getsize(path) / 1e6
print(f"wrote {path} ({size_mb:.1f} MB), {len(out)} arrays")
