"""Full-model parity: reference torch weights -> converter -> identical outputs.

The fixture (tools/make_golden_model.py) holds the reference FlowModel's
state_dict plus its encode() features and a GAEncoder denoising pass on a
synthetic batch. Converting the weights and running our modules must
reproduce every output — this is the end-to-end architecture check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pepflowww_tpu.convert import convert_state_dict
from pepflowww_tpu.models.flow import FlowModel, FlowModelConfig
from pepflowww_tpu.models.trunk import IPAConfig


@pytest.fixture(scope="module")
def parity(golden):
    g = golden("model_parity")
    nb = int(g["num_blocks"])
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
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
