"""bf16 compute path: numerics stay close to fp32, losses finite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pepflowww_tpu.data.collate import device_batch
from pepflowww_tpu.data.synthetic import make_batch
from pepflowww_tpu.models.flow import FlowModel, FlowModelConfig
from pepflowww_tpu.models.trunk import IPAConfig


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(11)
    batch = device_batch(make_batch(rng, batch_size=2, pep_len=5, rec_len=11, pad_to=16))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def build(dtype):
        cfg = FlowModelConfig(
            ipa=IPAConfig(c_s=64, c_z=32, c_hidden=32, no_heads=4, no_qk_points=4,
                          no_v_points=6, seq_tfmr_num_heads=4, seq_tfmr_num_layers=1,
                          num_blocks=2, dtype=dtype),
            node_embed_size=64, edge_embed_size=32,
        )
        return FlowModel(cfg)

    m32, m16 = build(None), build("bfloat16")
    key = jax.random.PRNGKey(0)
    params = jax.jit(m32.init)({"params": key, "corruption": key}, batch)["params"]
    return m32, m16, params, batch


def test_bf16_params_are_fp32(pair):
    m32, m16, params, batch = pair
    key = jax.random.PRNGKey(0)
    p16 = jax.jit(m16.init)({"params": key, "corruption": key}, batch)["params"]
    for leaf in jax.tree_util.tree_leaves(p16):
        assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype


def test_bf16_close_to_fp32(pair):
    """Same params, both precisions: denoise outputs agree to bf16 tolerance."""
    m32, m16, params, batch = pair
    enc = m32.apply({"params": params}, batch, method="encode")
    B, L = batch["aa"].shape
    t = jnp.full((B, 1), 0.5)

    def run(m):
        return m.apply(
            {"params": params}, t, enc[0], enc[1], enc[2], enc[3], enc[4], enc[5],
            batch["generate_mask"], batch["res_mask"], method="denoise",
        )

    r32, r16 = run(m32), run(m16)
    # translations in Å; bf16 matmuls through 2 blocks -> sub-Å agreement
    assert np.abs(np.asarray(r32[1]) - np.asarray(r16[1])).max() < 0.5
    assert np.abs(np.asarray(r32[0]) - np.asarray(r16[0])).max() < 0.1  # rotmats
    # logits within ~0.2
    assert np.abs(np.asarray(r32[3]) - np.asarray(r16[3])).max() < 0.5


def test_bf16_loss_finite(pair):
    m32, m16, params, batch = pair
    losses = m16.apply({"params": params}, batch, rngs={"corruption": jax.random.PRNGKey(1)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
