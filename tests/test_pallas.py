"""Fused EdgeTransition Pallas kernel vs the XLA path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pepflowww_tpu.models.ipa import EdgeTransition
from pepflowww_tpu.models.pallas_edge import fused_edge_transition


@pytest.fixture(scope="module")
def setup():
    B, L, c_s, c_z = 2, 32, 128, 64
    rng = np.random.default_rng(0)
    node = jnp.asarray(rng.normal(size=(B, L, c_s)).astype(np.float32))
    edge = jnp.asarray(rng.normal(size=(B, L, L, c_z)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, L)) > 0.1))
    edge_mask = (mask[:, :, None] & mask[:, None, :]).astype(jnp.float32)
    module = EdgeTransition(node_embed_size=c_s, edge_embed_in=c_z, edge_embed_out=c_z)
    params = module.init(jax.random.PRNGKey(0), node, edge)["params"]
    return module, params, node, edge, edge_mask


def _node_bias(params, node):
    k0 = params["Linear_0"]["Dense_0"]["kernel"]
    b0 = params["Linear_0"]["Dense_0"]["bias"]
    return node @ k0 + b0


def _kernel_params(params):
    return {
        "k1": params["Linear_1"]["Dense_0"]["kernel"],
        "b1": params["Linear_1"]["Dense_0"]["bias"],
        "k2": params["Linear_2"]["Dense_0"]["kernel"],
        "b2": params["Linear_2"]["Dense_0"]["bias"],
        "k3": params["Linear_3"]["Dense_0"]["kernel"],
        "b3": params["Linear_3"]["Dense_0"]["bias"],
        "ln_scale": params["LayerNorm_0"]["scale"],
        "ln_bias": params["LayerNorm_0"]["bias"],
    }


def test_fused_matches_xla_fp32(setup):
    module, params, node, edge, edge_mask = setup
    ref = module.apply({"params": params}, node, edge, edge_mask=edge_mask)
    nb = _node_bias(params, node)
    out = fused_edge_transition(
        edge, nb, edge_mask, _kernel_params(params),
        dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_matches_xla_bf16(setup):
    module, params, node, edge, edge_mask = setup
    bf16_module = EdgeTransition(
        node_embed_size=128, edge_embed_in=64, edge_embed_out=64, dtype=jnp.bfloat16
    )
    ref = bf16_module.apply({"params": params}, node, edge, edge_mask=edge_mask)
    nb = _node_bias(params, node).astype(jnp.bfloat16)
    out = fused_edge_transition(
        edge, nb, edge_mask, _kernel_params(params),
        dtype=jnp.bfloat16, interpret=True,
    )
    # both paths are bf16; they should agree to bf16 resolution
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32), atol=0.15
    )


def test_use_pallas_flag_in_module(setup):
    """EdgeTransition(use_pallas=True) must agree with the XLA module."""
    module, params, node, edge, edge_mask = setup
    import pepflowww_tpu.models.pallas_edge as pe
    import functools

    orig = pe.fused_edge_transition
    pe.fused_edge_transition = functools.partial(orig, interpret=True)
    try:
        pallas_module = EdgeTransition(
            node_embed_size=128, edge_embed_in=64, edge_embed_out=64,
            use_pallas=True,
        )
        out = pallas_module.apply({"params": params}, node, edge, edge_mask=edge_mask)
    finally:
        pe.fused_edge_transition = orig
    ref = module.apply({"params": params}, node, edge, edge_mask=edge_mask)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), atol=2e-4)
