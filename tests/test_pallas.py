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
    node_mask = jnp.asarray((rng.random((B, L)) > 0.1)).astype(jnp.float32)
    module = EdgeTransition(node_embed_size=c_s, edge_embed_in=c_z, edge_embed_out=c_z)
    params = module.init(jax.random.PRNGKey(0), node, edge)["params"]
    return module, params, node, edge, node_mask


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
    module, params, node, edge, node_mask = setup
    ref = module.apply({"params": params}, node, edge, node_mask=node_mask)
    nb = _node_bias(params, node)
    out = fused_edge_transition(
        edge, nb, node_mask, _kernel_params(params),
        dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_matches_xla_bf16(setup):
    module, params, node, edge, node_mask = setup
    bf16_module = EdgeTransition(
        node_embed_size=128, edge_embed_in=64, edge_embed_out=64, dtype=jnp.bfloat16
    )
    ref = bf16_module.apply({"params": params}, node, edge, node_mask=node_mask)
    nb = _node_bias(params, node).astype(jnp.bfloat16)
    out = fused_edge_transition(
        edge, nb, node_mask, _kernel_params(params),
        dtype=jnp.bfloat16, interpret=True,
    )
    # both paths are bf16; they should agree to bf16 resolution
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32), atol=0.15
    )


def test_row_tile_mosaic_legal_at_every_bucket():
    """Mosaic requires block dims divisible by 8 or equal to the full dim.
    The old largest-divisor-under-budget rule picked k_i=10 at L=160 and the
    TPU lowering rejected it — found by the round-3 rehearsal's ragged
    validation batch, the first on-chip visit to that bucket (interpret mode
    does NOT enforce this, hence a direct invariant test)."""
    from pepflowww_tpu.data.collate import DEFAULT_BUCKETS
    from pepflowww_tpu.models.pallas_common import pick_row_tile

    for L in tuple(DEFAULT_BUCKETS) + (16, 24, 320, 512):
        k = pick_row_tile(L)
        if k is None:
            # no legal tile within the hard VMEM budget (only far beyond the
            # serving buckets) — callers fall back to the XLA path
            assert L >= 512, L
            continue
        assert L % k == 0, (L, k)
        assert k % 8 == 0 or k == L, (L, k)
        # and the tile still respects the ~2048-row VMEM budget when possible
        if any(L % d == 0 and d % 8 == 0 for d in range(1, max(1, 2048 // L) + 1)):
            assert k * L <= 2048 * 8, (L, k)


def test_row_tile_hard_budget(setup):
    """ADVICE r3 (medium): the fallback tile must not silently exceed the
    width-scaled VMEM row budget. Shapes whose smallest Mosaic-legal tile
    overflows HARD_BUDGET_FACTOR x budget get None — and EdgeTransition
    then routes that shape through the XLA graph instead of the kernel."""
    from pepflowww_tpu.models.pallas_common import (
        HARD_BUDGET_FACTOR, dist_row_tile, edge_row_tile)

    # flagship shapes unchanged
    assert edge_row_tile(64, 64) == 32
    assert edge_row_tile(160, 64) == 8
    # wide pair channel: the L=160 fallback tile (1280 rows) stays inside
    # 1.5x the 1024-row budget...
    assert edge_row_tile(160, 128) == 8
    # ...but L=256 at CZ=128 would need a 2048-row tile — the exact size
    # measured to overflow the 16 MB scoped-vmem limit (PERF.md round-3
    # scaling probe) — so there is no legal tile.
    assert edge_row_tile(256, 128) is None
    assert dist_row_tile(256, 256) is None
    # every non-None result respects the hard cap by construction
    for L in (16, 64, 96, 128, 160, 256, 320):
        for W in (64, 128, 256):
            k = edge_row_tile(L, W)
            if k is not None:
                assert k * L <= HARD_BUDGET_FACTOR * max(256, 2048 * 64 // W)

    # module-level fallback: use_pallas=True at a no-tile shape silently
    # takes the XLA path (identical results, no kernel ValueError)
    module, params, _, _, _ = setup
    rng = np.random.default_rng(5)
    B, L, c_s, c_z = 1, 256, 128, 128
    node = jnp.asarray(rng.normal(size=(B, L, c_s)).astype(np.float32))
    edge = jnp.asarray(rng.normal(size=(B, L, L, c_z)).astype(np.float32))
    mask = jnp.ones((B, L), jnp.float32)
    wide = EdgeTransition(node_embed_size=c_s, edge_embed_in=c_z,
                          edge_embed_out=c_z)
    wide_params = wide.init(jax.random.PRNGKey(2), node, edge)["params"]
    ref = wide.apply({"params": wide_params}, node, edge, node_mask=mask)
    fused = EdgeTransition(node_embed_size=c_s, edge_embed_in=c_z,
                           edge_embed_out=c_z, use_pallas=True)
    out = fused.apply({"params": wide_params}, node, edge, node_mask=mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fused_int8_close_to_fp32(setup):
    """int8 serving profile (quant_int8): dynamic per-row activation scales x
    per-channel weight scales on the two Hp-wide GEMMs. Post-LayerNorm output
    must track the fp32 path to quantization noise (sub-percent mean error);
    end-to-end quality is separately gated by the trained-oracle envelope
    (test_sampler_parity.py::test_trained_sampler_int8_profile)."""
    module, params, node, edge, node_mask = setup
    ref = np.asarray(module.apply({"params": params}, node, edge, node_mask=node_mask))
    nb = _node_bias(params, node)
    out = np.asarray(fused_edge_transition(
        edge, nb, node_mask, _kernel_params(params),
        dtype=jnp.float32, quant_int8=True, interpret=True,
    ), dtype=np.float32)
    err = np.abs(out - ref)
    scale = max(float(ref.std()), 1e-6)
    assert float(err.mean()) / scale < 0.02, (err.mean(), scale)
    assert float(err.max()) / scale < 0.15, (err.max(), scale)


def test_use_pallas_flag_in_module(setup):
    """EdgeTransition(use_pallas=True) must agree with the XLA module."""
    module, params, node, edge, node_mask = setup
    import pepflowww_tpu.models.pallas_edge as pe
    import functools

    orig = pe.fused_edge_transition
    pe.fused_edge_transition = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        pallas_module = EdgeTransition(
            node_embed_size=128, edge_embed_in=64, edge_embed_out=64,
            use_pallas=True,
        )
        out = pallas_module.apply({"params": params}, node, edge, node_mask=node_mask)
    finally:
        pe.fused_edge_transition = orig
    ref = module.apply({"params": params}, node, edge, node_mask=node_mask)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), atol=2e-4)


def test_backward_matches_jax_grad(setup):
    """Custom-VJP gradients vs jax.grad of the XLA EdgeTransition (fp32).

    Params are perturbed away from the zero-init point: at k3 = 0 the LN input
    is exactly zero and XLA's backward association leaves fp32 cancellation
    residue (~1e-4/element, amplified by rsqrt(eps)) while the kernel cancels
    exactly — comparing there tests rounding noise, not the math.
    """
    from pepflowww_tpu.models.pallas_edge_bwd import fused_edge_transition_vjp

    module, params, node, edge, node_mask = setup
    prng = np.random.default_rng(5)
    params = jax.tree_util.tree_map(
        lambda x: x + jnp.asarray(prng.normal(scale=0.05, size=x.shape).astype(np.float32)),
        params,
    )
    nb = _node_bias(params, node)
    kp = _kernel_params(params)

    def loss_pallas(edge, nb, kp):
        out = fused_edge_transition_vjp(edge, nb, node_mask, kp,
                                        jnp.float32, True)
        return jnp.sum(out * jnp.cos(out))  # nontrivial cotangent

    def loss_xla(edge, node, params):
        out = module.apply({"params": params}, node, edge, node_mask=node_mask)
        return jnp.sum(out * jnp.cos(out))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(edge, nb, kp)
    gx = jax.grad(loss_xla, argnums=(0, 2))(edge, node, params)

    # d_edge direct comparison
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               rtol=1e-3, atol=1e-4)
    # weight grads: map xla tree names onto kernel param names
    xw = gx[1]
    pairs = [
        (gp[2]["k1"], xw["Linear_1"]["Dense_0"]["kernel"]),
        (gp[2]["b1"], xw["Linear_1"]["Dense_0"]["bias"]),
        (gp[2]["k2"], xw["Linear_2"]["Dense_0"]["kernel"]),
        (gp[2]["b2"], xw["Linear_2"]["Dense_0"]["bias"]),
        (gp[2]["k3"], xw["Linear_3"]["Dense_0"]["kernel"]),
        (gp[2]["b3"], xw["Linear_3"]["Dense_0"]["bias"]),
        (gp[2]["ln_scale"], xw["LayerNorm_0"]["scale"]),
        (gp[2]["ln_bias"], xw["LayerNorm_0"]["bias"]),
    ]
    for got, want in pairs:
        np.testing.assert_allclose(np.asarray(got).squeeze(), np.asarray(want),
                                   rtol=1e-3, atol=1e-3)
    # node_bias grad: chain through Linear_0 by hand for the xla side
    def loss_xla_nb(nb2):
        # re-run the xla path post-Linear_0 by injecting nb2: reuse pallas fp32
        # reference shape via module? simplest: compare against jax.grad of the
        # fp32 interpret kernel itself (already matched to xla above).
        out = fused_edge_transition_vjp(edge, nb2, node_mask, kp, jnp.float32, True)
        return jnp.sum(out * jnp.cos(out))

    fd = jax.grad(loss_xla_nb)(nb)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(fd), rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------- IPA kernel
@pytest.fixture(scope="module")
def ipa_inputs():
    B, L, H, C, Pq, Pv, CZ4 = 2, 16, 4, 32, 4, 6, 8
    rng = np.random.default_rng(3)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    q = mk(B, H, L, C)
    k = mk(B, H, L, C)
    v = mk(B, H, L, C)
    q_pts = mk(B, H, L, Pq * 3)
    k_pts = mk(B, H, L, Pq * 3)
    v_pts = mk(B, H, L, Pv * 3)
    bias = mk(B, H, L, L)
    pair_z = mk(B, L, L, CZ4)
    mask = jnp.asarray((rng.random((B, L)) > 0.15).astype(np.float32))
    return q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask


def test_ipa_kernel_matches_reference(ipa_inputs):
    from pepflowww_tpu.models.pallas_ipa import (
        fused_ipa_attention,
        ipa_attention_reference,
    )

    ref = ipa_attention_reference(*ipa_inputs)
    out = fused_ipa_attention(*ipa_inputs, interpret=True)
    for got, want, name in zip(out, ref, ["o", "o_pt", "o_pair"]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_ipa_kernel_bh_matches_reference(ipa_inputs):
    """Batch-grid (heads via fori_loop) variant vs the jnp twin."""
    from pepflowww_tpu.models.pallas_ipa import (
        fused_ipa_attention_bh,
        ipa_attention_reference,
    )

    ref = ipa_attention_reference(*ipa_inputs)
    out = fused_ipa_attention_bh(*ipa_inputs, interpret=True)
    for got, want, name in zip(out, ref, ["o", "o_pt", "o_pair"]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_ipa_kernel_vjp(ipa_inputs):
    from pepflowww_tpu.models.pallas_ipa import (
        fused_ipa_attention_vjp,
        ipa_attention_reference,
    )

    def lp(*args):
        o, opt, opair = fused_ipa_attention_vjp(*args, 1e5, True)
        return jnp.sum(o**2) + jnp.sum(opt * 0.5) + jnp.sum(jnp.sin(opair))

    def lr(*args):
        o, opt, opair = ipa_attention_reference(*args)
        return jnp.sum(o**2) + jnp.sum(opt * 0.5) + jnp.sum(jnp.sin(opair))

    gp = jax.grad(lp, argnums=(0, 1, 2, 3, 7))(*ipa_inputs)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3, 7))(*ipa_inputs)
    for got, want in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=1e-4)


def test_ipa_module_use_pallas_matches():
    """Full IPA module: pallas path vs XLA path with identical params."""
    import functools as ft
    import pepflowww_tpu.models.pallas_ipa as pi
    from pepflowww_tpu.models.ipa import InvariantPointAttention
    from pepflowww_tpu.ops import so3

    B, L = 2, 16
    rng = np.random.default_rng(4)
    s = jnp.asarray(rng.normal(size=(B, L, 64)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(B, L, L, 32)).astype(np.float32))
    R = so3.uniform_so3(jax.random.PRNGKey(0), (B, L))
    t = jnp.asarray(rng.normal(size=(B, L, 3)).astype(np.float32) * 5)
    mask = jnp.asarray((rng.random((B, L)) > 0.1).astype(np.float32))

    kwargs = dict(c_s=64, c_z=32, c_hidden=16, no_heads=4, no_qk_points=4,
                  no_v_points=6)
    m_xla = InvariantPointAttention(**kwargs)
    params = m_xla.init(jax.random.PRNGKey(1), s, z, R, t, mask)["params"]
    ref = m_xla.apply({"params": params}, s, z, R, t, mask)

    orig = pi.fused_ipa_attention
    pi.fused_ipa_attention = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        m_pal = InvariantPointAttention(**kwargs, use_pallas=True)
        out = m_pal.apply({"params": params}, s, z, R, t, mask)
    finally:
        pi.fused_ipa_attention = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


# ---------------------------------------------------- distance-embed kernel
@pytest.fixture(scope="module")
def dist_inputs():
    B, L, A, V, F = 2, 16, 15, 484, 64
    rng = np.random.default_rng(11)
    pos = jnp.asarray(rng.normal(size=(B, L, A, 3)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, L, A)) > 0.15).astype(np.float32))
    aa = rng.integers(0, 22, size=(B, L))
    aa_pair = jnp.asarray(aa[:, :, None] * 22 + aa[:, None, :], dtype=jnp.int32)
    pmask = jnp.asarray((rng.random((B, L, L)) > 0.1).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(V, 225)).astype(np.float32) * 0.1)
    k1 = jnp.asarray(rng.normal(size=(225, F)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.normal(size=(F,)).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.normal(size=(F, F)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.normal(size=(F,)).astype(np.float32) * 0.1)
    return pos, mask, aa_pair, pmask, table, k1, b1, k2, b2


def test_distance_kernel_matches_reference(dist_inputs):
    from pepflowww_tpu.models.pallas_dist import (
        distance_embed_reference,
        fused_distance_embed,
    )

    ref = distance_embed_reference(*dist_inputs, dtype=jnp.float32)
    out = fused_distance_embed(*dist_inputs, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_distance_kernel_vjp_param_grads(dist_inputs):
    """Parameter gradients through the fused VJP vs jax.grad of the twin."""
    from pepflowww_tpu.models.pallas_dist import (
        distance_embed_reference,
        fused_distance_embed_vjp,
    )

    pos, mask, aa_pair, pmask, table, k1, b1, k2, b2 = dist_inputs

    def lp(table, k1, b1, k2, b2):
        out = fused_distance_embed_vjp(pos, mask, aa_pair, pmask, table,
                                       k1, b1, k2, b2, jnp.float32, True)
        return jnp.sum(out * jnp.sin(out))

    def lr(table, k1, b1, k2, b2):
        out = distance_embed_reference(pos, mask, aa_pair, pmask, table,
                                       k1, b1, k2, b2, dtype=jnp.float32)
        return jnp.sum(out * jnp.sin(out))

    gp = jax.grad(lp, argnums=(0, 1, 2, 3, 4))(table, k1, b1, k2, b2)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3, 4))(table, k1, b1, k2, b2)
    for got, want in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=1e-4)


def test_edge_embedder_use_pallas_matches():
    """EdgeEmbedder(use_pallas=True) == XLA module, identical params."""
    import pepflowww_tpu.models.pallas_dist as pd
    from pepflowww_tpu.models.embed import EdgeEmbedder

    B, L = 2, 16
    rng = np.random.default_rng(12)
    aa = jnp.asarray(rng.integers(0, 20, size=(B, L)))
    res_nb = jnp.asarray(np.tile(np.arange(L), (B, 1)))
    chain_nb = jnp.asarray((np.arange(L) > L // 2).astype(np.int64))[None].repeat(B, 0)
    pos = jnp.asarray(rng.normal(size=(B, L, 15, 3)).astype(np.float32) * 3)
    mask_atoms = jnp.asarray((rng.random((B, L, 15)) > 0.1))
    smask = jnp.asarray(rng.random((B, L)) > 0.3)

    m_ref = EdgeEmbedder(feat_dim=64)
    params = m_ref.init(jax.random.PRNGKey(0), aa, res_nb, chain_nb, pos,
                        mask_atoms)["params"]
    ref = m_ref.apply({"params": params}, aa, res_nb, chain_nb, pos, mask_atoms,
                      structure_mask=smask, sequence_mask=smask)

    orig = pd.fused_distance_embed
    pd.fused_distance_embed = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        m_pal = EdgeEmbedder(feat_dim=64, use_pallas=True)
        out = m_pal.apply({"params": params}, aa, res_nb, chain_nb, pos,
                          mask_atoms, structure_mask=smask, sequence_mask=smask)
    finally:
        pd.fused_distance_embed = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


# ---------------------------------------------------------------- IPA v2
def _ipa2_inputs(L=16, B=2, H=4, C=32, Pq=4, Pv=6, CZ4=16):
    from pepflowww_tpu.ops import so3

    rng = np.random.default_rng(0)

    def arr(*s):
        return jnp.asarray(rng.normal(size=s), jnp.float32)

    R = so3.rotvec_to_rotmat(arr(B, L, 3))
    mask = (rng.uniform(size=(B, L)) > 0.2).astype(np.float32)
    maskb = jnp.asarray(1e5 * (mask - 1.0))[:, None, :]
    return (arr(B, L, H * C), arr(B, L, 2 * H * C),
            arr(B, H, 3, L, Pq), arr(B, H, 3, L, Pq + Pv),
            R.reshape(B, L, 9), arr(B, L, 3),
            arr(B, H, L, L), arr(B, L, L, CZ4), maskb,
            jnp.abs(arr(1, H)) + 0.5)


def test_fused_ipa2_forward_parity():
    """Fused IPA interior (frame transforms + attention + aggregations)
    matches the jnp twin."""
    from pepflowww_tpu.models import pallas_ipa2 as P

    args = _ipa2_inputs()
    ref = P.ipa2_reference(*args)
    out = jax.jit(lambda *a: P.fused_ipa2(*a, interpret=True))(*args)
    for name, a, b in zip(("o", "optl", "norm", "opair"), out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=name)


def test_fused_ipa2_backward_parity():
    """Hand-written backward kernel (flash-style softmax recompute) matches
    jax.grad through the twin for every input incl. frames and head weights."""
    from pepflowww_tpu.models import pallas_ipa2 as P

    args = _ipa2_inputs()

    def loss(f):
        def inner(a):
            out = f(*a)
            return sum(jnp.sum(x * (i + 1)) for i, x in enumerate(out))
        return inner

    g_fused = jax.grad(loss(lambda *a: P.fused_ipa2_vjp(*a, 1e-8, True)))(args)
    g_ref = jax.grad(loss(P.ipa2_reference))(args)
    names = ("q", "kv", "qp", "kvp", "r9", "t", "bias", "pz", "maskb", "sw")
    for n, a, b in zip(names, g_fused, g_ref):
        if n == "maskb":
            continue  # 0/-inf gate, no gradient by design
        scale = float(jnp.max(jnp.abs(b))) + 1e-8
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   atol=1e-3, err_msg=n)


def test_ipa_module_pallas_matches_xla():
    """InvariantPointAttention(use_pallas=True) == XLA path on valid rows,
    forward and gradients."""
    from pepflowww_tpu.models.ipa import InvariantPointAttention
    from pepflowww_tpu.ops import so3

    rng = np.random.default_rng(1)
    B, L, cs, cz = 2, 16, 64, 32

    def arr(*s):
        return jnp.asarray(rng.normal(size=s), jnp.float32)

    s = arr(B, L, cs)
    z = arr(B, L, L, cz)
    R = so3.rotvec_to_rotmat(arr(B, L, 3))
    t = arr(B, L, 3)
    mask_np = np.ones((B, L), np.float32)
    mask_np[:, -3:] = 0.0
    mask = jnp.asarray(mask_np)

    kw = dict(c_s=cs, c_z=cz, c_hidden=32, no_heads=4, no_qk_points=4,
              no_v_points=6)
    m_x = InvariantPointAttention(**kw, use_pallas=False)
    m_p = InvariantPointAttention(**kw, use_pallas=True)
    p = m_x.init(jax.random.PRNGKey(0), s, z, R, t, mask)["params"]
    out_x = m_x.apply({"params": p}, s, z, R, t, mask)
    out_p = jax.jit(lambda *a: m_p.apply({"params": p}, *a))(s, z, R, t, mask)
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(out_p)[valid],
                               np.asarray(out_x)[valid], atol=2e-4)

    def loss(params, mod):
        o = mod.apply({"params": params}, s, z, R, t, mask)
        return jnp.sum(jnp.square(o) * mask[..., None])

    g_x = jax.grad(loss)(p, m_x)
    g_p = jax.grad(loss)(p, m_p)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_p = jax.tree_util.tree_leaves_with_path(g_p)
    for (kx, vx), (_, vp) in zip(flat_x, flat_p):
        scale = float(jnp.max(jnp.abs(vx))) + 1e-8
        np.testing.assert_allclose(np.asarray(vp) / scale,
                                   np.asarray(vx) / scale, atol=5e-3,
                                   err_msg=jax.tree_util.keystr(kx))


def test_fused_readout_matches_xla(setup):
    """Pair-resident readout epilogue (pallas_edge.py `readout=`): the
    kernel-emitted next-block linear_b / down_z must equal GEMMs over the
    kernel's own z output (transposed to the consumer layouts)."""
    module, params, node, edge, node_mask = setup
    rng = np.random.default_rng(3)
    cz = edge.shape[-1]
    kb = jnp.asarray(rng.normal(size=(cz, 8)).astype(np.float32)) * 0.1
    bb = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    kdz = jnp.asarray(rng.normal(size=(cz, 16)).astype(np.float32)) * 0.1
    bdz = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))

    nb = _node_bias(params, node)
    p = _kernel_params(params)
    out0 = fused_edge_transition(edge, nb, node_mask, p, dtype=jnp.float32,
                                 interpret=True)
    out1, bt, pzt = fused_edge_transition(
        edge, nb, node_mask, p, dtype=jnp.float32, interpret=True,
        readout=(kb, bb, kdz, bdz))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1))
    b_ref = np.transpose(np.asarray(jnp.einsum("bijc,cf->bijf", out0, kb) + bb),
                         (0, 3, 1, 2))
    pz_ref = np.transpose(np.asarray(jnp.einsum("bijc,cf->bijf", out0, kdz) + bdz),
                          (0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(bt), b_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pzt), pz_ref, atol=2e-5)
