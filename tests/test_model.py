"""Model-level tests: init, loss, leakage invariance, sampler semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pepflowww_tpu.data.synthetic import make_batch
from pepflowww_tpu.data.collate import device_batch
from pepflowww_tpu.models.flow import FlowModel, FlowModelConfig
from pepflowww_tpu.models.trunk import IPAConfig
from pepflowww_tpu import sampling


def small_config():
    return FlowModelConfig(
        ipa=IPAConfig(
            c_s=128, c_z=64, c_hidden=32, no_heads=4, no_qk_points=4,
            no_v_points=6, seq_tfmr_num_heads=4, seq_tfmr_num_layers=1,
            num_blocks=2,
        )
    )


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    batch = device_batch(make_batch(rng, batch_size=2, pep_len=5, rec_len=11, pad_to=16))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = FlowModel(small_config())
    params = model.init(
        {"params": jax.random.PRNGKey(0), "corruption": jax.random.PRNGKey(1)},
        batch,
    )["params"]
    return model, params, batch


def test_loss_runs_and_finite(setup):
    model, params, batch = setup
    losses = model.apply(
        {"params": params}, batch, rngs={"corruption": jax.random.PRNGKey(2)}
    )
    assert set(losses) == {
        "trans_loss", "rot_loss", "bb_atom_loss", "seqs_loss", "angle_loss",
        "torsion_loss",
    }
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_loss_grad_finite(setup):
    model, params, batch = setup

    def total(p):
        l = model.apply({"params": p}, batch, rngs={"corruption": jax.random.PRNGKey(3)})
        return sum(l.values())

    g = jax.grad(total)(params)
    leaves = jax.tree_util.tree_leaves(g)
    bad = {
        "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path): int(
            (~np.isfinite(np.asarray(x))).sum()
        )
        for path, x in jax.tree_util.tree_leaves_with_path(g)
        if not np.all(np.isfinite(np.asarray(x)))
    }
    assert not bad, f"non-finite grads in: {bad}"
    # Gradients reach the embedders and the trunk.
    flat = {"/".join(str(p) for p in path): x for path, x in
            jax.tree_util.tree_leaves_with_path(g)}
    assert any("node_embedder" in k for k in flat)
    assert any(np.abs(np.asarray(v)).sum() > 0 for k, v in flat.items() if "ga_encoder" in k)


def test_encode_no_leakage(setup):
    """Featurizers must be invariant to generated-region content."""
    model, params, batch = setup
    out1 = model.apply({"params": params}, batch, method="encode")

    corrupted = dict(batch)
    gen = batch["generate_mask"]
    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.normal(size=batch["pos_heavyatom"].shape).astype(np.float32)) * 5.0
    corrupted["pos_heavyatom"] = jnp.where(
        gen[..., None, None], batch["pos_heavyatom"] + noise, batch["pos_heavyatom"]
    )
    corrupted["aa"] = jnp.where(gen, (batch["aa"] + 7) % 20, batch["aa"])
    corrupted["torsion_angle"] = jnp.where(
        gen[..., None], 0.5, batch["torsion_angle"]
    )
    out2 = model.apply({"params": params}, corrupted, method="encode")

    node1, node2 = out1[4], out2[4]
    edge1, edge2 = out1[5], out2[5]
    np.testing.assert_allclose(np.asarray(node1), np.asarray(node2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(edge1), np.asarray(edge2), atol=1e-5)


def test_sampler_shapes_and_context(setup):
    model, params, batch = setup
    out = sampling.euler_sample(
        model, params, batch, jax.random.PRNGKey(0), num_steps=4
    )
    B, L = batch["aa"].shape
    assert out["rotmats"].shape == (B, L, 3, 3)
    assert out["trans"].shape == (B, L, 3)
    assert out["angles"].shape == (B, L, 5)
    assert out["seqs"].shape == (B, L)

    ctx = ~np.asarray(batch["generate_mask"])
    np.testing.assert_allclose(
        np.asarray(out["trans"])[ctx], np.asarray(out["trans_1"])[ctx], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["rotmats"])[ctx], np.asarray(out["rotmats_1"])[ctx], atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(out["seqs"])[ctx], np.asarray(out["seqs_1"])[ctx]
    )
    # Generated angles obey the chemical validity table of the final sequence.
    from pepflowww_tpu.ops.allatom import torsions_mask_for

    tm = np.asarray(torsions_mask_for(out["seqs"])) > 0.5
    ang = np.asarray(out["angles"])
    gen = np.asarray(batch["generate_mask"])
    assert np.all(ang[gen][~tm[gen]] == 0.0)


def test_sampler_traj(setup):
    model, params, batch = setup
    out = sampling.euler_sample(
        model, params, batch, jax.random.PRNGKey(0), num_steps=4, return_traj=True
    )
    assert out["traj"]["trans"].shape[0] == 3  # num_steps - 1 scan outputs


def test_sampler_jit(setup):
    model, params, batch = setup
    fn = sampling.make_sampler(model, num_steps=3)
    out = fn(params, batch, jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(out["trans"])))


def test_dp_sampler_matches_single_device(setup):
    """Sharded sampling must produce the same samples as single-device."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    from pepflowww_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    model, params, batch = setup
    key = jax.random.PRNGKey(5)
    single = sampling.euler_sample(model, params, batch, key, num_steps=3)

    mesh = make_mesh(2)
    dp = sampling.make_dp_sampler(model, mesh, num_steps=3)
    out = dp(replicate(params, mesh), shard_batch(batch, mesh), key)
    np.testing.assert_allclose(np.asarray(out["trans"]),
                               np.asarray(single["trans"]), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out["seqs"]),
                                  np.asarray(single["seqs"]))


def test_quant_int8_requires_pallas():
    """IPAConfig(quant_int8=True) without use_pallas would silently run the
    plain XLA path (the int8 branch lives inside the fused kernel), so the
    config must refuse it outright (ADVICE r3)."""
    with pytest.raises(ValueError, match="use_pallas"):
        IPAConfig(quant_int8=True)
    IPAConfig(quant_int8=True, use_pallas=True)  # valid pairing


def test_dp_sampler_single_trace_per_shape(setup):
    """The DP sampler factory returns ONE jit wrapper (VERDICT r3 item 5:
    the old per-call `jax.jit` re-wrap gave every invocation a fresh trace
    cache). Two calls at the same shapes must hit one compiled executable;
    a second shape adds exactly one more cache entry."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    from pepflowww_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    model, params, batch = setup
    mesh = make_mesh(2)
    dp = sampling.make_dp_sampler(model, mesh, num_steps=2)
    p = replicate(params, mesh)
    b = shard_batch(batch, mesh)
    dp(p, b, jax.random.PRNGKey(0))
    dp(p, b, jax.random.PRNGKey(1))  # same shapes, different key/values
    assert dp._cache_size() == 1, "same-shape call retraced the DP sampler"
    # a second bucket (longer L) traces exactly once more
    batch2 = device_batch(make_batch(np.random.default_rng(3), batch_size=4,
                                     pep_len=5, rec_len=11, pad_to=24))
    b2 = shard_batch({k: jnp.asarray(v) for k, v in batch2.items()}, mesh)
    dp(p, b2, jax.random.PRNGKey(2))
    dp(p, b2, jax.random.PRNGKey(3))
    assert dp._cache_size() == 2


def test_sidechain_packing_mode(setup):
    """sample_bb=False, sample_seq=False: backbone and sequence stay native;
    only torsions are generated (learn_sc configuration)."""
    model, params, batch = setup
    out = sampling.euler_sample(
        model, params, batch, jax.random.PRNGKey(2), num_steps=4,
        sample_bb=False, sample_ang=True, sample_seq=False,
    )
    np.testing.assert_allclose(np.asarray(out["trans"]), np.asarray(out["trans_1"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["rotmats"]), np.asarray(out["rotmats_1"]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["seqs"]), np.asarray(out["seqs_1"]))
    # angles in the generated region did change
    gen = np.asarray(batch["generate_mask"])
    diff = np.abs(np.asarray(out["angles"]) - np.asarray(out["angles_1"]))[gen]
    assert diff.max() > 0.1


def test_dp_sampler_flagship_dims():
    """DP sampler on the 8-device CPU mesh at flagship dims with the TPU
    profile (bf16 + Pallas kernels, auto-interpret off TPU) — the real serving
    graph under SPMD partitioning (VERDICT r1 item 5)."""
    from pepflowww_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(11)
    batch = device_batch(make_batch(rng, batch_size=8, pep_len=6, rec_len=18,
                                    pad_to=64))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = FlowModel(FlowModelConfig(ipa=IPAConfig(dtype="bfloat16",
                                                    use_pallas=True)))
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "corruption": jax.random.PRNGKey(1)},
        batch,
    )["params"]
    mesh = make_mesh(8)
    dp = sampling.make_dp_sampler(model, mesh, num_steps=2)
    out = dp(replicate(params, mesh), shard_batch(batch, mesh),
             jax.random.PRNGKey(3))
    assert out["trans"].shape == (8, 64, 3)
    assert np.isfinite(np.asarray(out["trans"])).all()
    assert np.isfinite(np.asarray(out["angles"])).all()


def test_sampler_microbatching(setup):
    """Batches above the per-chip optimum run as sequential lax.map chunks
    inside one jit (PERF.md batch sweep: B>64 regresses via XLA batch-minor
    pair-tensor layouts); outputs keep shape and chunks draw distinct noise."""
    model, params, batch = setup
    big = {k: jnp.concatenate([v] * 4, axis=0) for k, v in batch.items()}
    fn = sampling.make_sampler(model, num_steps=2, microbatch=4)
    out = fn(params, big, jax.random.PRNGKey(0))
    B, L = big["aa"].shape
    assert out["trans"].shape == (B, L, 3)
    assert np.isfinite(np.asarray(out["trans"])).all()
    # different chunks get split keys -> different generated noise
    t = np.asarray(out["trans"])
    gen = np.asarray(big["generate_mask"][0]).astype(bool)
    assert not np.allclose(t[0][gen], t[4][gen])

    # microbatch=None path unchanged
    fn_plain = sampling.make_sampler(model, num_steps=2, microbatch=None)
    out_plain = fn_plain(params, big, jax.random.PRNGKey(0))
    assert out_plain["trans"].shape == (B, L, 3)

    # non-multiple batch: ragged tail chunk concatenates back (B=8, mb=3)
    fn_rag = sampling.make_sampler(model, num_steps=2, microbatch=3)
    out_rag = fn_rag(params, big, jax.random.PRNGKey(1))
    assert out_rag["trans"].shape == (B, L, 3)
    assert np.isfinite(np.asarray(out_rag["trans"])).all()

    # return_traj: time stacks outside the mapped batch axis and must be
    # un-chunked by key (num_steps == microbatch is the adversarial case)
    fn_traj = sampling.make_sampler(model, num_steps=4, microbatch=4,
                                    return_traj=True)
    out_traj = fn_traj(params, big, jax.random.PRNGKey(2))
    assert out_traj["trans"].shape == (B, L, 3)
    # traj stacks the scan steps (num_steps - 1 Euler updates; the final t=1
    # prediction is the top-level output), time axis OUTSIDE batch
    assert out_traj["traj"]["trans"].shape == (3, B, L, 3)
    assert np.isfinite(np.asarray(out_traj["traj"]["trans"])).all()
    # context rows are identical across chunks at every step
    gen0 = np.asarray(big["generate_mask"][0]).astype(bool)
    tr = np.asarray(out_traj["traj"]["trans"])
    np.testing.assert_allclose(tr[:, 0][:, ~gen0], tr[:, 4][:, ~gen0],
                               atol=1e-5)


def test_fused_pair_readout_matches(setup):
    """denoise(fused_pair_readout=True) — the sampler's pair-resident
    readout graph (trunk.py GAEncoder) — must match the plain graph. With
    use_pallas off the readout flows through EdgeTransition's GEMM fallback;
    the Pallas epilogue itself is pinned by
    test_pallas.py::test_fused_readout_matches_xla and exercised end-to-end
    by the bf16+pallas sampler-parity profiles."""
    model, params, batch = setup
    from pepflowww_tpu.ops import rot9

    rot1, tr1, ang1, seq1, ne, ee = model.apply(
        {"params": params}, batch, method="encode")
    r9 = rot9.to9(rot1.astype(jnp.float32))
    t = jnp.full((batch["aa"].shape[0], 1), 0.5)
    args = (t, r9, tr1, ang1, seq1, ne, ee,
            batch["generate_mask"], batch["res_mask"])
    d0 = model.apply({"params": params}, *args, method="denoise",
                     fused_pair_readout=False)
    d1 = model.apply({"params": params}, *args, method="denoise",
                     fused_pair_readout=True)
    np.testing.assert_allclose(np.asarray(d1[1]), np.asarray(d0[1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rot9.from9(d1[0])),
                               np.asarray(rot9.from9(d0[0])), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1[3]), np.asarray(d0[3]), atol=1e-5)
