"""Pipeline-parallel (GPipe over the block stack) vs the replicated path.

The reference has exactly one scaling strategy — DDP (train_ddp.py:79-94).
parallel/pp.py adds the depth axis: blocks shard over 'pipe', microbatches
stream through stages via ppermute. These tests pin

1. the name-free block decomposition (prologue → block_apply* → epilogue)
   is BITWISE the GAEncoder forward — any drift between the trunk loop and
   pp.block_apply fails here first;
2. the pipelined schedule reproduces the trunk forward across (data, pipe,
   microbatch) shapes, including fill/drain corner cases (M=1, M>S, S=nb);
3. one optimizer step through make_pp_train_step — i.e. gradients THROUGH
   ppermute/scan/cond and the full loss — matches the single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from test_train import WEIGHTS
from pepflowww_tpu.data.collate import device_batch
from pepflowww_tpu.data.synthetic import make_batch
from pepflowww_tpu.models.flow import FlowModel, FlowModelConfig
from pepflowww_tpu.models.trunk import GAEncoder, IPAConfig
from pepflowww_tpu.parallel import pp
from pepflowww_tpu.parallel.mesh import replicate
from pepflowww_tpu.training.optim import make_optimizer
from pepflowww_tpu.training.train_step import make_pp_train_step, make_train_step

_IPA = dict(c_s=32, c_z=16, c_hidden=8, no_heads=2, no_qk_points=2,
            no_v_points=3, seq_tfmr_num_heads=2, seq_tfmr_num_layers=1)


def tiny_deep(num_blocks=4):
    """A tiny flow model with a width-uniform pair track (edge_embed_size ==
    c_z — PP's stacked-block requirement, matched by the flagship config)
    and enough depth to pipeline."""
    cfg = FlowModelConfig(
        node_embed_size=32, edge_embed_size=16,
        ipa=IPAConfig(num_blocks=num_blocks, **_IPA),
    )
    rng = np.random.default_rng(1)
    batch = device_batch(make_batch(rng, batch_size=8, pep_len=4, rec_len=8, pad_to=16))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = FlowModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "corruption": jax.random.PRNGKey(1)}, batch
    )["params"]
    return model, params, batch


def _trunk_inputs(cfg, key, B=8, L=12):
    ks = jax.random.split(key, 7)
    t = jax.random.uniform(ks[0], (B, 1))
    rot = jnp.tile(jnp.eye(3), (B, L, 1, 1))
    trans = jax.random.normal(ks[1], (B, L, 3))
    angles = jax.random.uniform(ks[2], (B, L, 5)) * 2 * np.pi
    seqs = jax.random.randint(ks[3], (B, L), 0, 20)
    node = jax.random.normal(ks[4], (B, L, cfg.c_s))
    edge = jax.random.normal(ks[5], (B, L, L, cfg.c_z))
    gen = jnp.ones((B, L), jnp.int32)
    res = jnp.ones((B, L), jnp.int32)
    return t, rot, trans, angles, seqs, node, edge, gen, res


def test_pp_block_decomposition_exact():
    cfg = IPAConfig(num_blocks=4, **_IPA)
    args = _trunk_inputs(cfg, jax.random.PRNGKey(2))
    m = GAEncoder(cfg)
    params = m.init(jax.random.PRNGKey(3), *args)["params"]
    ref = m.apply({"params": params}, *args)

    t, rot, trans, angles, seqs, node, edge, _, res = args
    state = pp.trunk_prologue(cfg, params, t, rot, trans, angles, seqs,
                              node, edge, res)
    stacked = pp.stack_block_params(params, cfg.num_blocks)
    for b in range(cfg.num_blocks):
        bp = jax.tree.map(lambda a: a[b], stacked)
        state = pp.block_apply(cfg, bp, state,
                               jnp.asarray(b == cfg.num_blocks - 1))
    out = pp.trunk_epilogue(cfg, params, state[0], state[2], state[3])
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_pipeline_matches_trunk():
    cfg = IPAConfig(num_blocks=4, **_IPA)
    args = _trunk_inputs(cfg, jax.random.PRNGKey(4))
    m = GAEncoder(cfg)
    params = m.init(jax.random.PRNGKey(5), *args)["params"]
    ref = m.apply({"params": params}, *args)

    t, rot, trans, angles, seqs, node, edge, _, res = args
    state0 = pp.trunk_prologue(cfg, params, t, rot, trans, angles, seqs,
                               node, edge, res)
    stacked = pp.stack_block_params(params, cfg.num_blocks)

    # (n_data, n_pipe, n_micro): fill/drain corners — M < S, M = 1, S = nb,
    # and the composed data x pipe mesh.
    for nd, npipe, M in [(1, 2, 4), (1, 4, 2), (2, 2, 2), (4, 2, 1)]:
        mesh = pp.make_mesh_pp(nd, npipe)
        node_o, R_o, tr_o = jax.jit(
            lambda st, s0: pp.pipeline_blocks(mesh, cfg, st, s0, M,
                                              cfg.num_blocks)
        )(stacked, state0)
        out = pp.trunk_epilogue(cfg, params, node_o, R_o, tr_o)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, err_msg=f"{nd}x{npipe} M={M}")


def test_pp_train_step_matches_single_device():
    """One Adam step on a 2x4 (data, pipe) mesh — gradients through the
    whole pipelined loss — equals the single-device step. Tolerances as in
    test_tp.py: fp32 collectives re-associate sums."""
    model, params, batch = tiny_deep(num_blocks=4)
    tx = make_optimizer({"type": "adam", "lr": 1e-3}, 100.0)
    opt0 = tx.init(params)
    p1, o1, m1 = make_train_step(model, tx, WEIGHTS, donate=False)(
        params, opt0, batch, jax.random.PRNGKey(5))

    mesh = pp.make_mesh_pp(2, 4)
    pb = jax.device_put(batch, NamedSharding(mesh, P("data")))
    p2, o2, m2 = make_pp_train_step(model, tx, WEIGHTS, mesh, n_micro=2)(
        replicate(params, mesh), replicate(opt0, mesh), pb,
        jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-4)
    for k in WEIGHTS:
        np.testing.assert_allclose(float(m2[k]), float(m1[k]), rtol=2e-4,
                                   err_msg=k)
    deltas = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), p1, p2)
    assert max(jax.tree.leaves(deltas)) < 1e-5


def test_pp_fsdp_composed_matches_single_device():
    """--pp --fsdp: params + Adam state sharded 1/N_data over 'data' while
    blocks pipeline over 'pipe' on the SAME (2, 4) mesh — one Adam step must
    still equal the single-device step, and the prepared state must actually
    be sharded (not silently replicated)."""
    model, params, batch = tiny_deep(num_blocks=4)
    tx = make_optimizer({"type": "adam", "lr": 1e-3}, 100.0)
    opt0 = tx.init(params)
    p1, o1, m1 = make_train_step(model, tx, WEIGHTS, donate=False)(
        params, opt0, batch, jax.random.PRNGKey(5))

    mesh = pp.make_mesh_pp(2, 4)
    pb = jax.device_put(batch, NamedSharding(mesh, P("data")))
    step, prepare = make_pp_train_step(model, tx, WEIGHTS, mesh, n_micro=2,
                                       fsdp=True)
    p_sh, o_sh = prepare(jax.tree.map(lambda x: x.copy(), params),
                         tx.init(params))
    # the FSDP layout must be real: at least one leaf sharded over 'data'
    specs = {s.spec for s in jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding, p_sh))}
    assert any("data" in str(s) for s in specs), specs
    p2, o2, m2 = step(p_sh, o_sh, pb, jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-4)
    deltas = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(jax.device_get(a) - jax.device_get(b)))),
        p1, p2)
    assert max(jax.tree.leaves(deltas)) < 1e-5
