"""Tensor-parallel (pair-row sharded) train step vs the replicated path.

The reference has exactly one scaling strategy — DDP (train_ddp.py:79-94).
parallel/tp.py adds a (data, model) mesh where the trunk's L² pair tensors
shard their query rows; these tests pin (1) numerical equivalence to the
single-device step and (2) that the pair tensors are ACTUALLY sharded in the
compiled module (a silent fall-back to replication would pass test 1).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from test_train import WEIGHTS, tiny
from pepflowww_tpu.parallel.mesh import replicate
from pepflowww_tpu.parallel.tp import make_mesh_2d, tp_shard
from pepflowww_tpu.training.optim import make_optimizer
from pepflowww_tpu.training.train_step import (
    make_loss_fn,
    make_tp_train_step,
    make_train_step,
)


def test_tp_matches_replicated():
    """One optimizer step on a 2x4 (data, model) mesh == single-device step.

    Tolerance: collectives re-associate fp32 sums; observed ~1e-7 on params,
    ~4e-6 relative on the loss."""
    model, params, batch = tiny()
    tx = make_optimizer({"type": "adam", "lr": 1e-3}, 100.0)
    opt0 = tx.init(params)
    p1, o1, m1 = make_train_step(model, tx, WEIGHTS, donate=False)(
        params, opt0, batch, jax.random.PRNGKey(5))

    mesh = make_mesh_2d(2, 4)
    pb = jax.device_put(batch, NamedSharding(mesh, P("data")))
    p2, o2, m2 = make_tp_train_step(model, tx, WEIGHTS, mesh)(
        replicate(params, mesh), replicate(opt0, mesh), pb,
        jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-4)
    deltas = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), p1, p2)
    assert max(jax.tree.leaves(deltas)) < 1e-5


def test_tp_pair_tensors_are_sharded():
    """The compiled TP module must run the pair math on row-sharded shapes.

    At tiny dims (B=8, L=16) on a 2x4 mesh the per-shard pair shape is
    (4, 4, 16, c): batch 8/2, rows 16/4. Requires sharded-row pair ops to
    dominate full-row ones by >5x — full-row stragglers at the constraint
    boundaries are fine, wholesale replication is not."""
    model, params, batch = tiny()
    mesh = make_mesh_2d(2, 4)
    loss_fn = make_loss_fn(model, WEIGHTS)
    f = jax.jit(
        jax.grad(lambda p, b, r: loss_fn(p, b, r)[0]),
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("data")),
                      NamedSharding(mesh, P())),
    )
    with tp_shard(mesh):
        txt = f.lower(params, batch, jax.random.PRNGKey(0)).compile().as_text()
    full = len(re.findall(r"f32\[4,16,16,\d+\]", txt))
    shard = len(re.findall(r"f32\[4,4,16,\d+\]", txt))
    assert shard > 5 * max(full, 1), (shard, full)


def test_tp_sampler_matches_single_device():
    """The TP sampler (serving-side pair-row sharding) must reproduce the
    single-device ODE bit-for-bit up to fp reduction order: PRNG bits depend
    on key+shape, not sharding, so sampled tokens must agree exactly."""
    from pepflowww_tpu import sampling

    model, params, batch = tiny()
    key = jax.random.PRNGKey(7)
    out1 = jax.jit(
        lambda p, b, k: sampling.euler_sample(model, p, b, k, num_steps=4)
    )(params, batch, key)

    mesh = make_mesh_2d(2, 4)
    pb = jax.device_put(batch, NamedSharding(mesh, P("data")))
    out2 = sampling.make_tp_sampler(model, mesh, num_steps=4)(
        replicate(params, mesh), pb, key)

    np.testing.assert_allclose(np.asarray(out2["trans"]),
                               np.asarray(out1["trans"]), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out2["rotmats"]),
                               np.asarray(out1["rotmats"]), atol=5e-5)
    assert (np.asarray(out2["seqs"]) == np.asarray(out1["seqs"])).all()


def test_tp_sampler_single_trace_per_shape():
    """make_tp_sampler builds ONE jit wrapper (same guarantee the DP sampler
    test pins): repeat same-shape calls must not retrace even though the
    tp_shard scope is re-entered per call."""
    from pepflowww_tpu import sampling

    model, params, batch = tiny()
    mesh = make_mesh_2d(2, 4)
    fn = sampling.make_tp_sampler(model, mesh, num_steps=2)
    p = replicate(params, mesh)
    pb = jax.device_put(batch, NamedSharding(mesh, P("data")))
    fn(p, pb, jax.random.PRNGKey(0))
    fn(p, pb, jax.random.PRNGKey(1))
    assert fn._cache_size() == 1, "same-shape call retraced the TP sampler"
