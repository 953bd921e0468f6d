"""FSDP (sharded params + optimizer state) vs the single-device step.

The reference replicates all training state on every GPU (train_ddp.py:94).
parallel/fsdp.py shards each params/opt-state leaf over the `data` axis;
these tests pin (1) numerical equivalence to the single-device step, (2)
that the state is ACTUALLY sharded per device (memory win, not just a
relabeled replication), and (3) that the steady-state step keeps the
FSDP layout across calls (out_shardings == in_shardings, no re-gather).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from test_train import WEIGHTS, tiny
from pepflowww_tpu.parallel.fsdp import (
    fsdp_shardings,
    make_fsdp_train_step,
)
from pepflowww_tpu.parallel.mesh import make_mesh
from pepflowww_tpu.training.optim import make_optimizer
from pepflowww_tpu.training.train_step import make_train_step


def _setup():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    model, params, batch = tiny()
    tx = make_optimizer({"type": "adam", "lr": 1e-3}, 100.0)
    return model, params, batch, tx


def test_fsdp_matches_single_device():
    """Two optimizer steps under FSDP == single device (fp32 collectives
    re-associate sums; observed ~1e-7 on params)."""
    model, params, batch, tx = _setup()
    opt0 = tx.init(params)
    ref_step = make_train_step(model, tx, WEIGHTS, donate=False)
    p1, o1, m1 = ref_step(params, opt0, batch, jax.random.PRNGKey(5))
    p1, o1, m1 = ref_step(p1, o1, batch, jax.random.PRNGKey(6))

    mesh = make_mesh()
    step, prepare = make_fsdp_train_step(model, tx, WEIGHTS, mesh)
    pb = jax.device_put(batch, NamedSharding(mesh, P("data")))
    p2, o2 = prepare(params, tx.init(params))
    p2, o2, m2 = step(p2, o2, pb, jax.random.PRNGKey(5))
    p2, o2, m2 = step(p2, o2, pb, jax.random.PRNGKey(6))

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-4)
    deltas = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), p1, p2)
    # Adam's mu/sqrt(nu) amplifies reduction-order fp noise while nu is tiny;
    # observed worst leaf 3.4e-5 after two steps (vs 1e-7 on raw grads).
    assert max(jax.tree.leaves(deltas)) < 2e-4


def test_fsdp_state_is_sharded_per_device():
    """Every large leaf of params AND Adam moments must hold 1/N of its
    elements per device — the actual memory claim of FSDP."""
    model, params, batch, tx = _setup()
    mesh = make_mesh()
    n = mesh.shape["data"]
    step, prepare = make_fsdp_train_step(model, tx, WEIGHTS, mesh)
    p, o = prepare(params, tx.init(params))

    def check(tree, name):
        big_elems = 0
        for leaf in jax.tree.leaves(tree):
            if not hasattr(leaf, "addressable_shards") or leaf.size < 2 ** 10:
                continue
            big_elems += leaf.size
            if leaf.addressable_shards[0].data.size * n != leaf.size:
                # Only leaves with NO dim divisible by n may replicate
                # (e.g. the (484, 225) aapair embedding on an 8-mesh; on the
                # tiny fixture that one leaf is ~19% of all elements, which is
                # why the coverage fraction is asserted at flagship shapes in
                # test_fsdp_flagship_coverage, not here).
                assert not any(d % n == 0 and d >= n for d in leaf.shape), \
                    (name, leaf.shape)
        assert big_elems > 0, name

    check(p, "params")
    check(o, "opt_state")
    # And it stays sharded after a step (out_shardings == in_shardings).
    pb = jax.device_put(batch, NamedSharding(mesh, P("data")))
    p, o, _ = step(p, o, pb, jax.random.PRNGKey(0))
    check(p, "params after step")
    check(o, "opt_state after step")


def test_fsdp_flagship_coverage():
    """At flagship (learn_angle.yaml) shapes, >95% of parameter elements get
    a sharded spec — the per-device memory really is ~1/N. Uses eval_shape,
    so no flagship-sized allocation happens on the CPU mesh."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    import jax.numpy as jnp
    from pepflowww_tpu.data.collate import device_batch
    from pepflowww_tpu.data.synthetic import make_batch
    from pepflowww_tpu.models.flow import FlowModel, FlowModelConfig

    model = FlowModel(FlowModelConfig())
    rng = np.random.default_rng(0)
    batch = device_batch(make_batch(rng, batch_size=2, pep_len=6, rec_len=18,
                                    pad_to=32))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        model.init, {"params": key, "corruption": key}, batch
    )["params"]

    mesh = make_mesh()
    sh = fsdp_shardings(shapes, mesh)
    tot = sharded = 0
    for leaf, s in zip(jax.tree.leaves(shapes), jax.tree.leaves(sh)):
        size = int(np.prod(leaf.shape)) if leaf.shape else 1
        tot += size
        if any(ax is not None for ax in s.spec):
            sharded += size
    assert tot > 10 ** 6  # really flagship-sized
    assert sharded / tot > 0.95, sharded / tot


def test_fsdp_tp_matches_single_device():
    """FSDP x TP on a 4x2 (data, model) mesh == the single-device step: the
    2-D production recipe (state 1/N_data per device, pair activations
    1/N_model) must be numerically a relabeling, not a different program."""
    model, params, batch, tx = _setup()
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from pepflowww_tpu.parallel.tp import make_mesh_2d

    opt0 = tx.init(params)
    ref_step = make_train_step(model, tx, WEIGHTS, donate=False)
    p1, o1, m1 = ref_step(params, opt0, batch, jax.random.PRNGKey(5))
    p1, o1, m1 = ref_step(p1, o1, batch, jax.random.PRNGKey(6))

    mesh = make_mesh_2d(4, 2)
    step, prepare = make_fsdp_train_step(model, tx, WEIGHTS, mesh,
                                         tp_axis="model")
    pb = jax.device_put(batch, NamedSharding(mesh, P("data")))
    p2, o2 = prepare(params, tx.init(params))
    p2, o2, m2 = step(p2, o2, pb, jax.random.PRNGKey(5))
    p2, o2, m2 = step(p2, o2, pb, jax.random.PRNGKey(6))

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-4)
    deltas = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), p1, p2)
    assert max(jax.tree.leaves(deltas)) < 2e-4

    # The memory claims must BOTH hold: params/moments sharded 1/4 over
    # "data" (replicated over "model", so each TP group assembles locally)...
    n_data = mesh.shape["data"]
    found = 0
    for leaf in jax.tree.leaves(p2):
        if leaf.size >= 2 ** 10 and \
                leaf.addressable_shards[0].data.size * n_data == leaf.size:
            found += 1
    assert found > 0, "no param leaf is FSDP-sharded on the 2-D mesh"


def test_fsdp_tp_pair_tensors_are_sharded():
    """The composed step's compiled module must ALSO row-shard the pair
    tensors — composition must not silently drop the TP constraints.
    Same fingerprint as test_tp.py: tiny dims (B=8, L=16) on (4, 2) give
    per-shard pair shapes (2, 8, 16, c) vs full rows (2, 16, 16, c)."""
    import re

    model, params, batch, tx = _setup()
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from pepflowww_tpu.parallel.tp import make_mesh_2d

    mesh = make_mesh_2d(4, 2)
    step, prepare = make_fsdp_train_step(model, tx, WEIGHTS, mesh,
                                         tp_axis="model")
    pb = jax.device_put(batch, NamedSharding(mesh, P("data")))
    p, o = prepare(params, tx.init(params))
    from pepflowww_tpu.parallel import tp as tp_mod

    with tp_mod.tp_shard(mesh, "model"):
        txt = step._state["jit"].lower(
            p, o, pb, jax.random.PRNGKey(0)).compile().as_text()
    full = len(re.findall(r"f32\[2,16,16,\d+\]", txt))
    shard = len(re.findall(r"f32\[2,8,16,\d+\]", txt))
    assert shard > 5 * max(full, 1), (shard, full)


def test_fsdp_sharding_rule():
    """Leaves below min_size or with no divisible dim replicate; others
    shard exactly one (their largest divisible) dim."""
    mesh = make_mesh()
    n = mesh.shape["data"]
    tree = {
        "big": jnp.zeros((n * 3, 128)),
        "odd": jnp.zeros((n * 4 + 1, n * 2 + 1)),  # no divisible dim
        "tiny": jnp.zeros((4,)),
        "scalar": jnp.zeros(()),
    }
    sh = fsdp_shardings(tree, mesh, min_size=64)
    assert sh["big"].spec == P("data", None) or sh["big"].spec == P(None, "data")
    assert sh["odd"].spec == P()
    assert sh["tiny"].spec == P()
    assert sh["scalar"].spec == P()
