"""Manual (shard_map) data parallelism — the multi-chip path that KEEPS the
fused Pallas kernels (parallel/manual.py).

jit's automatic SPMD must swap Mosaic kernels for the XLA graph on a real
multi-chip mesh (tp.xla_profile_model); shard_map with every mesh axis
manual is the lowering-legal alternative. These tests pin the semantics on
the 8-virtual-device CPU mesh:

1. each sampler shard is BITWISE the single-device `euler_sample` on that
   shard's rows with fold_in(key, shard_index) — the per-shard
   reproducibility contract the docstring promises;
2. the train step's update equals hand-averaged per-shard grads through the
   same optimizer — gradient-identical to the global DP step up to fp
   reduction order;
3. the Pallas-profile model traces and runs through both factories WITHOUT
   the XLA swap (no "Mosaic" fallback warning) — the whole point;
4. the manual-axes contract this module relies on still holds in the
   installed jax (source assertion — a CPU mesh can never execute the
   TPU-only raise).
"""

import jax
import jax.numpy as jnp
import numpy as np

from test_train import WEIGHTS, tiny
from pepflowww_tpu import sampling
from pepflowww_tpu.parallel.manual import (
    make_manual_dp_sampler,
    make_manual_dp_train_step,
)
from pepflowww_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from pepflowww_tpu.training.optim import make_optimizer
from pepflowww_tpu.training.train_step import make_loss_fn


def test_manual_sampler_shard_bitwise_reproducible():
    """Shard i of the manual DP sampler == single-device euler_sample on
    shard i's rows with fold_in(key, i), bit for bit (same trace, same
    PRNG bits, no cross-shard term anywhere in the ODE)."""
    model, params, batch = tiny()
    n = 8
    mesh = make_mesh(n)
    key = jax.random.PRNGKey(1)
    out = jax.tree.map(np.asarray, make_manual_dp_sampler(
        model, mesh, num_steps=3)(
        replicate(params, mesh), shard_batch(batch, mesh), key))

    B = batch["aa"].shape[0]
    bs = B // n
    ref = jax.jit(lambda p, b, k: sampling.euler_sample(model, p, b, k, num_steps=3))
    for i in (0, 3, 7):
        sub = {k_: v[i * bs:(i + 1) * bs] for k_, v in batch.items()}
        r = ref(params, sub, jax.random.fold_in(key, i))
        np.testing.assert_array_equal(
            np.asarray(r["seqs"]), out["seqs"][i * bs:(i + 1) * bs])
        np.testing.assert_allclose(
            np.asarray(r["trans"]), out["trans"][i * bs:(i + 1) * bs],
            atol=0, rtol=0)


def test_manual_train_step_matches_hand_reduced_grads():
    """params/opt after one manual step == optax applied to the pmean of
    per-shard grads (each computed with the shard's folded corruption key):
    the shard_map step is exactly DDP-with-per-shard-RNG."""
    model, params, batch = tiny()
    n = 8
    mesh = make_mesh(n)
    tx = make_optimizer({"type": "adam", "lr": 1e-3}, 100.0)
    opt = tx.init(params)
    rng = jax.random.PRNGKey(0)

    # hand-reduced reference FIRST: the manual step donates its inputs, and
    # on a single-host mesh replicate() aliases the source buffers, so the
    # donating call deletes `params` too (the fsdp.prepare caveat).
    loss_fn = make_loss_fn(model, WEIGHTS)
    B = batch["aa"].shape[0]
    bs = B // n
    gfn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    grads, totals = [], []
    for i in range(n):
        sub = {k_: v[i * bs:(i + 1) * bs] for k_, v in batch.items()}
        (total, _), g = gfn(params, sub, jax.random.fold_in(rng, i))
        grads.append(g)
        totals.append(float(total))
    gmean = jax.tree.map(lambda *xs: sum(xs) / n, *grads)
    updates, o_ref = tx.update(gmean, opt, params)
    p_ref = jax.tree.map(lambda p, u: p + u, params, updates)
    p_ref = jax.tree.map(np.asarray, p_ref)

    p2, o2, m = make_manual_dp_train_step(model, tx, WEIGHTS, mesh)(
        replicate(params, mesh), replicate(opt, mesh),
        shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(m["loss"]), np.mean(totals), rtol=1e-5)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), p_ref, p2)
    assert max(jax.tree.leaves(d)) < 1e-5, max(jax.tree.leaves(d))


def test_manual_keeps_pallas_kernels():
    """A Pallas-profile model must go through BOTH manual factories without
    the xla_profile_model swap (no Mosaic-fallback warning) and produce
    finite outputs — on CPU the kernels run in interpret mode; on a pod the
    manual-axes rule admits the compiled Mosaic call (see
    test_mosaic_manual_axes_contract)."""
    import dataclasses
    import warnings as _w

    model, params, batch = tiny()
    pallas_model = type(model)(dataclasses.replace(
        model.cfg, ipa=dataclasses.replace(model.cfg.ipa, use_pallas=True)))
    mesh = make_mesh(8)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        out = make_manual_dp_sampler(pallas_model, mesh, num_steps=2)(
            replicate(params, mesh), shard_batch(batch, mesh),
            jax.random.PRNGKey(1))
        tx = make_optimizer({"type": "adam", "lr": 1e-3}, 100.0)
        _, _, m = make_manual_dp_train_step(pallas_model, tx, WEIGHTS, mesh)(
            replicate(params, mesh), replicate(tx.init(params), mesh),
            shard_batch(batch, mesh), jax.random.PRNGKey(0))
    assert not any("Mosaic" in str(r.message) or "Pallas" in str(r.message)
                   for r in rec), [str(r.message) for r in rec]
    assert np.isfinite(np.asarray(out["trans"])).all()
    assert np.isfinite(float(m["loss"]))


def test_manual_requires_1d_mesh():
    """The factories run the full single-device program per shard; a 2-D
    mesh would leave the second axis unaccounted — must refuse loudly."""
    import pytest

    from pepflowww_tpu.parallel.tp import make_mesh_2d

    model, _, _ = tiny()
    with pytest.raises(AssertionError, match="1-D mesh"):
        make_manual_dp_sampler(model, make_mesh_2d(2, 4))


def test_mosaic_manual_axes_contract():
    """parallel/manual.py exists because jax's TPU lowering (a) rejects
    Mosaic custom calls under automatic SPMD with >1 device and (b) admits
    them when every mesh axis is manual. A CPU process can't execute that
    branch, so pin the contract against the installed jax's source: if an
    upgrade rewrites it, this fails before a pod does."""
    import inspect

    from jax._src import tpu_custom_call as tcc

    src = inspect.getsource(tcc)
    assert "Mosaic kernels cannot be automatically partitioned" in src
    # the manual-axes escape hatch: SPMDAxisContext is only rejected when
    # the manual axes do NOT cover the whole mesh
    assert "manual_axes" in src and "SPMDAxisContext" in src


def test_train_cli_dp_manual(tmp_path):
    """`--dp_manual` trains from the CLI (8 virtual CPU devices): finite
    losses, clean exit. Guards the train.py wiring only — the step's
    numerics are pinned by test_manual_train_step_matches_hand_reduced_grads
    above, and composition with --fsdp/--tp/--pp must refuse loudly."""
    import os
    import subprocess
    import sys

    import yaml

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "configs/learn_angle.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["model"]["encoder"]["ipa"].update(
        c_s=32, c_z=16, c_hidden=32, no_heads=2, no_qk_points=2,
        no_v_points=3, seq_tfmr_num_layers=1, num_blocks=2)
    cfg["model"]["encoder"]["node_embed_size"] = 32
    cfg["model"]["encoder"]["edge_embed_size"] = 16
    path = tmp_path / "tiny_dp_manual.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)

    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys, runpy; "
        f"sys.argv=['train.py','--config',{str(path)!r},'--synthetic','--debug',"
        "'--max_iters','4','--log_freq','2','--batch_size','8',"
        "'--dp_manual']; "
        "runpy.run_path('train.py', run_name='__main__')"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=root, timeout=900)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    log = out.stdout + out.stderr
    losses = [float(m) for m in
              __import__("re").findall(r"it \d+ \| loss ([-\d.]+)", log)]
    assert losses and all(np.isfinite(l) for l in losses), log[-2000:]

    # the composition guard: --dp_manual with a GSPMD axis must refuse
    code_bad = code.replace("'--dp_manual']", "'--dp_manual','--fsdp']")
    out_bad = subprocess.run([sys.executable, "-c", code_bad],
                             capture_output=True, text=True, cwd=root,
                             timeout=300)
    assert out_bad.returncode != 0
    assert "--dp_manual" in (out_bad.stdout + out_bad.stderr)
