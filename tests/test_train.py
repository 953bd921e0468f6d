"""Training-step tests: loss decreases, DP sharding, checkpoint round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pepflowww_tpu.data.collate import device_batch
from pepflowww_tpu.data.synthetic import make_batch
from pepflowww_tpu.models.flow import FlowModel, FlowModelConfig
from pepflowww_tpu.models.trunk import IPAConfig
from pepflowww_tpu.training.optim import PlateauScheduler, make_optimizer, sum_weighted_losses
from pepflowww_tpu.training.train_step import make_dp_train_step, make_train_step

WEIGHTS = {"trans_loss": 0.5, "rot_loss": 0.5, "bb_atom_loss": 0.25,
           "seqs_loss": 1.0, "angle_loss": 1.0, "torsion_loss": 0.5}


def tiny():
    cfg = FlowModelConfig(
        ipa=IPAConfig(c_s=32, c_z=16, c_hidden=8, no_heads=2, no_qk_points=2,
                      no_v_points=3, seq_tfmr_num_heads=2, seq_tfmr_num_layers=1,
                      num_blocks=1)
    )
    rng = np.random.default_rng(1)
    batch = device_batch(make_batch(rng, batch_size=8, pep_len=4, rec_len=8, pad_to=16))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = FlowModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "corruption": jax.random.PRNGKey(1)}, batch
    )["params"]
    return model, params, batch


def test_train_step_reduces_loss():
    model, params, batch = tiny()
    tx = make_optimizer({"type": "adam", "lr": 1e-3}, 100.0)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, WEIGHTS, donate=False)
    # Fixed corruption key -> deterministic objective; 30 Adam steps on the
    # same batch must reduce it.
    k = jax.random.PRNGKey(0)
    first = None
    metrics = None
    for i in range(30):
        params, opt_state, metrics = step(params, opt_state, batch, k)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_dp_train_step_multidevice():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    from pepflowww_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    model, params, batch = tiny()
    mesh = make_mesh()
    tx = make_optimizer({"type": "adam", "lr": 1e-3}, 100.0)
    opt_state = tx.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    batch = shard_batch(batch, mesh)
    step = make_dp_train_step(model, tx, WEIGHTS, mesh)
    params, opt_state, metrics = step(params, opt_state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_dp_matches_single_device():
    """The sharded step must compute the same update as the single-chip step."""
    from pepflowww_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    model, params, batch = tiny()
    tx = make_optimizer({"type": "adam", "lr": 1e-3}, 100.0)
    opt0 = tx.init(params)

    key = jax.random.PRNGKey(7)
    single = make_train_step(model, tx, WEIGHTS, donate=False)
    p1, _, m1 = single(params, opt0, batch, key)

    mesh = make_mesh()
    dp = make_dp_train_step(model, tx, WEIGHTS, mesh)
    p2, _, m2 = dp(replicate(params, mesh), replicate(opt0, mesh), shard_batch(batch, mesh), key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_plateau_scheduler():
    s = PlateauScheduler(factor=0.5, patience=2, min_lr=1e-5)
    lr = 1e-3
    for _ in range(3):
        lr = s.step(1.0, lr)
    assert lr == 1e-3  # first call sets best, then 2 bad -> not yet > patience
    lr = s.step(1.0, lr)
    assert lr == 5e-4  # 3rd bad epoch trips it
    for _ in range(20):
        lr = s.step(1.0, lr)
    assert lr >= 1e-5


def test_checkpoint_roundtrip(tmp_path):
    from pepflowww_tpu.training import checkpoints as ckpt

    model, params, batch = tiny()
    tx = make_optimizer({"type": "adam", "lr": 1e-3}, 100.0)
    opt_state = tx.init(params)
    sched = PlateauScheduler()
    path = ckpt.save_checkpoint(str(tmp_path / "ckpts"), 42, params, opt_state,
                                sched.state_dict())
    assert ckpt.latest_checkpoint(str(tmp_path / "ckpts")) == path
    restored = ckpt.restore_checkpoint(
        path, {"params": params, "opt_state": opt_state,
               "scheduler": sched.state_dict(), "iteration": 0}
    )
    assert int(restored["iteration"]) == 42
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nan_rescue():
    """A poisoned batch must not produce NaN params (train.py:125-139 semantics)."""
    model, params, batch = tiny()
    bad = dict(batch)
    bad["pos_heavyatom"] = batch["pos_heavyatom"].at[0].set(jnp.nan)
    tx = make_optimizer({"type": "adam", "lr": 1e-3}, 100.0)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, WEIGHTS, donate=False)
    params, opt_state, metrics = step(params, opt_state, bad, jax.random.PRNGKey(0))
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(params))


def test_grad_accumulation():
    """accum_grad=k: params only change every k-th step, matching the mean."""
    model, params, batch = tiny()
    tx = make_optimizer({"type": "adam", "lr": 1e-3}, 100.0, accum_grad=2)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, WEIGHTS, donate=False)
    key = jax.random.PRNGKey(0)
    p1, opt_state, _ = step(params, opt_state, batch, key)
    # first of the pair: update is withheld
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    p2, opt_state, _ = step(p1, opt_state, batch, key)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2))
    )
    assert changed


def test_train_cli_synthetic_val(tmp_path):
    """`--synthetic` runs the val-driven plateau path by default
    (reference train.py:160-193 semantics; VERDICT r1 item 8)."""
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
    cfg["train"]["val_freq"] = 3
    path = tmp_path / "tiny_learn_angle.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)

    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys, runpy; "
        f"sys.argv=['train.py','--config',{str(path)!r},'--synthetic','--debug',"
        "'--max_iters','6','--log_freq','3','--batch_size','2']; "
        "runpy.run_path('train.py', run_name='__main__')"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=root, timeout=900)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    log = out.stdout + out.stderr
    assert "val it 3" in log and "val it 6" in log, log[-2000:]


def test_train_cli_fsdp_tp(tmp_path):
    """`--fsdp --tp 2` (the composed 2-D recipe, 4x2 over the 8 virtual
    devices) trains from the CLI: finite decreasing-side losses, clean exit.
    Guards the train.py wiring, not the numerics (those are pinned by
    test_fsdp.py::test_fsdp_tp_matches_single_device)."""
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
    path = tmp_path / "tiny_fsdp_tp.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)

    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys, runpy; "
        f"sys.argv=['train.py','--config',{str(path)!r},'--synthetic','--debug',"
        "'--max_iters','4','--log_freq','2','--batch_size','8',"
        "'--fsdp','--tp','2']; "
        "runpy.run_path('train.py', run_name='__main__')"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=root, timeout=900)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    log = out.stdout + out.stderr
    losses = [float(m) for m in
              __import__("re").findall(r"it \d+ \| loss ([-\d.]+)", log)]
    assert losses and all(np.isfinite(l) for l in losses), log[-2000:]


def test_train_cli_sigterm_checkpoints(tmp_path):
    """SIGTERM (TPU preemption) triggers a final checkpoint and clean exit."""
    import os
    import signal
    import subprocess
    import sys
    import time as _time

    import yaml

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "configs/learn_angle.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["model"]["encoder"]["ipa"].update(
        c_s=32, c_z=16, c_hidden=32, no_heads=2, no_qk_points=2,
        no_v_points=3, seq_tfmr_num_layers=1, num_blocks=2)
    cfg["model"]["encoder"]["node_embed_size"] = 32
    cfg["model"]["encoder"]["edge_embed_size"] = 16
    cfg["train"]["val_freq"] = 100000  # never checkpoints on schedule
    path = tmp_path / "tiny.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    logdir = tmp_path / "logs"

    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys, runpy; "
        f"sys.argv=['train.py','--config',{str(path)!r},'--synthetic',"
        f"'--max_iters','100000','--log_freq','5','--batch_size','2',"
        f"'--logdir',{str(logdir)!r}]; "
        "runpy.run_path('train.py', run_name='__main__')"
    )
    proc = subprocess.Popen([sys.executable, "-c", code], cwd=root,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    # wait for the loop to actually run a few iterations
    deadline = _time.time() + 600
    started = False
    while _time.time() < deadline:
        runs = list(logdir.glob("*")) if logdir.exists() else []
        if runs and (runs[0] / "log.txt").exists():
            if "it 5 " in (runs[0] / "log.txt").read_text():
                started = True
                break
        _time.sleep(2)
    assert started, "training never reached iteration 5"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, out[-2000:]
    assert "preemption checkpoint" in out or "preemption checkpoint" in (
        runs[0] / "log.txt").read_text()
    ckpts = list((runs[0] / "checkpoints").glob("*"))
    assert ckpts, "no checkpoint written on SIGTERM"
