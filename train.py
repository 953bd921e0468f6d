#!/usr/bin/env python
"""Training CLI — single-chip or data-parallel over all local devices.

TPU-native re-design of the reference's `train.py`/`train_ddp.py`: one config,
one jit'd train step; `--dp` shards the batch over a 1-D `data` mesh (the
shard-map/psum equivalent of DDP). Supports `--synthetic` for running without
the PepMerge dataset.

Usage:
    python train.py --config configs/learn_angle.yaml --synthetic --max_iters 100
    python train.py --config configs/learn_angle.yaml \
        --structure_dir ~/Data/PepMerge_new --dataset_dir ~/Data/cache --dp
"""

from __future__ import annotations

import argparse
import os
import shutil
import time

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="configs/learn_angle.yaml")
    ap.add_argument("--logdir", type=str, default="./logs")
    ap.add_argument("--tag", type=str, default="")
    ap.add_argument("--resume", type=str, default=None)
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--dp", action="store_true", help="data-parallel over all devices")
    ap.add_argument("--synthetic", action="store_true", help="train on synthetic data")
    ap.add_argument("--structure_dir", type=str, default=None)
    ap.add_argument("--dataset_dir", type=str, default=None)
    ap.add_argument("--dataset_name", type=str, default="pep_pocket_train")
    ap.add_argument("--val_dataset_name", type=str, default=None,
                    help="validate every val_freq iters and drive the plateau "
                         "scheduler on validation loss (train.py:160-186)")
    ap.add_argument("--val_structure_dir", type=str, default=None,
                    help="structure dir for the val split (defaults to "
                         "--structure_dir; use with a held-out complex set)")
    ap.add_argument("--exclude_names", type=str, default=None)
    ap.add_argument("--max_iters", type=int, default=None)
    ap.add_argument("--val_freq", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--log_freq", type=int, default=100)
    ap.add_argument("--use_wandb", action="store_true")
    ap.add_argument("--profile_dir", type=str, default=None,
                    help="dump a jax.profiler trace of iterations 10-15 here")
    ap.add_argument("--multihost", action="store_true",
                    help="call jax.distributed.initialize() for multi-host "
                         "meshes (replaces torch.distributed rendezvous, "
                         "train_ddp.py:79)")
    args = ap.parse_args()

    if args.multihost:
        jax.distributed.initialize()

    from pepflowww_tpu.training.config import load_config
    from pepflowww_tpu.training.optim import (PlateauScheduler, get_learning_rate,
                                          make_optimizer, set_learning_rate)
    from pepflowww_tpu.training.train_step import make_dp_train_step, make_train_step
    from pepflowww_tpu.training import checkpoints as ckpt_lib
    from pepflowww_tpu.models.flow import FlowModel
    from pepflowww_tpu.parallel.mesh import make_mesh, shard_batch
    from pepflowww_tpu.utils import misc

    model_cfg, cfg, cfg_name = load_config(args.config)
    train_cfg = cfg.train
    misc.seed_all(train_cfg["seed"])

    if args.debug:
        log_dir, logger, metrics = None, misc.get_logger("train"), misc.BlackHole()
    else:
        log_dir = misc.get_new_log_dir(args.logdir, prefix=cfg_name, tag=args.tag)
        logger = misc.get_logger("train", log_dir)
        metrics = misc.MetricsWriter(log_dir, use_wandb=args.use_wandb,
                                     wandb_kwargs={"project": "pepflowww_tpu", "config": dict(cfg)})
        shutil.copyfile(args.config, os.path.join(log_dir, os.path.basename(args.config)))
        with open(os.path.join(log_dir, "commit.txt"), "w") as f:
            f.write(misc.git_version_stamp() + "\n")
        ckpt_dir = os.path.join(log_dir, "checkpoints")

    # ---------------- data ----------------
    if args.val_freq is not None:
        train_cfg["val_freq"] = args.val_freq
    batch_size = int(args.batch_size or train_cfg["batch_size"])
    have_val = False
    if args.synthetic:
        from pepflowww_tpu.data.synthetic import make_batch
        from pepflowww_tpu.data.collate import device_batch

        rng = np.random.default_rng(train_cfg["seed"])

        def batches():
            while True:
                yield device_batch(make_batch(rng, batch_size=batch_size,
                                              pep_len=12, rec_len=48, pad_to=64))

        train_iter = batches()
        n_train = -1
        # Synthesized held-out split so the plateau scheduler drives on
        # validation loss by default, matching the reference's semantics
        # (train.py:160-193) even without a real dataset.
        val_rng = np.random.default_rng(train_cfg["seed"] + 7919)
        val_loader = [
            device_batch(make_batch(val_rng, batch_size=batch_size,
                                    pep_len=12, rec_len=48, pad_to=64))
            for _ in range(2)
        ]
        have_val = True
    else:
        from pepflowww_tpu.data.dataset import DataLoader, PepDataset

        assert args.structure_dir and args.dataset_dir, "need --structure_dir/--dataset_dir"
        dataset = PepDataset(
            structure_dir=args.structure_dir, dataset_dir=args.dataset_dir,
            name=args.dataset_name, exclude_names_file=args.exclude_names,
        )
        n_train = len(dataset)
        loader = DataLoader(dataset, batch_size=batch_size, shuffle=True,
                            seed=train_cfg["seed"],
                            num_shards=jax.process_count(), shard_index=jax.process_index())
        train_iter = loader.prefetch()
        if args.val_dataset_name:
            val_dataset = PepDataset(
                structure_dir=args.val_structure_dir or args.structure_dir,
                dataset_dir=args.dataset_dir,
                name=args.val_dataset_name,
            )
            val_loader = DataLoader(val_dataset, batch_size=batch_size,
                                    shuffle=False, drop_last=False)
            have_val = True

    logger.info("Devices: %s | train size: %d", jax.devices(), n_train)

    # ---------------- model/opt ----------------
    model = FlowModel(model_cfg)
    first_batch = next(train_iter)
    import jax.numpy as jnp

    first_batch = {k: jnp.asarray(v) for k, v in first_batch.items() if not isinstance(v, list)}
    init_key = jax.random.PRNGKey(train_cfg["seed"])
    # jit the init: eager flax init dispatches thousands of tiny ops, which is
    # pathological over a remote-TPU tunnel; one compiled program instead.
    params = jax.jit(model.init)(
        {"params": init_key, "corruption": init_key}, first_batch
    )["params"]
    logger.info("Number of parameters: %d", misc.count_parameters(params))

    tx = make_optimizer(train_cfg["optimizer"], train_cfg["max_grad_norm"],
                    accum_grad=int(train_cfg.get("accum_grad", 1)))
    opt_state = tx.init(params)
    sched = PlateauScheduler(
        factor=train_cfg["scheduler"]["factor"],
        patience=train_cfg["scheduler"]["patience"],
        min_lr=train_cfg["scheduler"]["min_lr"],
    )
    it_first = 1

    if args.resume:
        restored = ckpt_lib.restore_checkpoint(
            args.resume,
            {"params": params, "opt_state": opt_state,
             "scheduler": sched.state_dict(), "iteration": 0},
        )
        params, opt_state = restored["params"], restored["opt_state"]
        sched.load_state_dict(restored["scheduler"])
        it_first = int(restored["iteration"]) + 1
        logger.info("Resumed from %s at iteration %d", args.resume, it_first)

    loss_weights = dict(train_cfg["loss_weights"])
    if args.dp:
        mesh = make_mesh()
        step_fn = make_dp_train_step(model, tx, loss_weights, mesh)
    else:
        mesh = None
        step_fn = make_train_step(model, tx, loss_weights)

    max_iters = args.max_iters or int(train_cfg["max_iters"])
    rng_key = jax.random.PRNGKey(train_cfg["seed"] + 100 * jax.process_index())

    from pepflowww_tpu.training.train_step import make_loss_fn

    eval_loss = jax.jit(make_loss_fn(model, loss_weights))

    def validate(it):
        """Mean weighted loss over the val split (reference train.py:160-186)."""
        acc = misc.ScalarMetricAccumulator()
        vkey = jax.random.PRNGKey(0)
        for vb in val_loader:
            vb = {k: v for k, v in vb.items() if not isinstance(v, list)}
            vkey, k = jax.random.split(vkey)
            total, losses = eval_loss(params, vb, k)
            bsz = int(vb["aa"].shape[0])
            acc.add("loss", float(total), bsz)
            for name, v in losses.items():
                acc.add(name, float(v), bsz)
        summary = acc.summary()
        metrics.log(it, summary, tag="val")
        logger.info("val it %d | %s", it,
                    " ".join(f"{k}={v:.4f}" for k, v in summary.items()))
        return summary["loss"]

    # ---------------- loop ----------------
    # Preemption safety (beyond the reference, which only tears down the DDP
    # process group on KeyboardInterrupt, train_ddp.py:214-216): SIGTERM —
    # what TPU preemption/maintenance delivers — requests a final checkpoint
    # at the next loop boundary and a clean exit.
    import signal

    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        stop_requested["flag"] = True
        logger.info("signal %d received; checkpointing and exiting", signum)

    signal.signal(signal.SIGTERM, _request_stop)

    batch = first_batch
    t0 = time.time()
    seen = 0
    for it in range(it_first, max_iters + 1):
        # Tracing/profiling hook (SURVEY.md §5.1: absent in the reference —
        # hand-rolled wall-clock only; here a real XLA trace behind a flag).
        if args.profile_dir and it == it_first + 10:
            jax.profiler.start_trace(args.profile_dir)
        if args.profile_dir and it == it_first + 15:
            jax.profiler.stop_trace()
            logger.info("profiler trace written to %s", args.profile_dir)
        rng_key, step_key = jax.random.split(rng_key)
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        params, opt_state, m = step_fn(params, opt_state, batch, step_key)
        seen += batch_size

        if it % args.log_freq == 0:
            m = {k: float(v) for k, v in m.items()}
            dt = time.time() - t0
            m["samples_per_sec"] = seen / dt
            m["lr"] = get_learning_rate(opt_state)
            logger.info("it %d | loss %.4f | %s", it, m["loss"],
                        " ".join(f"{k}={v:.4f}" for k, v in m.items() if k.endswith("_loss")))
            metrics.log(it, m, tag="train")
            if not have_val:
                # No val split at all: fall back to training-loss stepping
                # (divergent path; the flagship recipe defaults to val-driven).
                new_lr = sched.step(m["loss"], m["lr"])
                if new_lr != m["lr"]:
                    set_learning_rate(opt_state, new_lr)
                    logger.info("lr -> %.3g", new_lr)
            t0, seen = time.time(), 0

        if have_val and it % int(train_cfg["val_freq"]) == 0:
            val_loss = validate(it)
            lr = get_learning_rate(opt_state)
            new_lr = sched.step(val_loss, lr)
            if new_lr != lr:
                set_learning_rate(opt_state, new_lr)
                logger.info("lr -> %.3g", new_lr)

        checkpoint_now = it % int(train_cfg["val_freq"]) == 0 or stop_requested["flag"]
        if (not args.debug) and checkpoint_now and jax.process_index() == 0:
            path = ckpt_lib.save_checkpoint(ckpt_dir, it, params, opt_state, sched.state_dict())
            logger.info("checkpoint -> %s", path)
        if stop_requested["flag"]:
            logger.info("exiting at iteration %d after preemption checkpoint", it)
            break

        batch = next(train_iter)
        batch = {k: v for k, v in batch.items() if not isinstance(v, list)}


if __name__ == "__main__":
    main()
