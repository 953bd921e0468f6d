"""The jit'd training step — single-chip and data-parallel over a mesh.

The DP design follows the scaling-book recipe rather than the reference's DDP
(`train_ddp.py:79-94`, NCCL all-reduce hooks): the step is one `jax.jit`
program with batch arrays sharded over the `data` mesh axis and parameters /
optimizer state replicated; XLA inserts the gradient all-reduce over ICI
automatically from the sharding constraints.

NaN semantics match the reference (train.py:125-139): a non-finite total loss
contributes a zero gradient; residual non-finite gradient entries are zeroed
elementwise before clipping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from pepflowww_tpu.training.optim import sum_weighted_losses, zero_nans


def make_loss_fn(model, loss_weights: dict):
    def loss_fn(params, batch, rng):
        losses = model.apply({"params": params}, batch, rngs={"corruption": rng})
        total = sum_weighted_losses(losses, loss_weights)
        # NaN rescue: drop the step's contribution if the loss is non-finite.
        total = jnp.where(jnp.isfinite(total), total, 0.0)
        return total, losses

    return loss_fn


def make_train_step(model, tx, loss_weights: dict, donate: bool = True):
    """Returns train_step(params, opt_state, batch, rng) -> (params, opt_state, metrics)."""
    loss_fn = make_loss_fn(model, loss_weights)

    def train_step(params, opt_state, batch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        grads = zero_nans(grads)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = grad_norm
        return params, opt_state, metrics

    return jax.jit(train_step, donate_argnums=(0, 1) if donate else ())


def make_dp_train_step(model, tx, loss_weights: dict, mesh):
    """Data-parallel step over `mesh` (axis name "data").

    Batch leaves shard on axis 0; params/opt_state replicate. Works on any
    1-D mesh (v4-8 ICI ring or the CPU-device test mesh).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pepflowww_tpu.parallel import tp

    # On a real multi-chip TPU mesh, Mosaic kernels fail multi-device jit
    # lowering outright (tp.xla_profile_model docstring) — swap to the
    # equivalent XLA graph there; CPU virtual meshes keep pallas-interpret.
    model = tp.xla_profile_model_if_partitioned(model, mesh)

    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P("data"))

    loss_fn = make_loss_fn(model, loss_weights)

    def train_step(params, opt_state, batch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        grads = zero_nans(grads)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = grad_norm
        return params, opt_state, metrics

    # ONE jit wrapper per factory call (same fix as sampling.make_dp_sampler,
    # VERDICT r3 item 5): `data_sharded` applies to the whole batch dict as a
    # pytree prefix, so no per-call wrapper construction is needed.
    return jax.jit(
        train_step,
        in_shardings=(replicated, replicated, data_sharded, replicated),
        out_shardings=(replicated, replicated, replicated),
    )


def make_tp_train_step(model, tx, loss_weights: dict, mesh):
    """Tensor+data-parallel step over a 2-D ``(data, model)`` mesh
    (parallel/tp.py): batch shards on "data", the trunk's L² pair tensors
    shard their query rows on "model" (the `tp.pair_constraint` hooks in
    GAEncoder), params/opt state replicate. GSPMD keeps every pair op local
    and inserts only node-level collectives; this is the axis that lets
    widths whose pair activations exceed one chip's HBM train at all —
    the reference's DDP (train_ddp.py:94) has no equivalent.

    Equivalence to the replicated path is pinned by tests/test_tp.py.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pepflowww_tpu.parallel import tp

    # Pallas custom calls can't partition on the model axis (they would
    # replicate the very pair tensors TP shards) — trace the equivalent
    # XLA graph instead (tp.xla_profile_model docstring has the full why).
    model = tp.xla_profile_model(model)

    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P("data"))

    loss_fn = make_loss_fn(model, loss_weights)

    def train_step(params, opt_state, batch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        grads = zero_nans(grads)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = grad_norm
        return params, opt_state, metrics

    jitted = jax.jit(
        train_step,
        in_shardings=(replicated, replicated, data_sharded, replicated),
        out_shardings=(replicated, replicated, replicated),
    )

    def stepper(params, opt_state, batch, rng):
        # tp_shard only matters while TRACING (the constraints bake into the
        # jaxpr); entering it per call keeps the single jit wrapper.
        with tp.tp_shard(mesh):
            return jitted(params, opt_state, batch, rng)

    return stepper


def make_pp_train_step(model, tx, loss_weights: dict, mesh, n_micro: int,
                       fsdp: bool = False):
    """Pipeline(+data)-parallel step over a ``(data, pipe)`` mesh
    (parallel/pp.py): the trunk's block stack is sharded over 'pipe' and
    microbatches stream through it GPipe-style; corruption/encode and the
    loss epilogue run full-batch outside the pipelined region, so the RNG
    stream and loss math are exactly models/flow.py::loss (loss_pre →
    pipelined denoise → loss_post). Batch shards on 'data'; params/opt
    state replicate (depth compute+activations are the PP axis's job —
    param memory is FSDP's, pair memory TP's).

    ``fsdp=True`` composes the two memory axes on the SAME mesh
    (train.py ``--pp N --fsdp``): params + Adam state shard 1/N_data over
    the 'data' axis (parallel/fsdp.py's rule) while block compute and
    activations stay 1/S over 'pipe'. GSPMD all-gathers the (sharded)
    block subtrees right before `stack_block_params`, the stacked copy
    enters the shard_map region under its P('pipe') spec, and the grad
    transpose reduce-scatters back to the 1/N_data layout — no manual
    collectives, same recipe as make_fsdp_train_step. Returns
    ``(step, prepare)`` in this mode (prepare CONSUMES its inputs, like
    fsdp's). Equivalence pinned by tests/test_pp.py::test_pp_fsdp_*.

    Equivalence to the replicated path is pinned by tests/test_pp.py.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pepflowww_tpu.parallel import pp, tp

    # Mosaic kernels are single-device programs; the pipelined trace is
    # multi-device by construction (tp.xla_profile_model docstring).
    model = tp.xla_profile_model(model)
    cfg = model.cfg.ipa
    nb = cfg.num_blocks
    assert model.cfg.edge_embed_size == cfg.c_z, (
        "pp assumes a width-uniform pair track (edge_embed_size == c_z); "
        "the stacked first-block IPA readout weights would otherwise differ "
        "in shape from the later blocks'")

    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P("data"))

    def loss_fn(params, batch, rng):
        pre = model.apply({"params": params}, batch, method="loss_pre",
                          rngs={"corruption": rng})
        ga = params["ga_encoder"]
        state0 = pp.trunk_prologue(
            cfg, ga, pre["t"], pre["rotmats_t"], pre["trans_t_c"],
            pre["angles_t"], pre["seqs_t"], pre["node_embed"],
            pre["edge_embed"], batch["res_mask"].astype(jnp.int32))
        stacked = pp.stack_block_params(ga, nb)
        node, R, tr = pp.pipeline_blocks(mesh, cfg, stacked, state0,
                                         n_micro, nb)
        denoised = pp.trunk_epilogue(cfg, ga, node, R, tr)
        losses = model.apply({"params": params}, batch, pre, denoised,
                             method="loss_post")
        total = sum_weighted_losses(losses, loss_weights)
        total = jnp.where(jnp.isfinite(total), total, 0.0)
        return total, losses

    def train_step(params, opt_state, batch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        grads = zero_nans(grads)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = grad_norm
        return params, opt_state, metrics

    if not fsdp:
        return jax.jit(
            train_step,
            in_shardings=(replicated, replicated, data_sharded, replicated),
            out_shardings=(replicated, replicated, replicated),
        )

    from pepflowww_tpu.parallel.fsdp import fsdp_shardings, shard_tree

    state = {}

    def prepare(params, opt_state):
        p_sh = fsdp_shardings(params, mesh)
        o_sh = fsdp_shardings(opt_state, mesh)
        state["jit"] = jax.jit(
            train_step,
            in_shardings=(p_sh, o_sh, data_sharded, replicated),
            out_shardings=(p_sh, o_sh, replicated),
            donate_argnums=(0, 1),
        )
        return shard_tree(params, p_sh), shard_tree(opt_state, o_sh)

    def step(params, opt_state, batch, rng):
        return state["jit"](params, opt_state, batch, rng)

    step._state = state  # introspection (tests fingerprint the lowering)
    return step, prepare
