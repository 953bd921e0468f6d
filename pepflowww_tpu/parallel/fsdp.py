"""FSDP (ZeRO-3-style) parameter + optimizer-state sharding.

The reference's only scaling strategy is DDP with fully replicated
parameters and optimizer state (`train_ddp.py:79-94`): every GPU holds a
complete copy of params, grads, and both Adam moments. This module adds the
memory axis that replication lacks — each leaf of params/opt-state lives
sharded over the ``data`` mesh axis, and XLA's SPMD partitioner inserts the
all-gather (params, before use) / reduce-scatter (grads, after the backward)
pairs that make the step numerically identical to the replicated one.

This is the scaling-book FSDP recipe, not a torch-FSDP translation: there is
no wrapper module, no explicit gather/scatter code, no bucketing machinery —
only sharding *annotations* on the jit boundary. GSPMD derives the
communication schedule; on a TPU mesh those collectives ride ICI.

Sharding rule: for each array leaf, shard the largest dim that divides the
axis size; leaves too small to matter (or with no divisible dim) replicate.
Scalars and empty leaves replicate. Optimizer state is sharded with the SAME
rule — Adam's mu/nu leaves have the param shapes, so they land on the same
layout and `tx.update` stays fully local (no gather of the moments, the
actual memory win: 3x params of fp32 state stays 1/N per device).

Equivalence to the single-device step and the per-device memory win are
pinned by tests/test_fsdp.py on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(shape, n_shard: int, min_size: int, axis: str = "data") -> P:
    """Partition spec for one array: biggest dim divisible by n_shard."""
    if not shape or int(np.prod(shape)) < min_size:
        return P()
    dims = sorted(range(len(shape)), key=lambda i: shape[i], reverse=True)
    for i in dims:
        if shape[i] % n_shard == 0 and shape[i] >= n_shard:
            spec = [None] * len(shape)
            spec[i] = axis
            return P(*spec)
    return P()


def fsdp_shardings(tree, mesh: Mesh, axis: str = "data", min_size: int = 2 ** 10):
    """NamedSharding pytree sharding each leaf's largest divisible dim.

    `tree` may be real arrays or ShapeDtypeStructs (jax.eval_shape output).
    """
    n = mesh.shape[axis]

    def one(leaf):
        return NamedSharding(
            mesh, _leaf_spec(getattr(leaf, "shape", ()), n, min_size, axis))

    return jax.tree.map(one, tree)


def shard_tree(tree, shardings):
    """Place (or re-place) a pytree onto its FSDP shardings.

    Multi-process: device_put cannot target non-addressable devices, so each
    global array is assembled shard-by-shard from the full process-local
    copy (every process holds identical values — train.py seeds init/resume
    identically everywhere, same invariant as mesh.replicate)."""
    if jax.process_count() > 1:
        def one(x, s):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

        return jax.tree.map(one, tree, shardings)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)


_GATHER_JITS: dict = {}


def gather_tree(tree, mesh: Mesh):
    """All-gather an FSDP-sharded pytree to mesh-replicated (for host
    fetches — e.g. the validation pass — where every process needs the full
    values; replicated arrays are addressable on all processes).

    One jit wrapper per mesh (the replicated out_sharding applies as a
    pytree prefix), so repeat calls — one per validation round — reuse the
    compiled gather instead of re-wrapping (the VERDICT-r3-item-5 pattern)."""
    fn = _GATHER_JITS.get(mesh)
    if fn is None:
        fn = jax.jit(lambda t: t, out_shardings=NamedSharding(mesh, P()))
        _GATHER_JITS[mesh] = fn
    return fn(tree)


def make_fsdp_train_step(model, tx, loss_weights: dict, mesh: Mesh,
                         tp_axis: str | None = None):
    """FSDP train step over a ``data`` mesh axis.

    Returns ``(step, prepare)``: ``prepare(params, opt_state)`` shards both
    trees onto their FSDP layout (call once after init/restore);
    ``step(params, opt_state, batch, rng)`` keeps them sharded across calls
    (in_shardings == out_shardings, so steady-state training never
    re-gathers the optimizer state).

    ``prepare`` CONSUMES its inputs: device_put onto the sharded layout
    aliases each source buffer on the device it already lives on, and the
    donating step then frees those buffers along with the prepared tree.
    Rebind (``params, opt = prepare(params, opt)``, as train.py does) and
    don't touch the originals afterwards; ``.copy()`` first if you need
    them (e.g. to prepare the same init onto two meshes — __graft_entry__).

    ``tp_axis``: name of a second (model) mesh axis to compose with pair-row
    tensor parallelism (parallel/tp.py) — the standard 2-D production
    recipe: params + Adam state live 1/N_data per device (replicated over
    the model axis, so each TP group can assemble them locally), while the
    trunk's L² pair activations shard 1/N_model. The two memory axes are
    independent — FSDP bounds the *state*, TP bounds the *activations* —
    so their product is what lets both the 8x-width parameter count AND its
    L² pair tensors exceed a single chip. Equivalence to the single-device
    step is pinned by tests/test_fsdp.py::test_fsdp_tp_matches_single_device.

    Contrast: `train_ddp.py:94` replicates all state on every device.
    """
    from pepflowww_tpu.training.train_step import make_loss_fn

    import optax
    from pepflowww_tpu.parallel import tp
    from pepflowww_tpu.training.optim import zero_nans

    if tp_axis is not None:
        # Pallas custom calls have no SPMD partitioning rule on the model
        # axis (they would replicate the very pair tensors TP shards) —
        # trace the equivalent XLA graph, same as make_tp_train_step.
        model = tp.xla_profile_model(model)
    else:
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
        if tp_axis is not None:
            # tp_shard only matters while TRACING (the pair constraints bake
            # into the jaxpr); entering it per call keeps the single wrapper.
            with tp.tp_shard(mesh, tp_axis):
                return state["jit"](params, opt_state, batch, rng)
        return state["jit"](params, opt_state, batch, rng)

    step._state = state  # introspection (tests fingerprint the lowering)
    return step, prepare
