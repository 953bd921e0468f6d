"""Manual (shard_map) data parallelism — multi-chip WITH the Pallas kernels.

The automatic-SPMD factories (`training/train_step.make_dp_train_step`,
`sampling.make_dp_sampler`) must swap the fused Mosaic kernels for the
equivalent XLA graph on a real multi-chip mesh: jit's partitioner has no
rule for a Mosaic custom call, and jax's TPU lowering raises
``NotImplementedError("Mosaic kernels cannot be automatically
partitioned...")`` whenever ``ShardingContext.num_devices != 1``
(jax/_src/tpu_custom_call.py). The SAME lowering explicitly permits the
kernel when **every mesh axis is manual** — i.e. inside ``jax.shard_map``
over the full mesh. That is this module: each device traces the plain
single-device program — the exact bf16+Pallas graph bench.py measures —
over its own batch shard, so a ``--dp`` pod serves at the single-chip
kernel throughput instead of the XLA-fallback throughput.

Semantics vs the automatic-SPMD step (both are valid DP; know which one
you're running):

* **Sampling** has no cross-batch term anywhere (the ODE is independent
  per complex), so per-device execution over batch shards IS the sampler.
* **RNG**: jax PRNG bits depend on (key, shape). A per-device draw of the
  local (B/n, ...) noise from the global key would give every shard the
  same bits, so each shard folds ``lax.axis_index`` into its key. Results
  are therefore *statistically, not bitwise,* equal to the single-device
  global sampler — the same documented divergence class as the repo-vs-
  reference sampler parity (different RNG, same distribution; PARITY.md).
  Each shard's output IS bitwise reproducible: it equals a single-device
  ``euler_sample`` on that shard's rows with the folded key
  (tests/test_manual.py pins this exactly).
* **Training**: grads/losses ``pmean`` over the axis — gradient-identical
  to the global step up to fp reduction order, with two deliberate
  refinements: the corruption stream is per-shard (fold_in, as above), and
  the NaN rescue (zero_nans + the non-finite-loss drop) applies *per data
  shard*, so one shard's non-finite step no longer contaminates the other
  shards' contributions before zeroing (the global step zeroes after the
  full-batch reduce). The reference's DDP has the coarser semantics
  (train.py:125-139 rescues the whole global step).

Used by sample.py/serve.py ``--dp`` (auto-selected when the model profile
carries Pallas kernels and the mesh has >1 device) and train.py
``--dp --dp_manual``. Pinned by tests/test_manual.py on a virtual
8-device CPU mesh (interpret-mode kernels — the same inlining that hides
the Mosaic raise also makes the CPU test a pure semantics check; the
manual-axes lowering rule itself is asserted against jax's source by
test_manual.py::test_mosaic_manual_axes_contract).
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, PartitionSpec as P

from pepflowww_tpu.training.optim import zero_nans


def _single_axis(mesh: Mesh) -> str:
    assert len(mesh.axis_names) == 1, (
        "manual DP runs the full single-device program per shard; it is "
        f"only defined over a 1-D mesh (got axes {mesh.axis_names}). For "
        "2-D meshes use the automatic-SPMD factories (tp/fsdp/pp).")
    return mesh.axis_names[0]


def make_manual_dp_sampler(model, mesh: Mesh, num_steps: int = 100,
                           sample_bb: bool = True, sample_ang: bool = True,
                           sample_seq: bool = True):
    """DP sampler over a 1-D mesh that keeps the fused Pallas kernels.

    fn(params, batch, key) -> outputs; batch rows shard on axis 0, params
    replicate, shard i samples with fold_in(key, i). Outputs are the
    concatenated per-shard samples (global batch order preserved).
    """
    from pepflowww_tpu import sampling

    axis = _single_axis(mesh)

    def local_fn(params, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return sampling.euler_sample(
            model, params, batch, key, num_steps=num_steps,
            sample_bb=sample_bb, sample_ang=sample_ang, sample_seq=sample_seq,
        )

    # check_vma=False: pallas_call's out_shape ShapeDtypeStructs carry no
    # vma annotation, so the varying-axes type check rejects any kernel-
    # bearing body outright ("vma on jax.ShapeDtypeStruct must not be
    # None") — and kernel-bearing bodies are this module's whole purpose.
    # The classic (unchecked) semantics are exactly what out_specs P(axis)
    # states; per-shard correctness is pinned bitwise by test_manual.py.
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(axis), P()), out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(fn)


def make_manual_dp_train_step(model, tx, loss_weights: dict, mesh: Mesh):
    """DP train step over a 1-D mesh that keeps the fused Pallas kernels.

    step(params, opt_state, batch, rng) -> (params, opt_state, metrics);
    params/opt_state replicate (donated), batch shards on axis 0. Grads and
    loss metrics pmean over the axis; the optimizer update runs identically
    on every device (replicated-in, replicated-out), exactly like the
    automatic-SPMD step — only the trace inside is per-device.
    """
    from pepflowww_tpu.training.train_step import make_loss_fn

    axis = _single_axis(mesh)
    loss_fn = make_loss_fn(model, loss_weights)

    def local_step(params, opt_state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        # Per-shard NaN rescue BEFORE the cross-shard reduce (docstring).
        grads = zero_nans(grads)
        grads = jax.lax.pmean(grads, axis)
        total = jax.lax.pmean(total, axis)
        losses = jax.tree.map(lambda x: jax.lax.pmean(x, axis), losses)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = grad_norm
        return params, opt_state, metrics

    # check_vma=False: pmean'd values are varying-but-equal in the vma type
    # system; declaring them replicated via out_specs P() is the intended
    # (classic pmap-style) semantics here and is verified numerically by
    # tests/test_manual.py.
    fn = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0, 1))
