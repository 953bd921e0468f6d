"""Tensor parallelism for the trunk: pair-row (sequence) sharding.

The reference scales with one strategy — DDP (`train_ddp.py:79-94`). This
module adds the second mesh axis the rebuild was designed for: a 2-D
``(data, model)`` mesh where the L² *pair* tensors — the HBM/memory hog of
the architecture (a (B, L, L, c_z) tensor is L/c_s times larger than every
node tensor) — shard along their query-row dim on the ``model`` axis.

Why pair-row sharding instead of Megatron-style head sharding: every pair
op in the trunk (EdgeTransition's factorized MLP + LayerNorm, linear_b /
down_z, the attention-logit add, softmax over j) is pointwise or j-contracting
in the row dim, so with rows sharded ALL of the L² compute and memory is
local; the only communication GSPMD inserts is all-gathers of node-level
(B, L, c) tensors (~100x smaller) at block boundaries. Head sharding would
leave the pair tensors replicated — the wrong tensor distributed.

Mechanism: ``pair_constraint`` is a trace-time hook the trunk calls on every
pair tensor; inside ``tp_shard`` scopes it lowers to
``lax.with_sharding_constraint(x, P(None, "model"))`` on dim 1 and GSPMD
propagates the rest. Off (the default) it is the identity, so the
single-axis DP path and the sampler trace the exact graphs they always did.

Used by ``training/train_step.make_tp_train_step``; equivalence to the
replicated path is pinned by tests/test_tp.py on a virtual 2x4 CPU mesh.
"""

from __future__ import annotations

import contextlib
import dataclasses
import warnings
from contextvars import ContextVar
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Trace-time (mesh, axis) for pair constraints; None = identity.
_PAIR_CTX: ContextVar[Optional[tuple]] = ContextVar("pepflow_pair_ctx", default=None)


def make_mesh_2d(n_data: int, n_model: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """(data, model) mesh; model is the minor axis so its collectives ride
    the fastest ICI links."""
    devs = list(devices if devices is not None else jax.devices())
    assert len(devs) >= n_data * n_model, (len(devs), n_data, n_model)
    grid = np.asarray(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


@contextlib.contextmanager
def tp_shard(mesh: Mesh, axis: str = "model"):
    """Enable pair-row sharding constraints for traces made in this scope."""
    token = _PAIR_CTX.set((mesh, axis))
    try:
        yield
    finally:
        _PAIR_CTX.reset(token)


def xla_profile_model(model):
    """Return ``model`` with the Pallas kernels (and int8, which requires
    them) disabled — the multi-device factories call this so the trunk
    traces the numerically-equivalent XLA graph instead.

    Why: a compiled Mosaic kernel cannot be partitioned by jit. jax's TPU
    lowering raises ``NotImplementedError("Mosaic kernels cannot be
    automatically partitioned...")`` for any multi-device ``jit``
    (jax/_src/tpu_custom_call.py, the ``ShardingContext.num_devices != 1``
    branch) — so on a real pod the Pallas profile would fail at compile on
    every sharded path (DP, FSDP, TP). The CPU virtual-mesh tests CANNOT
    catch this: interpret mode inlines the kernel into ordinary
    partitionable HLO, so only a real multi-chip TPU run would hit the
    raise. The XLA path is pinned equivalent to the kernels by the parity
    suite (test_model.py, test_sampler_parity.py), so falling back costs
    only the single-chip kernel speedup. (The per-shard alternative —
    shard_map with all axes manual around the whole step — would change the
    collective semantics of the step; revisit if multi-chip serving ever
    needs the fused kernels.)

    The swap preserves the parameter tree: the kernels share raw params
    with the XLA graph (models/embed.py, models/ipa.py), guarded by
    test_convert.py::test_param_tree_matches.
    """
    ipa = model.cfg.ipa
    if not (ipa.use_pallas or ipa.use_pallas_ipa):
        return model
    warnings.warn(
        "multi-device mesh: Mosaic/Pallas kernels cannot be automatically "
        "partitioned by jit (jax tpu_custom_call); using the equivalent "
        "XLA graph for this trace.",
        stacklevel=3,
    )
    new_ipa = dataclasses.replace(
        ipa, use_pallas=False, use_pallas_ipa=False, quant_int8=False)
    return type(model)(dataclasses.replace(model.cfg, ipa=new_ipa))


def xla_profile_model_if_partitioned(model, mesh: Mesh):
    """`xla_profile_model`, applied only where the Mosaic raise would
    actually fire: a real-TPU backend AND a >1-device mesh. On CPU meshes
    (tests, the driver dryrun) the kernels run in interpret mode — inlined,
    partitionable HLO — so the Pallas graph itself stays under SPMD there,
    which is exactly what the virtual-mesh coverage is for."""
    if mesh.devices.size > 1 and jax.default_backend() == "tpu":
        return xla_profile_model(model)
    return model


def pair_constraint(x: jax.Array) -> jax.Array:
    """Constrain a (B, I, ...) pair tensor to shard rows (dim 1) on the
    model axis (batch stays on data). Identity unless inside `tp_shard`."""
    ctx = _PAIR_CTX.get()
    if ctx is None:
        return x
    mesh, axis = ctx
    spec = [None] * x.ndim
    spec[0] = "data"
    spec[1] = axis
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
