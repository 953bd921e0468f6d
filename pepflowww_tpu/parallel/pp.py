"""Pipeline parallelism (GPipe) over the trunk's block stack.

The reference scales with exactly one strategy — DDP
(`train_ddp.py:79-94`). The rebuild already goes past it with a pair-row
TP axis (parallel/tp.py) and an FSDP axis (parallel/fsdp.py); this module
adds the DEPTH axis: the trunk's ``num_blocks`` identical
{IPA → LN → seq-tfmr → transition → frame-update → edge-transition} blocks
(models/trunk.py, ga.py:15-126 in the reference) are sharded over a
``pipe`` mesh axis and microbatches stream through the stages, so models
whose block-stack *activations and compute* exceed one chip can train at
all (PP bounds depth compute + live activations to 1/S per device; the
param/optimizer memory axis is FSDP's job — see the scope paragraph
below). Composes with the ``data`` axis on one 2-D ``(data, pipe)`` mesh,
and with FSDP state sharding over that same data axis
(``train.py --pp N --fsdp``; train_step.make_pp_train_step(fsdp=True)).

Design (idiomatic JAX — the scaling-book pipelining recipe, not a port of
any torch pipeline engine):

* **Corruption + encode + trunk prologue and the loss epilogue run OUTSIDE
  the pipelined region**, full-batch. The step therefore consumes the
  'corruption' RNG stream and computes the 6 losses EXACTLY like the plain
  step (models/flow.py::loss is literally loss_pre → denoise → loss_post);
  equivalence to the replicated path is fp-reduction-order exact and pinned
  by tests/test_pp.py.
* **Per-block parameters are stacked on a leading (nb,) axis** and sharded
  over 'pipe' by shard_map in_specs; each device ``lax.scan``s its
  ``nb / n_pipe`` local blocks. The last block has no edge transition in
  the checkpoint tree (its output would be dead — ga.py applies it only
  for b < nb-1); the stack pads a zeros dummy there and a ``lax.cond``
  skips the compute.
* **The schedule is a ``lax.scan`` over M + S - 1 ticks**: stage 0 injects
  microbatch t, every stage applies its local blocks, stage S-1 banks
  finished microbatch t-(S-1), and the activation state — including the
  (B_m, L, L, c_z) pair tensor — hops stage→stage via ``lax.ppermute``
  over ICI. ``jax.grad`` differentiates straight through (ppermute
  transposes to the reverse shift), giving the standard GPipe bubble of
  (S-1)/(M+S-1); per-block ``jax.checkpoint`` keeps the stash at one
  activation state per tick instead of every block interior.

What PP does and does not shard here: block COMPUTE and ACTIVATIONS are
1/S per device; the checkpoint param tree stays replicated, and the stack
of per-block subtrees is rebuilt INSIDE the step (``stack_block_params``
in the jit'd loss). That restack is pure data movement — at flagship size
a 6.26 M-param (25 MB fp32) contiguous copy, ~0.03 ms of HBM traffic at
v5e bandwidth, whose transpose (the grad unstack) adds the same again;
measured on the real chip the whole jit'd restack runs at ≤3.0 ms/call
wall amortized INCLUDING axon dispatch (PERF.md round-5 "PP cost
accounting") against a ~39 ms step. That is why the state is NOT kept
stacked across steps: doing so would force every checkpoint save / val
pass / cross-topology resume through an unstack-restack pair and re-key
the tree convert.py guards, to save well under 1% of a step. Sharding the
params/optimizer memory is the FSDP axis's job (composable here —
``train_step.make_pp_train_step(fsdp=True)`` shards state 1/N_data over
the 'data' axis of the same mesh); pair-tensor memory is the TP axis's.
PP is the axis for depth.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pepflowww_tpu.models.ipa import (
    BackboneUpdate,
    EdgeTransition,
    InvariantPointAttention,
    StructureModuleTransition,
    TorchTransformerEncoder,
)
from pepflowww_tpu.models.layers import AngularEncoding, Linear, MLP, get_time_embedding
from pepflowww_tpu.ops import rot9

# Canonical per-block parameter keys; f"{key}_{b}" is the trunk tree name
# (load-bearing for convert.py — PP only READS that tree, never renames it).
_BLOCK_KEYS = (
    "ipa", "ipa_ln", "seq_tfmr", "post_tfmr", "node_transition",
    "bb_update", "edge_transition",
)


def make_mesh_pp(n_data: int, n_pipe: int, devices=None) -> Mesh:
    """2-D (data, pipe) mesh; pipe minor so stage hops ride the fastest ICI
    links (the per-tick transfer is the (B_m, L, L, c_z) pair tensor)."""
    devs = list(devices if devices is not None else jax.devices())
    assert len(devs) >= n_data * n_pipe, (len(devs), n_data, n_pipe)
    grid = np.asarray(devs[: n_data * n_pipe]).reshape(n_data, n_pipe)
    return Mesh(grid, ("data", "pipe"))


def stack_block_params(ga_params, nb: int):
    """Stack the trunk's per-block param subtrees on a leading (nb,) axis
    under canonical keys. The missing final edge_transition is padded with
    zeros (block_apply cond-skips it, so the dummy is never executed)."""
    per_block = []
    for b in range(nb):
        d = {k: ga_params[f"{k}_{b}"] for k in _BLOCK_KEYS[:-1]}
        et = ga_params.get(f"edge_transition_{b}")
        if et is None:
            et = jax.tree.map(jnp.zeros_like, ga_params["edge_transition_0"])
        d["edge_transition"] = et
        per_block.append(d)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_block)


def _modules(cfg):
    """The block's module instances, config-identical to models/trunk.py.
    Always the XLA graph: Mosaic kernels are single-device programs and the
    whole point here is a multi-device trace (tp.xla_profile_model has the
    full why; the multi-device factory swaps the model before reaching us)."""
    cdt = cfg.compute_dtype
    return dict(
        ipa=InvariantPointAttention(
            cfg.c_s, cfg.c_z, cfg.c_hidden, cfg.no_heads,
            cfg.no_qk_points, cfg.no_v_points, dtype=cdt),
        ipa_ln=nn.LayerNorm(epsilon=1e-5),
        seq_tfmr=TorchTransformerEncoder(
            cfg.c_s, cfg.seq_tfmr_num_heads, cfg.seq_tfmr_num_layers,
            dtype=cdt),
        post_tfmr=Linear(cfg.c_s, init="final"),
        node_transition=StructureModuleTransition(cfg.c_s, dtype=cdt),
        bb_update=BackboneUpdate(cfg.c_s),
        edge_transition=EdgeTransition(
            node_embed_size=cfg.c_s, edge_embed_in=cfg.c_z,
            edge_embed_out=cfg.c_z, dtype=cdt),
    )


def block_apply(cfg, bp, state, is_last):
    """One trunk block from canonical params — the exact loop body of
    GAEncoder.__call__ (models/trunk.py), applied name-free so it can run
    under lax.scan over stacked param slices. Composition over all blocks
    is pinned equal to GAEncoder.apply by tests/test_pp.py.

    ``is_last`` is a traced bool: the final block's edge transition is
    skipped (its output is dead — ga.py computes it only for b < nb-1)."""
    node_embed, edge_embed, R, tr, node_mask = state
    m = _modules(cfg)

    ipa_embed = m["ipa"].apply(
        {"params": bp["ipa"]}, node_embed, edge_embed, R, tr, node_mask)
    ipa_embed = ipa_embed * node_mask[..., None]
    node_embed = m["ipa_ln"].apply(
        {"params": bp["ipa_ln"]}, node_embed + ipa_embed)
    seq_tfmr_out = m["seq_tfmr"].apply(
        {"params": bp["seq_tfmr"]}, node_embed,
        key_padding_mask=(node_mask < 0.5))
    node_embed = node_embed + m["post_tfmr"].apply(
        {"params": bp["post_tfmr"]}, seq_tfmr_out)
    node_embed = m["node_transition"].apply(
        {"params": bp["node_transition"]}, node_embed)
    node_embed = node_embed * node_mask[..., None]
    update = m["bb_update"].apply(
        {"params": bp["bb_update"]}, node_embed * node_mask[..., None])
    R, tr = rot9.compose_q_update(R, tr, update, update_mask=node_mask)

    def _skip(args):
        return args[1]

    def _apply_et(args):
        node, edge, mask, p = args
        return m["edge_transition"].apply(
            {"params": p}, node, edge, node_mask=mask)

    edge_embed = jax.lax.cond(
        is_last, _skip, _apply_et,
        (node_embed, edge_embed, node_mask, bp["edge_transition"]))
    return (node_embed, edge_embed, R, tr, node_mask)


def trunk_prologue(cfg, ga_params, t, rotmats_t, trans_t, angles_t, seqs_t,
                   node_embed, edge_embed, res_mask):
    """GAEncoder.__call__'s pre-loop (feature mixing + plane-form frames),
    applied from the param tree. Returns the block-stack state tuple."""
    B, L = seqs_t.shape
    node_mask = res_mask.astype(node_embed.dtype)

    seq_embed = nn.Embed(
        22, cfg.c_s, embedding_init=nn.initializers.normal(1.0),
    ).apply({"params": ga_params["current_seq_embedder"]}, seqs_t)
    t_embed = get_time_embedding(t[:, 0], cfg.c_s, max_positions=2056)
    t_embed = jnp.broadcast_to(t_embed[:, None, :], (B, L, cfg.c_s))
    ang_embed = AngularEncoding(num_funcs=12).apply({}, angles_t).reshape(B, L, -1)
    cdt = cfg.compute_dtype
    node_embed = MLP((cfg.c_s, cfg.c_s), dtype=cdt).apply(
        {"params": ga_params["res_feat_mixer"]},
        jnp.concatenate([node_embed, seq_embed, t_embed, ang_embed], axis=-1),
    ).astype(jnp.float32)
    node_embed = node_embed * node_mask[..., None]

    R = rot9.to9(rotmats_t.astype(jnp.float32))
    tr = rot9.t_to3(trans_t.astype(jnp.float32))
    return (node_embed, edge_embed, R, tr, node_mask)


def trunk_epilogue(cfg, ga_params, node_embed, R, tr):
    """GAEncoder.__call__'s post-loop readouts (array-form rotations)."""
    pred_rotmats = rot9.from9(R)
    pred_trans = rot9.t_from3(tr)
    pred_seqs_prob = MLP((cfg.c_s, cfg.c_s, 20)).apply(
        {"params": ga_params["seq_net"]}, node_embed)
    pred_angles = MLP((cfg.c_s, cfg.c_s, 5)).apply(
        {"params": ga_params["angle_net"]}, node_embed)
    pred_angles = jnp.mod(pred_angles, 2 * math.pi)
    return pred_rotmats, pred_trans, pred_angles, pred_seqs_prob


def pipeline_blocks(mesh: Mesh, cfg, stacked, state0, n_micro: int, nb: int):
    """Run the block stack as a GPipe pipeline over mesh axis 'pipe'.

    stacked: stack_block_params output (leading dim nb, sharded on 'pipe').
    state0:  trunk_prologue output, full (local-data) batch.
    Returns (node_embed, R, tr) for the full batch, replicated over 'pipe'.
    """
    S = int(mesh.shape["pipe"])
    assert S >= 2, "pipeline needs >= 2 stages (use the plain/DP step for 1)"
    assert nb % S == 0, f"num_blocks {nb} must divide over {S} pipeline stages"
    k = nb // S
    M = int(n_micro)
    has_data = "data" in mesh.shape
    n_data = int(mesh.shape["data"]) if has_data else 1

    B = state0[0].shape[0]
    assert B % (n_data * M) == 0, (
        f"batch {B} must divide into {n_data} data shards x {M} microbatches")

    dspec = P("data") if has_data else P()

    def body(stacked_local, state0_local):
        ax = jax.lax.axis_index("pipe")
        Bloc = state0_local[0].shape[0]
        Bm = Bloc // M
        T = M + S - 1
        perm = [(i, (i + 1) % S) for i in range(S)]

        def micro(tree_, idx):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, idx * Bm, Bm, 0),
                tree_)

        def vary(x):
            return jax.tree.map(
                lambda a: jax.lax.pcast(a, ("pipe",), to="varying"), x)

        buf = vary(micro(jax.tree.map(jnp.zeros_like, state0_local), 0))
        out0 = (state0_local[0], state0_local[2], state0_local[3])  # node, R, tr
        outbuf = vary(jax.tree.map(jnp.zeros_like, out0))

        def remat_block(st, bp, is_last):
            return block_apply(cfg, bp, st, is_last)

        remat_block = jax.checkpoint(remat_block, static_argnums=())

        def tick(carry, tk):
            buf, outbuf = carry
            inj = micro(state0_local, jnp.minimum(tk, M - 1))
            take = jnp.logical_and(ax == 0, tk < M)
            st = jax.tree.map(
                lambda a, b: jnp.where(take, a, b), inj, buf)

            def kblock(st, xs):
                bp, j = xs
                gb = ax * k + j
                return remat_block(st, bp, gb == nb - 1), None

            st, _ = jax.lax.scan(kblock, st, (stacked_local, jnp.arange(k)))

            done = jnp.logical_and(ax == S - 1, tk >= S - 1)
            oidx = jnp.clip(tk - (S - 1), 0, M - 1) * Bm
            o = (st[0], st[2], st[3])
            outbuf = jax.tree.map(
                lambda ob, x: jnp.where(
                    done,
                    jax.lax.dynamic_update_slice_in_dim(ob, x, oidx, 0),
                    ob),
                outbuf, o)
            buf = jax.tree.map(
                lambda a: jax.lax.ppermute(a, "pipe", perm), st)
            return (buf, outbuf), None

        (buf, outbuf), _ = jax.lax.scan(
            tick, (buf, outbuf), jnp.arange(T))
        # Only the last stage's buffers are real; psum broadcasts them.
        return jax.tree.map(
            lambda o: jax.lax.psum(
                jnp.where(ax == S - 1, o, jnp.zeros_like(o)), "pipe"),
            outbuf)

    in_state_specs = jax.tree.map(lambda _: dspec, state0)
    in_stack_specs = jax.tree.map(lambda _: P("pipe"), stacked)
    out_specs = (dspec, tuple(dspec for _ in range(9)),
                 tuple(dspec for _ in range(3)))
    node, R, tr = jax.shard_map(
        body, mesh=mesh,
        in_specs=(in_stack_specs, in_state_specs),
        out_specs=out_specs,
    )(stacked, state0)
    return node, R, tr
