"""Euler-ODE sampler — jit'd lax.scan over timesteps.

Re-implements `FlowModel.sample` from the reference (flow_model.py:229-374) as
a compiled scan: one trace, `num_steps` fused iterations, trajectory stacked
on-device (the reference does a host transfer every step, flow_model.py:313 —
here nothing leaves HBM until the caller asks).

Step semantics match the reference exactly:
* context rows re-imposed via generate_mask on every modality, every step
* sequence re-sampled from the simplex each step; its torsion-validity table
  zeroes chemically undefined angles (flow_model.py:302-303, 332-333)
* rotations integrate with the hard-coded exp schedule d_t * exp_rate
  (flow_model.py:322), translations/simplex linearly against the *initial*
  noise, torus angles along the shortest arc
* one extra prediction at t=1 appended (flow_model.py:346-372)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pepflowww_tpu.models.flow import FlowModel
from pepflowww_tpu.ops import allatom, rot9, simplex, so3, torus


def _impose_context(pred, truth, mask):
    return jnp.where(mask, pred, truth)


def euler_sample(
    model: FlowModel,
    params,
    batch,
    key: jax.Array,
    num_steps: int = 100,
    sample_bb: bool = True,
    sample_ang: bool = True,
    sample_seq: bool = True,
    return_traj: bool = False,
):
    """Run the multi-modal Euler ODE.

    Returns a dict with the final clean prediction
    {rotmats, trans, angles, seqs, seqs_simplex, rotmats_1, trans_1, angles_1,
    seqs_1} and, if `return_traj`, a stacked per-step trajectory under "traj".

    Wrap in `jax.jit` with static num_steps/sample_* for production use; see
    :func:`make_sampler`.
    """
    icfg = model.cfg.interpolant
    K, k = icfg.num_classes, icfg.simplex_value
    B, L = batch["aa"].shape

    gen_mask = batch["generate_mask"]
    gm1 = gen_mask[..., None]
    res_mask = batch["res_mask"]

    # Encode once; features are reused across all steps (flow_model.py:239).
    rotmats_1, trans_1, angles_1, seqs_1, node_embed, edge_embed = model.apply(
        {"params": params}, batch, method="encode"
    )
    trans_1_c = trans_1
    seqs_1_simplex = simplex.seq_to_simplex(seqs_1, k, K)

    # Rotations run the whole ODE in plane form (ops/rot9.py) — the scan
    # carry, the denoiser frames and the geodesic update never materialize a
    # (B, L, 3, 3) tensor (whose TPU tile layout wastes ~28x HBM traffic);
    # matrices only at the encode/output boundaries.
    r9_1 = rot9.to9(rotmats_1.astype(jnp.float32))

    key, k_rot, k_trans, k_ang, k_seq, k_seqtok = jax.random.split(key, 6)

    # Initial noise (flow_model.py:251-277).
    if sample_bb:
        r9_0 = rot9.where(gen_mask, rot9.to9(so3.uniform_so3(k_rot, (B, L))), r9_1)
        trans_0 = jax.random.normal(k_trans, (B, L, 3))
        trans_0_c, _ = FlowModel.zero_center_part(
            trans_0, gen_mask.astype(jnp.float32), res_mask.astype(jnp.float32)
        )
        trans_0_c = jnp.where(gm1, trans_0_c, trans_1_c)
    else:
        r9_0, trans_0_c = r9_1, trans_1_c
    if sample_ang:
        angles_0 = torus.random_uniform(k_ang, angles_1.shape, dtype=angles_1.dtype)
        angles_0 = jnp.where(gm1, angles_0, angles_1)
    else:
        angles_0 = angles_1
    if sample_seq:
        seqs_0_simplex = k * jax.random.normal(k_seq, (B, L, K))
        seqs_0 = simplex.sample_from(k_seqtok, jax.nn.softmax(seqs_0_simplex, axis=-1))
        seqs_0 = jnp.where(gen_mask, seqs_0, seqs_1)
        seqs_0_simplex = jnp.where(gm1, seqs_0_simplex, seqs_1_simplex)
    else:
        seqs_0 = seqs_1
        seqs_0_simplex = seqs_1_simplex

    ts = jnp.linspace(1e-2, 1.0, num_steps)

    # Pair-resident readout (trunk.py GAEncoder docstring): only meaningful
    # with the Pallas edge kernels; the fp32/XLA profile keeps the committed
    # parity graph.
    fused_ro = bool(getattr(model.cfg.ipa, "use_pallas", False))

    def denoise(t_scalar, rot, tr, ang, seq):
        t = jnp.full((B, 1), t_scalar)
        return model.apply(
            {"params": params}, t, rot, tr, ang, seq, node_embed, edge_embed,
            gen_mask, res_mask, method="denoise",
            fused_pair_readout=fused_ro,
        )

    def predict_clean(t_scalar, rot, tr, ang, seq, key):
        """Predict x̂₁ and re-impose context (flow_model.py:290-303).
        `rot` and the returned prediction are plane-form (9-tuples)."""
        pred_rot, pred_tr, pred_ang, pred_seq_logits = denoise(t_scalar, rot, tr, ang, seq)
        pred_rot = rot9.where(gen_mask, pred_rot, r9_1)
        pred_tr = _impose_context(pred_tr, trans_1_c, gm1)
        pred_ang = _impose_context(pred_ang, angles_1, gm1)
        pred_seq = simplex.sample_from(key, jax.nn.softmax(pred_seq_logits, axis=-1))
        pred_seq = jnp.where(gen_mask, pred_seq, seqs_1)
        pred_seq_simplex = simplex.seq_to_simplex(pred_seq, k, K)
        tor_mask = allatom.torsions_mask_for(pred_seq) > 0.5
        pred_ang = jnp.where(tor_mask, pred_ang, 0.0)
        if not sample_bb:
            pred_tr, pred_rot = trans_1_c, r9_1
        if not sample_ang:
            pred_ang = angles_1
        if not sample_seq:
            pred_seq, pred_seq_simplex = seqs_1, seqs_1_simplex
        return pred_rot, pred_tr, pred_ang, pred_seq, pred_seq_simplex

    def step(carry, t_pair):
        rot, tr, ang, seq, seq_simplex, key = carry
        t_1, t_2 = t_pair
        key, k_pred, k_tok = jax.random.split(key, 3)

        pred_rot, pred_tr, pred_ang, pred_seq, pred_seq_simplex = predict_clean(
            t_1, rot, tr, ang, seq, k_pred
        )

        d_t = t_2 - t_1
        # Euler updates (flow_model.py:316-333).
        trans_t_2 = tr + (pred_tr - trans_0_c) * d_t
        trans_t_2 = _impose_context(trans_t_2, trans_1_c, gm1)
        rot_t_2 = rot9.geodesic_t(d_t * icfg.rots_exp_rate, pred_rot, rot)
        rot_t_2 = rot9.where(gen_mask, rot_t_2, r9_1)
        ang_t_2 = torus.geodesic_t(d_t, pred_ang, ang)
        ang_t_2 = _impose_context(ang_t_2, angles_1, gm1)
        seq_simplex_t_2 = seq_simplex + (pred_seq_simplex - seqs_0_simplex) * d_t
        seq_t_2 = simplex.sample_from(k_tok, jax.nn.softmax(seq_simplex_t_2, axis=-1))
        seq_t_2 = jnp.where(gen_mask, seq_t_2, seqs_1)
        tor_mask = allatom.torsions_mask_for(seq_t_2) > 0.5
        ang_t_2 = jnp.where(tor_mask, ang_t_2, 0.0)

        if not sample_bb:
            trans_t_2, rot_t_2 = trans_1_c, r9_1
        if not sample_ang:
            ang_t_2 = angles_1
        if not sample_seq:
            seq_t_2 = seqs_1

        new_carry = (rot_t_2, trans_t_2, ang_t_2, seq_t_2, seq_simplex_t_2, key)
        out = (
            {"rotmats": rot9.from9(pred_rot), "trans": pred_tr,
             "angles": pred_ang, "seqs": pred_seq,
             "seqs_simplex": pred_seq_simplex}
            if return_traj
            else None
        )
        return new_carry, out

    carry0 = (r9_0, trans_0_c, angles_0, seqs_0, seqs_0_simplex, key)
    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    carry, traj = jax.lax.scan(step, carry0, t_pairs)
    rot, tr, ang, seq, seq_simplex, key = carry

    # Final prediction at t=1 (flow_model.py:346-372).
    key, k_pred = jax.random.split(key)
    pred_rot, pred_tr, pred_ang, pred_seq, pred_seq_simplex = predict_clean(
        ts[-1], rot, tr, ang, seq, k_pred
    )

    out = {
        "rotmats": rot9.from9(pred_rot),
        "trans": pred_tr,
        "angles": pred_ang,
        "seqs": pred_seq,
        "seqs_simplex": pred_seq_simplex,
        "rotmats_1": rotmats_1,
        "trans_1": trans_1_c,
        "angles_1": angles_1,
        "seqs_1": seqs_1,
    }
    if return_traj:
        out["traj"] = traj
    return out


def make_sampler(model: FlowModel, num_steps: int = 100, sample_bb: bool = True,
                 sample_ang: bool = True, sample_seq: bool = True,
                 return_traj: bool = False, microbatch: int | None = 64):
    """Build a jit'd sampler fn(params, batch, key) -> outputs.

    `microbatch`: per-chip parallel-batch optimum. Measured on v5e (PERF.md
    batch sweep): throughput/chip PEAKS at B=64 and regresses beyond (XLA
    assigns batch-minor layouts to the L² pair tensors once the batch fills a
    lane tile, inserting full-tensor copies around the einsums). Batches
    larger than `microbatch` therefore run as sequential B=microbatch chunks
    via `lax.map` inside the same jit — a B=128 call keeps the B=64
    throughput instead of losing ~10%. Set `microbatch=None` to disable.
    """

    def sample_chunk(params, batch, key):
        return euler_sample(
            model, params, batch, key, num_steps=num_steps, sample_bb=sample_bb,
            sample_ang=sample_ang, sample_seq=sample_seq, return_traj=return_traj,
        )

    @functools.partial(jax.jit, donate_argnums=())
    def fn(params, batch, key):
        B = batch["aa"].shape[0]
        if microbatch is None or B <= microbatch:
            return sample_chunk(params, batch, key)
        k, rem = divmod(B, microbatch)
        main = B - rem
        keys = jax.random.split(key, k + 1)
        chunked = {
            name: v[:main].reshape((k, microbatch) + v.shape[1:])
            for name, v in batch.items()
        }
        out = jax.lax.map(
            lambda args: sample_chunk(params, args[0], args[1]),
            (chunked, keys[:k]),
        )
        # Trajectory leaves stack time OUTSIDE the mapped batch axis —
        # (k, steps, mb, ...) vs (k, mb, ...) for final-state leaves — so
        # un-chunk the "traj" subtree by key, not by shape sniffing.
        main_traj = out.pop("traj", None)
        out = jax.tree.map(lambda v: v.reshape((main,) + v.shape[2:]), out)
        if main_traj is not None:
            main_traj = jax.tree.map(
                lambda v: jnp.moveaxis(v, 0, 1).reshape(
                    (v.shape[1], main) + v.shape[3:]),
                main_traj,
            )
        if rem:
            # ragged tail runs as its own (smaller) chunk; concat batch axes
            tail = sample_chunk(
                params, {name: v[main:] for name, v in batch.items()}, keys[k]
            )
            tail_traj = tail.pop("traj", None)
            out = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], axis=0), out, tail
            )
            if main_traj is not None:
                main_traj = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b], axis=1),
                    main_traj, tail_traj,
                )
        if main_traj is not None:
            out["traj"] = main_traj
        return out

    return fn


def make_dp_sampler(model: FlowModel, mesh, num_steps: int = 100,
                    sample_bb: bool = True, sample_ang: bool = True,
                    sample_seq: bool = True):
    """Data-parallel sampler over a 1-D `data` mesh (mass sampling at scale).

    The batch shards along axis 0 across devices; params replicate; one SPMD
    program — XLA partitions the whole ODE with no collectives on the hot
    path (sampling is embarrassingly parallel over complexes).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pepflowww_tpu.parallel import tp

    # On a real multi-chip TPU mesh, Mosaic kernels fail multi-device jit
    # lowering outright (tp.xla_profile_model docstring) — swap to the
    # equivalent XLA graph there; CPU virtual meshes keep pallas-interpret.
    model = tp.xla_profile_model_if_partitioned(model, mesh)

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))

    def fn(params, batch, key):
        return euler_sample(
            model, params, batch, key, num_steps=num_steps, sample_bb=sample_bb,
            sample_ang=sample_ang, sample_seq=sample_seq,
        )

    # ONE jit wrapper per factory call (VERDICT r3 item 5 — the old form
    # built a fresh `jax.jit` inside every invocation, giving each call its
    # own trace cache). `sharded` applies to the whole batch dict as a pytree
    # prefix, so the wrapper works for any batch key set; repeat calls at the
    # same shapes hit the compiled executable (tests/test_model.py pins the
    # trace count).
    return jax.jit(fn, in_shardings=(replicated, sharded, replicated))


def make_best_dp_sampler(model: FlowModel, mesh, **kw):
    """Pick the right DP-sampler implementation for this model profile.

    Pallas profile → the manual shard_map path (parallel/manual.py): keeps
    the fused Mosaic kernels per-device on a real pod — the single-chip
    kernel throughput — where the automatic-SPMD path must swap them for
    the XLA graph (tp.xla_profile_model; the measured cost of that swap is
    bench.py's ``sampling_pps_xla``). Per-shard RNG, so results are
    statistically (not bitwise) equal to the single-device sampler.

    XLA profile → the automatic-SPMD path (:func:`make_dp_sampler`), which
    keeps bitwise global-RNG parity with the single-device sampler.

    sample.py/serve.py ``--dp`` route through this.
    """
    ipa = model.cfg.ipa
    if getattr(ipa, "use_pallas", False) or getattr(ipa, "use_pallas_ipa", False):
        from pepflowww_tpu.parallel.manual import make_manual_dp_sampler

        return make_manual_dp_sampler(model, mesh, **kw)
    return make_dp_sampler(model, mesh, **kw)


def make_tp_sampler(model: FlowModel, mesh, num_steps: int = 100,
                    sample_bb: bool = True, sample_ang: bool = True,
                    sample_seq: bool = True):
    """Tensor+data-parallel sampler over a 2-D ``(data, model)`` mesh.

    The serving-side analogue of ``make_tp_train_step``: the batch shards on
    "data" and the trunk's L² pair tensors shard their query rows on "model"
    (``tp.pair_constraint`` hooks in GAEncoder), so widths/lengths whose
    (B, L, L, c_z) pair activations exceed one chip's HBM can still serve.
    All pair compute stays local; GSPMD only all-gathers node-level tensors
    at block boundaries. The reference has no serving parallelism at all
    (its sampler is a single-GPU loop, flow_model.py:229-374).

    Equivalence to the single-device sampler is pinned by
    tests/test_tp.py::test_tp_sampler_matches_single_device.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pepflowww_tpu.parallel import tp

    # Pallas custom calls can't partition on the model axis (they would
    # replicate the very pair tensors TP shards) — trace the equivalent
    # XLA graph instead (tp.xla_profile_model docstring has the full why).
    model = tp.xla_profile_model(model)

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))

    def fn(params, batch, key):
        return euler_sample(
            model, params, batch, key, num_steps=num_steps, sample_bb=sample_bb,
            sample_ang=sample_ang, sample_seq=sample_seq,
        )

    jitted = jax.jit(fn, in_shardings=(replicated, sharded, replicated))

    def sampler(params, batch, key):
        # tp_shard only matters while TRACING (constraints bake into the
        # jaxpr); entering it per call keeps the single jit wrapper.
        with tp.tp_shard(mesh):
            return jitted(params, batch, key)

    sampler._cache_size = jitted._cache_size  # retrace-count regression hook
    return sampler
