"""Fused EdgeEmbedder distance-block Pallas kernel.

The 15x15 inter-atom distance-gaussian feature (edge.py:80-87 in the
reference) is the training step's largest remaining HBM consumer after the
EdgeTransition kernels: the XLA graph materializes several (B, L, L, 225)
tensors (squared distances, per-pair coefficients from a 484-row table,
gaussians) plus a 225-wide GEMM — profiled at ~4.5 ms/step forward at
B=L=64 on v5e. This kernel keeps everything pair-resolution in VMEM:

* d² is built from rep/tile lane expansions of per-atom coordinates and
  squared norms (precomputed outside at node resolution, (B, L, 225) each)
  via three broadcast multiply-adds — the (B, L, L, 15, 15, 3) difference
  tensor never exists anywhere.
* the per-aa-pair coefficient lookup runs as a one-hot (P, 484) matmul with
  the 436 KB table VMEM-resident (gather/scatter-free).
* softplus, exp, atom-pair mask, and the two distance_embed layers fuse in.

Outputs (B, L, L, F) directly in 4-D blocks (see pallas_edge.py for why).
Backward: `fused_distance_embed_vjp` recomputes through the jnp twin under
`jax.vjp` by default; parity pinned in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pepflowww_tpu.models.pallas_common import dist_row_tile, resolve_interpret

A = 15          # heavy atoms per residue
AA2 = A * A     # 225 atom pairs


def _expand(x, kind):
    """(B, L, A) -> (B, L, A*A): "rep" repeats each lane A times (i-side,
    lane (a, a') -> x[a]); "tile" tiles the row A times (j-side, -> x[a'])."""
    if kind == "rep":
        return jnp.repeat(x, A, axis=-1)
    return jnp.tile(x, (1, 1, A))


def _precompute_expansions(pos_nm, mask_atoms):
    f32 = jnp.float32
    pos = pos_nm.astype(f32)
    sq = jnp.sum(jnp.square(pos), axis=-1)               # (B, L, A)
    m = mask_atoms.astype(f32)
    xr = [_expand(pos[..., c], "rep") for c in range(3)]
    xt = [_expand(pos[..., c], "tile") for c in range(3)]
    sr, st = _expand(sq, "rep"), _expand(sq, "tile")
    mr, mt = _expand(m, "rep"), _expand(m, "tile")
    return xr, xt, sr, st, mr, mt


def _kernel(xr0_ref, xr1_ref, xr2_ref, sr_ref, mr_ref,
            xt0_ref, xt1_ref, xt2_ref, st_ref, mt_ref,
            idx_ref, smask_ref,
            table_ref, k1_ref, b1_ref, k2_ref, b2_ref,
            out_ref, *, k_i: int, L: int, V: int):
    f32 = jnp.float32
    cd = k1_ref.dtype

    def bi(ref):  # (K_I, AA2) -> (K_I, L, AA2) broadcast over j
        x = ref[0].astype(f32)
        return jnp.broadcast_to(x[:, None, :], (k_i, L, AA2))

    def bj(ref):  # (L, AA2) -> (K_I, L, AA2) broadcast over i
        x = ref[0].astype(f32)
        return jnp.broadcast_to(x[None, :, :], (k_i, L, AA2))

    cross = bi(xr0_ref) * bj(xt0_ref)
    cross += bi(xr1_ref) * bj(xt1_ref)
    cross += bi(xr2_ref) * bj(xt2_ref)
    d2 = bi(sr_ref) + bj(st_ref) - 2.0 * cross          # (K_I, L, AA2)

    # Per-aa-pair coefficient rows via one-hot matmul (table stays in VMEM).
    idx = idx_ref[0]                                     # (K_I, L) int32
    iota = jax.lax.broadcasted_iota(jnp.int32, (k_i, L, V), 2)
    onehot = (idx[:, :, None] == iota).astype(cd).reshape(k_i * L, V)
    coef = jnp.dot(onehot, table_ref[:].astype(cd),
                   preferred_element_type=f32).reshape(k_i, L, AA2)
    c = jax.nn.softplus(coef)

    gauss = jnp.exp(-c * d2) * (bi(mr_ref) * bj(mt_ref))

    x = gauss.reshape(k_i * L, AA2).astype(cd)
    h = jax.nn.relu(
        jnp.dot(x, k1_ref[:], preferred_element_type=f32) + b1_ref[:].astype(f32)
    )
    o = jax.nn.relu(
        jnp.dot(h.astype(cd), k2_ref[:], preferred_element_type=f32)
        + b2_ref[:].astype(f32)
    )
    F = o.shape[-1]
    o = o.reshape(k_i, L, F) * smask_ref[0].astype(f32)[:, :, None]
    out_ref[0] = o.astype(out_ref.dtype)


def fused_distance_embed(
    pos_nm: jax.Array,       # (B, L, A, 3) atom coords, already in nm
    mask_atoms: jax.Array,   # (B, L, A)
    aa_pair: jax.Array,      # (B, L, L) int32, aa_i * 22 + aa_j
    pair_mask: jax.Array,    # (B, L, L) — structure (or all-ones) pair mask
    table: jax.Array,        # (V, 225) coefficient embedding
    k1: jax.Array, b1: jax.Array,   # distance_embed Linear_0
    k2: jax.Array, b2: jax.Array,   # distance_embed Linear_1
    dtype=jnp.bfloat16,
    k_i=None,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused (masked gaussian of d²) -> 2-layer ReLU MLP. Returns (B, L, L, F)."""
    interpret = resolve_interpret(interpret)
    B, L, A_, _ = pos_nm.shape
    assert A_ == A
    V, AA2_ = table.shape
    assert AA2_ == AA2
    F = k1.shape[-1]
    f32 = jnp.float32

    xr, xt, sr, st, mr, mt = _precompute_expansions(pos_nm, mask_atoms)

    if k_i is None:
        # Tile sweep on v5e at flagship dims: 512 rows -> 0.88 ms,
        # 1024 -> 0.79, 2048 -> 0.77 per fwd call (bwd 1.76/1.61/1.42).
        # Wider pair channels scale the row budget down (the 4x-width
        # scaling probe's F=256 backward overflowed scoped vmem at 2048).
        k_i = dist_row_tile(L, F)
    if k_i is None:
        raise ValueError(
            f"no Mosaic-legal row tile within the VMEM budget at L={L} "
            f"F={F}; callers must pre-check pallas_common.dist_row_tile "
            "and use the XLA path")
    grid = (B, L // k_i)

    kernel = functools.partial(_kernel, k_i=k_i, L=L, V=V)
    full = lambda *i: (0, 0)
    node_i = pl.BlockSpec((1, k_i, AA2), lambda b, p: (b, p, 0))
    node_j = pl.BlockSpec((1, L, AA2), lambda b, p: (b, 0, 0))
    pair = pl.BlockSpec((1, k_i, L), lambda b, p: (b, p, 0))

    cd = dtype
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            node_i, node_i, node_i, node_i, node_i,
            node_j, node_j, node_j, node_j, node_j,
            pair, pair,
            pl.BlockSpec((V, AA2), full),
            pl.BlockSpec((AA2, F), full), pl.BlockSpec((1, F), full),
            pl.BlockSpec((F, F), full), pl.BlockSpec((1, F), full),
        ],
        out_specs=pl.BlockSpec((1, k_i, L, F), lambda b, p: (b, p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, L, F), dtype),
        interpret=interpret,
    )(
        xr[0].astype(cd), xr[1].astype(cd), xr[2].astype(cd),
        sr.astype(cd), mr.astype(cd),
        xt[0].astype(cd), xt[1].astype(cd), xt[2].astype(cd),
        st.astype(cd), mt.astype(cd),
        aa_pair.astype(jnp.int32), pair_mask.astype(cd),
        table.astype(f32),
        k1.astype(cd), b1.reshape(1, -1).astype(f32),
        k2.astype(cd), b2.reshape(1, -1).astype(f32),
    )
    return out


def distance_embed_reference(pos_nm, mask_atoms, aa_pair, pair_mask, table,
                             k1, b1, k2, b2, dtype=jnp.bfloat16):
    """jnp twin (numerics oracle + backward recompute)."""
    f32 = jnp.float32
    cd = dtype
    B, L = aa_pair.shape[:2]
    pos = pos_nm.astype(f32)
    # (B, L, L, A, A) with [..., a, a'] = ||p_i[a] - p_j[a']||²
    d2 = jnp.sum(
        jnp.square(pos[:, :, None, :, None] - pos[:, None, :, None, :]),
        axis=-1,
    ).reshape(B, L, L, AA2)
    coef = jnp.take(table, aa_pair, axis=0)
    c = jax.nn.softplus(coef)
    mp = (mask_atoms[:, :, None, :, None] * mask_atoms[:, None, :, None, :])
    mp = mp.reshape(B, L, L, AA2).astype(f32)
    g = jnp.exp(-c * d2) * mp
    x = g.astype(cd)
    h = jax.nn.relu(
        jnp.einsum("bijc,cf->bijf", x, k1.astype(cd),
                   preferred_element_type=f32) + b1.astype(f32)
    )
    o = jax.nn.relu(
        jnp.einsum("bijc,cf->bijf", h.astype(cd), k2.astype(cd),
                   preferred_element_type=f32) + b2.astype(f32)
    )
    o = o * pair_mask.astype(f32)[..., None]
    return o.astype(dtype)




def _bwd_kernel(xr0_ref, xr1_ref, xr2_ref, sr_ref, mr_ref,
                xt0_ref, xt1_ref, xt2_ref, st_ref, mt_ref,
                idx_ref, smask_ref, g_ref,
                table_ref, k1_ref, b1_ref, k2_ref, b2_ref,
                d_table_ref, d_k1_ref, d_b1_ref, d_k2_ref, d_b2_ref,
                *, k_i: int, L: int, V: int):
    """Rematerializes the tile forward, accumulates parameter gradients.

    Positions/masks/indices are batch data on every live path, so the only
    outputs are the five parameter-grad accumulators (constant-index blocks,
    initialized at the first program — same pattern as pallas_edge_bwd)."""
    f32 = jnp.float32
    cd = k1_ref.dtype
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    P = k_i * L

    def bi(ref):
        x = ref[0].astype(f32)
        return jnp.broadcast_to(x[:, None, :], (k_i, L, AA2))

    def bj(ref):
        x = ref[0].astype(f32)
        return jnp.broadcast_to(x[None, :, :], (k_i, L, AA2))

    # ---- recompute forward ----
    cross = bi(xr0_ref) * bj(xt0_ref)
    cross += bi(xr1_ref) * bj(xt1_ref)
    cross += bi(xr2_ref) * bj(xt2_ref)
    d2 = (bi(sr_ref) + bj(st_ref) - 2.0 * cross).reshape(P, AA2)

    idx = idx_ref[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (k_i, L, V), 2)
    onehot = (idx[:, :, None] == iota).astype(cd).reshape(P, V)
    coef = jnp.dot(onehot, table_ref[:].astype(cd), preferred_element_type=f32)
    c = jax.nn.softplus(coef)
    mpair = (bi(mr_ref) * bj(mt_ref)).reshape(P, AA2)
    e = jnp.exp(-c * d2)
    x = (e * mpair).astype(cd)
    a1 = jnp.dot(x, k1_ref[:], preferred_element_type=f32) + b1_ref[:].astype(f32)
    h = jax.nn.relu(a1)
    h_c = h.astype(cd)
    a2 = jnp.dot(h_c, k2_ref[:], preferred_element_type=f32) + b2_ref[:].astype(f32)

    # ---- backward ----
    g = g_ref[0].astype(f32).reshape(k_i, L, -1)
    do = (g * smask_ref[0].astype(f32)[:, :, None]).reshape(P, -1)
    da2 = do * (a2 > 0)
    da2_c = da2.astype(cd)
    d_k2 = jnp.dot(h_c.T, da2_c, preferred_element_type=f32)
    d_b2 = jnp.sum(da2, axis=0, keepdims=True)
    dh = jnp.dot(da2_c, k2_ref[:].T, preferred_element_type=f32)
    da1 = dh * (a1 > 0)
    da1_c = da1.astype(cd)
    d_k1 = jnp.dot(x.T, da1_c, preferred_element_type=f32)
    d_b1 = jnp.sum(da1, axis=0, keepdims=True)
    dx = jnp.dot(da1_c, k1_ref[:].T, preferred_element_type=f32)   # (P, AA2)
    # x = exp(-c*d2) * mpair  (cast to cd absorbs into grad tolerance)
    dc = dx * mpair * e * (-d2)
    dcoef = (dc * jax.nn.sigmoid(coef)).astype(cd)
    d_table = jnp.dot(onehot.T, dcoef, preferred_element_type=f32)

    @pl.when(first)
    def _():
        d_table_ref[...] = jnp.zeros_like(d_table_ref)
        d_k1_ref[...] = jnp.zeros_like(d_k1_ref)
        d_b1_ref[...] = jnp.zeros_like(d_b1_ref)
        d_k2_ref[...] = jnp.zeros_like(d_k2_ref)
        d_b2_ref[...] = jnp.zeros_like(d_b2_ref)

    d_table_ref[...] += d_table.astype(d_table_ref.dtype)
    d_k1_ref[...] += d_k1.astype(d_k1_ref.dtype)
    d_b1_ref[...] += d_b1.astype(d_b1_ref.dtype)
    d_k2_ref[...] += d_k2.astype(d_k2_ref.dtype)
    d_b2_ref[...] += d_b2.astype(d_b2_ref.dtype)


def distance_embed_bwd(pos_nm, mask_atoms, aa_pair, pair_mask, table,
                       k1, b1, k2, b2, g, dtype=jnp.float32, k_i=None,
                       interpret: bool | None = None):
    """Parameter gradients (d_table, d_k1, d_b1, d_k2, d_b2)."""
    interpret = resolve_interpret(interpret)
    B, L, A_, _ = pos_nm.shape
    V = table.shape[0]
    F = k1.shape[-1]
    f32 = jnp.float32
    cd = dtype

    xr, xt, sr, st, mr, mt = _precompute_expansions(pos_nm, mask_atoms)

    if k_i is None:
        # see fused_distance_embed: row budget scales down with F
        k_i = dist_row_tile(L, F)
    if k_i is None:
        raise ValueError(
            f"no Mosaic-legal row tile within the VMEM budget at L={L} "
            f"F={F}; callers must pre-check pallas_common.dist_row_tile "
            "and use the XLA path")
    grid = (B, L // k_i)

    kernel = functools.partial(_bwd_kernel, k_i=k_i, L=L, V=V)
    full = lambda *i: (0, 0)
    node_i = pl.BlockSpec((1, k_i, AA2), lambda b, p: (b, p, 0))
    node_j = pl.BlockSpec((1, L, AA2), lambda b, p: (b, 0, 0))
    pair = pl.BlockSpec((1, k_i, L), lambda b, p: (b, p, 0))

    out_shapes = (
        jax.ShapeDtypeStruct((V, AA2), f32),
        jax.ShapeDtypeStruct((AA2, F), f32),
        jax.ShapeDtypeStruct((1, F), f32),
        jax.ShapeDtypeStruct((F, F), f32),
        jax.ShapeDtypeStruct((1, F), f32),
    )
    out_specs = (
        pl.BlockSpec((V, AA2), full),
        pl.BlockSpec((AA2, F), full), pl.BlockSpec((1, F), full),
        pl.BlockSpec((F, F), full), pl.BlockSpec((1, F), full),
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            node_i, node_i, node_i, node_i, node_i,
            node_j, node_j, node_j, node_j, node_j,
            pair, pair,
            pl.BlockSpec((1, k_i, L, F), lambda b, p: (b, p, 0, 0)),
            pl.BlockSpec((V, AA2), full),
            pl.BlockSpec((AA2, F), full), pl.BlockSpec((1, F), full),
            pl.BlockSpec((F, F), full), pl.BlockSpec((1, F), full),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        xr[0].astype(cd), xr[1].astype(cd), xr[2].astype(cd),
        sr.astype(cd), mr.astype(cd),
        xt[0].astype(cd), xt[1].astype(cd), xt[2].astype(cd),
        st.astype(cd), mt.astype(cd),
        aa_pair.astype(jnp.int32), pair_mask.astype(cd),
        g,
        table.astype(f32),
        k1.astype(cd), b1.reshape(1, -1).astype(f32),
        k2.astype(cd), b2.reshape(1, -1).astype(f32),
    )
    d_table, d_k1, d_b1, d_k2, d_b2 = outs
    return d_table, d_k1, d_b1[0], d_k2, d_b2[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_distance_embed_vjp(pos_nm, mask_atoms, aa_pair, pair_mask, table,
                             k1, b1, k2, b2, dtype=jnp.bfloat16,
                             interpret=None):
    return fused_distance_embed(pos_nm, mask_atoms, aa_pair, pair_mask, table,
                                k1, b1, k2, b2, dtype=dtype,
                                interpret=interpret)


def _fwd(pos_nm, mask_atoms, aa_pair, pair_mask, table, k1, b1, k2, b2,
         dtype, interpret):
    out = fused_distance_embed(pos_nm, mask_atoms, aa_pair, pair_mask, table,
                               k1, b1, k2, b2, dtype=dtype, interpret=interpret)
    return out, (pos_nm, mask_atoms, aa_pair, pair_mask, table, k1, b1, k2, b2)


def _bwd(dtype, interpret, res, g):
    pos_nm, mask_atoms, aa_pair, pair_mask, table, k1, b1, k2, b2 = res
    # Gradients only for the parameters (positions/masks/indices are data on
    # every live path — encode features come from the batch). Hand-written
    # backward kernel: the jax.vjp-through-the-twin alternative re-runs the
    # whole XLA distance block (~9 ms/step fwd+bwd vs ~2 ms fused).
    d_table, d_k1, d_b1, d_k2, d_b2 = distance_embed_bwd(
        pos_nm, mask_atoms, aa_pair, pair_mask, table, k1, b1, k2, b2, g,
        dtype=dtype, interpret=interpret,
    )
    return (None, None, None, None, d_table, d_k1, d_b1, d_k2, d_b2)


fused_distance_embed_vjp.defvjp(_fwd, _bwd)
