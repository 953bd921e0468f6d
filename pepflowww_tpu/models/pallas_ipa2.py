"""Fused InvariantPointAttention kernel, v2 (forward + hand-written backward).

Fuses the ENTIRE IPA interior between the input projections and the output
projection (AF2 Alg. 22, reference models_con/ipa_pytorch.py:316-475):

    local->global frame transform of q/k/v points  (ipa_pytorch.py:365-383)
    scalar logits + pair bias + point-distance term (:393-437)
    mask + softmax                                   (:439-447)
    scalar / point / pair aggregations               (:453-470)
    global->local inverse transform + point norms    (:460-465)

Why this shape (TPU-first rationale, cf. PERF.md round-1 profiling):
* The round-1 XLA path spent ~1.08 ms/denoise in layout copies on the
  trailing-3 point tensors (local_to_global/global_to_local einsums over a
  size-3 minor axis tile-pad 128/3 on TPU). Here the frame transforms are
  9 broadcast multiply-adds over (L, P) planes INSIDE the kernel — the
  (.., P, 3)-shaped tensors never exist.
* All kernel inputs/outputs are natural reshapes of the projection GEMMs
  (q/kv head-blocked along lanes, points coordinate-blocked as the reference
  packs them) and the outputs concatenate directly into the reference's
  o_feats layout (scalar | x|y|z point blocks | norms | pair) — zero XLA
  transposes on (L, *) tensors around the call; only the per-head point
  tensors (tiny) and the pair bias are pre-transposed head-major.
* Grid is (B,): the (L, L) attention matrices live and die in VMEM, the pair
  blocks (bias, down-projected z) are DMA'd once per batch row, and heads are
  a statically unrolled loop so Mosaic pipelines across batch programs.

The backward kernel recomputes the softmax flash-style from the saved inputs
(no (B, H, L, L) residuals in HBM) and emits every gradient in one pass:
d(q/kv/points/bias/pair_z/R/t) plus the per-head point-weight gradient
(d_sw), replacing round-1's recompute-through-XLA backward whose point
reductions cost 2.9 ms/train-step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pepflowww_tpu.models.pallas_common import resolve_interpret

F32 = jnp.float32


def _dims(q, qp, kvp):
    H = qp.shape[1]
    C = q.shape[-1] // H
    Pq = qp.shape[-1]
    Pv = kvp.shape[-1] - Pq
    L = q.shape[1]
    return H, C, Pq, Pv, L


def _fwd_kernel(q_ref, kv_ref, qp_ref, kvp_ref, r_ref, t_ref, bias_ref,
                pz_ref, maskb_ref, sw_ref,
                o_ref, optl_ref, norm_ref, opair_ref,
                *, H, C, Pq, Pv, CZ4, s1, s2, eps):
    r9 = r_ref[0].astype(F32)       # (L, 9), row-major R[c, d] at 3c+d
    tt = t_ref[0].astype(F32)       # (L, 3)
    maskb = maskb_ref[0]            # (1, L) — broadcasts over query rows
    pz = pz_ref[0]                  # (L, L, CZ4)

    def rcol(c, d):
        return r9[:, 3 * c + d : 3 * c + d + 1]   # (L, 1)

    def tcol(c):
        return tt[:, c : c + 1]

    def to_global(ref, h, lo, hi, scale):
        """Per-coordinate global points [(L, hi-lo)] * 3 — R x + t, scaled."""
        xs = [ref[0, h, d, :, lo:hi].astype(F32) for d in range(3)]
        return [
            (rcol(c, 0) * xs[0] + rcol(c, 1) * xs[1] + rcol(c, 2) * xs[2]
             + tcol(c)) * scale
            for c in range(3)
        ]

    for h in range(H):
        q_h = q_ref[0, :, h * C : (h + 1) * C]
        k_h = kv_ref[0, :, 2 * h * C : 2 * h * C + C]
        v_h = kv_ref[0, :, 2 * h * C + C : 2 * h * C + 2 * C]

        a = jnp.dot(q_h, k_h.T, preferred_element_type=F32) * s1
        a = a + bias_ref[0, h].astype(F32) * s2

        sw_h = sw_ref[0, h]
        qg = to_global(qp_ref, h, 0, Pq, sw_h)
        kg = to_global(kvp_ref, h, 0, Pq, sw_h)
        vg = to_global(kvp_ref, h, Pq, Pq + Pv, 1.0)

        pt = jnp.zeros_like(a)
        for c in range(3):
            q_sq = jnp.sum(jnp.square(qg[c]), axis=-1, keepdims=True)  # (L, 1)
            k_sq = jnp.sum(jnp.square(kg[c]), axis=-1, keepdims=True)
            pt = pt + q_sq + k_sq.T - 2.0 * jnp.dot(qg[c], kg[c].T,
                                                    preferred_element_type=F32)
        a = a - 0.5 * pt + maskb
        a = jax.nn.softmax(a, axis=-1)
        a_c = a.astype(v_h.dtype)

        o_ref[0, :, h * C : (h + 1) * C] = jnp.dot(
            a_c, v_h, preferred_element_type=F32
        ).astype(o_ref.dtype)

        optg = [jnp.dot(a, vg[c], preferred_element_type=F32) for c in range(3)]
        dif = [optg[d] - tcol(d) for d in range(3)]
        nsq = jnp.full((1, 1), eps, F32)
        for c in range(3):
            # inverse transform: R^T (o_pt_global - t)
            loc_c = rcol(0, c) * dif[0] + rcol(1, c) * dif[1] + rcol(2, c) * dif[2]
            optl_ref[0, :, c * H * Pv + h * Pv : c * H * Pv + (h + 1) * Pv] = (
                loc_c.astype(optl_ref.dtype)
            )
            nsq = nsq + jnp.square(loc_c)
        norm_ref[0, :, h * Pv : (h + 1) * Pv] = jnp.sqrt(nsq).astype(norm_ref.dtype)

        opair_ref[0, :, h * CZ4 : (h + 1) * CZ4] = jnp.sum(
            a[:, :, None] * pz.astype(F32), axis=1
        ).astype(opair_ref.dtype)


def fused_ipa2(q, kv, qp, kvp, r9, t, bias, pz, maskb, sw,
               eps: float = 1e-8, interpret: bool | None = None):
    """Fused IPA interior.

    Args (B = batch, L = padded length, natural GEMM-output layouts):
        q:    (B, L, H*C) scalar queries (head-blocked lanes).
        kv:   (B, L, H*2C) scalar keys|values ([k_h | v_h] per head block).
        qp:   (B, H, 3, L, Pq) local query points (head-major; coordinate
              planes as the reference packs them, ipa_pytorch.py:362-366).
        kvp:  (B, H, 3, L, Pq+Pv) local key|value points.
        r9:   (B, L, 9) row-major backbone rotations; t: (B, L, 3).
        bias: (B, H, L, L) pair bias (linear_b output, head-major).
        pz:   (B, L, L, CZ4) down-projected pair (down_z output).
        maskb:(B, 1, L) additive key-mask bias (inf*(mask-1)).
        sw:   (1, H) sqrt of the softplus'd per-head point weights (incl. the
              sqrt(1/(3*Pq*9/2)) scale), folded into q/k global points so the
              squared-distance expansion carries w_h implicitly.
    Returns:
        o:     (B, L, H*C) f32 scalar output.
        o_ptl: (B, L, 3*H*Pv) f32 local output points, [x|y|z] blocks —
               exactly the reference's concat layout (ipa_pytorch.py:475).
        norm:  (B, L, H*Pv) f32 point norms (+eps inside the sqrt).
        opair: (B, L, H*CZ4) f32 pair readout.
    """
    interpret = resolve_interpret(interpret)
    H, C, Pq, Pv, L = _dims(q, qp, kvp)
    B = q.shape[0]
    CZ4 = pz.shape[-1]
    s1 = float(1.0 / (3 * C) ** 0.5)
    s2 = float(1.0 / 3.0 ** 0.5)

    kernel = functools.partial(
        _fwd_kernel, H=H, C=C, Pq=Pq, Pv=Pv, CZ4=CZ4, s1=s1, s2=s2, eps=eps
    )

    def row(shape):
        n = len(shape)
        return pl.BlockSpec((1,) + shape, lambda b, _n=n: (b,) + (0,) * _n)

    out_shapes = (
        jax.ShapeDtypeStruct((B, L, H * C), F32),
        jax.ShapeDtypeStruct((B, L, 3 * H * Pv), F32),
        jax.ShapeDtypeStruct((B, L, H * Pv), F32),
        jax.ShapeDtypeStruct((B, L, H * CZ4), F32),
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            row((L, H * C)), row((L, 2 * H * C)),
            row((H, 3, L, Pq)), row((H, 3, L, Pq + Pv)),
            row((L, 9)), row((L, 3)),
            row((H, L, L)), row((L, L, CZ4)), row((1, L)),
            pl.BlockSpec((1, H), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(row((L, H * C)), row((L, 3 * H * Pv)),
                   row((L, H * Pv)), row((L, H * CZ4))),
        out_shape=out_shapes,
        interpret=interpret,
    )(q, kv, qp, kvp, r9, t, bias, pz, maskb, sw)


# ---------------------------------------------------------------- backward
def _bwd_kernel(q_ref, kv_ref, qp_ref, kvp_ref, r_ref, t_ref, bias_ref,
                pz_ref, maskb_ref, sw_ref,
                go_ref, goptl_ref, gnorm_ref, gopair_ref,
                gq_ref, gkv_ref, gqp_ref, gkvp_ref, gr_ref, gt_ref,
                gbias_ref, gpz_ref, gsw_ref,
                *, H, C, Pq, Pv, CZ4, s1, s2, eps):
    r9 = r_ref[0].astype(F32)
    tt = t_ref[0].astype(F32)
    maskb = maskb_ref[0]
    pz = pz_ref[0].astype(F32)

    gr_ref[0] = jnp.zeros_like(gr_ref[0])
    gt_ref[0] = jnp.zeros_like(gt_ref[0])
    gpz_ref[0] = jnp.zeros_like(gpz_ref[0])

    def rcol(c, d):
        return r9[:, 3 * c + d : 3 * c + d + 1]

    def tcol(c):
        return tt[:, c : c + 1]

    for h in range(H):
        # ---- recompute forward (flash-style; no attention residuals) ----
        q_h = q_ref[0, :, h * C : (h + 1) * C]
        k_h = kv_ref[0, :, 2 * h * C : 2 * h * C + C]
        v_h = kv_ref[0, :, 2 * h * C + C : 2 * h * C + 2 * C]
        a = jnp.dot(q_h, k_h.T, preferred_element_type=F32) * s1
        a = a + bias_ref[0, h].astype(F32) * s2

        sw_h = sw_ref[0, h]
        xq = [[qp_ref[0, h, d, :, 0:Pq].astype(F32) for d in range(3)]]
        xk = [kvp_ref[0, h, d, :, 0:Pq].astype(F32) for d in range(3)]
        xv = [kvp_ref[0, h, d, :, Pq:Pq + Pv].astype(F32) for d in range(3)]
        xq = xq[0]

        def fwd_tfm(xs, scale):
            return [
                (rcol(c, 0) * xs[0] + rcol(c, 1) * xs[1] + rcol(c, 2) * xs[2]
                 + tcol(c)) * scale
                for c in range(3)
            ]

        qg = fwd_tfm(xq, sw_h)
        kg = fwd_tfm(xk, sw_h)
        vg = fwd_tfm(xv, 1.0)

        pt = jnp.zeros_like(a)
        for c in range(3):
            q_sq = jnp.sum(jnp.square(qg[c]), axis=-1, keepdims=True)
            k_sq = jnp.sum(jnp.square(kg[c]), axis=-1, keepdims=True)
            pt = pt + q_sq + k_sq.T - 2.0 * jnp.dot(qg[c], kg[c].T,
                                                    preferred_element_type=F32)
        a = jax.nn.softmax(a - 0.5 * pt + maskb, axis=-1)
        a_c = a.astype(v_h.dtype)
        at = a.T                                    # reused by all T-side grads

        optg = [jnp.dot(a, vg[c], preferred_element_type=F32) for c in range(3)]
        dif = [optg[d] - tcol(d) for d in range(3)]
        optl = []
        nsq = jnp.full((1, 1), eps, F32)
        for c in range(3):
            loc_c = rcol(0, c) * dif[0] + rcol(1, c) * dif[1] + rcol(2, c) * dif[2]
            optl.append(loc_c)
            nsq = nsq + jnp.square(loc_c)
        norm = jnp.sqrt(nsq)

        # ---- gradients ----
        go_h = go_ref[0, :, h * C : (h + 1) * C].astype(F32)
        gnorm_h = gnorm_ref[0, :, h * Pv : (h + 1) * Pv].astype(F32)
        gopair_h = gopair_ref[0, :, h * CZ4 : (h + 1) * CZ4].astype(F32)

        # norm -> local points; local -> global output points
        goptl = [
            goptl_ref[0, :, c * H * Pv + h * Pv : c * H * Pv + (h + 1) * Pv]
            .astype(F32) + optl[c] * gnorm_h / norm
            for c in range(3)
        ]
        goptg = [
            rcol(d, 0) * goptl[0] + rcol(d, 1) * goptl[1] + rcol(d, 2) * goptl[2]
            for d in range(3)
        ]
        # d R from the inverse transform: optl_c = sum_d R[d,c] * dif_d
        for d in range(3):
            for c in range(3):
                gr_ref[0, :, 3 * d + c : 3 * d + c + 1] += jnp.sum(
                    dif[d] * goptl[c], axis=-1, keepdims=True
                ).astype(gr_ref.dtype)
        for d in range(3):
            gt_ref[0, :, d : d + 1] += -jnp.sum(
                goptg[d], axis=-1, keepdims=True
            ).astype(gt_ref.dtype)

        # attention-weight gradient from all three aggregations
        g_a = jnp.dot(go_h.astype(v_h.dtype), v_h.T, preferred_element_type=F32)
        for c in range(3):
            g_a = g_a + jnp.dot(goptg[c], vg[c].T, preferred_element_type=F32)
        g_a = g_a + jnp.sum(gopair_h[:, None, :] * pz, axis=-1)

        gkv_ref[0, :, 2 * h * C + C : 2 * h * C + 2 * C] = jnp.dot(
            a_c.T, go_h.astype(v_h.dtype), preferred_element_type=F32
        ).astype(gkv_ref.dtype)
        gvg = [jnp.dot(at, goptg[c], preferred_element_type=F32) for c in range(3)]
        gpz_ref[0] += (a[:, :, None] * gopair_h[:, None, :]).astype(gpz_ref.dtype)

        # softmax backward
        gs = a * (g_a - jnp.sum(a * g_a, axis=-1, keepdims=True))
        gst = gs.T
        gbias_ref[0, h] = (gs * s2).astype(gbias_ref.dtype)
        gq_ref[0, :, h * C : (h + 1) * C] = (
            jnp.dot(gs.astype(k_h.dtype), k_h, preferred_element_type=F32) * s1
        ).astype(gq_ref.dtype)
        gkv_ref[0, :, 2 * h * C : 2 * h * C + C] = (
            jnp.dot(gst.astype(q_h.dtype), q_h, preferred_element_type=F32) * s1
        ).astype(gkv_ref.dtype)

        # point-distance backward: e -= 0.5*(qsq_i + ksq_j - 2 qg.kg^T)
        rowsum = jnp.sum(gs, axis=-1, keepdims=True)       # (L, 1)
        colsum = jnp.sum(gst, axis=-1, keepdims=True)
        gqg = [
            -rowsum * qg[c] + jnp.dot(gs, kg[c], preferred_element_type=F32)
            for c in range(3)
        ]
        gkg = [
            -colsum * kg[c] + jnp.dot(gst, qg[c], preferred_element_type=F32)
            for c in range(3)
        ]

        # per-head point-weight gradient (qg = sw*u): sum(g.qg + g.kg)/sw
        gsw_h = jnp.zeros((1, 1), F32)
        for c in range(3):
            gsw_h = gsw_h + jnp.sum(gqg[c] * qg[c]) + jnp.sum(gkg[c] * kg[c])
        gsw_ref[0:1, h : h + 1] = (gsw_h / sw_h).astype(gsw_ref.dtype)

        # forward-transform backward: u_c = sum_d R[c,d] x_d + t_c (x local)
        def tfm_bwd(gu, xs, out_ref, lo, scale):
            for d in range(3):
                gx_d = (rcol(0, d) * gu[0] + rcol(1, d) * gu[1]
                        + rcol(2, d) * gu[2]) * scale
                out_ref[0, h, d, :, lo:lo + gx_d.shape[-1]] = gx_d.astype(
                    out_ref.dtype
                )
            for c in range(3):
                gt_ref[0, :, c : c + 1] += (
                    jnp.sum(gu[c], axis=-1, keepdims=True) * scale
                ).astype(gt_ref.dtype)
                for d in range(3):
                    gr_ref[0, :, 3 * c + d : 3 * c + d + 1] += (
                        jnp.sum(xs[d] * gu[c], axis=-1, keepdims=True) * scale
                    ).astype(gr_ref.dtype)

        tfm_bwd(gqg, xq, gqp_ref, 0, sw_h)
        tfm_bwd(gkg, xk, gkvp_ref, 0, sw_h)
        tfm_bwd(gvg, xv, gkvp_ref, Pq, 1.0)


def fused_ipa2_bwd(q, kv, qp, kvp, r9, t, bias, pz, maskb, sw,
                   go, goptl, gnorm, gopair, eps: float = 1e-8,
                   interpret: bool | None = None):
    interpret = resolve_interpret(interpret)
    H, C, Pq, Pv, L = _dims(q, qp, kvp)
    B = q.shape[0]
    CZ4 = pz.shape[-1]
    s1 = float(1.0 / (3 * C) ** 0.5)
    s2 = float(1.0 / 3.0 ** 0.5)

    kernel = functools.partial(
        _bwd_kernel, H=H, C=C, Pq=Pq, Pv=Pv, CZ4=CZ4, s1=s1, s2=s2, eps=eps
    )

    def row(shape):
        n = len(shape)
        return pl.BlockSpec((1,) + shape, lambda b, _n=n: (b,) + (0,) * _n)

    out_shapes = (
        jax.ShapeDtypeStruct((B, L, H * C), F32),            # g_q
        jax.ShapeDtypeStruct((B, L, 2 * H * C), F32),        # g_kv
        jax.ShapeDtypeStruct((B, H, 3, L, Pq), F32),         # g_qp
        jax.ShapeDtypeStruct((B, H, 3, L, Pq + Pv), F32),    # g_kvp
        jax.ShapeDtypeStruct((B, L, 9), F32),                # g_r9
        jax.ShapeDtypeStruct((B, L, 3), F32),                # g_t
        jax.ShapeDtypeStruct((B, H, L, L), F32),             # g_bias
        jax.ShapeDtypeStruct((B, L, L, CZ4), F32),           # g_pz
        jax.ShapeDtypeStruct((B, H), F32),                   # g_sw partials
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            row((L, H * C)), row((L, 2 * H * C)),
            row((H, 3, L, Pq)), row((H, 3, L, Pq + Pv)),
            row((L, 9)), row((L, 3)),
            row((H, L, L)), row((L, L, CZ4)), row((1, L)),
            pl.BlockSpec((1, H), lambda b: (0, 0), memory_space=pltpu.SMEM),
            row((L, H * C)), row((L, 3 * H * Pv)),
            row((L, H * Pv)), row((L, H * CZ4)),
        ],
        out_specs=(
            row((L, H * C)), row((L, 2 * H * C)),
            row((H, 3, L, Pq)), row((H, 3, L, Pq + Pv)),
            row((L, 9)), row((L, 3)),
            row((H, L, L)), row((L, L, CZ4)),
            pl.BlockSpec((1, H), lambda b: (b, 0)),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(q, kv, qp, kvp, r9, t, bias, pz, maskb, sw, go, goptl, gnorm, gopair)


# ---------------------------------------------------------------- custom vjp
@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_ipa2_vjp(q, kv, qp, kvp, r9, t, bias, pz, maskb, sw, eps=1e-8,
                   interpret=None):
    return fused_ipa2(q, kv, qp, kvp, r9, t, bias, pz, maskb, sw, eps=eps,
                      interpret=interpret)


def _vjp_fwd(q, kv, qp, kvp, r9, t, bias, pz, maskb, sw, eps, interpret):
    out = fused_ipa2(q, kv, qp, kvp, r9, t, bias, pz, maskb, sw, eps=eps,
                     interpret=interpret)
    return out, (q, kv, qp, kvp, r9, t, bias, pz, maskb, sw)


def _vjp_bwd(eps, interpret, res, g):
    q, kv, qp, kvp, r9, t, bias, pz, maskb, sw = res
    go, goptl, gnorm, gopair = g
    gq, gkv, gqp, gkvp, gr9, gt, gbias, gpz, gsw = fused_ipa2_bwd(
        q, kv, qp, kvp, r9, t, bias, pz, maskb, sw,
        go, goptl, gnorm, gopair, eps=eps, interpret=interpret,
    )
    gq = gq.astype(q.dtype)
    gkv = gkv.astype(kv.dtype)
    gqp = gqp.astype(qp.dtype)
    gkvp = gkvp.astype(kvp.dtype)
    gbias = gbias.astype(bias.dtype)
    gpz = gpz.astype(pz.dtype)
    # maskb is a 0/-inf gate: no gradient. g_sw sums its per-batch partials.
    return (gq, gkv, gqp, gkvp, gr9.astype(r9.dtype), gt.astype(t.dtype),
            gbias, gpz, None, jnp.sum(gsw, axis=0, keepdims=True).astype(sw.dtype))


fused_ipa2_vjp.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------- jnp twin
def ipa2_reference(q, kv, qp, kvp, r9, t, bias, pz, maskb, sw, eps=1e-8):
    """jnp twin (numerics oracle for tests; differentiable)."""
    H, C, Pq, Pv, L = _dims(q, qp, kvp)
    B = q.shape[0]
    CZ4 = pz.shape[-1]
    s1 = 1.0 / (3 * C) ** 0.5
    s2 = 1.0 / 3.0 ** 0.5

    R = r9.reshape(B, L, 3, 3).astype(F32)
    qh = q.reshape(B, L, H, C)
    kvh = kv.reshape(B, L, H, 2 * C)
    kh, vh = kvh[..., :C], kvh[..., C:]

    def to_global(x, scale):  # x: (B, H, 3, L, P)
        g = jnp.einsum("blcd,bhdlp->bhclp", R, x.astype(F32))
        g = g + t.astype(F32).transpose(0, 2, 1)[:, None, :, :, None]
        return g * scale  # (B, H, 3, L, P)

    swb = sw[0][None, :, None, None, None]
    qg = to_global(qp, swb)
    kg = to_global(kvp[..., :Pq], swb)
    vg = to_global(kvp[..., Pq:], 1.0)

    a = jnp.einsum("blhc,bmhc->bhlm", qh.astype(F32), kh.astype(F32)) * s1
    a = a + bias.astype(F32) * s2
    q_sq = jnp.sum(jnp.square(qg), axis=(2, 4))  # (B, H, L)
    k_sq = jnp.sum(jnp.square(kg), axis=(2, 4))
    qk = jnp.einsum("bhclp,bhcmp->bhlm", qg, kg)
    a = a - 0.5 * (q_sq[..., :, None] + k_sq[..., None, :] - 2 * qk)
    a = a + maskb[:, :, None, :]
    a = jax.nn.softmax(a, axis=-1)

    o = jnp.einsum("bhlm,bmhc->blhc", a.astype(vh.dtype), vh,
                   preferred_element_type=F32).reshape(B, L, H * C)
    optg = jnp.einsum("bhlm,bhcmp->bhclp", a, vg)
    dif = optg - t.astype(F32).transpose(0, 2, 1)[:, None, :, :, None]
    optl = jnp.einsum("bldc,bhdlp->bhclp", R, dif)  # R^T (g - t)
    norm = jnp.sqrt(jnp.sum(jnp.square(optl), axis=2) + eps)  # (B, H, L, Pv)
    opair = jnp.einsum("bhlm,blmd->blhd", a, pz.astype(F32)).reshape(
        B, L, H * CZ4
    )
    optl_out = optl.transpose(0, 3, 2, 1, 4).reshape(B, L, 3 * H * Pv)
    norm_out = norm.transpose(0, 2, 1, 3).reshape(B, L, H * Pv)
    return o.astype(F32), optl_out, norm_out, opair
