"""Slab-form SO(3)/frame algebra for the denoiser hot loop.

TPU layout problem this module solves: a ``(B, L, 3, 3)`` rotation tensor gets
``T(4,128)`` tiling — 9 of 512 tile slots used — so every frame op in the
sampler's 100-step scan moves ~28x more HBM bytes than its logical size
(measured 0.04-0.07 ms per op at B=L=64; PERF.md round-4 section). Here a
rotation is instead a tuple of nine ``(B, L)`` "plane" arrays (row-major:
``r[3*i+j] == R[..., i, j]``) and a translation a tuple of three planes; every
op becomes a handful of full-lane ``(B, L)`` VPU multiplies that XLA fuses.
Measured 2x on the compose+geodesic chain and it removes the pathological
layouts entirely.

Semantics mirror :mod:`pepflowww_tpu.ops.so3` and
:mod:`pepflowww_tpu.ops.frames` term-for-term (same Taylor switches, same
three-case log map with the reference's tolerances, same eps constants) so the
two forms agree to fp reassociation error (~1e-6; tests/test_rot9.py). The
reference implements all of this on (…, 3, 3) torch tensors
(/root/reference/data/so3_utils.py:143-254, 486-520;
openfold/utils/rigid_utils.py:1039-1063) — the math is identical, only the
memory layout is TPU-native.

Conventions:
    r9: tuple of 9 arrays, shape (...,), row-major.
    t3: tuple of 3 arrays, shape (...,).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TOL = 1e-7


# ---------------------------------------------------------------- conversions
def to9(R: jax.Array):
    """(..., 3, 3) -> 9-tuple of (...,) planes."""
    return tuple(R[..., i, j] for i in range(3) for j in range(3))


def from9(r9) -> jax.Array:
    """9-tuple of (...,) planes -> (..., 3, 3)."""
    rows = [jnp.stack(r9[3 * i:3 * i + 3], axis=-1) for i in range(3)]
    return jnp.stack(rows, axis=-2)


def t_to3(t: jax.Array):
    """(..., 3) -> 3-tuple of (...,) planes."""
    return (t[..., 0], t[..., 1], t[..., 2])


def t_from3(t3) -> jax.Array:
    return jnp.stack(t3, axis=-1)


# ------------------------------------------------------------------- algebra
def compose(a, b):
    """Matrix product a @ b in plane form (27 fused VPU multiplies)."""
    return tuple(
        a[3 * i + 0] * b[0 + j] + a[3 * i + 1] * b[3 + j] + a[3 * i + 2] * b[6 + j]
        for i in range(3) for j in range(3)
    )


def transpose(a):
    return tuple(a[3 * j + i] for i in range(3) for j in range(3))


def where(mask: jax.Array, a, b):
    """Per-element select between two plane tuples; mask shape (...,)."""
    return tuple(jnp.where(mask, x, y) for x, y in zip(a, b))


def apply(r9, v3):
    """Rotate a 3-tuple of planes: (R v)."""
    return tuple(
        r9[3 * d + 0] * v3[0] + r9[3 * d + 1] * v3[1] + r9[3 * d + 2] * v3[2]
        for d in range(3)
    )


def quat_1ijk_to_rot9(b: jax.Array, c: jax.Array, d: jax.Array):
    """Plane form of frames.quat_1ijk_to_rotmat (rigid_utils.py:1039-1063)."""
    s = jnp.sqrt(1.0 + b * b + c * c + d * d)
    a, b, c, d = 1.0 / s, b / s, c / s, d / s
    return (
        a * a + b * b - c * c - d * d, 2 * b * c - 2 * a * d, 2 * b * d + 2 * a * c,
        2 * b * c + 2 * a * d, a * a - b * b + c * c - d * d, 2 * c * d - 2 * a * b,
        2 * b * d - 2 * a * c, 2 * c * d + 2 * a * b, a * a - b * b - c * c + d * d,
    )


def compose_q_update(r9, t3, update: jax.Array, update_mask=None):
    """Plane form of frames.compose_q_update: 6-D [(1,x,y,z) quat | trans]."""
    q9 = quat_1ijk_to_rot9(update[..., 0], update[..., 1], update[..., 2])
    r_upd = compose(r9, q9)
    tv = (update[..., 3], update[..., 4], update[..., 5])
    t_upd = apply(r9, tv)
    if update_mask is not None:
        m = update_mask
        r_new = where(m > 0.5 if m.dtype != jnp.bool_ else m, r_upd, r9)
        t_new = tuple(t + u * m for t, u in zip(t3, t_upd))
    else:
        r_new = r_upd
        t_new = tuple(t + u for t, u in zip(t3, t_upd))
    return r_new, t_new


# ---------------------------------------------------------------- point maps
def rotate_points(r9, t3, flat: jax.Array, translate: bool = True):
    """Local->global points, coordinate-major packing.

    ``flat``: (..., 3N) packed [x-block | y-block | z-block] — exactly the
    reference's point-projection layout (ipa_pytorch.py:362-366). Returns
    three (..., N) slabs (gx, gy, gz). The lane slices fuse into the multiply
    fusion (no relayout).
    """
    n = flat.shape[-1] // 3
    x, y, z = flat[..., :n], flat[..., n:2 * n], flat[..., 2 * n:]
    out = []
    for d in range(3):
        g = (r9[3 * d + 0][..., None] * x + r9[3 * d + 1][..., None] * y
             + r9[3 * d + 2][..., None] * z)
        if translate:
            g = g + t3[d][..., None]
        out.append(g)
    return out[0], out[1], out[2]


def unrotate_points(r9, t3, gx: jax.Array, gy: jax.Array, gz: jax.Array):
    """Global->local: p = Rᵀ (q - t); slabs in, slabs out."""
    dx = gx - t3[0][..., None]
    dy = gy - t3[1][..., None]
    dz = gz - t3[2][..., None]
    return tuple(
        r9[0 + d][..., None] * dx + r9[3 + d][..., None] * dy + r9[6 + d][..., None] * dz
        for d in range(3)
    )


# --------------------------------------------------------------- SO(3) flows
def _safe_norm3(x, y, z):
    return jnp.sqrt(x * x + y * y + z * z + 1e-24)


def rotvec_to_rot9(vx: jax.Array, vy: jax.Array, vz: jax.Array, tol: float = _TOL):
    """Plane form of so3.rotvec_to_rotmat (Rodrigues with Taylor fallbacks)."""
    a = _safe_norm3(vx, vy, vz)
    a_sq = jnp.square(a)
    small = jnp.abs(a) < tol
    safe_a = jnp.where(small, jnp.ones_like(a), a)
    sin_c = jnp.where(small, 1.0 - a_sq / 6.0, jnp.sin(safe_a) / safe_a)
    cos_c = jnp.where(small, 0.5 - a_sq / 24.0,
                      (1.0 - jnp.cos(safe_a)) / jnp.square(safe_a))
    zero = jnp.zeros_like(vx)
    K = (zero, -vz, vy, vz, zero, -vx, -vy, vx, zero)
    KK = compose(K, K)
    eye = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    return tuple(eye[i] + sin_c * K[i] + cos_c * KK[i] for i in range(9))


def angle_from_rot9(r9):
    """Plane form of so3.angle_from_rotmat: (angle, sin, cos)."""
    sx = r9[7] - r9[5]   # vee(R - Rᵀ)
    sy = r9[2] - r9[6]
    sz = r9[3] - r9[1]
    sin = _safe_norm3(sx, sy, sz) / 2.0
    cos = (r9[0] + r9[4] + r9[8] - 1.0) / 2.0
    return jnp.arctan2(sin, cos), sin, cos


def rot9_to_rotvec(r9):
    """Plane form of so3.rotmat_to_rotvec — three-case log map with the
    reference's tolerances (theta≈0 atol 1e-8, theta≈pi atol 1e-2) and the
    same double-where sqrt guard on the pi-case diagonal."""
    angles, angles_sin, _ = angle_from_rot9(r9)
    vx = r9[7] - r9[5]
    vy = r9[2] - r9[6]
    vz = r9[3] - r9[1]

    dtype = vx.dtype
    mask_zero = (jnp.abs(angles) <= 1e-8).astype(dtype)
    mask_pi = (jnp.abs(angles - jnp.pi) <= 1e-2).astype(dtype)
    mask_else = (1.0 - mask_zero) * (1.0 - mask_pi)

    numerator = mask_zero / 2.0 + angles * mask_else
    denominator = (
        (1.0 - angles ** 2 / 6.0) * mask_zero + 2.0 * angles_sin * mask_else + mask_pi
    )
    pf = numerator / denominator
    vx, vy, vz = vx * pf, vy * pf, vz * pf

    # theta ≈ pi: ww^T = (I + R)/2 with relu-clamped diagonal; sqrt is
    # double-where'd so the masked branch never sees sqrt'(0) = inf (exactly
    # so3.rotmat_to_rotvec). Off-diagonals stay the raw (eye + R)/2 entries.
    o01, o02, o10 = r9[1] / 2.0, r9[2] / 2.0, r9[3] / 2.0
    o12, o20, o21 = r9[5] / 2.0, r9[6] / 2.0, r9[7] / 2.0
    d0 = jax.nn.relu((1.0 + r9[0]) / 2.0)
    d1 = jax.nn.relu((1.0 + r9[4]) / 2.0)
    d2 = jax.nn.relu((1.0 + r9[8]) / 2.0)
    comps = []
    for di in (d0, d1, d2):
        safe = jnp.where(di > 1e-12, di, 1.0)
        comps.append(jnp.where(di > 1e-12, jnp.sqrt(safe), 0.0))

    # Row of ww^T with the largest norm (first-max, matching argmax), signs.
    n0 = jnp.sqrt(d0 * d0 + o01 * o01 + o02 * o02)
    n1 = jnp.sqrt(o10 * o10 + d1 * d1 + o12 * o12)
    n2 = jnp.sqrt(o20 * o20 + d2 * d2 + o21 * o21)
    pick0 = jnp.logical_and(n0 >= n1, n0 >= n2)
    pick1 = jnp.logical_and(jnp.logical_not(pick0), n1 >= n2)
    line0 = jnp.where(pick0, d0, jnp.where(pick1, o10, o20))
    line1 = jnp.where(pick0, o01, jnp.where(pick1, d1, o21))
    line2 = jnp.where(pick0, o02, jnp.where(pick1, o12, d2))
    signs = (jnp.sign(line0), jnp.sign(line1), jnp.sign(line2))

    pi_x = comps[0] * angles * signs[0]
    pi_y = comps[1] * angles * signs[1]
    pi_z = comps[2] * angles * signs[2]
    return (vx + pi_x * mask_pi, vy + pi_y * mask_pi, vz + pi_z * mask_pi)


def calc_rot_vf(rt9, r19):
    """Log_{R_t}(R_1) as a rotation-vector 3-tuple (so3.calc_rot_vf)."""
    return rot9_to_rotvec(compose(transpose(rt9), r19))


def geodesic_t(t, mat9, base9):
    """R_t = base · Exp(t · Log(baseᵀ · mat)) in plane form; `t` broadcasts
    against (...,) planes (pass shape (..., ) or a scalar)."""
    vx, vy, vz = calc_rot_vf(base9, mat9)
    return compose(base9, rotvec_to_rot9(t * vx, t * vy, t * vz))
