"""Rigid-frame algebra (rotation-matrix native).

Re-designs the reference's two frame stacks — the diffab-style helpers in
`pepflow/modules/common/geometry.py` and the quaternion-based OpenFold
`Rigid`/`Rotation` classes (`openfold/utils/rigid_utils.py`) — as a single
matrix-native functional API. The only quaternion the reference actually needs
on the live path is the (1, x, y, z) backbone update
(`rigid_utils.py:1039-1063` compose_q_update_vec), which is equivalent to a
right-multiplication by the rotation matrix of the normalized quaternion; we
implement it directly (`quat_1ijk_to_rotmat`, cf. geometry.py:257-275).

Frames are (R, t) pairs: R (..., 3, 3) column-basis matrices, t (..., 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Frame algebra is 3x3/3-vector math; keep it in full precision on TPU.
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def safe_normalize(v: jax.Array, axis: int = -1, eps: float = 1e-6) -> jax.Array:
    """v / (|v| + eps) — matches reference normalize_vector (geometry.py:74).

    The norm itself is computed gradient-safely (sqrt has infinite slope at 0;
    degenerate padded rows would otherwise emit NaN·0 = NaN in backward).
    """
    n = jnp.sqrt(jnp.sum(jnp.square(v), axis=axis, keepdims=True) + 1e-24)
    return v / (n + eps)


def project_v2v(v: jax.Array, e: jax.Array, axis: int = -1) -> jax.Array:
    """Project `v` onto unit vector `e` (geometry.py:78-86)."""
    return jnp.sum(e * v, axis=axis, keepdims=True) * e


def construct_3d_basis(center: jax.Array, p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Gram–Schmidt frame from three points (CA, C, N).

    Returns (..., 3, 3) with columns [e1, e2, e3] (geometry.py:89-111).
    """
    v1 = p1 - center
    e1 = safe_normalize(v1)
    v2 = p2 - center
    u2 = v2 - project_v2v(v2, e1)
    e2 = safe_normalize(u2)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3], axis=-1)


def local_to_global(R: jax.Array, t: jax.Array, p: jax.Array) -> jax.Array:
    """q = R p + t. R: (..., 3, 3); t: (..., 3); p: (..., *, 3) with the extra
    point axes broadcast against the frame batch (geometry.py:114-133)."""
    q = _einsum("...ij,...pj->...pi", R, p.reshape(p.shape[:len(R.shape) - 2] + (-1, 3)))
    q = q + t[..., None, :]
    return q.reshape(p.shape)


def global_to_local(R: jax.Array, t: jax.Array, q: jax.Array) -> jax.Array:
    """p = Rᵀ (q - t) (geometry.py:136-155)."""
    qf = q.reshape(q.shape[:len(R.shape) - 2] + (-1, 3))
    p = _einsum("...ji,...pj->...pi", R, qf - t[..., None, :])
    return p.reshape(q.shape)


def apply_rotation(R: jax.Array, p: jax.Array) -> jax.Array:
    """Rotate points without translation."""
    return local_to_global(R, jnp.zeros(R.shape[:-2] + (3,), R.dtype), p)


def compose(R1: jax.Array, t1: jax.Array, R2: jax.Array, t2: jax.Array):
    """Frame composition: (R1 R2, R1 t2 + t1) (geometry.py:162-173)."""
    R_new = _einsum("...ij,...jk->...ik", R1, R2)
    t_new = _einsum("...ij,...j->...i", R1, t2) + t1
    return R_new, t_new


def compose_chain(Ts):
    """Right-fold composition of a list of (R, t) frames (geometry.py:176-182)."""
    Ts = list(Ts)
    while len(Ts) >= 2:
        R1, t1 = Ts[-2]
        R2, t2 = Ts[-1]
        Ts = Ts[:-2] + [compose(R1, t1, R2, t2)]
    return Ts[0]


def quat_1ijk_to_rotmat(q: jax.Array) -> jax.Array:
    """Rotation matrix of the normalized quaternion (1, b, c, d).

    Matches geometry.py:257-275 and, composed on the right, the OpenFold
    quaternion update `quats + quat_multiply_by_vec(quats, vec)` followed by
    normalization (rigid_utils.py:587-616): R(q·(1,v)) = R(q) R((1,v)/|..|).
    """
    b, c, d = q[..., 0], q[..., 1], q[..., 2]
    s = jnp.sqrt(1.0 + b * b + c * c + d * d)
    a, b, c, d = 1.0 / s, b / s, c / s, d / s
    row0 = jnp.stack([a * a + b * b - c * c - d * d, 2 * b * c - 2 * a * d, 2 * b * d + 2 * a * c], axis=-1)
    row1 = jnp.stack([2 * b * c + 2 * a * d, a * a - b * b + c * c - d * d, 2 * c * d - 2 * a * b], axis=-1)
    row2 = jnp.stack([2 * b * d - 2 * a * c, 2 * c * d + 2 * a * b, a * a - b * b - c * c + d * d], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def compose_q_update(R: jax.Array, t: jax.Array, update: jax.Array, update_mask=None):
    """Apply a 6-D backbone update [(1,x,y,z) quat | translation].

    Semantics of Rigid.compose_q_update_vec (rigid_utils.py:1039-1063):
        R_new = R · R((1, x, y, z))        (masked: R unchanged where mask=0)
        t_new = t + R · t_vec              (masked: update zeroed)
    """
    q_vec, t_vec = update[..., :3], update[..., 3:]
    R_upd = _einsum("...ij,...jk->...ik", R, quat_1ijk_to_rotmat(q_vec))
    t_upd = _einsum("...ij,...j->...i", R, t_vec)
    if update_mask is not None:
        m = update_mask[..., None]
        R_new = jnp.where(m[..., None], R_upd, R)
        t_new = t + t_upd * m
    else:
        R_new, t_new = R_upd, t + t_upd
    return R_new, t_new


def repr_6d_to_rotmat(x: jax.Array) -> jax.Array:
    """6-D rotation representation -> rotation matrix (geometry.py:278-293)."""
    a1, a2 = x[..., 0:3], x[..., 3:6]
    b1 = safe_normalize(a1)
    b2 = safe_normalize(a2 - project_v2v(a2, b1))
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def kabsch_align(pos_1: jax.Array, pos_2: jax.Array, weights: jax.Array):
    """Weighted Kabsch: rigidly align pos_1 onto pos_2.

    Args:
        pos_1, pos_2: (..., N, 3)
        weights: (..., N) nonnegative; zero entries are excluded.
    Returns:
        (pos_1_aligned, R, t) with pos_1_aligned = pos_1 @ Rᵀ + t.

    Masked-weight re-design of geometry.py:18-56 (which uses masked_select and
    therefore dynamic shapes); mathematically identical for 0/1 weights.
    """
    w = weights[..., None]
    wsum = jnp.sum(w, axis=-2, keepdims=True) + 1e-8
    mu1 = jnp.sum(pos_1 * w, axis=-2, keepdims=True) / wsum
    mu2 = jnp.sum(pos_2 * w, axis=-2, keepdims=True) / wsum
    x = (pos_1 - mu1) * w
    y = (pos_2 - mu2) * w
    S = _einsum("...ni,...nj->...ij", x, y)
    u, _, vt = jnp.linalg.svd(S, full_matrices=False)
    # Proper rotation: flip the last column of u if det < 0.
    det = jnp.linalg.det(_einsum("...ij,...jk->...ik", jnp.swapaxes(vt, -1, -2), jnp.swapaxes(u, -1, -2)))
    flip = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    u = u * flip[..., None, :]
    R = _einsum("...ji,...kj->...ik", vt, u)  # vtᵀ @ uᵀ
    t = mu2 - _einsum("...ij,...nj->...ni", R, mu1)
    aligned = _einsum("...ij,...nj->...ni", R, pos_1) + t
    return aligned, R, t
