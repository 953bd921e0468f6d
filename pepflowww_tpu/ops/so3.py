"""SO(3) manifold ops for the rotation flow.

Pure-JAX, fully vmappable/jittable re-implementations of the live subset of the
reference's rotation library (`data/so3_utils.py` in Ced3-han/PepFlowww):
exp/log maps with Taylor-series small-angle handling and the three-case
(theta≈0 / theta≈pi / generic) logarithm, the geodesic interpolant used by the
flow, and uniform SO(3) sampling.

All branches are mask-based `jnp.where` selects — there is no data-dependent
control flow, so everything compiles to straight-line XLA and runs on the VPU.
Rotations are 3x3 matrices end-to-end (fp32).

Reference parity targets (file:line in /root/reference):
    rotvec_to_rotmat    data/so3_utils.py:143-165 (skew_matrix_exponential_map :88-141)
    rotmat_to_rotvec    data/so3_utils.py:167-254
    angle_from_rotmat   data/so3_utils.py:257-283
    calc_rot_vf         data/so3_utils.py:486-497
    geodesic_t          data/so3_utils.py:500-520
    uniform_so3         pepflow/modules/so3/dist.py:40-45 (scipy Rotation.random)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# 3x3 rotation algebra must stay exact even on TPU (default matmul precision
# is reduced there); these einsums are tiny, so full precision is free.
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

_TOL = 1e-7


def hat(v: jax.Array) -> jax.Array:
    """Map rotation vectors to skew matrices: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def vee(S: jax.Array) -> jax.Array:
    """Inverse of :func:`hat`: extract (x, y, z) from a skew matrix."""
    return jnp.stack([S[..., 2, 1], S[..., 0, 2], S[..., 1, 0]], axis=-1)


def _safe_norm(v: jax.Array, axis: int = -1) -> jax.Array:
    """Norm whose gradient is finite at v = 0 (sqrt(x) has an infinite slope
    there; NaN·0 from masked branches would otherwise poison the backward
    pass — the failure the reference patches with its per-step NaN-gradient
    rescue, train.py:136-139). Value error is ≤ 1e-12."""
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=axis) + 1e-24)


def rotvec_to_rotmat(rotvec: jax.Array, tol: float = _TOL) -> jax.Array:
    """Exponential map so(3) -> SO(3) via Rodrigues' formula.

    Uses the angle-absorbed form with 2nd-order Taylor fallbacks near zero so
    no division by the angle of an un-normalized axis is needed.
    """
    angles = _safe_norm(rotvec)
    K = hat(rotvec)

    a = angles[..., None, None]
    a_sq = jnp.square(a)
    # sin(x)/x and (1-cos(x))/x^2 with Taylor fallbacks near 0.
    small = jnp.abs(a) < tol
    safe_a = jnp.where(small, jnp.ones_like(a), a)
    sin_coeff = jnp.where(small, 1.0 - a_sq / 6.0, jnp.sin(safe_a) / safe_a)
    cos_coeff = jnp.where(small, 0.5 - a_sq / 24.0, (1.0 - jnp.cos(safe_a)) / jnp.square(safe_a))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=rotvec.dtype), K.shape)
    KK = _einsum("...ik,...kj->...ij", K, K)
    return eye + sin_coeff * K + cos_coeff * KK


def angle_from_rotmat(R: jax.Array):
    """Rotation angle (plus sin/cos) of a rotation matrix, via atan2.

    Returns (angles, sin, cos); sin derived from the skew part norm, cos from
    the trace, exactly as the reference does for numerical stability.
    """
    skew = R - jnp.swapaxes(R, -1, -2)
    sin = _safe_norm(vee(skew)) / 2.0
    cos = (jnp.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0
    angles = jnp.arctan2(sin, cos)
    return angles, sin, cos


def rotmat_to_rotvec(R: jax.Array) -> jax.Array:
    """Logarithmic map SO(3) -> so(3) with three-case branch handling.

    1) theta ≈ 0: Taylor expansion of theta / (2 sin theta).
    2) theta ≈ pi (|theta - pi| < 1e-2): outer-product relation
       w w^T = (I + R)/2 with sign recovery from the largest row.
    3) generic: theta / (2 sin theta) * vee(R - R^T).
    """
    angles, angles_sin, _ = angle_from_rotmat(R)
    vector = vee(R - jnp.swapaxes(R, -1, -2))

    # Case masks (match torch.isclose semantics: atol 1e-8 near zero, 1e-2 near pi).
    mask_zero = (jnp.abs(angles) <= 1e-8).astype(R.dtype)
    mask_pi = (jnp.abs(angles - jnp.pi) <= 1e-2).astype(R.dtype)
    mask_else = (1.0 - mask_zero) * (1.0 - mask_pi)

    numerator = mask_zero / 2.0 + angles * mask_else
    denominator = (
        (1.0 - angles**2 / 6.0) * mask_zero
        + 2.0 * angles_sin * mask_else
        + mask_pi
    )
    prefactor = numerator / denominator
    vector = vector * prefactor[..., None]

    # theta ≈ pi: recover the axis from ww^T = (I + R) / 2.
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    skew_outer = (eye + R) / 2.0
    # Clamp the diagonal to >= 0 before the square root.
    skew_outer = skew_outer + (jax.nn.relu(skew_outer) - skew_outer) * eye

    # Double-where keeps the sqrt gradient finite when a diagonal entry is 0
    # (axis component zero): the masked branch must not see sqrt'(0) = inf.
    diag = jnp.diagonal(skew_outer, axis1=-2, axis2=-1)
    diag_safe = jnp.where(diag > 1e-12, diag, 1.0)
    vector_pi = jnp.where(diag > 1e-12, jnp.sqrt(diag_safe), 0.0)

    # Signs from the row of ww^T with the largest norm (global phase fixed).
    signs_line_idx = jnp.argmax(jnp.linalg.norm(skew_outer, axis=-1), axis=-1)
    signs_line = jnp.take_along_axis(
        skew_outer, signs_line_idx[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    signs = jnp.sign(signs_line)

    vector_pi = vector_pi * angles[..., None] * signs
    return vector + vector_pi * mask_pi[..., None]


def rot_transpose(R: jax.Array) -> jax.Array:
    return jnp.swapaxes(R, -1, -2)


def rot_mult(R1: jax.Array, R2: jax.Array) -> jax.Array:
    return _einsum("...ij,...jk->...ik", R1, R2)


def calc_rot_vf(mat_t: jax.Array, mat_1: jax.Array) -> jax.Array:
    """Rotation vector field Log_{mat_t}(mat_1), as a rotation vector."""
    return rotmat_to_rotvec(rot_mult(rot_transpose(mat_t), mat_1))


def geodesic_t(t, mat: jax.Array, base_mat: jax.Array, rot_vf=None) -> jax.Array:
    """Geodesic interpolation R_t = base · Exp(t · Log(baseᵀ · mat)).

    `t` broadcasts against the rotation-vector (so pass shape (..., 1) to scale
    per-batch, matching the reference call sites where t is [B,1,1]).
    """
    if rot_vf is None:
        rot_vf = calc_rot_vf(base_mat, mat)
    mat_t = rotvec_to_rotmat(t * rot_vf)
    return _einsum("...ij,...jk->...ik", base_mat, mat_t)


def centered_gaussian(key: jax.Array, shape) -> jax.Array:
    """Gaussian point cloud centered over the length axis
    (pepflow/modules/so3/dist.py:35-38: noise minus its per-sample mean)."""
    noise = jax.random.normal(key, shape)
    return noise - jnp.mean(noise, axis=-2, keepdims=True)


def uniform_so3(key: jax.Array, shape=()) -> jax.Array:
    """Sample uniform rotations via normalized quaternions.

    Distributionally identical to the reference's scipy `Rotation.random`
    (which also samples unit quaternions); returns (*shape, 3, 3).
    """
    q = jax.random.normal(key, tuple(shape) + (4,))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )
    return R
