"""Plane-form (rot9) vs matrix-form (so3/frames) parity.

rot9 re-expresses the same formulas on (B, L) slabs; agreement is up to fp
reassociation only, so tolerances are ~1e-5 absolute on unit-scale values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pepflowww_tpu.ops import frames, rot9, so3


def _rand_rots(key, shape):
    R = so3.uniform_so3(key, shape)
    return R


@pytest.fixture(scope="module")
def rots():
    key = jax.random.PRNGKey(0)
    R = _rand_rots(key, (4, 8))
    # include exact identity (theta=0) and a near-pi rotation in the batch
    R = R.at[0, 0].set(jnp.eye(3))
    axis = jnp.array([1.0, 2.0, -0.5])
    axis = axis / jnp.linalg.norm(axis)
    near_pi = so3.rotvec_to_rotmat((np.pi - 1e-4) * axis)
    R = R.at[0, 1].set(near_pi)
    return R


def test_roundtrip(rots):
    r9 = rot9.to9(rots)
    np.testing.assert_array_equal(np.asarray(rot9.from9(r9)), np.asarray(rots))


def test_compose_transpose(rots):
    R2 = _rand_rots(jax.random.PRNGKey(1), rots.shape[:-2])
    got = rot9.from9(rot9.compose(rot9.to9(rots), rot9.to9(R2)))
    want = so3.rot_mult(rots, R2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    gotT = rot9.from9(rot9.transpose(rot9.to9(rots)))
    np.testing.assert_array_equal(np.asarray(gotT), np.asarray(so3.rot_transpose(rots)))


def test_log_map_matches_so3(rots):
    want = so3.rotmat_to_rotvec(rots)
    vx, vy, vz = rot9.rot9_to_rotvec(rot9.to9(rots))
    got = jnp.stack([vx, vy, vz], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_exp_map_matches_so3():
    v = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 3)) * 2.0
    v = v.at[0, 0].set(jnp.zeros(3))
    v = v.at[0, 1].set(jnp.array([1e-9, 0.0, 0.0]))
    want = so3.rotvec_to_rotmat(v)
    got = rot9.from9(rot9.rotvec_to_rot9(v[..., 0], v[..., 1], v[..., 2]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_geodesic_matches_so3(rots):
    base = _rand_rots(jax.random.PRNGKey(3), rots.shape[:-2])
    t = 0.37
    want = so3.geodesic_t(t, rots, base)
    got = rot9.from9(rot9.geodesic_t(t, rot9.to9(rots), rot9.to9(base)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_geodesic_per_batch_t(rots):
    base = _rand_rots(jax.random.PRNGKey(4), rots.shape[:-2])
    tb = jnp.linspace(0.1, 0.9, rots.shape[0])[:, None]  # (B, 1) per-batch t
    want = so3.geodesic_t(tb[..., None], rots, base)
    got = rot9.from9(rot9.geodesic_t(tb, rot9.to9(rots), rot9.to9(base)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_compose_q_update_matches_frames(rots):
    B, L = rots.shape[:2]
    t = jax.random.normal(jax.random.PRNGKey(5), (B, L, 3))
    upd = jax.random.normal(jax.random.PRNGKey(6), (B, L, 6)) * 0.3
    mask = (jax.random.uniform(jax.random.PRNGKey(7), (B, L)) > 0.3).astype(jnp.float32)
    wantR, wantT = frames.compose_q_update(rots, t, upd, update_mask=mask)
    r9, t3 = rot9.compose_q_update(rot9.to9(rots), rot9.t_to3(t), upd, update_mask=mask)
    np.testing.assert_allclose(np.asarray(rot9.from9(r9)), np.asarray(wantR), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rot9.t_from3(t3)), np.asarray(wantT), atol=1e-6)


def test_rotate_points_matches_frames(rots):
    B, L = rots.shape[:2]
    t = jax.random.normal(jax.random.PRNGKey(8), (B, L, 3))
    n = 10
    flat = jax.random.normal(jax.random.PRNGKey(9), (B, L, 3 * n))
    # reference packing [x | y | z] -> (B, L, n, 3) points
    pts = jnp.swapaxes(flat.reshape(B, L, 3, n), -1, -2)
    want = frames.local_to_global(rots, t, pts)
    gx, gy, gz = rot9.rotate_points(rot9.to9(rots), rot9.t_to3(t), flat)
    got = jnp.stack([gx, gy, gz], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # inverse
    loc = frames.global_to_local(rots, t, want)
    lx, ly, lz = rot9.unrotate_points(rot9.to9(rots), rot9.t_to3(t), gx, gy, gz)
    got_loc = jnp.stack([lx, ly, lz], axis=-1)
    np.testing.assert_allclose(np.asarray(got_loc), np.asarray(loc), atol=1e-5)


def test_log_map_near_pi_cases():
    """Sweep axes through the pi-case including zero-component axes."""
    axes = jnp.array([
        [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
        [1.0, 1.0, 0.0], [-1.0, 2.0, 3.0], [0.0, -1.0, 1.0],
    ])
    axes = axes / jnp.linalg.norm(axes, axis=-1, keepdims=True)
    for ang in (np.pi - 1e-3, np.pi - 1e-5, np.pi):
        R = so3.rotvec_to_rotmat(ang * axes)
        want = so3.rotmat_to_rotvec(R)
        vx, vy, vz = rot9.rot9_to_rotvec(rot9.to9(R))
        got = jnp.stack([vx, vy, vz], axis=-1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                                   err_msg=f"angle={ang}")
