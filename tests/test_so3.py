"""Parity + invariant tests for SO(3) ops (vs data/so3_utils.py goldens)."""

import jax
import jax.numpy as jnp
import numpy as np

from pepflowww_tpu.ops import so3


def test_rotvec_to_rotmat_parity(golden):
    g = golden("so3")
    out = np.asarray(so3.rotvec_to_rotmat(jnp.asarray(g["vecs"])))
    np.testing.assert_allclose(out, g["exp_of_vec"], atol=2e-6)


def test_rotmat_to_rotvec_parity(golden):
    g = golden("so3")
    out = np.asarray(so3.rotmat_to_rotvec(jnp.asarray(g["mats"])))
    ref = g["rotvec"]
    # Near-pi axes can differ in global sign between implementations only if
    # the sign-reference row differs; compare rotations, not raw vectors.
    R_out = np.asarray(so3.rotvec_to_rotmat(jnp.asarray(out)))
    R_ref = np.asarray(so3.rotvec_to_rotmat(jnp.asarray(ref)))
    np.testing.assert_allclose(R_out, R_ref, atol=5e-5)
    # And away from pi the vectors must agree elementwise.
    angles = np.linalg.norm(ref, axis=-1)
    generic = angles < np.pi - 1e-2
    np.testing.assert_allclose(out[generic], ref[generic], atol=2e-5)


def test_log_exp_roundtrip(golden):
    g = golden("so3")
    vec = so3.rotmat_to_rotvec(jnp.asarray(g["mats"]))
    R = so3.rotvec_to_rotmat(vec)
    np.testing.assert_allclose(np.asarray(R), g["roundtrip"], atol=5e-5)
    # exp(log(R)) == R holds tightly away from pi; near pi the outer-product
    # log loses precision identically in both implementations (golden matches).
    angles = np.linalg.norm(g["rotvec"], axis=-1)
    generic = angles < np.pi - 1e-2
    np.testing.assert_allclose(np.asarray(R)[generic], g["mats"][generic], atol=5e-4)


def test_calc_rot_vf_parity(golden):
    g = golden("so3")
    out = so3.calc_rot_vf(jnp.asarray(g["base"]), jnp.asarray(g["mats"]))
    out_R = np.asarray(so3.rotvec_to_rotmat(out))
    ref_R = np.asarray(so3.rotvec_to_rotmat(jnp.asarray(g["vf"])))
    np.testing.assert_allclose(out_R, ref_R, atol=5e-5)


def test_geodesic_parity(golden):
    g = golden("so3")
    out = so3.geodesic_t(jnp.asarray(g["t"]), jnp.asarray(g["mats"]), jnp.asarray(g["base"]))
    np.testing.assert_allclose(np.asarray(out), g["geo"], atol=1e-4)


def test_geodesic_endpoints():
    key = jax.random.PRNGKey(0)
    R0 = so3.uniform_so3(key, (32,))
    R1 = so3.uniform_so3(jax.random.PRNGKey(1), (32,))
    at0 = so3.geodesic_t(0.0, R1, R0)
    at1 = so3.geodesic_t(1.0, R1, R0)
    np.testing.assert_allclose(np.asarray(at0), np.asarray(R0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(at1), np.asarray(R1), atol=1e-4)


def test_uniform_so3_is_rotation():
    R = so3.uniform_so3(jax.random.PRNGKey(0), (64,))
    RtR = jnp.einsum("...ji,...jk->...ik", R, R)
    np.testing.assert_allclose(np.asarray(RtR), np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), np.ones(64), atol=1e-5)


def test_jit_and_grad():
    f = jax.jit(lambda v: jnp.sum(so3.rotvec_to_rotmat(v)))
    g = jax.grad(f)(jnp.ones((4, 3)) * 0.3)
    assert np.all(np.isfinite(np.asarray(g)))
