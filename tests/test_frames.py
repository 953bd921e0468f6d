"""Parity tests for frame algebra (vs geometry.py / rigid_utils.py goldens)."""

import jax.numpy as jnp
import numpy as np

from pepflowww_tpu.ops import frames


def test_construct_3d_basis_parity(golden):
    g = golden("frames")
    R = frames.construct_3d_basis(
        jnp.asarray(g["center"]), jnp.asarray(g["p1"]), jnp.asarray(g["p2"])
    )
    np.testing.assert_allclose(np.asarray(R), g["R"], atol=1e-5)


def test_local_global_roundtrip_parity(golden):
    g = golden("frames")
    local = frames.global_to_local(
        jnp.asarray(g["R"]), jnp.asarray(g["center"]), jnp.asarray(g["pts"])
    )
    np.testing.assert_allclose(np.asarray(local), g["local"], atol=1e-4)
    glob = frames.local_to_global(
        jnp.asarray(g["R"]), jnp.asarray(g["center"]), jnp.asarray(local)
    )
    np.testing.assert_allclose(np.asarray(glob), g["glob"], atol=1e-4)


def test_quat_1ijk_parity(golden):
    g = golden("frames")
    R = frames.quat_1ijk_to_rotmat(jnp.asarray(g["q_vec"]))
    np.testing.assert_allclose(np.asarray(R), g["quat_R"], atol=1e-5)


def test_repr_6d_parity(golden):
    g = golden("frames")
    R = frames.repr_6d_to_rotmat(jnp.asarray(g["rep6"]))
    np.testing.assert_allclose(np.asarray(R), g["rep6_R"], atol=1e-5)


def test_compose_q_update_parity(golden):
    """Matrix-native backbone update vs OpenFold's quaternion path."""
    g = golden("rigid_update")
    R_new, t_new = frames.compose_q_update(
        jnp.asarray(g["rots"]),
        jnp.asarray(g["trans"]),
        jnp.asarray(g["update"]),
        update_mask=jnp.asarray(g["mask"]),
    )
    np.testing.assert_allclose(np.asarray(R_new), g["new_rots"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(t_new), g["new_trans"], atol=2e-5)


def test_kabsch_identity():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 20, 3)).astype(np.float32)
    aligned, R, t = frames.kabsch_align(jnp.asarray(x), jnp.asarray(x), jnp.ones((3, 20)))
    np.testing.assert_allclose(np.asarray(aligned), x, atol=1e-4)


def test_kabsch_recovers_rotation():
    from pepflowww_tpu.ops import so3
    import jax

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 30, 3)).astype(np.float32))
    R_true = so3.uniform_so3(jax.random.PRNGKey(0), (2,))
    t_true = jnp.asarray(rng.normal(size=(2, 1, 3)).astype(np.float32) * 5)
    y = jnp.einsum("bij,bnj->bni", R_true, x) + t_true
    aligned, R, t = frames.kabsch_align(x, y, jnp.ones((2, 30)))
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(y), atol=1e-3)
