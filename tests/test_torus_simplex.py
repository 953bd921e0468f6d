"""Parity tests for torus and simplex ops."""

import jax
import jax.numpy as jnp
import numpy as np

from pepflowww_tpu.ops import simplex, torus


def test_torus_logmap_parity(golden):
    g = golden("torus")
    out = torus.logmap(jnp.asarray(g["a"]), jnp.asarray(g["b"]))
    np.testing.assert_allclose(np.asarray(out), g["logmap"], atol=1e-6)


def test_torus_geodesic_parity(golden):
    g = golden("torus")
    out = torus.geodesic_t(jnp.asarray(g["t"]), jnp.asarray(g["a"]), jnp.asarray(g["b"]))
    np.testing.assert_allclose(np.asarray(out), g["geodesic"], atol=1e-6)


def test_torus_geodesic_endpoints():
    key = jax.random.PRNGKey(0)
    a = torus.random_uniform(key, (16, 5))
    b = torus.random_uniform(jax.random.PRNGKey(1), (16, 5))
    at0 = torus.geodesic_t(0.0, a, b)
    at1 = torus.geodesic_t(1.0, a, b)
    np.testing.assert_allclose(np.asarray(at0), np.asarray(b), atol=1e-6)
    # endpoint equality is mod 2π
    diff = np.asarray(torus.logmap(at1, a))
    np.testing.assert_allclose(diff, np.zeros_like(diff), atol=1e-5)


def test_clamped_one_hot():
    x = jnp.asarray([[0, 5, 19, 20, 21, -1]])
    y = np.asarray(simplex.clamped_one_hot(x, 20))
    assert y.shape == (1, 6, 20)
    assert y[0, 0, 0] == 1 and y[0, 1, 5] == 1 and y[0, 2, 19] == 1
    assert y[0, 3].sum() == 0 and y[0, 4].sum() == 0 and y[0, 5].sum() == 0


def test_seq_to_simplex_values():
    x = jnp.asarray([[3, 21]])
    s = np.asarray(simplex.seq_to_simplex(x, k=5.0))
    assert s[0, 0, 3] == 5.0
    assert np.all(s[0, 0, :3] == -5.0)
    assert np.all(s[0, 1] == -5.0)  # PAD -> all -k


def test_sample_from_distribution():
    probs = jnp.asarray(np.tile(np.array([[0.8, 0.2] + [0.0] * 18]), (2000, 1))[None])
    toks = np.asarray(simplex.sample_from(jax.random.PRNGKey(0), probs))
    frac = (toks == 0).mean()
    assert 0.75 < frac < 0.85
