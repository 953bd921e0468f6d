"""Tests for auxiliary layers and neighbor utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from pepflowww_tpu.models.layers import DistanceToBins, PositionalEncoding, calc_distogram
from pepflowww_tpu.ops.neighbors import knn_points, pairwise_distances


def test_positional_encoding_dims():
    pe = PositionalEncoding(num_funcs=6)
    x = jnp.ones((2, 3, 4))
    out = pe.apply({}, x)
    assert out.shape == (2, 3, pe.get_out_dim(4))


def test_distance_to_bins_soft():
    m = DistanceToBins(0.0, 20.0, num_bins=16)
    d = jnp.asarray([[5.0], [25.0]])[..., None]  # (2, 1, 1)
    y = m.apply({}, d)
    assert y.shape == (2, 1, 16)
    np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, atol=1e-5)
    # overflow bin fires for d >= dist_max
    assert np.asarray(y)[1, 0, -1] > 0.9


def test_distance_to_bins_onehot():
    m = DistanceToBins(0.0, 10.0, num_bins=11, use_onehot=True)
    d = jnp.asarray([[[3.2]]])  # (1, 1, 1): singleton bin axis last
    y = m.apply({}, d)
    assert y.shape == (1, 1, 11)
    assert np.asarray(y)[0, 0, 3] == 1.0


def test_calc_distogram():
    pos = jnp.zeros((1, 3, 3)).at[0, 1, 0].set(5.0).at[0, 2, 0].set(15.0)
    dg = calc_distogram(pos, 1e-3, 20.0, 8)
    assert dg.shape == (1, 3, 3, 8)
    assert np.asarray(dg)[0, 0, 1].sum() == 1.0


def test_knn_points():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(2, 20, 3)).astype(np.float32))
    dist, idx, nbrs = knn_points(p, p, K=4)
    assert dist.shape == (2, 20, 4) and nbrs.shape == (2, 20, 4, 3)
    # nearest neighbor of each point is itself
    np.testing.assert_array_equal(np.asarray(idx)[..., 0], np.tile(np.arange(20), (2, 1)))
    # distances sorted ascending
    d = np.asarray(dist)
    assert np.all(np.diff(d, axis=-1) >= -1e-6)


def test_pairwise_distances_matches_direct():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 5, 3)).astype(np.float32))
    d = np.asarray(pairwise_distances(x))
    ref = np.linalg.norm(np.asarray(x)[0, :, None] - np.asarray(x)[0, None, :], axis=-1)
    np.testing.assert_allclose(d[0], ref, atol=1e-4)


def test_embed_dense_grad_matches_nn_embed():
    """EmbedDenseGrad: identical forward and matching gradients vs nn.Embed.

    The backward replaces XLA's scatter-add (measured 1.8-2.6 ms/table/step
    on v5e for (B, L, L) lookups) with a one-hot matmul; addends round to
    bf16, so gradients match to ~1e-2 relative.
    """
    import flax.linen as nn
    import jax

    from pepflowww_tpu.models.layers import EmbedDenseGrad

    V, D = 37, 24
    rng = np.random.default_rng(7)
    idx = jnp.asarray(rng.integers(0, V, size=(2, 9, 9)))
    g_out = jnp.asarray(rng.normal(size=(2, 9, 9, D)).astype(np.float32))

    m_ref = nn.Embed(V, D, embedding_init=nn.initializers.normal(1.0))
    m_new = EmbedDenseGrad(V, D, embedding_init=nn.initializers.normal(1.0))
    params = m_ref.init(jax.random.PRNGKey(0), idx)["params"]

    out_ref = m_ref.apply({"params": params}, idx)
    out_new = m_new.apply({"params": params}, idx)
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_new))

    def loss(m):
        def f(p):
            return jnp.sum(m.apply({"params": p}, idx) * g_out)
        return jax.grad(f)(params)["embedding"]

    g_ref = np.asarray(loss(m_ref))
    g_new = np.asarray(loss(m_new))
    np.testing.assert_allclose(g_new, g_ref, rtol=2e-2, atol=1e-2)
    # rows for indices never looked up must stay exactly zero
    unused = sorted(set(range(V)) - set(np.asarray(idx).ravel().tolist()))
    if unused:
        assert np.all(g_new[unused] == 0)
