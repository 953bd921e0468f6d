"""Spatial neighbor utilities.

Covers the remaining live interface of the reference's geometry module:
`pairwise_distances` (geometry.py:59-71), `knn_points`/`knn_gather`
(geometry.py:316-341). On TPU, top-k over a dense distance matrix maps onto
sort units directly; no scatter needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_distances(x: jax.Array, y: jax.Array | None = None, return_v: bool = False):
    """(B, N, d) x (B, M, d) -> (B, N, M) distances (safe-sqrt)."""
    if y is None:
        y = x
    v = x[:, :, None, :] - y[:, None, :, :]
    d = jnp.sqrt(jnp.clip(jnp.sum(jnp.square(v), axis=-1), 1e-8, None))
    return (d, v) if return_v else d


def knn_points(q: jax.Array, p: jax.Array, K: int):
    """K nearest points of `p` for each query in `q`.

    Args:
        q: (B, M, d); p: (B, N, d).
    Returns:
        (dist, idx, neighbors): (B, M, K), (B, M, K), (B, M, K, d).
    """
    N = p.shape[1]
    K = min(K, N)
    d = pairwise_distances(q, p)  # (B, M, N)
    neg_dist, idx = jax.lax.top_k(-d, K)
    gathered = knn_gather(idx, p)
    return -neg_dist, idx, gathered


def knn_gather(idx: jax.Array, value: jax.Array) -> jax.Array:
    """Gather (B, N, K) indices from (B, M, d) values -> (B, N, K, d)."""
    return jnp.take_along_axis(
        value[:, None, :, :], idx[..., None].astype(jnp.int32), axis=2
    )
