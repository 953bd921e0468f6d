"""Flat-torus T^n ops for the side-chain torsion flow.

Re-implements the reference's `models_con/torus.py` (Ced3-han/PepFlowww) in
JAX. Angles live in [0, 2π); the log map is the atan2-wrapped difference.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * math.pi


def expmap(x: jax.Array, u: jax.Array) -> jax.Array:
    """Move from `x` along tangent `u`, wrapping to [0, 2π)."""
    return jnp.mod(x + u, TWO_PI)


def logmap(x: jax.Array, y: jax.Array) -> jax.Array:
    """Shortest signed angular difference y - x, in (-π, π]."""
    return jnp.arctan2(jnp.sin(y - x), jnp.cos(y - x))


def projx(x: jax.Array) -> jax.Array:
    return jnp.mod(x, TWO_PI)


def random_uniform(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    return jax.random.uniform(key, shape, dtype=dtype) * TWO_PI


def geodesic_t(t, angles_1: jax.Array, angles_0: jax.Array) -> jax.Array:
    """Interpolate from `angles_0` toward `angles_1` by fraction `t` along the
    shortest arc (cf. reference torus.py:22-26: target first, base second)."""
    tangent = t * logmap(angles_0, angles_1)
    return expmap(angles_0, tangent)


def uniform_logprob(x: jax.Array) -> jax.Array:
    dim = x.shape[-1]
    return jnp.full(x.shape[:-1], -dim * math.log(TWO_PI), dtype=x.dtype)
