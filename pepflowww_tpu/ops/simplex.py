"""Logit-simplex ops for the sequence flow.

The sequence modality flows on a ±k logit simplex over K=20 classes
(cf. reference `models_con/flow_model.py:108-109` seq_to_simplex and
`pepflow/modules/common/layers.py:10-22` clampped_one_hot / sample_from).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clamped_one_hot(x: jax.Array, num_classes: int) -> jax.Array:
    """One-hot with out-of-range tokens (UNK=20, PAD=21) mapped to all-zeros."""
    valid = (x >= 0) & (x < num_classes)
    x_clamped = jnp.clip(x, 0, num_classes - 1)
    return jax.nn.one_hot(x_clamped, num_classes, dtype=jnp.float32) * valid[..., None]


def seq_to_simplex(seqs: jax.Array, k: float, num_classes: int = 20) -> jax.Array:
    """Map tokens to the ±k vertex encoding: one_hot * 2k - k."""
    return clamped_one_hot(seqs, num_classes) * (2.0 * k) - k


def sample_from(key: jax.Array, probs: jax.Array) -> jax.Array:
    """Sample class indices from (possibly unnormalized) probabilities.

    Matches the reference's `multinomial(probs + 1e-8)`; categorical over
    log-probabilities is the TPU-friendly equivalent.
    """
    return jax.random.categorical(key, jnp.log(probs + 1e-8), axis=-1)
