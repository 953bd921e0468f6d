"""Shared layers: AF2-style initialized Dense, angular/time encodings.

Re-designs `models_con/ipa_pytorch.py:64-181` (Linear with AF2 init schemes)
and `pepflow/modules/common/layers.py:92-113` (AngularEncoding) plus the DDPM
sinusoidal time embedding (`models_con/utils.py:60-72`).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# AF2 init schemes (ipa_pytorch.py:64-101). Truncated-normal initializers in
# JAX apply the truncation std correction, matching scipy-based trunc_normal_.
INITIALIZERS = {
    "default": nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
    "relu": nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
    "glorot": nn.initializers.xavier_uniform(),
    "gating": nn.initializers.zeros_init(),
    "normal": nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
    "final": nn.initializers.zeros_init(),
    # torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
    "torch": nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
}


class Linear(nn.Module):
    """Dense layer with named init scheme (cf. ipa_pytorch.py:116-181)."""

    features: int
    init: str = "default"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        bias_init = (
            nn.initializers.ones_init() if self.init == "gating" else nn.initializers.zeros_init()
        )
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=INITIALIZERS[self.init],
            bias_init=bias_init,
            dtype=self.dtype,
        )(x)


def mlp(dims, init="torch", final_init="torch", dtype=None, final_activation=False):
    """Build a ReLU MLP as a list of callables (applied left-to-right)."""
    layers = []
    for i, d in enumerate(dims):
        is_last = i == len(dims) - 1
        layers.append(Linear(d, init=(final_init if is_last else init), dtype=dtype))
        if not is_last or final_activation:
            layers.append(nn.relu)
    return layers


class MLP(nn.Module):
    """ReLU MLP mirroring the reference's nn.Sequential stacks."""

    dims: tuple
    init: str = "torch"
    final_init: str = "torch"
    final_activation: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            is_last = i == len(self.dims) - 1
            x = Linear(d, init=(self.final_init if is_last else self.init), dtype=self.dtype)(x)
            if not is_last or self.final_activation:
                x = nn.relu(x)
        return x


def _lookup(table, idx, num_embeddings, dtype=None):
    # On the bf16 compute path, small-vocab pair lookups run the FORWARD as a
    # bf16 one-hot GEMM: a (B, L, L) gather from a <=128-row table measured
    # ~0.5 ms/step on v5e (gathers dispatch per row) while the (N, V)x(V, D)
    # matmul is bandwidth-bound on the output alone (train step 42.9 ->
    # 41.8 ms). The bf16 rounding of the table values matches the rest of the
    # compute path (cf. the distance-gaussian block); with dtype=None the
    # lookup stays an exact gather, so fp32 golden parity is bit-preserved.
    if dtype is not None and num_embeddings <= 128:
        onehot = jax.nn.one_hot(idx.reshape(-1), num_embeddings, dtype=dtype)
        out = jax.lax.dot_general(
            onehot, table.astype(dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(table.dtype)
        return out.reshape(idx.shape + table.shape[1:])
    return jnp.take(table, idx, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _take_dense_grad(table, idx, num_embeddings, dtype=None):
    return _lookup(table, idx, num_embeddings, dtype)


def _take_dense_grad_fwd(table, idx, num_embeddings, dtype):
    return _lookup(table, idx, num_embeddings, dtype), idx


def _take_dense_grad_bwd(num_embeddings, dtype, idx, g):
    # One-hot GEMM instead of scatter-add: XLA's scatter over the ~262k pair
    # indices of a (B, L, L) lookup measured 1.8-2.6 ms/table/step on v5e; the
    # equivalent (N, V)ᵀ·(N, D) matmul with bf16 addends and fp32 accumulation
    # runs in ~0.3 ms. Embedding gradients are summed in fp32 either way.
    flat_idx = idx.reshape(-1)
    g_flat = g.reshape(flat_idx.shape[0], -1)
    onehot = jax.nn.one_hot(flat_idx, num_embeddings, dtype=jnp.bfloat16)
    d_table = jax.lax.dot_general(
        onehot, g_flat.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return d_table.reshape(num_embeddings, *g.shape[len(idx.shape):]), None


_take_dense_grad.defvjp(_take_dense_grad_fwd, _take_dense_grad_bwd)


class EmbedDenseGrad(nn.Module):
    """nn.Embed drop-in (same param name/shape) with a dense-matmul gradient.

    Use for lookups with many indices (pair-level (B, L, L) tables) where the
    backward scatter-add dominates the training step.
    """

    num_embeddings: int
    features: int
    embedding_init: object = nn.initializers.normal(1.0)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, idx):
        table = self.param(
            "embedding", self.embedding_init, (self.num_embeddings, self.features)
        )
        return _take_dense_grad(table, idx, self.num_embeddings, self.dtype)


class AngularEncoding(nn.Module):
    """Multi-frequency angle features (layers.py:92-113).

    freq_bands = [1..n, 1/1..1/n]; output per input dim: [x, sin(x f), cos(x f)]
    giving dim * (1 + 4n) features.
    """

    num_funcs: int = 3

    def get_out_dim(self, in_dim: int) -> int:
        return in_dim * (1 + 2 * 2 * self.num_funcs)

    @nn.compact
    def __call__(self, x):
        n = self.num_funcs
        freqs = jnp.asarray(
            [float(i + 1) for i in range(n)] + [1.0 / (i + 1) for i in range(n)],
            dtype=x.dtype,
        )
        xe = x[..., None]
        code = jnp.concatenate(
            [xe, jnp.sin(xe * freqs), jnp.cos(xe * freqs)], axis=-1
        )
        return code.reshape(x.shape[:-1] + (-1,))


def get_time_embedding(timesteps: jax.Array, embedding_dim: int, max_positions: int = 2000):
    """DDPM sinusoidal embedding of scalar times in [0, 1]
    (models_con/utils.py:60-72)."""
    timesteps = timesteps * max_positions
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class PositionalEncoding(nn.Module):
    """NeRF-style positional code with powers-of-two bands (layers.py:70-89)."""

    num_funcs: int = 6

    def get_out_dim(self, in_dim: int) -> int:
        return in_dim * (2 * self.num_funcs + 1)

    @nn.compact
    def __call__(self, x):
        freqs = 2.0 ** jnp.linspace(0.0, self.num_funcs - 1, self.num_funcs).astype(x.dtype)
        xe = x[..., None]
        code = jnp.concatenate([xe, jnp.sin(xe * freqs), jnp.cos(xe * freqs)], axis=-1)
        return code.reshape(x.shape[:-1] + (-1,))


class DistanceToBins(nn.Module):
    """Soft/one-hot distance binning (layers.py:24-67)."""

    dist_min: float = 0.0
    dist_max: float = 20.0
    num_bins: int = 64
    use_onehot: bool = False

    @property
    def out_channels(self) -> int:
        return self.num_bins

    @nn.compact
    def __call__(self, dist, axis: int = -1, normalize: bool = True):
        if self.use_onehot:
            # Hard assignment to the nearest bin center. Assumes the binning
            # axis is the last one (the only way the reference is called).
            assert axis in (-1, dist.ndim - 1)
            offset = jnp.linspace(self.dist_min, self.dist_max, self.num_bins)
            diff = jnp.abs(dist - offset)
            bin_idx = jnp.argmin(diff, axis=-1)
            return jax.nn.one_hot(bin_idx, self.num_bins, dtype=dist.dtype)
        offset = jnp.linspace(self.dist_min, self.dist_max, self.num_bins - 1)
        coeff = -0.5 / (((offset[1] - offset[0]) * 0.2) ** 2)
        shape = [1] * dist.ndim
        shape[axis] = -1
        overflow = (dist >= self.dist_max).astype(dist.dtype)
        y = jnp.exp(coeff * jnp.square(dist - offset.reshape(shape)))
        y = jnp.concatenate([y, overflow], axis=axis)
        if normalize:
            y = y / jnp.sum(y, axis=axis, keepdims=True)
        return y


def calc_distogram(pos: jax.Array, min_bin: float, max_bin: float, num_bins: int):
    """Binary distogram features (models_con/utils.py:26-36)."""
    d = jnp.linalg.norm(pos[:, :, None, :] - pos[:, None, :, :], axis=-1)[..., None]
    lower = jnp.linspace(min_bin, max_bin, num_bins)
    upper = jnp.concatenate([lower[1:], jnp.asarray([1e8])])
    return ((d > lower) * (d < upper)).astype(pos.dtype)


def get_index_embedding(indices: jax.Array, embed_size: int, max_len: int = 2056):
    """Sin/cos positional embedding of integer offsets (models_con/utils.py:39-57)."""
    K = jnp.arange(embed_size // 2, dtype=jnp.float32)
    scale = math.pi / (max_len ** (2 * K / embed_size))
    ang = indices[..., None].astype(jnp.float32) * scale
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
