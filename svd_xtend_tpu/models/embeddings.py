"""Sinusoidal timestep projections and embedding MLPs.

Behavior contract (reference src/unet_spatio_temporal_condition.py:136-144,
403-416): `Timesteps(dim, flip_sin_to_cos=True, downscale_freq_shift=0)`
sinusoids followed by a linear-SiLU-linear MLP; the add-embedding consumes
flattened 3x256 sinusoids of [fps, motion_bucket_id, noise_aug_strength].
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def sinusoidal_embedding(
    timesteps: Array,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> Array:
    """(N,) -> (N, dim) sinusoids; fp32 regardless of input dtype."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """linear -> SiLU -> linear MLP over sinusoid features.

    ``hidden_dim`` widens linear_1 (diffusers TimestepEmbedding's
    ``time_embed_dim`` with ``out_dim`` set — the transformer frame-position
    embedding is C -> 4C -> C); default is the square dim -> dim -> dim form
    used by time_embedding/add_embedding."""

    dim: int
    hidden_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.hidden_dim or self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear_1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="linear_2")(x)
        return x
