"""AutoencoderKLTemporalDecoder — per-frame 2D encoder, temporal decoder.

Behavior contract (SURVEY.md §2.2): plain 2D conv encoder (per-frame,
8x downsample, 4-channel latent, scaling_factor ~0.18215) with
DiagonalGaussianDistribution sampling (reference train_svd.py:287), and a
TemporalDecoder whose ResNet blocks are spatio-temporal (every spatial block
followed by a (3,1,1)-kernel frame-axis conv path) with a final
``time_conv_out`` frame-axis conv; decode takes ``num_frames`` and is chunked
at inference (decode_chunk_size=8, train_svd.py:1135).

TPU-first: channels-last; encoder runs over folded frames (B*F, H, W, 3);
decoder temporal convs run on (B, F, H*W, C) like models/blocks.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import VAEConfig
from ..ops.attention import dot_product_attention
from .blocks import (Conv3x3, Downsample2D, GroupNormSiLU, ResnetBlock2D,
                     SpatioTemporalResBlock, Upsample2D)

Array = jax.Array


class VAEAttention(nn.Module):
    """Single-block self-attention of the VAE mid blocks: GN, 1-head-per-
    `head_dim` attention over h*w tokens, residual."""

    head_dim: int = 512
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        num_heads = max(1, c // self.head_dim)
        residual = x
        xn = GroupNormSiLU(groups=32, eps=self.eps, silu=False,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="group_norm")(x)
        tokens = xn.reshape(n, h * w, c)
        dense = lambda name: nn.Dense(c, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        q = dense("to_q")(tokens).reshape(n, h * w, num_heads, c // num_heads)
        k = dense("to_k")(tokens).reshape(n, h * w, num_heads, c // num_heads)
        v = dense("to_v")(tokens).reshape(n, h * w, num_heads, c // num_heads)
        o = dot_product_attention(q, k, v, impl="xla").reshape(n, h * w, c)
        o = dense("to_out")(o).reshape(n, h, w, c)
        return o + residual


class Encoder(nn.Module):
    """Per-frame KL encoder: conv_in, 4 down stages (2 resnets + downsample),
    mid (resnet, attention, resnet), GN+SiLU, conv_out -> 2*latent moments."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = Conv3x3(cfg.block_out_channels[0], name="conv_in", **common)(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, eps=cfg.norm_eps,
                                  name=f"down_blocks_{i}_resnets_{j}", **common)(x)
            if i < len(cfg.block_out_channels) - 1:
                x = Downsample2D(ch, asymmetric_padding=True,
                                 name=f"down_blocks_{i}_downsamplers_0", **common)(x)
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(ch, eps=cfg.norm_eps, name="mid_resnets_0", **common)(x)
        x = VAEAttention(eps=cfg.norm_eps, name="mid_attentions_0", **common)(x)
        x = ResnetBlock2D(ch, eps=cfg.norm_eps, name="mid_resnets_1", **common)(x)
        x = GroupNormSiLU(groups=32, eps=cfg.norm_eps,
                          name="conv_norm_out", **common)(x)
        return Conv3x3(2 * cfg.latent_channels, name="conv_out", **common)(x)


class TemporalDecoder(nn.Module):
    """Latent -> pixels with spatio-temporal resnets and a final frame-axis
    smoothing conv. Input (B, F, h, w, latent); output (B, F, 8h, 8w, 3)."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, f, h, w, _ = z.shape
        x = z.reshape(b * f, h, w, z.shape[-1])
        ch_top = cfg.block_out_channels[-1]
        x = Conv3x3(ch_top, name="conv_in", **common)(x)

        st_res = lambda ch, name: SpatioTemporalResBlock(
            ch, f, eps=cfg.norm_eps, temporal_eps=1e-5, merge_factor=0.0,
            name=name, **common)
        # mid: resnet, attention, resnet (spatio-temporal resnets)
        x = st_res(ch_top, "mid_resnets_0")(x, None)
        x = VAEAttention(eps=cfg.norm_eps, name="mid_attentions_0", **common)(x)
        x = st_res(ch_top, "mid_resnets_1")(x, None)

        rev = list(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = st_res(ch, f"up_blocks_{i}_resnets_{j}")(x, None)
            if i < len(rev) - 1:
                x = Upsample2D(ch, name=f"up_blocks_{i}_upsamplers_0", **common)(x)

        x = GroupNormSiLU(groups=32, eps=cfg.norm_eps,
                          name="conv_norm_out", **common)(x)
        x = Conv3x3(cfg.out_channels, name="conv_out", **common)(x)

        # final temporal smoothing conv over frames: (B, F, S, C), kernel (3, 1)
        hh, ww = x.shape[1], x.shape[2]
        x = x.reshape(b, f, hh * ww, cfg.out_channels)
        from .blocks import TemporalConv
        x = TemporalConv(cfg.out_channels, name="time_conv_out", **common)(x)
        return x.reshape(b, f, hh, ww, cfg.out_channels)


@dataclasses.dataclass
class DiagonalGaussian:
    """Latent posterior q(z|x) = N(mean, exp(logvar)) (diffusers
    DiagonalGaussianDistribution contract, sampled at train_svd.py:287)."""

    mean: Array
    logvar: Array

    @classmethod
    def from_moments(cls, moments: Array) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return cls(mean, jnp.clip(logvar, -30.0, 20.0))

    def sample(self, key: Array) -> Array:
        std = jnp.exp(0.5 * self.logvar)
        return self.mean + std * jax.random.normal(key, self.mean.shape,
                                                   dtype=self.mean.dtype)

    def mode(self) -> Array:
        return self.mean

    def kl(self) -> Array:
        return 0.5 * jnp.sum(self.mean**2 + jnp.exp(self.logvar) - 1.0 - self.logvar,
                             axis=tuple(range(1, self.mean.ndim)))


class AutoencoderKLTemporalDecoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype,
                               param_dtype=self.param_dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype, param_dtype=self.param_dtype)
        self.decoder = TemporalDecoder(self.config, dtype=self.dtype,
                                       param_dtype=self.param_dtype)

    def encode_moments(self, images: Array) -> Array:
        """(N, H, W, 3) -> (N, H/8, W/8, 2*latent)."""
        return self.quant_conv(self.encoder(images))

    def encode(self, images: Array) -> DiagonalGaussian:
        return DiagonalGaussian.from_moments(
            self.encode_moments(images).astype(jnp.float32))

    def decode(self, z: Array) -> Array:
        """(B, F, h, w, latent) -> (B, F, H, W, 3). Pass latents already
        divided by scaling_factor."""
        return self.decoder(z)

    def __call__(self, images: Array, key: Array):
        posterior = self.encode(images)
        z = posterior.sample(key) * self.config.scaling_factor
        n, h, w, _ = z.shape
        rec = self.decode((z / self.config.scaling_factor).reshape(n, 1, h, w, -1))
        return rec.reshape(images.shape), posterior
