"""CLIP ViT vision tower with projection — the frozen image conditioner.

Behavior contract (SURVEY.md §2.2): transformers CLIPVisionModelWithProjection
(CLIP-ViT-H/14): 224x224 input, patch 14, width 1280, 32 pre-LN transformer
layers, projected pooled (class-token) output of dim 1024 — the single
cross-attention token. Preprocessing parity with reference train_svd.py:857-876:
[-1,1] -> [0,1] -> antialiased resize to 224 -> CLIP mean/std normalize.

TPU-first: patch embedding as a reshape+matmul (not a conv — XLA maps it to
one MXU matmul), bf16 compute, fp32 LayerNorm statistics via param upcast.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import CLIPVisionConfig
from ..ops.attention import dot_product_attention
from ..ops.resize import resize_antialiased

Array = jax.Array


class CLIPMLP(nn.Module):
    intermediate: int
    hidden: int
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.intermediate, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        if self.act == "gelu":
            x = nn.gelu(x, approximate=False)
        elif self.act == "quick_gelu":
            x = x * jax.nn.sigmoid(1.702 * x)
        else:
            raise ValueError(self.act)
        return nn.Dense(self.hidden, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(x)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        h = ln("layer_norm1")(x)
        dense = lambda name: nn.Dense(c.hidden_size, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        n, s, _ = h.shape
        q = dense("q_proj")(h).reshape(n, s, c.num_heads, head_dim)
        k = dense("k_proj")(h).reshape(n, s, c.num_heads, head_dim)
        v = dense("v_proj")(h).reshape(n, s, c.num_heads, head_dim)
        o = dot_product_attention(q, k, v, impl="xla").reshape(n, s, c.hidden_size)
        x = x + dense("out_proj")(o)
        x = x + CLIPMLP(c.intermediate_size, c.hidden_size, act=c.hidden_act,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="mlp")(ln("layer_norm2")(x))
        return x


class CLIPVisionModelWithProjection(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: Array) -> Array:
        """(N, image_size, image_size, 3) normalized pixels -> (N, projection_dim)."""
        c = self.config
        n, h, w, _ = pixel_values.shape
        p = c.patch_size
        grid = (h // p) * (w // p)

        # patch embedding as unfold + matmul (HWC patches, row-major, no bias)
        patches = pixel_values.reshape(n, h // p, p, w // p, p, 3)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(n, grid, p * p * 3)
        x = nn.Dense(c.hidden_size, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="patch_embedding")(
            patches.astype(self.dtype))

        class_emb = self.param("class_embedding",
                               nn.initializers.normal(0.02), (c.hidden_size,),
                               self.param_dtype)
        cls = jnp.broadcast_to(class_emb.astype(self.dtype), (n, 1, c.hidden_size))
        x = jnp.concatenate([cls, x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (grid + 1, c.hidden_size), self.param_dtype)
        x = x + pos.astype(self.dtype)[None]

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="pre_layrnorm")(x)
        for i in range(c.num_layers):
            x = CLIPEncoderLayer(c, dtype=self.dtype, param_dtype=self.param_dtype,
                                 name=f"layers_{i}")(x)
        pooled = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="post_layernorm")(x[:, 0])
        return nn.Dense(c.projection_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="visual_projection")(pooled)


def preprocess_for_clip(images: Array, cfg: CLIPVisionConfig) -> Array:
    """[-1,1] NHWC images of any size -> normalized (N, 224, 224, 3).

    Mirrors reference encode_image (train_svd.py:857-876): antialiased resize
    in [-1,1] space, then [0,1] rescale and CLIP mean/std normalization.
    """
    x = resize_antialiased(images.astype(jnp.float32), (cfg.image_size, cfg.image_size))
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(cfg.image_mean, jnp.float32)
    std = jnp.asarray(cfg.image_std, jnp.float32)
    return (x - mean) / std
