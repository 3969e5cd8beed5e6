"""Tracklet2Video: bbox/tracklet-conditioned generation branch.

The reference README (README.md:57-70) describes — but does not ship — a
Tracklet2Video capability built from Boximator-style "Self-Tracking" and
TrackDiffusion's "Instance-Enhancer" (code "will be updated soon",
README.md:60). This module is a from-the-papers design, as an OPTIONAL
conditioning branch that is an exact no-op at init (zero-init tanh gates),
so enabling it never perturbs pretrained behavior:

  - BoxTokenizer: per-frame, per-instance tokens from Fourier-embedded
    normalized (x1, y1, x2, y2) boxes + a learned instance-id embedding;
    absent boxes map to a learned null token (Boximator's padding scheme).
  - InstanceEnhancer: a temporal transformer over each instance's tokens
    across frames (TrackDiffusion: strengthen cross-frame instance
    consistency before injection).
  - GatedSelfAttention: GLIGEN-style injection into each spatial transformer
    block: visual tokens self-attend jointly with box tokens, residual scaled
    by tanh(gamma), gamma init 0.

All sequence work is tiny (N_boxes <= 32, F <= 25): plain XLA attention.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention, merge_heads, split_heads
from .transformer import FeedForward

Array = jax.Array


def fourier_embed(x: Array, num_freqs: int = 8) -> Array:
    """(..., D) -> (..., D * 2 * num_freqs) sin/cos features (GLIGEN-style)."""
    freqs = (2.0 ** jnp.arange(num_freqs, dtype=jnp.float32)) * np.pi
    ang = x[..., None] * freqs                                  # (..., D, F)
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return emb.reshape(*x.shape[:-1], x.shape[-1] * 2 * num_freqs)


class BoxTokenizer(nn.Module):
    """(B, F, N, 4) boxes + (B, F, N) presence mask -> (B, F, N, dim) tokens."""

    dim: int
    num_freqs: int = 8
    max_instances: int = 64
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, boxes: Array, mask: Array,
                 instance_ids: Optional[Array] = None) -> Array:
        b, f, n, _ = boxes.shape
        feats = fourier_embed(boxes.astype(jnp.float32), self.num_freqs)
        if instance_ids is None:
            instance_ids = jnp.broadcast_to(jnp.arange(n)[None, None], (b, f, n))
        id_emb = nn.Embed(self.max_instances, self.dim, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name="instance_embedding")(instance_ids)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="proj_1")(feats.astype(self.dtype))
        h = nn.silu(h + id_emb)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="proj_2")(h)
        null = self.param("null_token", nn.initializers.normal(0.02),
                          (self.dim,), self.param_dtype)
        m = mask.astype(self.dtype)[..., None]
        return h * m + null.astype(self.dtype) * (1.0 - m)


class InstanceEnhancer(nn.Module):
    """Self-attention over frames per instance: (B, F, N, C) -> same."""

    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: Array) -> Array:
        b, f, n, c = tokens.shape
        x = tokens.transpose(0, 2, 1, 3).reshape(b * n, f, c)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        dense = lambda name: nn.Dense(c, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        h = ln("norm1")(x)
        q = split_heads(dense("to_q")(h), self.num_heads)
        k = split_heads(dense("to_k")(h), self.num_heads)
        v = split_heads(dense("to_v")(h), self.num_heads)
        x = x + dense("to_out")(merge_heads(
            dot_product_attention(q, k, v, impl="xla")))
        x = x + FeedForward(c, dtype=self.dtype, param_dtype=self.param_dtype,
                            name="ff")(ln("norm2")(x))
        return x.reshape(b, n, f, c).transpose(0, 2, 1, 3)


class GatedSelfAttention(nn.Module):
    """GLIGEN-style gated injection: visual tokens attend over
    [visual ++ box] tokens; residual scaled by tanh(gamma), gamma init 0 —
    the branch is an exact no-op at init."""

    num_heads: int
    head_dim: int
    # 0.0 = exact no-op at init (safe on a pretrained backbone); a warm
    # value escapes the zero-gate cold start when the backbone is trained
    # jointly from scratch (UNetConfig.tracklet_gate_init rationale)
    gate_init: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, objs: Array) -> Array:
        c = x.shape[-1]
        s = x.shape[1]
        inner = self.num_heads * self.head_dim
        objs = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="obj_proj")(objs)
        gate = nn.initializers.constant(self.gate_init)
        gamma_attn = self.param("alpha_attn", gate, (1,), self.param_dtype)
        gamma_ff = self.param("alpha_dense", gate, (1,), self.param_dtype)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        dense = lambda feat, name: nn.Dense(feat, dtype=self.dtype,
                                            param_dtype=self.param_dtype, name=name)
        y = ln("norm1")(jnp.concatenate([x, objs], axis=1))
        q = split_heads(dense(inner, "to_q")(y[:, :s]), self.num_heads)
        k = split_heads(dense(inner, "to_k")(y), self.num_heads)
        v = split_heads(dense(inner, "to_v")(y), self.num_heads)
        attn = dense(c, "to_out")(merge_heads(
            dot_product_attention(q, k, v, impl="xla")))
        x = x + jnp.tanh(gamma_attn.astype(jnp.float32))[0].astype(x.dtype) * attn
        ff = FeedForward(c, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="ff")(ln("norm2")(x))
        x = x + jnp.tanh(gamma_ff.astype(jnp.float32))[0].astype(x.dtype) * ff
        return x


class TrackletConditioner(nn.Module):
    """Tokenize + enhance: boxes -> per-frame instance tokens for injection.

    Output (B*F, N, dim): folded to match the UNet's frames-in-batch layout."""

    dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, boxes: Array, mask: Array,
                 instance_ids: Optional[Array] = None) -> Array:
        b, f, n, _ = boxes.shape
        tokens = BoxTokenizer(self.dim, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="tokenizer")(boxes, mask, instance_ids)
        tokens = InstanceEnhancer(self.num_heads, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="enhancer")(tokens)
        return tokens.reshape(b * f, n, self.dim)
