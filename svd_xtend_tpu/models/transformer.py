"""Spatial + temporal transformer blocks of the SVD UNet.

Behavior contract (SURVEY.md §2.2 TransformerSpatioTemporalModel): GN+proj-in
over (b*f, h*w, c) tokens; per layer a spatial BasicTransformerBlock
(self-attn over h*w tokens, cross-attn to the 1-token CLIP embedding, GEGLU
feed-forward) followed by a TemporalBasicTransformerBlock over (b*h*w, f, c)
tokens with a sinusoidal frame-position embedding, merged by an AlphaBlender
with the sigmoid weighting the temporal branch; proj-out + residual.

The trainable-scope selector of the reference matches parameter paths that
contain 'temporal_transformer_block' (train_svd.py:758-766) — module names
below keep that substring so the same selection semantics work here.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention, merge_heads, split_heads
from ..ops.video import spatial_tokens, temporal_to_tokens, tokens_to_temporal
from .blocks import AlphaBlender
from .embeddings import TimestepEmbedding, sinusoidal_embedding

Array = jax.Array


class Attention(nn.Module):
    """Multi-head attention with diffusers-style projection names
    (to_q/to_k/to_v/to_out — the reference's LoRA targets,
    train_svd_lora.py:663)."""

    num_heads: int
    head_dim: int
    out_dim: Optional[int] = None
    attn_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        inner = self.num_heads * self.head_dim
        out_dim = self.out_dim or x.shape[-1]
        ctx = x if context is None else context
        dense = lambda feat, name: nn.Dense(
            feat, dtype=self.dtype, param_dtype=self.param_dtype, name=name)

        if context is not None and ctx.shape[-2] == 1:
            # Single-key cross-attention (SVD: the one CLIP token): softmax
            # over one key is identically 1, so the output is to_out(to_v(ctx))
            # for EVERY query — bit-equal to full attention, with the q/k
            # projections and score einsums (S x inner^2 work) elided. They
            # are still invoked on one token so the param tree (and grads:
            # exactly zero, as in the full computation) is unchanged.
            _ = dense(inner, "to_q")(x[..., :1, :])
            _ = dense(inner, "to_k")(ctx)
            v = dense(inner, "to_v")(ctx)                   # (Bc, 1, inner)
            out = dense(out_dim, "to_out")(v)               # (Bc, 1, out)
            if out.shape[0] != x.shape[0]:
                # context may carry one row per sample while queries carry
                # B*S rows (temporal tokens are sample-major, ops/video.py)
                rep = x.shape[0] // out.shape[0]
                out = jnp.broadcast_to(
                    out[:, None], (out.shape[0], rep, 1, out_dim),
                ).reshape(x.shape[0], 1, out_dim)
            return jnp.broadcast_to(out, x.shape[:-1] + (out_dim,))

        q = dense(inner, "to_q")(x)
        k = dense(inner, "to_k")(ctx)
        v = dense(inner, "to_v")(ctx)
        o = dot_product_attention(
            split_heads(q, self.num_heads), split_heads(k, self.num_heads),
            split_heads(v, self.num_heads), impl=self.attn_impl)
        return dense(out_dim, "to_out")(merge_heads(o))


class FeedForward(nn.Module):
    """GEGLU feed-forward: Dense(2*4c) -> x * gelu(gate) -> Dense(c).

    `chunk_size` > 0 processes the token axis in chunks (the reference's
    enable_forward_chunking memory knob, src/unet_spatio_temporal_condition.py:328-355)
    — the 8c-wide inner activation is never materialized for all tokens."""

    dim: int
    mult: int = 4
    chunk_size: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        inner = self.dim * self.mult
        proj_in = nn.Dense(inner * 2, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="net_0_proj")
        proj_out = nn.Dense(self.dim, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="net_2")

        def ff(tokens):
            h, gate = jnp.split(proj_in(tokens), 2, axis=-1)
            return proj_out(h * nn.gelu(gate))

        s = x.shape[-2]
        if self.chunk_size <= 0 or s % self.chunk_size or s == self.chunk_size:
            return ff(x)
        k = s // self.chunk_size
        xs = jnp.moveaxis(
            x.reshape(*x.shape[:-2], k, self.chunk_size, x.shape[-1]), -3, 0)
        out = jax.lax.map(ff, xs)
        return jnp.moveaxis(out, 0, -3).reshape(x.shape)


class BasicTransformerBlock(nn.Module):
    """Pre-LN: self-attn, cross-attn, GEGLU FF — the spatial block."""

    num_heads: int
    head_dim: int
    attn_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        attn = lambda name: Attention(self.num_heads, self.head_dim,
                                      attn_impl=self.attn_impl, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        x = x + attn("attn1")(ln("norm1")(x))
        x = x + attn("attn2")(ln("norm2")(x), context)
        x = x + FeedForward(x.shape[-1], dtype=self.dtype,
                            param_dtype=self.param_dtype, name="ff")(ln("norm3")(x))
        return x


class TemporalBasicTransformerBlock(nn.Module):
    """FF-in, self-attn over frames, cross-attn, FF — the temporal block.

    Input: (B*S, F, C) temporal tokens. Sequence length F is tiny (<=25), so
    the attention here stays on the plain XLA path (flash has no win at F=25;
    the matmuls are already one MXU tile)."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        attn = lambda name: Attention(self.num_heads, self.head_dim, attn_impl="xla",
                                      dtype=self.dtype, param_dtype=self.param_dtype,
                                      name=name)
        x = x + FeedForward(x.shape[-1], dtype=self.dtype,
                            param_dtype=self.param_dtype, name="ff_in")(ln("norm_in")(x))
        x = x + attn("attn1")(ln("norm1")(x))
        x = x + attn("attn2")(ln("norm2")(x), context)
        x = x + FeedForward(x.shape[-1], dtype=self.dtype,
                            param_dtype=self.param_dtype, name="ff")(ln("norm3")(x))
        return x


class TransformerSpatioTemporalModel(nn.Module):
    """Factorized spatial+temporal transformer over video feature maps.

    Input:  (B*F, H, W, C) features, (B*F, N_tok, D_cross) encoder states.
    Output: (B*F, H, W, C).
    """

    num_heads: int
    head_dim: int
    num_layers: int = 1
    norm_eps: float = 1e-6
    num_frames: int = 25
    attn_impl: str = "auto"
    use_tracklet: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, encoder_hidden_states: Array,
                 image_only_indicator: Optional[Array] = None,
                 tracklet_tokens: Optional[Array] = None) -> Array:
        bf, h, w, c = x.shape
        f = self.num_frames
        b = bf // f
        inner = self.num_heads * self.head_dim
        residual = x

        from .blocks import GroupNormSiLU
        x = GroupNormSiLU(groups=32, eps=self.norm_eps, silu=False,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="norm")(x)
        tokens = spatial_tokens(x)
        tokens = nn.Dense(inner, dtype=self.dtype, param_dtype=self.param_dtype,
                          name="proj_in")(tokens)

        # cross-attn context for the temporal blocks: the first frame's
        # encoder state per batch element, repeated per spatial token
        ctx = encoder_hidden_states.reshape(b, f, -1, encoder_hidden_states.shape[-1])[:, 0]
        n_tok, d_cross = ctx.shape[-2], ctx.shape[-1]
        if n_tok == 1:
            # 1-key cross-attn (Attention shortcut) broadcasts per spatial
            # token itself — don't materialize the (B*H*W, 1, D) copy
            time_context = ctx
        else:
            time_context = jnp.broadcast_to(
                ctx[:, None], (b, h * w, n_tok, d_cross)).reshape(b * h * w, n_tok, d_cross)

        # sinusoidal frame-position embedding -> (1*F, 1, inner), broadcast over B
        frame_ids = jnp.arange(f, dtype=jnp.float32)
        t_emb = sinusoidal_embedding(frame_ids, inner * 4)
        emb = TimestepEmbedding(inner, dtype=self.dtype, param_dtype=self.param_dtype,
                                name="time_pos_embed")(t_emb.astype(self.dtype))
        emb = jnp.tile(emb, (b, 1))[:, None, :]           # (B*F, 1, inner)

        time_mixer = AlphaBlender(merge_factor=0.5, switch_spatial_to_temporal_mix=True,
                                  name="time_mixer")
        for i in range(self.num_layers):
            tokens = BasicTransformerBlock(
                self.num_heads, self.head_dim, attn_impl=self.attn_impl,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"transformer_blocks_{i}",
            )(tokens, encoder_hidden_states)
            if self.use_tracklet and tracklet_tokens is not None:
                from .tracklet import GatedSelfAttention
                tokens = GatedSelfAttention(
                    self.num_heads, self.head_dim, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"gated_attentions_{i}",
                )(tokens, tracklet_tokens)
            mix = tokens + emb
            mix = tokens_to_temporal(mix, f)               # (B*HW, F, inner)
            mix = TemporalBasicTransformerBlock(
                self.num_heads, self.head_dim, dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"temporal_transformer_blocks_{i}",
            )(mix, time_context)
            mix = temporal_to_tokens(mix, f, h * w)        # (B*F, HW, inner)
            tokens = time_mixer(tokens, mix, image_only_indicator)

        tokens = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                          name="proj_out")(tokens)
        return tokens.reshape(bf, h, w, c) + residual
