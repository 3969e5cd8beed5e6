"""Spatial + temporal transformer blocks of the SVD UNet.

Behavior contract (SURVEY.md §2.2 TransformerSpatioTemporalModel): GN+proj-in
over (b*f, h*w, c) tokens; per layer a spatial BasicTransformerBlock
(self-attn over h*w tokens, cross-attn to the 1-token CLIP embedding, GEGLU
feed-forward) followed by a TemporalBasicTransformerBlock attending over the
frame axis with a sinusoidal frame-position embedding, merged by an
AlphaBlender with the sigmoid weighting the temporal branch; proj-out +
residual.

TPU-first delta vs the reference's (b*h*w, f, c) temporal-token view
(src/unet_spatio_temporal_condition.py:418-425): the temporal block here runs
on the (b, f, s, c) RESHAPE of the spatial tokens — LayerNorm/FF act on c
regardless of layout and the f-axis attention contracts via (b, s)-batched
einsums, so the reference's fold/unfold transpose churn (SURVEY.md §3.3
"layout-churn the TPU build should fuse away") does not exist here at all.

The trainable-scope selector of the reference matches parameter paths that
contain 'temporal_transformer_block' (train_svd.py:758-766) — module names
below keep that substring so the same selection semantics work here.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention_packed
from ..ops.video import spatial_tokens
from .blocks import AlphaBlender
from .embeddings import TimestepEmbedding, sinusoidal_embedding

Array = jax.Array


class QDense(nn.Module):
    """nn.Dense with an opt-in W8A8 int8 fast path (ops/quant.py). Param
    tree (kernel/bias, lecun_normal/zeros init) is identical to nn.Dense, so
    checkpoints, LoRA targeting, and sharding rules are unaffected. The int8
    path engages only when the ambient quant mode is "int8" (a trace-time
    read — PipelineConfig.unet_quant is a static jit arg) AND the measured
    dense table says this (rows, cin, cout) wins on the int8 MXU."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        from ..ops import quant
        if bias is None:
            x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        else:
            x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                      dtype=self.dtype)
        if (quant.get_mode() == "int8"
                and quant.int8_dense_wins(x.shape, self.features)):
            return quant.int8_dense(x, kernel, bias)
        # exact path: identical math to nn.Dense (same dot_general, bias add
        # in the promoted dtype) so the default pipeline is unchanged
        y = jax.lax.dot_general(x, kernel,
                                (((x.ndim - 1,), (0,)), ((), ())))
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        return y


class Attention(nn.Module):
    """Multi-head attention with diffusers-style projection names
    (to_q/to_k/to_v/to_out — the reference's LoRA targets,
    train_svd_lora.py:663). Consults the attention-processor registry
    (models/attn_processor.py ≙ set_attn_processor,
    src/unet_spatio_temporal_condition.py:247-321) keyed by module path."""

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
        # diffusers UNet attention convention: to_q/to_k/to_v bias-free,
        # to_out biased — real-checkpoint state dicts carry no qkv biases
        dense = lambda feat, name: QDense(
            feat, use_bias=name == "to_out", dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)

        from .attn_processor import get_processor
        site = "/".join(self.path)
        proc = get_processor(site)
        if proc is not None:
            # custom processor: full projections, no 1-token shortcut (the
            # processor may implement different math at this site)
            q = dense(inner, "to_q")(x)
            k = dense(inner, "to_k")(ctx)
            v = dense(inner, "to_v")(ctx)
            o = proc(q, k, v, num_heads=self.num_heads,
                     scale=self.head_dim ** -0.5, site=site)
            return dense(out_dim, "to_out")(o)

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
        o = dot_product_attention_packed(q, k, v, num_heads=self.num_heads,
                                         impl=self.attn_impl)
        return dense(out_dim, "to_out")(o)


class _GEGLUCore(nn.Module):
    """The unchunked GEGLU computation; scope is shared with FeedForward so
    its params live at FeedForward's own path (net_0_proj / net_2)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: Array) -> Array:
        inner = self.dim * self.mult
        h, gate = jnp.split(
            QDense(inner * 2, dtype=self.dtype, param_dtype=self.param_dtype,
                   name="net_0_proj")(tokens), 2, axis=-1)
        return QDense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="net_2")(h * nn.gelu(gate))


class FeedForward(nn.Module):
    """GEGLU feed-forward: Dense(2*4c) -> x * gelu(gate) -> Dense(c).

    `chunk_size` > 0 processes the token axis in chunks (the reference's
    enable_forward_chunking memory knob, src/unet_spatio_temporal_condition.py:328-355)
    — the 8c-wide inner activation is never materialized for all tokens. The
    chunk loop is a lifted ``nn.scan`` (params broadcast), the flax-safe form
    of ``lax.map`` over a module call."""

    dim: int
    mult: int = 4
    chunk_size: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        core = _GEGLUCore(self.dim, self.mult, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="core")
        nn.share_scope(self, core)
        s = x.shape[-2]
        if self.chunk_size <= 0 or s == self.chunk_size:
            return core(x)
        if s % self.chunk_size:
            # the reference's enable_forward_chunking surfaces a config error
            # here; a silent no-op would quietly change nothing
            raise ValueError(
                f"ff chunk_size {self.chunk_size} must divide the token "
                f"count {s} (src/unet_spatio_temporal_condition.py:328-355)")
        k = s // self.chunk_size
        xs = jnp.moveaxis(
            x.reshape(*x.shape[:-2], k, self.chunk_size, x.shape[-1]), -3, 0)
        scan = nn.scan(lambda mdl, carry, t: (carry, mdl(t)),
                       variable_broadcast="params",
                       split_rngs={"params": False})
        _, out = scan(core, None, xs)
        return jnp.moveaxis(out, 0, -3).reshape(x.shape)


class _DenseParams(nn.Module):
    """Declares QDense's exact param tree (kernel/bias, lecun_normal/zeros)
    without computing — the fused-FF path reads raw weights while keeping
    checkpoint paths and initializer draws identical to the module path."""

    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
        return k, b


class _LNParams(nn.Module):
    """nn.LayerNorm's param tree (scale ones / bias zeros), params only."""

    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: int):
        s = self.param("scale", nn.initializers.ones, (features,),
                       self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (features,),
                       self.param_dtype)
        return s, b


class ResidualGEGLU(nn.Module):
    """x + FeedForward(LayerNorm(x)) with a fused Pallas fast path.

    The pre-LN residual GEGLU blocks dominate the UNet step's matmul tail
    (PERF.md session-12: ~22 ms "net_2 family"); ops/pallas/geglu.py runs
    LN → net_0_proj → gelu-gate → net_2 → +residual in ONE pallas_call so
    the 8C inner activation never reaches HBM and the LN/residual neighbors
    ride inside the kernel instead of dying at its fusion boundary.

    Share-scoped into the calling block, with child names `ln_name`/`ff_name`
    — the param tree is byte-identical to the unfused LayerNorm+FeedForward
    pair (checkpoints, LoRA targeting and sharding rules unaffected). The
    fused path engages on TPU only, never under int8 quant mode (QDense's
    measured int8 tables own that regime) or forward chunking.
    """

    dim: int
    ln_name: str
    ff_name: str
    mult: int = 4
    ff_chunk: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ..ops import quant
        from ..ops.pallas import geglu as gg
        t = 1
        for d in x.shape[:-1]:
            t *= d
        use = (((jax.default_backend() == "tpu" and gg.enabled())
                or gg.force())
               and self.ff_chunk <= 0 and quant.get_mode() != "int8"
               and gg.supports(t, self.dim, self.mult))
        if not use:
            ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              param_dtype=self.param_dtype, name=self.ln_name)
            ff = FeedForward(self.dim, mult=self.mult,
                             chunk_size=self.ff_chunk, dtype=self.dtype,
                             param_dtype=self.param_dtype, name=self.ff_name)
            return x + ff(ln(x))
        ls, lb = _LNParams(param_dtype=self.param_dtype,
                           name=self.ln_name)(self.dim)
        inner = self.dim * self.mult
        ffp = _FFParams(self.dim, self.mult, param_dtype=self.param_dtype,
                        name=self.ff_name)
        w1, b1, w2, b2 = ffp(self.dim)
        dt = self.dtype
        return gg.ln_geglu_residual(
            x.astype(dt), ls.astype(dt), lb.astype(dt), w1.astype(dt),
            b1.astype(dt), w2.astype(dt), b2.astype(dt))


class _FFParams(nn.Module):
    """FeedForward's param tree (net_0_proj / net_2), params only."""

    dim: int
    mult: int = 4
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        inner = self.dim * self.mult
        w1, b1 = _DenseParams(inner * 2, param_dtype=self.param_dtype,
                              name="net_0_proj")(in_features)
        w2, b2 = _DenseParams(self.dim, param_dtype=self.param_dtype,
                              name="net_2")(inner)
        return w1, b1, w2, b2


class BasicTransformerBlock(nn.Module):
    """Pre-LN: self-attn, cross-attn, GEGLU FF — the spatial block."""

    num_heads: int
    head_dim: int
    attn_impl: str = "auto"
    ff_chunk: int = 0
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
        rg = ResidualGEGLU(x.shape[-1], ln_name="norm3", ff_name="ff",
                           ff_chunk=self.ff_chunk, dtype=self.dtype,
                           param_dtype=self.param_dtype)
        nn.share_scope(self, rg)
        return rg(x)


class FrameAxisAttention(nn.Module):
    """Attention over the frame axis of (B, F, S, C) — layout-preserving.

    Mathematically identical to transposing to (B*S, F, C) temporal tokens
    and running ``Attention`` (tests/test_models_blocks.py asserts this), but
    the F-axis contraction is expressed as an einsum with (b, s) batch
    dimensions, so the multi-MB transpose pair around every temporal block
    disappears (measured ~0.15-0.45 ms per block at the SVD shapes,
    scripts/microbench_temporal_layout.py). Child param names match
    ``Attention`` (to_q/to_k/to_v/to_out — the reference's LoRA targets,
    train_svd_lora.py:663) so checkpoints and LoRA targeting are unchanged.

    F is tiny (<=25): the per-(b,s) attention matmuls are a fraction of one
    MXU tile, so the plain einsum path is the right backend (no flash win).
    """

    num_heads: int
    head_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        b, f, s, c = x.shape
        inner = self.num_heads * self.head_dim
        out_dim = self.out_dim or c
        scale = self.head_dim ** -0.5
        # same bias convention as Attention: qkv bias-free, to_out biased
        dense = lambda feat, name: QDense(
            feat, use_bias=name == "to_out", dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)

        from .attn_processor import get_processor
        site = "/".join(self.path)
        proc = get_processor(site)
        if proc is not None:
            # custom processor: hand it the reference's own temporal-token
            # view ((B*S, F, C) — src/unet_spatio_temporal_condition.py:418)
            # so one processor signature covers spatial and temporal sites;
            # the layout-preserving fast paths below stay default-only
            q = dense(inner, "to_q")(x)
            if context is None:
                k, v = dense(inner, "to_k")(x), dense(inner, "to_v")(x)
                to_t = lambda a: a.transpose(0, 2, 1, 3).reshape(b * s, f, inner)
                qq, kk, vv = to_t(q), to_t(k), to_t(v)
            else:
                n = context.shape[-2]
                k = dense(inner, "to_k")(context)
                v = dense(inner, "to_v")(context)
                bcast = lambda a: jnp.broadcast_to(
                    a[:, None], (b, s, n, inner)).reshape(b * s, n, inner)
                qq = q.transpose(0, 2, 1, 3).reshape(b * s, f, inner)
                kk, vv = bcast(k), bcast(v)
            o = proc(qq, kk, vv, num_heads=self.num_heads, scale=scale,
                     site=site)
            o = o.reshape(b, s, f, inner).transpose(0, 2, 1, 3)
            return dense(out_dim, "to_out")(o)

        if context is not None and context.shape[-2] == 1:
            # Single-key cross-attention (the one CLIP token): softmax over
            # one key is identically 1 => output is to_out(to_v(ctx)) for
            # every (frame, token) query — bit-equal to full attention. q/k
            # run on one token so the param tree (and their exactly-zero
            # grads) is unchanged.
            _ = dense(inner, "to_q")(x[:, :1, :1])
            _ = dense(inner, "to_k")(context)
            v = dense(inner, "to_v")(context)             # (B, 1, inner)
            out = dense(out_dim, "to_out")(v)             # (B, 1, out)
            return jnp.broadcast_to(out[:, :, None, :], (b, f, s, out_dim))

        q = dense(inner, "to_q")(x)
        if context is None:
            k = dense(inner, "to_k")(x)
            v = dense(inner, "to_v")(x)
            from ..ops.pallas import temporal_attention as ta
            if (jax.default_backend() == "tpu" and ta.enabled()
                    and self.head_dim == ta.HEAD_DIM
                    and ta.supports(f, s, inner)):
                # fused kernel consumes/produces the projections' native
                # (B, F, S, N) layout — removes the q/k/v reshape copies,
                # output transpose and lane-starved softmax the einsum
                # lowering pays (~2.5 ms -> roofline at L0, PERF.md)
                o = ta.frame_attention(q, k, v, num_heads=self.num_heads,
                                       scale=scale)
                return dense(out_dim, "to_out")(o)
            q = q.reshape(b, f, s, self.num_heads, self.head_dim)
            k = k.reshape(b, f, s, self.num_heads, self.head_dim)
            v = v.reshape(b, f, s, self.num_heads, self.head_dim)
            logits = jnp.einsum("bfshd,bgshd->bshfg", q, k,
                                preferred_element_type=jnp.float32) * scale
            w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            o = jnp.einsum("bshfg,bgshd->bfshd", w, v)
        else:
            # multi-token context (B, N, D): every (f, s) query attends to it
            n = context.shape[-2]
            k = dense(inner, "to_k")(context).reshape(b, n, self.num_heads,
                                                      self.head_dim)
            v = dense(inner, "to_v")(context).reshape(b, n, self.num_heads,
                                                      self.head_dim)
            q = q.reshape(b, f, s, self.num_heads, self.head_dim)
            logits = jnp.einsum("bfshd,bnhd->bfshn", q, k,
                                preferred_element_type=jnp.float32) * scale
            w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            o = jnp.einsum("bfshn,bnhd->bfshd", w, v)
        return dense(out_dim, "to_out")(o.reshape(b, f, s, inner))


class TemporalBasicTransformerBlock(nn.Module):
    """FF-in, self-attn over frames, cross-attn, FF — the temporal block.

    Input: (B, F, S, C) — the frame axis is attended over in place
    (FrameAxisAttention); LayerNorm/FF act on C and are layout-agnostic, so
    no temporal-token transpose exists anywhere in the block."""

    num_heads: int
    head_dim: int
    ff_chunk: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        attn = lambda name: FrameAxisAttention(
            self.num_heads, self.head_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        def rgeglu(ln_name, ff_name, h):
            rg = ResidualGEGLU(h.shape[-1], ln_name=ln_name, ff_name=ff_name,
                               ff_chunk=self.ff_chunk, dtype=self.dtype,
                               param_dtype=self.param_dtype)
            nn.share_scope(self, rg)
            return rg(h)

        x = rgeglu("norm_in", "ff_in", x)
        x = x + attn("attn1")(ln("norm1")(x))
        x = x + attn("attn2")(ln("norm2")(x), context)
        x = rgeglu("norm3", "ff", x)
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
    ff_chunk: int = 0
    use_tracklet: bool = False
    tracklet_gate_init: float = 0.0
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
        tokens = QDense(inner, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="proj_in")(tokens)

        # cross-attn context for the temporal blocks: the first frame's
        # encoder state per batch element — FrameAxisAttention consumes the
        # (B, N, D) tensor directly, no per-spatial-token copy in any case
        time_context = encoder_hidden_states.reshape(
            b, f, -1, encoder_hidden_states.shape[-1])[:, 0]

        # sinusoidal frame-position embedding -> (1*F, 1, inner), broadcast
        # over B. diffusers layout: C-dim sinusoids through a C -> 4C -> C
        # MLP (TimestepEmbedding(in_channels, in_channels*4, out_dim=...)),
        # so real-checkpoint time_pos_embed weights import shape-exactly.
        frame_ids = jnp.arange(f, dtype=jnp.float32)
        t_emb = sinusoidal_embedding(frame_ids, inner)
        emb = TimestepEmbedding(inner, hidden_dim=inner * 4, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="time_pos_embed")(t_emb.astype(self.dtype))
        emb = jnp.tile(emb, (b, 1))[:, None, :]           # (B*F, 1, inner)

        time_mixer = AlphaBlender(merge_factor=0.5, switch_spatial_to_temporal_mix=True,
                                  name="time_mixer")
        for i in range(self.num_layers):
            tokens = BasicTransformerBlock(
                self.num_heads, self.head_dim, attn_impl=self.attn_impl,
                ff_chunk=self.ff_chunk,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"transformer_blocks_{i}",
            )(tokens, encoder_hidden_states)
            if self.use_tracklet and tracklet_tokens is not None:
                from .tracklet import GatedSelfAttention
                tokens = GatedSelfAttention(
                    self.num_heads, self.head_dim,
                    gate_init=self.tracklet_gate_init, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"gated_attentions_{i}",
                )(tokens, tracklet_tokens)
            mix = (tokens + emb).reshape(b, f, h * w, inner)  # free reshape
            mix = TemporalBasicTransformerBlock(
                self.num_heads, self.head_dim, ff_chunk=self.ff_chunk,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"temporal_transformer_blocks_{i}",
            )(mix, time_context)
            mix = mix.reshape(bf, h * w, inner)               # free reshape
            tokens = time_mixer(tokens, mix, image_only_indicator)

        tokens = QDense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="proj_out")(tokens)
        return tokens.reshape(bf, h, w, c) + residual
