"""UNetSpatioTemporalConditionModel — the SVD denoiser, TPU-native.

Behavior contract (reference src/unet_spatio_temporal_condition.py:357-490 and
SURVEY.md §2.3): inputs sample (b, f, 8, h, w) [here (b, f, h, w, 8) —
channels-last], scalar-or-vector timestep, encoder_hidden_states (b, 1, 1024),
added_time_ids (b, 3); timestep + micro-conditioning sinusoid MLPs; frames
folded into batch for the spatial path; 4 down blocks with residual skips
consumed by 4 mirrored up blocks; GN+SiLU+conv head; output (b, f, h, w, 4).

TPU-first: bf16 compute with fp32 params, channels-last convs, optional
per-block rematerialization (jax.checkpoint) to trade FLOPs for HBM.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import UNetConfig
from .blocks import Conv3x3, Downsample2D, SpatioTemporalResBlock, Upsample2D
from .embeddings import TimestepEmbedding, sinusoidal_embedding
from .transformer import TransformerSpatioTemporalModel

Array = jax.Array


class DownBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int
    num_frames: int
    add_downsample: bool = True
    resnet_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Array, indicator: Optional[Array]):
        residuals = []
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(
                self.out_channels, self.num_frames, eps=self.resnet_eps,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"resnets_{i}",
            )(x, temb, indicator)
            residuals.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="downsamplers_0")(x)
            residuals.append(x)
        return x, tuple(residuals)


class CrossAttnDownBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int
    num_frames: int
    num_heads: int
    transformer_layers: int = 1
    add_downsample: bool = True
    resnet_eps: float = 1e-5
    attn_impl: str = "auto"
    ff_chunk: int = 0
    use_tracklet: bool = False
    tracklet_gate_init: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Array, ehs: Array, indicator: Optional[Array],
                 tracklet_tokens: Optional[Array] = None):
        residuals = []
        head_dim = self.out_channels // self.num_heads
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(
                self.out_channels, self.num_frames, eps=self.resnet_eps,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"resnets_{i}",
            )(x, temb, indicator)
            x = TransformerSpatioTemporalModel(
                self.num_heads, head_dim, num_layers=self.transformer_layers,
                num_frames=self.num_frames, attn_impl=self.attn_impl,
                ff_chunk=self.ff_chunk, use_tracklet=self.use_tracklet,
                tracklet_gate_init=self.tracklet_gate_init,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"attentions_{i}",
            )(x, ehs, indicator, tracklet_tokens)
            residuals.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="downsamplers_0")(x)
            residuals.append(x)
        return x, tuple(residuals)


class UNetMidBlockSpatioTemporal(nn.Module):
    channels: int
    num_frames: int
    num_heads: int
    transformer_layers: int = 1
    num_layers: int = 1
    resnet_eps: float = 1e-5
    attn_impl: str = "auto"
    ff_chunk: int = 0
    use_tracklet: bool = False
    tracklet_gate_init: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Array, ehs: Array, indicator: Optional[Array],
                 tracklet_tokens: Optional[Array] = None):
        head_dim = self.channels // self.num_heads
        res = lambda i: SpatioTemporalResBlock(
            self.channels, self.num_frames, eps=self.resnet_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name=f"resnets_{i}")
        x = res(0)(x, temb, indicator)
        for i in range(self.num_layers):
            x = TransformerSpatioTemporalModel(
                self.num_heads, head_dim, num_layers=self.transformer_layers,
                num_frames=self.num_frames, attn_impl=self.attn_impl,
                ff_chunk=self.ff_chunk, use_tracklet=self.use_tracklet,
                tracklet_gate_init=self.tracklet_gate_init,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"attentions_{i}",
            )(x, ehs, indicator, tracklet_tokens)
            x = res(i + 1)(x, temb, indicator)
        return x


class UpBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int
    num_frames: int
    add_upsample: bool = True
    resnet_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, skips: Tuple[Array, ...], temb: Array,
                 indicator: Optional[Array]):
        for i in range(self.num_layers):
            # skip enters as a separate operand: the concat is computed in
            # split form (GN-stats/conv1/shortcut read the parts directly;
            # see blocks.ResnetBlock2D skip_cat) and never hits HBM
            x = SpatioTemporalResBlock(
                self.out_channels, self.num_frames, eps=self.resnet_eps,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"resnets_{i}",
            )(x, temb, indicator, skip_cat=skips[-(i + 1)])
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="upsamplers_0")(x)
        return x


class CrossAttnUpBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int
    num_frames: int
    num_heads: int
    transformer_layers: int = 1
    add_upsample: bool = True
    resnet_eps: float = 1e-5
    attn_impl: str = "auto"
    ff_chunk: int = 0
    use_tracklet: bool = False
    tracklet_gate_init: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, skips: Tuple[Array, ...], temb: Array, ehs: Array,
                 indicator: Optional[Array],
                 tracklet_tokens: Optional[Array] = None):
        head_dim = self.out_channels // self.num_heads
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(
                self.out_channels, self.num_frames, eps=self.resnet_eps,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"resnets_{i}",
            )(x, temb, indicator, skip_cat=skips[-(i + 1)])
            x = TransformerSpatioTemporalModel(
                self.num_heads, head_dim, num_layers=self.transformer_layers,
                num_frames=self.num_frames, attn_impl=self.attn_impl,
                ff_chunk=self.ff_chunk, use_tracklet=self.use_tracklet,
                tracklet_gate_init=self.tracklet_gate_init,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"attentions_{i}",
            )(x, ehs, indicator, tracklet_tokens)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="upsamplers_0")(x)
        return x


class UNetSpatioTemporalConditionModel(nn.Module):
    """The SVD UNet. `config` fields are static; see core/config.py."""

    config: UNetConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    # rematerialization (jax.checkpoint) granularity — the TPU-native
    # memory/FLOPs trade for training (the reference has no counterpart;
    # torch would use gradient checkpointing, train_svd.py:608):
    #   False | "none": stash every block's activations (fastest, most HBM)
    #   True  | "block": remat every top-level block (least HBM; the bwd
    #       recomputes ~one full forward)
    #   "outer": remat only resolution levels 0-1 (down_blocks_0/1 and their
    #       up mirrors) — the high-res blocks hold ~80 % of the activation
    #       bytes (per-tensor 22.9/11.5 MB vs 5.7/2.9 MB at L2/L3,
    #       PERF.md) but only ~half the recompute FLOPs
    remat: Any = False

    @nn.compact
    def __call__(self, sample: Array, timestep: Array, encoder_hidden_states: Array,
                 added_time_ids: Array, boxes: Optional[Array] = None,
                 box_mask: Optional[Array] = None,
                 instance_ids: Optional[Array] = None,
                 cached_deep: Optional[Array] = None,
                 return_deep: bool = False,
                 cache_depth: int = 1) -> Array:
        """Standard forward, plus the DeepCache-style partial-evaluation pair
        (inference-only acceleration; Ma et al. 2023, "DeepCache" — adjacent
        diffusion steps change the deep (low-res) UNet features slowly, so
        they can be cached and reused while the high-res levels refresh):

        - ``return_deep=True``: full forward that ALSO returns the deep
          feature — the input of up block ``n_up - cache_depth`` (e.g. for
          ``cache_depth=1`` the output of up_blocks_2, at full latent
          resolution) as ``(out, deep)`` with deep shaped (b, f, h, w, c).
        - ``cached_deep=...``: shallow forward — compute only down blocks
          ``[0, cache_depth)`` (the last one skips its downsampler, whose
          output would only feed the skipped deeper levels), substitute
          ``cached_deep`` for the skipped trunk, and run up blocks
          ``[n_up - cache_depth, n_up)`` + head. By construction
          ``shallow(x, deep) == full(x)`` bit-exactly when ``deep`` comes
          from ``full(x, return_deep=True)`` (asserted in tests).

        The reference has no counterpart (train/infer are always full
        passes); this is a TPU-side opt-in engaged by
        PipelineConfig.deep_cache_interval.
        """
        cfg = self.config
        b, f, h, w, _ = sample.shape
        t_dim = cfg.time_embed_dim
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        # ---- time + micro-conditioning embeddings (fp32 sinusoids) ----
        timestep = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32).reshape(-1), (b,))
        t_emb = sinusoidal_embedding(timestep, cfg.block_out_channels[0])
        emb = TimestepEmbedding(t_dim, name="time_embedding", **common)(
            t_emb.astype(self.dtype))
        add_sin = sinusoidal_embedding(
            added_time_ids.reshape(-1).astype(jnp.float32), cfg.addition_time_embed_dim)
        add_sin = add_sin.reshape(b, cfg.projection_class_embeddings_input_dim)
        emb = emb + TimestepEmbedding(t_dim, name="add_embedding", **common)(
            add_sin.astype(self.dtype))

        # ---- fold frames into batch ----
        x = sample.astype(self.dtype).reshape(b * f, h, w, sample.shape[-1])
        emb_f = jnp.repeat(emb, f, axis=0)
        ehs_f = jnp.repeat(encoder_hidden_states.astype(self.dtype), f, axis=0)
        # The reference builds a zeros image_only_indicator
        # (src/unet_spatio_temporal_condition.py:430), which selects the
        # plain alpha-blend everywhere. None is the same semantics here and
        # keeps the fused temporal-resnet collapse eligible
        # (models/blocks.py: SpatioTemporalResBlock).
        indicator = None

        # optional Tracklet2Video conditioning tokens (models/tracklet.py)
        tracklet_tokens = None
        use_tracklet = cfg.tracklet_dim > 0
        if use_tracklet and boxes is not None:
            from .tracklet import TrackletConditioner
            if box_mask is None:
                box_mask = jnp.ones(boxes.shape[:3], jnp.float32)
            tracklet_tokens = TrackletConditioner(
                cfg.tracklet_dim, cfg.tracklet_heads, name="tracklet_conditioner",
                **common)(boxes, box_mask, instance_ids)

        x = Conv3x3(cfg.block_out_channels[0], name="conv_in", **common)(x)
        residuals = [x]

        # bool forms + legacy 'full' (pre-r4 configs documented none|block|full;
        # 'full' meant "remat every block", i.e. today's 'block')
        remat_mode = {True: "block", False: "none",
                      "full": "block"}.get(self.remat, self.remat)
        if remat_mode not in ("none", "block", "outer"):
            raise ValueError(f"unknown remat mode {self.remat!r}")

        def maybe_remat(cls, level=None):
            # level: resolution index (0 = highest res); None = mid block
            if remat_mode == "none":
                return cls
            if remat_mode == "outer" and (level is None or level > 1):
                return cls
            return nn.remat(cls, static_argnums=())

        # ---- DeepCache bookkeeping ----
        n_up = len(cfg.up_block_types)
        shallow = cached_deep is not None
        if (shallow or return_deep) and not 1 <= cache_depth < n_up:
            raise ValueError(f"cache_depth must be in [1, {n_up - 1}], "
                             f"got {cache_depth}")
        if shallow and return_deep:
            raise ValueError("cached_deep and return_deep are exclusive")
        deep = None

        # ---- down ----
        for i, block_type in enumerate(cfg.down_block_types):
            if shallow and i >= cache_depth:
                break
            is_final = i == len(cfg.down_block_types) - 1
            # shallow pass: the LAST computed down block's downsample output
            # would only feed the skipped deeper levels — elide it (its
            # params simply go unread by this apply)
            add_ds = (not is_final) and not (shallow and i == cache_depth - 1)
            if block_type == "CrossAttnDownBlockSpatioTemporal":
                x, res = maybe_remat(CrossAttnDownBlockSpatioTemporal, i)(
                    cfg.block_out_channels[i], cfg.layers_per_block, f,
                    cfg.num_attention_heads[i],
                    transformer_layers=cfg.transformer_layers_per_block[i],
                    add_downsample=add_ds, resnet_eps=cfg.resnet_eps,
                    attn_impl=self.attn_impl, ff_chunk=cfg.ff_chunk_size,
                    use_tracklet=use_tracklet,
                    tracklet_gate_init=cfg.tracklet_gate_init,
                    name=f"down_blocks_{i}", **common,
                )(x, emb_f, ehs_f, indicator, tracklet_tokens)
            elif block_type == "DownBlockSpatioTemporal":
                x, res = maybe_remat(DownBlockSpatioTemporal, i)(
                    cfg.block_out_channels[i], cfg.layers_per_block, f,
                    add_downsample=add_ds, resnet_eps=cfg.resnet_eps,
                    name=f"down_blocks_{i}", **common,
                )(x, emb_f, indicator)
            else:
                raise ValueError(f"unknown down block {block_type!r}")
            residuals.extend(res)

        # ---- mid ----
        if not shallow:
            x = maybe_remat(UNetMidBlockSpatioTemporal)(
                cfg.block_out_channels[-1], f, cfg.num_attention_heads[-1],
                transformer_layers=cfg.transformer_layers_per_block[-1],
                resnet_eps=cfg.resnet_eps, attn_impl=self.attn_impl,
                ff_chunk=cfg.ff_chunk_size,
                use_tracklet=use_tracklet,
                tracklet_gate_init=cfg.tracklet_gate_init, name="mid_block", **common,
            )(x, emb_f, ehs_f, indicator, tracklet_tokens)

        # ---- up ----
        rev_channels = list(reversed(cfg.block_out_channels))
        rev_heads = list(reversed(cfg.num_attention_heads))
        rev_tlayers = list(reversed(cfg.transformer_layers_per_block))
        n_res_up = cfg.layers_per_block + 1
        for i, block_type in enumerate(cfg.up_block_types):
            if shallow and i < n_up - cache_depth:
                continue
            if shallow and i == n_up - cache_depth:
                # substitute the cached trunk for everything skipped above
                x = cached_deep.astype(self.dtype).reshape(
                    (b * f,) + cached_deep.shape[2:])
            is_final = i == len(cfg.up_block_types) - 1
            skips = tuple(residuals[-n_res_up:])
            residuals = residuals[:-n_res_up]
            if block_type == "CrossAttnUpBlockSpatioTemporal":
                x = maybe_remat(CrossAttnUpBlockSpatioTemporal,
                                len(cfg.up_block_types) - 1 - i)(
                    rev_channels[i], n_res_up, f, rev_heads[i],
                    transformer_layers=rev_tlayers[i], add_upsample=not is_final,
                    resnet_eps=cfg.resnet_eps, attn_impl=self.attn_impl,
                    ff_chunk=cfg.ff_chunk_size,
                    use_tracklet=use_tracklet,
                    tracklet_gate_init=cfg.tracklet_gate_init,
                    name=f"up_blocks_{i}", **common,
                )(x, skips, emb_f, ehs_f, indicator, tracklet_tokens)
            elif block_type == "UpBlockSpatioTemporal":
                x = maybe_remat(UpBlockSpatioTemporal,
                                len(cfg.up_block_types) - 1 - i)(
                    rev_channels[i], n_res_up, f, add_upsample=not is_final,
                    resnet_eps=cfg.resnet_eps, name=f"up_blocks_{i}", **common,
                )(x, skips, emb_f, indicator)
            else:
                raise ValueError(f"unknown up block {block_type!r}")
            if return_deep and i == n_up - cache_depth - 1:
                deep = x   # the input the next (shallow-recomputed) block sees

        # ---- head ----
        from .blocks import GroupNormSiLU
        x = GroupNormSiLU(groups=32, eps=cfg.resnet_eps, name="conv_norm_out",
                          **common)(x)
        x = Conv3x3(cfg.out_channels, name="conv_out", **common)(x)
        out = x.reshape(b, f, h, w, cfg.out_channels)
        if return_deep:
            return out, deep.reshape((b, f) + deep.shape[1:])
        return out
