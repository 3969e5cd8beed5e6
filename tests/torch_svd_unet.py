"""Torch oracle: the ASSEMBLED SVD UNet forward, transcribed independently
from the architecture contract of the reference's vendored model
(/root/reference/src/unet_spatio_temporal_condition.py:357-490 — the shell)
and the diffusers block semantics it delegates to (SpatioTemporalResBlock,
TransformerSpatioTemporalModel, AlphaBlender, spatio-temporal down/mid/up
blocks). State-dict key names follow the diffusers checkpoint format, so
converting this module's weights through io/convert exercises the exact path
a real pretrained checkpoint takes.

This is a TEST ORACLE, not a torch port of the package: it exists so
wiring-order bugs in the flax model (skip ordering, blend conventions,
embedding broadcasts) are caught against a genuinely independent
implementation. Keep it boring, eager torch.
"""

import math

import torch
import torch.nn.functional as F


def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    """Sinusoids, flip_sin_to_cos=True, downscale_freq_shift=0 (reference
    Timesteps modules at src/unet_spatio_temporal_condition.py:136-144)."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    freqs = torch.exp(exponent / half)
    args = t.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimestepEmbeddingMLP(torch.nn.Module):
    def __init__(self, cin, hidden, cout=None):
        super().__init__()
        self.linear_1 = torch.nn.Linear(cin, hidden)
        self.linear_2 = torch.nn.Linear(hidden, cout or hidden)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class AlphaBlender(torch.nn.Module):
    """learned_with_images strategy with a zeros indicator == plain learned:
    out = a*spatial + (1-a)*temporal, a = sigmoid(mix_factor); the
    transformer time-mixer uses the switched convention (a weights
    temporal)."""

    def __init__(self, alpha=0.5, switch=False):
        super().__init__()
        self.mix_factor = torch.nn.Parameter(torch.tensor([alpha]))
        self.switch = switch

    def forward(self, x_spatial, x_temporal):
        a = torch.sigmoid(self.mix_factor)
        if self.switch:
            a = 1.0 - a
        return a * x_spatial + (1.0 - a) * x_temporal


class ResnetBlock2D(torch.nn.Module):
    def __init__(self, cin, cout, ctemb, eps):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = torch.nn.Linear(ctemb, cout)
        self.norm2 = torch.nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (torch.nn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        skip = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return skip + h


class TemporalResnetBlock(torch.nn.Module):
    """(3,1,1) Conv3d resnet over (B, C, F, H, W) with per-frame temb."""

    def __init__(self, c, ctemb, eps):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(32, c, eps=eps)
        self.conv1 = torch.nn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))
        self.time_emb_proj = torch.nn.Linear(ctemb, c)
        self.norm2 = torch.nn.GroupNorm(32, c, eps=eps)
        self.conv2 = torch.nn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        # temb (B, F, Ct) -> (B, C, F, 1, 1)
        t = self.time_emb_proj(F.silu(temb))
        h = h + t.permute(0, 2, 1)[:, :, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        return x + h


class SpatioTemporalResBlock(torch.nn.Module):
    def __init__(self, cin, cout, ctemb, eps):
        super().__init__()
        self.spatial_res_block = ResnetBlock2D(cin, cout, ctemb, eps)
        self.temporal_res_block = TemporalResnetBlock(cout, ctemb, eps)
        self.time_mixer = AlphaBlender()

    def forward(self, x, temb, num_frames):
        h = self.spatial_res_block(x, temb)              # (B*F, C, H, W)
        bf, c, hh, ww = h.shape
        b = bf // num_frames
        h5 = h.reshape(b, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)
        temb_f = temb.reshape(b, num_frames, -1)
        ht = self.temporal_res_block(h5, temb_f)
        out = self.time_mixer(h5, ht)
        return out.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


class Attention(torch.nn.Module):
    """qkv bias-free, out biased (diffusers UNet attention)."""

    def __init__(self, c, heads, ctx=None):
        super().__init__()
        self.heads = heads
        self.to_q = torch.nn.Linear(c, c, bias=False)
        self.to_k = torch.nn.Linear(ctx or c, c, bias=False)
        self.to_v = torch.nn.Linear(ctx or c, c, bias=False)
        self.to_out = torch.nn.ModuleList([torch.nn.Linear(c, c)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, s, c = x.shape
        h = self.heads
        q = self.to_q(x).view(b, s, h, c // h).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], h, c // h).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], h, c // h).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        return self.to_out[0](o.transpose(1, 2).reshape(b, s, c))


class GEGLUFeedForward(torch.nn.Module):
    def __init__(self, c, mult=4):
        super().__init__()
        proj = torch.nn.Module()
        proj.proj = torch.nn.Linear(c, c * mult * 2)
        self.net = torch.nn.ModuleList(
            [proj, torch.nn.Identity(), torch.nn.Linear(c * mult, c)])

    def forward(self, x):
        h, gate = self.net[0].proj(x).chunk(2, dim=-1)
        return self.net[2](h * F.gelu(gate))


class BasicTransformerBlock(torch.nn.Module):
    def __init__(self, c, heads, ctx):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(c)
        self.attn1 = Attention(c, heads)
        self.norm2 = torch.nn.LayerNorm(c)
        self.attn2 = Attention(c, heads, ctx=ctx)
        self.norm3 = torch.nn.LayerNorm(c)
        self.ff = GEGLUFeedForward(c)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class TemporalBasicTransformerBlock(torch.nn.Module):
    """Operates on temporal tokens (B*S, F, C): ff_in, frame self-attn,
    cross-attn to the first-frame encoder state, ff."""

    def __init__(self, c, heads, ctx):
        super().__init__()
        self.norm_in = torch.nn.LayerNorm(c)
        self.ff_in = GEGLUFeedForward(c)
        self.norm1 = torch.nn.LayerNorm(c)
        self.attn1 = Attention(c, heads)
        self.norm2 = torch.nn.LayerNorm(c)
        self.attn2 = Attention(c, heads, ctx=ctx)
        self.norm3 = torch.nn.LayerNorm(c)
        self.ff = GEGLUFeedForward(c)

    def forward(self, x, time_context, num_frames):
        bf, s, c = x.shape
        b = bf // num_frames
        # (B*F, S, C) -> (B*S, F, C), batch-major temporal tokens
        x = x.reshape(b, num_frames, s, c).permute(0, 2, 1, 3)
        x = x.reshape(b * s, num_frames, c)
        # time_context (B, 1, D) -> one row per (batch, spatial) token
        tc = torch.repeat_interleave(time_context, s, dim=0)
        x = x + self.ff_in(self.norm_in(x))
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), tc)
        x = x + self.ff(self.norm3(x))
        x = x.reshape(b, s, num_frames, c).permute(0, 2, 1, 3)
        return x.reshape(bf, s, c)


class TransformerSpatioTemporalModel(torch.nn.Module):
    def __init__(self, c, heads, ctx, num_layers, norm_eps=1e-6):
        super().__init__()
        self.norm = torch.nn.GroupNorm(32, c, eps=norm_eps)
        self.proj_in = torch.nn.Linear(c, c)
        self.transformer_blocks = torch.nn.ModuleList(
            [BasicTransformerBlock(c, heads, ctx) for _ in range(num_layers)])
        self.temporal_transformer_blocks = torch.nn.ModuleList(
            [TemporalBasicTransformerBlock(c, heads, ctx)
             for _ in range(num_layers)])
        self.time_pos_embed = TimestepEmbeddingMLP(c, c * 4, c)
        self.time_mixer = AlphaBlender(switch=True)
        self.proj_out = torch.nn.Linear(c, c)

    def forward(self, x, encoder_hidden_states, num_frames):
        bf, c, hh, ww = x.shape
        b = bf // num_frames
        residual = x
        # first frame's encoder state per batch element
        time_context = encoder_hidden_states.reshape(
            b, num_frames, -1, encoder_hidden_states.shape[-1])[:, 0]
        tokens = self.norm(x).permute(0, 2, 3, 1).reshape(bf, hh * ww, c)
        tokens = self.proj_in(tokens)
        frame_ids = torch.arange(num_frames)
        emb = self.time_pos_embed(timestep_embedding(frame_ids, c))
        emb = emb.repeat(b, 1)[:, None, :]               # (B*F, 1, C)
        for block, tblock in zip(self.transformer_blocks,
                                 self.temporal_transformer_blocks):
            tokens = block(tokens, encoder_hidden_states)
            mix = tblock(tokens + emb, time_context, num_frames)
            tokens = self.time_mixer(tokens, mix)
        tokens = self.proj_out(tokens)
        out = tokens.reshape(bf, hh, ww, c).permute(0, 3, 1, 2)
        return out + residual


class Downsample2D(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = torch.nn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample2D(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = torch.nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class DownBlock(torch.nn.Module):
    def __init__(self, cin, cout, ctemb, eps, layers, heads=None, ctx=None,
                 tlayers=1, add_downsample=True, cross=False):
        super().__init__()
        self.cross = cross
        self.resnets = torch.nn.ModuleList(
            [SpatioTemporalResBlock(cin if i == 0 else cout, cout, ctemb, eps)
             for i in range(layers)])
        if cross:
            self.attentions = torch.nn.ModuleList(
                [TransformerSpatioTemporalModel(cout, heads, ctx, tlayers)
                 for _ in range(layers)])
        self.downsamplers = (torch.nn.ModuleList([Downsample2D(cout)])
                             if add_downsample else None)

    def forward(self, x, temb, ehs, num_frames):
        residuals = []
        for i, resnet in enumerate(self.resnets):
            x = resnet(x, temb, num_frames)
            if self.cross:
                x = self.attentions[i](x, ehs, num_frames)
            residuals.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            residuals.append(x)
        return x, residuals


class MidBlock(torch.nn.Module):
    def __init__(self, c, ctemb, eps, heads, ctx, tlayers):
        super().__init__()
        self.resnets = torch.nn.ModuleList(
            [SpatioTemporalResBlock(c, c, ctemb, eps) for _ in range(2)])
        self.attentions = torch.nn.ModuleList(
            [TransformerSpatioTemporalModel(c, heads, ctx, tlayers)])

    def forward(self, x, temb, ehs, num_frames):
        x = self.resnets[0](x, temb, num_frames)
        x = self.attentions[0](x, ehs, num_frames)
        return self.resnets[1](x, temb, num_frames)


class UpBlock(torch.nn.Module):
    def __init__(self, cin, cout, cprev, ctemb, eps, layers, heads=None,
                 ctx=None, tlayers=1, add_upsample=True, cross=False):
        super().__init__()
        self.cross = cross
        resnets = []
        for i in range(layers):
            skip = cin if i == layers - 1 else cout
            rin = cprev if i == 0 else cout
            resnets.append(
                SpatioTemporalResBlock(rin + skip, cout, ctemb, eps))
        self.resnets = torch.nn.ModuleList(resnets)
        if cross:
            self.attentions = torch.nn.ModuleList(
                [TransformerSpatioTemporalModel(cout, heads, ctx, tlayers)
                 for _ in range(layers)])
        self.upsamplers = (torch.nn.ModuleList([Upsample2D(cout)])
                           if add_upsample else None)

    def forward(self, x, skips, temb, ehs, num_frames):
        for i, resnet in enumerate(self.resnets):
            x = torch.cat([x, skips.pop()], dim=1)
            x = resnet(x, temb, num_frames)
            if self.cross:
                x = self.attentions[i](x, ehs, num_frames)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class TorchUNetSpatioTemporal(torch.nn.Module):
    """Assembled oracle taking our UNetConfig (tests pass TINY_UNET)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        c0 = cfg.block_out_channels[0]
        tdim = c0 * 4
        ctx = cfg.cross_attention_dim
        eps = cfg.resnet_eps
        self.conv_in = torch.nn.Conv2d(cfg.in_channels, c0, 3, padding=1)
        self.time_embedding = TimestepEmbeddingMLP(c0, tdim)
        self.add_embedding = TimestepEmbeddingMLP(
            cfg.projection_class_embeddings_input_dim, tdim)
        blocks = []
        cin = c0
        for i, btype in enumerate(cfg.down_block_types):
            cout = cfg.block_out_channels[i]
            blocks.append(DownBlock(
                cin, cout, tdim, eps, cfg.layers_per_block,
                heads=cfg.num_attention_heads[i], ctx=ctx,
                tlayers=cfg.transformer_layers_per_block[i],
                add_downsample=i < len(cfg.down_block_types) - 1,
                cross=btype == "CrossAttnDownBlockSpatioTemporal"))
            cin = cout
        self.down_blocks = torch.nn.ModuleList(blocks)
        self.mid_block = MidBlock(
            cfg.block_out_channels[-1], tdim, eps,
            cfg.num_attention_heads[-1], ctx,
            cfg.transformer_layers_per_block[-1])
        rev_c = list(reversed(cfg.block_out_channels))
        rev_h = list(reversed(cfg.num_attention_heads))
        rev_t = list(reversed(cfg.transformer_layers_per_block))
        ups = []
        cprev = rev_c[0]
        n = len(cfg.up_block_types)
        for i, btype in enumerate(cfg.up_block_types):
            cout = rev_c[i]
            cin_skip = rev_c[min(i + 1, n - 1)]
            ups.append(UpBlock(
                cin_skip, cout, cprev, tdim, eps, cfg.layers_per_block + 1,
                heads=rev_h[i], ctx=ctx, tlayers=rev_t[i],
                add_upsample=i < n - 1,
                cross=btype == "CrossAttnUpBlockSpatioTemporal"))
            cprev = cout
        self.up_blocks = torch.nn.ModuleList(ups)
        self.conv_norm_out = torch.nn.GroupNorm(32, c0, eps=eps)
        self.conv_out = torch.nn.Conv2d(c0, cfg.out_channels, 3, padding=1)

    def forward(self, sample, timestep, encoder_hidden_states,
                added_time_ids):
        """sample (B, F, C, H, W) -> (B, F, Cout, H, W); contract of
        src/unet_spatio_temporal_condition.py:357-490."""
        b, f = sample.shape[:2]
        cfg = self.cfg
        t = timestep.reshape(-1).expand(b)
        emb = self.time_embedding(
            timestep_embedding(t, cfg.block_out_channels[0]))
        add_sin = timestep_embedding(added_time_ids.reshape(-1),
                                     cfg.addition_time_embed_dim)
        emb = emb + self.add_embedding(add_sin.reshape(b, -1))

        x = sample.flatten(0, 1)
        emb = torch.repeat_interleave(emb, f, dim=0)
        ehs = torch.repeat_interleave(encoder_hidden_states, f, dim=0)

        x = self.conv_in(x)
        residuals = [x]
        for block in self.down_blocks:
            x, res = block(x, emb, ehs, f)
            residuals.extend(res)
        x = self.mid_block(x, emb, ehs, f)
        for block in self.up_blocks:
            n_res = len(block.resnets)
            skips, residuals = residuals[-n_res:], residuals[:-n_res]
            x = block(x, skips, emb, ehs, f)
        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        return x.reshape(b, f, *x.shape[1:])
