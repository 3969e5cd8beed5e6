"""Independent eager-torch oracle for the temporal-decoder KL VAE.

Transcribed from the behavior contract in SURVEY.md §2.2 / models/vae.py —
NOT from diffusers source: a per-frame 2D KL encoder (4 down stages with
asymmetric-padding downsamplers, mid resnet-attn-resnet) and a TemporalDecoder
whose resnets are spatio-temporal (spatial ResNet + (3,1,1) frame-axis ResNet,
alpha-blended) with a final time_conv_out frame conv — the model the reference
drives as AutoencoderKLTemporalDecoder (train_svd.py:649-650, :287, :1135).

Module/attribute names follow the diffusers state-dict layout that
io/convert.py maps our flax paths onto, so the parity tests can import
through the REAL diffusers_to_flax path.
"""

import torch
import torch.nn.functional as F


class ResnetBlock2D(torch.nn.Module):
    """GN-SiLU-conv x2 + skip, no time embedding (the VAE form)."""

    def __init__(self, cin, cout, eps=1e-6):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = torch.nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (torch.nn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        skip = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return skip + h


class VAEAttention(torch.nn.Module):
    """Single mid-block self-attention: GN, 1 head per 512 channels, resid."""

    def __init__(self, c, eps=1e-6, head_dim=512):
        super().__init__()
        self.heads = max(1, c // head_dim)
        self.group_norm = torch.nn.GroupNorm(32, c, eps=eps)
        self.to_q = torch.nn.Linear(c, c)
        self.to_k = torch.nn.Linear(c, c)
        self.to_v = torch.nn.Linear(c, c)
        self.to_out = torch.nn.ModuleList([torch.nn.Linear(c, c)])

    def forward(self, x):
        n, c, h, w = x.shape
        t = self.group_norm(x).flatten(2).transpose(1, 2)   # (N, HW, C)
        hd = c // self.heads
        split = lambda y: y.reshape(n, h * w, self.heads, hd).transpose(1, 2)
        o = F.scaled_dot_product_attention(
            split(self.to_q(t)), split(self.to_k(t)), split(self.to_v(t)))
        o = o.transpose(1, 2).reshape(n, h * w, c)
        o = self.to_out[0](o).transpose(1, 2).reshape(n, c, h, w)
        return o + x


class Downsample(torch.nn.Module):
    """Stride-2 conv with the encoder's asymmetric (0,1),(0,1) padding."""

    def __init__(self, c):
        super().__init__()
        self.conv = torch.nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class _Stage(torch.nn.Module):
    def __init__(self, resnets, samplers=None):
        super().__init__()
        self.resnets = torch.nn.ModuleList(resnets)
        if samplers is not None:
            self.downsamplers = torch.nn.ModuleList(samplers)


class _UpStage(torch.nn.Module):
    def __init__(self, resnets, samplers=None):
        super().__init__()
        self.resnets = torch.nn.ModuleList(resnets)
        if samplers is not None:
            self.upsamplers = torch.nn.ModuleList(samplers)


class _Mid(torch.nn.Module):
    def __init__(self, resnets, attentions):
        super().__init__()
        self.resnets = torch.nn.ModuleList(resnets)
        self.attentions = torch.nn.ModuleList(attentions)


class TorchVAEEncoder(torch.nn.Module):
    """Per-frame 2D KL encoder -> 2*latent moments (models/vae.py Encoder)."""

    def __init__(self, cfg):
        super().__init__()
        chs = cfg.block_out_channels
        eps = cfg.norm_eps
        self.conv_in = torch.nn.Conv2d(cfg.in_channels, chs[0], 3, padding=1)
        blocks = []
        cin = chs[0]
        for i, ch in enumerate(chs):
            resnets = []
            for _ in range(cfg.layers_per_block):
                resnets.append(ResnetBlock2D(cin, ch, eps))
                cin = ch
            samplers = ([Downsample(ch)] if i < len(chs) - 1 else None)
            blocks.append(_Stage(resnets, samplers))
        self.down_blocks = torch.nn.ModuleList(blocks)
        self.mid_block = _Mid(
            [ResnetBlock2D(chs[-1], chs[-1], eps),
             ResnetBlock2D(chs[-1], chs[-1], eps)],
            [VAEAttention(chs[-1], eps)])
        self.conv_norm_out = torch.nn.GroupNorm(32, chs[-1], eps=eps)
        self.conv_out = torch.nn.Conv2d(chs[-1], 2 * cfg.latent_channels, 3,
                                        padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for block in self.down_blocks:
            for r in block.resnets:
                x = r(x)
            if hasattr(block, "downsamplers"):
                x = block.downsamplers[0](x)
        x = self.mid_block.resnets[0](x)
        x = self.mid_block.attentions[0](x)
        x = self.mid_block.resnets[1](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TemporalResnet(torch.nn.Module):
    """Frame-axis ResNet: (3,1,1) Conv3d pair on (B, C, F, H, W)."""

    def __init__(self, c, eps=1e-5):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(32, c, eps=eps)
        self.conv1 = torch.nn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))
        self.norm2 = torch.nn.GroupNorm(32, c, eps=eps)
        self.conv2 = torch.nn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        return x + h


class SpatioTemporalResnet(torch.nn.Module):
    """Spatial ResNet on folded frames + temporal ResNet, alpha-blended
    (merge_factor stored as the time_mixer's mix_factor logit)."""

    def __init__(self, cin, cout, f, eps=1e-6, temporal_eps=1e-5,
                 merge_factor=0.0):
        super().__init__()
        self.f = f
        self.spatial_res_block = ResnetBlock2D(cin, cout, eps)
        self.temporal_res_block = TemporalResnet(cout, temporal_eps)
        self.time_mixer = torch.nn.Module()
        self.time_mixer.mix_factor = torch.nn.Parameter(
            torch.full((1,), float(merge_factor)))

    def forward(self, x):
        h = self.spatial_res_block(x)                  # (B*F, C, H, W)
        bf, c, hh, ww = h.shape
        h5 = h.reshape(bf // self.f, self.f, c, hh, ww).permute(0, 2, 1, 3, 4)
        ht = self.temporal_res_block(h5)
        alpha = torch.sigmoid(self.time_mixer.mix_factor)
        out = alpha * h5 + (1.0 - alpha) * ht
        return out.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


class Upsample(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = torch.nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TorchTemporalDecoder(torch.nn.Module):
    """Latent -> pixels with spatio-temporal resnets + time_conv_out."""

    def __init__(self, cfg, f):
        super().__init__()
        chs = cfg.block_out_channels
        eps = cfg.norm_eps
        st = lambda cin, cout: SpatioTemporalResnet(cin, cout, f, eps)
        self.conv_in = torch.nn.Conv2d(cfg.latent_channels, chs[-1], 3,
                                       padding=1)
        self.mid_block = _Mid([st(chs[-1], chs[-1]), st(chs[-1], chs[-1])],
                              [VAEAttention(chs[-1], eps)])
        rev = list(reversed(chs))
        blocks = []
        cin = rev[0]
        for i, ch in enumerate(rev):
            resnets = []
            for _ in range(cfg.layers_per_block + 1):
                resnets.append(st(cin, ch))
                cin = ch
            samplers = [Upsample(ch)] if i < len(rev) - 1 else None
            blocks.append(_UpStage(resnets, samplers))
        self.up_blocks = torch.nn.ModuleList(blocks)
        self.conv_norm_out = torch.nn.GroupNorm(32, chs[0], eps=eps)
        self.conv_out = torch.nn.Conv2d(chs[0], cfg.out_channels, 3,
                                        padding=1)
        self.time_conv_out = torch.nn.Conv3d(
            cfg.out_channels, cfg.out_channels, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, z):
        """(B, F, C_lat, h, w) -> (B, F, 3, 8h, 8w)."""
        b, f = z.shape[:2]
        x = self.conv_in(z.flatten(0, 1))
        x = self.mid_block.resnets[0](x)
        x = self.mid_block.attentions[0](x)
        x = self.mid_block.resnets[1](x)
        for block in self.up_blocks:
            for r in block.resnets:
                x = r(x)
            if hasattr(block, "upsamplers"):
                x = block.upsamplers[0](x)
        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        c, hh, ww = x.shape[1:]
        x5 = x.reshape(b, f, c, hh, ww).permute(0, 2, 1, 3, 4)
        x5 = self.time_conv_out(x5)
        return x5.permute(0, 2, 1, 3, 4)
