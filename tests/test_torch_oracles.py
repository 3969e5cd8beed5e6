"""Torch micro-oracles: hand-built torch modules with diffusers-style state
dicts, imported through io/convert, must reproduce our blocks' outputs.

This validates the conversion layout rules (Dense/Conv2d/Conv3d transposes,
GN scale/bias) and the block math against real torch — the closest available
proxy for pretrained-checkpoint import (diffusers itself isn't installed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from svd_xtend_tpu.io import convert
from svd_xtend_tpu.models.blocks import ResnetBlock2D, TemporalResnetBlock
from svd_xtend_tpu.models.transformer import Attention, FeedForward


def _import_from_torch(torch_module, template):
    sd = {k: v.detach().numpy() for k, v in torch_module.state_dict().items()}
    return convert.diffusers_to_flax(sd, template)


class TorchResnet2D(torch.nn.Module):
    def __init__(self, cin, cout, ctemb, eps=1e-5):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = torch.nn.Linear(ctemb, cout)
        self.norm2 = torch.nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = torch.nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb):
        h = torch.nn.functional.silu(self.norm1(x))
        h = self.conv1(h)
        h = h + self.time_emb_proj(torch.nn.functional.silu(temb))[:, :, None, None]
        h = torch.nn.functional.silu(self.norm2(h))
        h = self.conv2(h)
        return self.conv_shortcut(x) + h


def test_resnet2d_matches_torch():
    torch.manual_seed(0)
    tm = TorchResnet2D(64, 96, 32).eval()
    ours = ResnetBlock2D(out_channels=96)
    x = np.random.RandomState(0).randn(2, 8, 8, 64).astype(np.float32)
    temb = np.random.RandomState(1).randn(2, 32).astype(np.float32)
    template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(temb))["params"]
    params = _import_from_torch(tm, template)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x),
                                jnp.asarray(temb)))
    with torch.no_grad():
        expected = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      torch.from_numpy(temb)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


class TorchTemporalResnet(torch.nn.Module):
    """diffusers TemporalResnetBlock shape: Conv3d (3,1,1) over (B,C,F,H,W)."""

    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(32, c, eps=eps)
        self.conv1 = torch.nn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))
        self.norm2 = torch.nn.GroupNorm(32, c, eps=eps)
        self.conv2 = torch.nn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, x):
        h = torch.nn.functional.silu(self.norm1(x))
        h = self.conv1(h)
        h = torch.nn.functional.silu(self.norm2(h))
        h = self.conv2(h)
        return x + h


def test_temporal_resnet_matches_torch():
    torch.manual_seed(1)
    tm = TorchTemporalResnet(64).eval()
    ours = TemporalResnetBlock(out_channels=64)
    x = np.random.RandomState(2).randn(2, 5, 4, 4, 64).astype(np.float32)
    template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), None)["params"]
    # our param tree path contains 'temporal_res_block'? No — standalone module;
    # the temporal-conv detection keys on the path, so wrap paths accordingly
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    flat_t = convert.flatten(template)
    out_flat = {}
    for path, tarr in flat_t.items():
        base, leaf = path.rsplit("/", 1)
        tkey = f"{base}.{'weight' if leaf in ('kernel', 'scale') else 'bias'}"
        arr = sd[tkey]
        if leaf == "kernel":
            arr = (arr[..., 0, 0].transpose(2, 1, 0)[:, None]
                   if arr.ndim == 5 else arr.T)
        out_flat[path] = arr
    params = convert.fill_template(template, out_flat)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x), None))
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))   # B C F H W
        expected = tm(xt).numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


class TorchAttention(torch.nn.Module):
    """diffusers UNet attention convention: qkv bias-free, out biased."""

    def __init__(self, c, heads, ctx=None):
        super().__init__()
        ctx = ctx or c
        self.heads = heads
        self.to_q = torch.nn.Linear(c, c, bias=False)
        self.to_k = torch.nn.Linear(ctx, c, bias=False)
        self.to_v = torch.nn.Linear(ctx, c, bias=False)
        self.to_out = torch.nn.Linear(c, c)

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, s, c = x.shape
        h = self.heads
        q = self.to_q(x).view(b, s, h, c // h).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], h, c // h).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], h, c // h).transpose(1, 2)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        return self.to_out(o.transpose(1, 2).reshape(b, s, c))


@pytest.mark.parametrize("cross", [False, True])
def test_attention_matches_torch_sdpa(cross):
    torch.manual_seed(2)
    tm = TorchAttention(64, heads=4, ctx=32 if cross else None).eval()
    ours = Attention(num_heads=4, head_dim=16)
    x = np.random.RandomState(3).randn(2, 10, 64).astype(np.float32)
    ctx = np.random.RandomState(4).randn(2, 1, 32).astype(np.float32) if cross else None
    args = (jnp.asarray(x),) + ((jnp.asarray(ctx),) if cross else ())
    template = ours.init(jax.random.PRNGKey(0), *args)["params"]
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    flat = {}
    for name in ("to_q", "to_k", "to_v", "to_out"):
        flat[f"{name}/kernel"] = sd[f"{name}.weight"].T
    flat["to_out/bias"] = sd["to_out.bias"]
    params = convert.fill_template(template, flat)
    got = np.asarray(ours.apply({"params": params}, *args))
    with torch.no_grad():
        expected = tm(torch.from_numpy(x),
                      torch.from_numpy(ctx) if cross else None).numpy()
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


def test_full_unet_matches_torch():
    """The ASSEMBLED UNet forward against an independent torch replica of
    the reference contract (src/unet_spatio_temporal_condition.py:357-490),
    imported through the real checkpoint path (state_dict ->
    convert.diffusers_to_flax). Catches wiring-order bugs (skip ordering,
    blend conventions, embedding broadcasts) that block-level oracles and
    round-trip tests cannot. B=2 so batch-major vs hw-major flattening
    mistakes are exposed."""
    from torch_svd_unet import TorchUNetSpatioTemporal

    from svd_xtend_tpu.core.config import TINY_UNET
    from svd_xtend_tpu.models.unet import UNetSpatioTemporalConditionModel

    cfg = TINY_UNET
    torch.manual_seed(4)
    tm = TorchUNetSpatioTemporal(cfg).eval()

    b, f, h, w = 2, 3, 8, 8
    rs = np.random.RandomState(6)
    sample = rs.randn(b, f, h, w, cfg.in_channels).astype(np.float32)
    timestep = np.float32(37.0)
    ehs = rs.randn(b, 1, cfg.cross_attention_dim).astype(np.float32)
    add_ids = np.array([[6.0, 127.0, 0.02], [7.0, 63.0, 0.1]], np.float32)

    ours = UNetSpatioTemporalConditionModel(cfg, dtype=jnp.float32)
    template = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(sample), jnp.asarray(timestep),
        jnp.asarray(ehs), jnp.asarray(add_ids))["params"]
    params = _import_from_torch(tm, template)

    got = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(sample), jnp.asarray(timestep),
        jnp.asarray(ehs), jnp.asarray(add_ids)))
    with torch.no_grad():
        expected = tm(
            torch.from_numpy(sample.transpose(0, 1, 4, 2, 3)),
            torch.tensor(timestep), torch.from_numpy(ehs),
            torch.from_numpy(add_ids)).numpy().transpose(0, 1, 3, 4, 2)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-3)


def test_pipeline_denoise_step_matches_torch():
    """One full CFG denoise step — scale-model-input, 8-channel concat,
    stacked-CFG UNet, frame-linear guidance, EDM denoise + Euler step —
    against an independent torch transcription of the reference pipeline
    semantics (EulerDiscrete v-prediction as EDM scalings with
    sigma_data=1; guidance linspace per frame). Uses the torch UNet oracle
    so the ENTIRE step is torch-side."""
    from torch_svd_unet import TorchUNetSpatioTemporal

    from svd_xtend_tpu.core.config import TINY_UNET
    from svd_xtend_tpu.diffusion.scheduler import EulerDiscreteScheduler
    from svd_xtend_tpu.models.unet import UNetSpatioTemporalConditionModel

    cfg = TINY_UNET
    torch.manual_seed(5)
    tm = TorchUNetSpatioTemporal(cfg).eval()
    ours = UNetSpatioTemporalConditionModel(cfg, dtype=jnp.float32)

    b, f, h, w = 1, 3, 8, 8
    latc = cfg.in_channels // 2
    rs = np.random.RandomState(8)
    latents = rs.randn(b, f, h, w, latc).astype(np.float32) * 3.0
    cond_lat = rs.randn(b, f, h, w, latc).astype(np.float32)
    embeds = rs.randn(b, 1, cfg.cross_attention_dim).astype(np.float32)
    add_ids = np.array([[6.0, 127.0, 0.02]], np.float32)
    sigma, sigma_next = np.float32(5.0), np.float32(3.0)
    gmin, gmax = 1.0, 3.0

    template = ours.init(
        jax.random.PRNGKey(0), jnp.zeros((2 * b, f, h, w, cfg.in_channels)),
        jnp.zeros(()), jnp.zeros((2 * b, 1, cfg.cross_attention_dim)),
        jnp.zeros((2 * b, 3)))["params"]
    params = _import_from_torch(tm, template)

    # ---- our step (the exact-path body of diffusion/pipeline._generate) ----
    sch = EulerDiscreteScheduler()
    lat = jnp.asarray(latents)
    ehs2 = jnp.concatenate([jnp.zeros_like(embeds), jnp.asarray(embeds)], 0)
    cond2 = jnp.concatenate([jnp.zeros_like(cond_lat),
                             jnp.asarray(cond_lat)], 0)
    ids2 = jnp.concatenate([jnp.asarray(add_ids)] * 2, 0)
    x2 = sch.scale_model_input(jnp.concatenate([lat, lat], 0),
                               jnp.float32(sigma))
    x_in = jnp.concatenate([x2, cond2], axis=-1)
    t2 = jnp.broadcast_to(sch.timestep(jnp.float32(sigma)), (2 * b,))
    out = ours.apply({"params": params}, x_in, t2, ehs2, ids2)
    uncond, cond = jnp.split(out, 2, axis=0)
    guidance = jnp.linspace(gmin, gmax, f).reshape(1, f, 1, 1, 1)
    mo = uncond + guidance * (cond - uncond)
    got = np.asarray(sch.step(lat, sch.denoised(mo, lat, jnp.float32(sigma)),
                              jnp.float32(sigma), jnp.float32(sigma_next)))

    # ---- independent torch step ----
    with torch.no_grad():
        tl = torch.from_numpy(latents.transpose(0, 1, 4, 2, 3))
        tc = torch.from_numpy(cond_lat.transpose(0, 1, 4, 2, 3))
        s = torch.tensor(float(sigma))
        x2t = torch.cat([tl, tl], 0) / torch.sqrt(s * s + 1.0)
        x_int = torch.cat([x2t, torch.cat([torch.zeros_like(tc), tc], 0)], 2)
        ehs2t = torch.cat([torch.zeros(b, 1, cfg.cross_attention_dim),
                           torch.from_numpy(embeds)], 0)
        ids2t = torch.from_numpy(np.concatenate([add_ids, add_ids], 0))
        outt = tm(x_int, 0.25 * torch.log(s), ehs2t, ids2t)
        unc, cnd = outt.chunk(2, dim=0)
        g = torch.linspace(gmin, gmax, f).reshape(1, f, 1, 1, 1)
        mot = unc + g * (cnd - unc)
        denoised = mot * (-s / torch.sqrt(s * s + 1.0)) + tl / (s * s + 1.0)
        nxt = tl + (float(sigma_next) - float(sigma)) * (tl - denoised) / s
        expected = nxt.numpy().transpose(0, 1, 3, 4, 2)

    np.testing.assert_allclose(got, expected, atol=5e-3, rtol=1e-3)


def test_geglu_ff_matches_torch():
    torch.manual_seed(3)

    class TorchGEGLU(torch.nn.Module):
        def __init__(self, c):
            super().__init__()
            self.proj = torch.nn.Linear(c, c * 8)
            self.out = torch.nn.Linear(c * 4, c)

        def forward(self, x):
            h, gate = self.proj(x).chunk(2, dim=-1)
            return self.out(h * torch.nn.functional.gelu(gate))

    tm = TorchGEGLU(32).eval()
    ours = FeedForward(32)
    x = np.random.RandomState(5).randn(2, 6, 32).astype(np.float32)
    template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    flat = {
        "net_0_proj/kernel": tm.proj.weight.detach().numpy().T,
        "net_0_proj/bias": tm.proj.bias.detach().numpy(),
        "net_2/kernel": tm.out.weight.detach().numpy().T,
        "net_2/bias": tm.out.bias.detach().numpy(),
    }
    params = convert.fill_template(template, flat)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        expected = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_full_width_unet_matches_torch():
    """Full-width parity (r2 VERDICT missing #2): the REAL SVD config —
    block_out_channels 320/640/1280/1280, heads 5/10/20/20 (head_dim 64),
    cross_attention_dim 1024 (src/unet_spatio_temporal_condition.py:70-96) —
    at tiny spatial/frame dims (16x16 latent, f=2), fp32, through the real
    diffusers_to_flax import path. Exercises the 320-ch GN group boundaries,
    d=64 head reshapes, and the 1280-channel split-concat up paths that the
    TINY_UNET oracle never reaches."""
    from torch_svd_unet import TorchUNetSpatioTemporal

    from svd_xtend_tpu.core.config import UNetConfig
    from svd_xtend_tpu.models.unet import UNetSpatioTemporalConditionModel

    cfg = UNetConfig()          # the real SVD widths — no scaling
    torch.manual_seed(7)
    tm = TorchUNetSpatioTemporal(cfg).eval()

    b, f, h, w = 1, 2, 16, 16
    rs = np.random.RandomState(9)
    sample = rs.randn(b, f, h, w, cfg.in_channels).astype(np.float32)
    timestep = np.float32(41.0)
    ehs = rs.randn(b, 1, cfg.cross_attention_dim).astype(np.float32)
    add_ids = np.array([[6.0, 127.0, 0.02]], np.float32)

    ours = UNetSpatioTemporalConditionModel(cfg, dtype=jnp.float32)
    template = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(sample), jnp.asarray(timestep),
        jnp.asarray(ehs), jnp.asarray(add_ids))["params"]
    params = _import_from_torch(tm, template)
    del template

    got = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(sample), jnp.asarray(timestep),
        jnp.asarray(ehs), jnp.asarray(add_ids)))
    del params
    with torch.no_grad():
        expected = tm(
            torch.from_numpy(sample.transpose(0, 1, 4, 2, 3)),
            torch.tensor(timestep), torch.from_numpy(ehs),
            torch.from_numpy(add_ids)).numpy().transpose(0, 1, 3, 4, 2)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-3)


def test_full_width_vae_encoder_matches_torch():
    """Real-width KL encoder parity (r2 VERDICT missing #2, VAE half):
    block_out_channels 128/256/512/512 at a 64x64 input, fp32, through the
    real diffusers_to_flax import path. Exercises the asymmetric-padding
    downsamplers and the 512-ch mid attention at width."""
    from torch_svd_vae import TorchVAEEncoder

    from svd_xtend_tpu.core.config import VAEConfig
    from svd_xtend_tpu.models.vae import Encoder

    cfg = VAEConfig()
    torch.manual_seed(11)
    tm = TorchVAEEncoder(cfg).eval()

    x = np.random.RandomState(3).randn(2, 64, 64, 3).astype(np.float32)
    ours = Encoder(cfg, dtype=jnp.float32)
    template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = _import_from_torch(tm, template)

    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        expected = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))
                      ).numpy().transpose(0, 2, 3, 1)
    assert got.shape == expected.shape == (2, 8, 8, 2 * cfg.latent_channels)
    np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-3)


def test_full_width_temporal_decoder_matches_torch():
    """Real-width TemporalDecoder parity: 512->128 up path with
    spatio-temporal resnets, upsamplers, and time_conv_out at width
    (f=2, 8x8 latent), fp32, through diffusers_to_flax."""
    from torch_svd_vae import TorchTemporalDecoder

    from svd_xtend_tpu.core.config import VAEConfig
    from svd_xtend_tpu.models.vae import TemporalDecoder

    cfg = VAEConfig()
    b, f = 1, 2
    torch.manual_seed(13)
    tm = TorchTemporalDecoder(cfg, f).eval()

    z = np.random.RandomState(5).randn(b, f, 8, 8,
                                       cfg.latent_channels).astype(np.float32)
    ours = TemporalDecoder(cfg, dtype=jnp.float32)
    template = ours.init(jax.random.PRNGKey(0), jnp.asarray(z))["params"]
    params = _import_from_torch(tm, template)

    got = np.asarray(ours.apply({"params": params}, jnp.asarray(z)))
    with torch.no_grad():
        expected = tm(torch.from_numpy(z.transpose(0, 1, 4, 2, 3))
                      ).numpy().transpose(0, 1, 3, 4, 2)
    assert got.shape == expected.shape == (b, f, 64, 64, cfg.out_channels)
    np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-3)
