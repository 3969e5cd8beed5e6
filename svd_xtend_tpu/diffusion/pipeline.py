"""StableVideoDiffusionPipeline — image-to-video inference, one jit.

Behavior contract (SURVEY.md §3.4, reference train_svd.py:1130-1140 and
infer_svd.ipynb cell 2): CLIP-encode the image (+ zero embedding for CFG),
VAE-encode the noise-augmented image (+ zero latent for CFG), build
added_time_ids = [fps - fps_offset, motion_bucket_id, noise_aug_strength]
(the upstream pipeline embeds fps-1 while training feeds raw fps — both are
exposed via PipelineConfig.fps_offset; see SURVEY.md §7 "fps convention trap"),
init latents at sigma_max, Euler-denoise with a frame-linear guidance scale
(linspace min->max over frames), decode in temporal chunks, return video.

TPU-first design: the whole denoise loop is a ``lax.scan`` inside a single
jit — no per-step host round-trips; CFG runs as a stacked batch of 2 so the
UNet is invoked once per step; decode chunking is a ``lax.map`` over
equal-size frame chunks (static shapes).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..core.config import (CLIPVisionConfig, PipelineConfig, SchedulerConfig,
                           UNetConfig, VAEConfig)
from ..models.clip import CLIPVisionModelWithProjection, preprocess_for_clip
from ..models.unet import UNetSpatioTemporalConditionModel
from ..models.vae import AutoencoderKLTemporalDecoder, DiagonalGaussian
from .scheduler import EulerDiscreteScheduler

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SVDModels:
    """Static bundle of module definitions (hashable -> jit-static)."""

    unet_config: UNetConfig = UNetConfig()
    vae_config: VAEConfig = VAEConfig()
    clip_config: CLIPVisionConfig = CLIPVisionConfig()
    scheduler_config: SchedulerConfig = SchedulerConfig()
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    attn_impl: str = "auto"

    def unet(self, remat: Any = False) -> UNetSpatioTemporalConditionModel:
        return UNetSpatioTemporalConditionModel(
            self.unet_config, dtype=self.dtype, param_dtype=self.param_dtype,
            attn_impl=self.attn_impl, remat=remat)

    def vae(self) -> AutoencoderKLTemporalDecoder:
        return AutoencoderKLTemporalDecoder(self.vae_config, dtype=self.dtype,
                                            param_dtype=self.param_dtype)

    def clip(self) -> CLIPVisionModelWithProjection:
        return CLIPVisionModelWithProjection(self.clip_config, dtype=self.dtype,
                                             param_dtype=self.param_dtype)

    def scheduler(self) -> EulerDiscreteScheduler:
        return EulerDiscreteScheduler(self.scheduler_config)

    def check_resolution(self, height: int, width: int) -> None:
        """THE train/inference resolution guard: H and W must survive the
        VAE downsample times the UNet's 2^(levels-1) (the reference has the
        same implicit constraint via diffusers blocks)."""
        ds = self.vae_config.downsample_factor
        unet_div = ds * 2 ** (len(self.unet_config.block_out_channels) - 1)
        if height % unet_div or width % unet_div:
            raise ValueError(
                f"height/width must be divisible by {unet_div} "
                f"(VAE {ds}x downsample x UNet levels); got {width}x{height}")

    def with_tracklet(self, dim: int, heads: int = None,
                      gate_init: float = None) -> "SVDModels":
        """This bundle with the Tracklet2Video UNet branch enabled — the one
        spelling every entry point (train CLI, examples, benches) uses, so
        train and inference configs can't diverge."""
        import dataclasses
        kw = {"tracklet_dim": dim}
        if heads is not None:
            kw["tracklet_heads"] = heads
        if gate_init is not None:
            kw["tracklet_gate_init"] = gate_init
        return dataclasses.replace(
            self, unet_config=dataclasses.replace(self.unet_config, **kw))


@functools.partial(jax.jit, static_argnames=("models", "height", "width"))
def init_pipeline_params(models: SVDModels, rng: Array,
                         height: int = 64, width: int = 64) -> dict:
    """Random-init parameter trees for all three models (for tests/bench;
    real weights come from io.convert.load_diffusers_checkpoint).

    One jit: flax ``init`` is otherwise eager and dispatches hundreds of tiny
    op-by-op compiles, which is minutes of round-trips on a remote TPU relay.
    """
    k1, k2, k3 = jax.random.split(rng, 3)
    f = 2
    unet_args = [
        jnp.zeros((1, f, height // models.vae_config.downsample_factor,
                   width // models.vae_config.downsample_factor,
                   models.unet_config.in_channels)),
        jnp.zeros(()),
        jnp.zeros((1, 1, models.unet_config.cross_attention_dim)),
        jnp.zeros((1, 3)),
    ]
    if models.unet_config.tracklet_dim > 0:
        # dummy boxes so the Tracklet2Video branch's params materialize
        unet_args += [jnp.zeros((1, f, 1, 4)), jnp.zeros((1, f, 1))]
    unet_vars = models.unet().init(k1, *unet_args)
    vae_vars = models.vae().init(
        k2, jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(0))
    c = models.clip_config
    clip_vars = models.clip().init(
        k3, jnp.zeros((1, c.image_size, c.image_size, 3)))
    return {"unet": unet_vars["params"], "vae": vae_vars["params"],
            "clip": clip_vars["params"]}


def encode_conditioning(
    models: SVDModels,
    params: dict,
    image: Array,                 # (B, H, W, 3) in [-1, 1]
    noise_aug_strength: Array,    # scalar or (B,)
    rng: Array,
    *,
    sample_posterior: bool = False,
):
    """CLIP embedding + (noise-augmented, UNSCALED) first-frame VAE latent.

    The conditioning latent is intentionally NOT multiplied by the VAE
    scaling factor (reference divides it back out at train_svd.py:959-960;
    the upstream pipeline likewise concatenates the unscaled latent).
    """
    clip_in = preprocess_for_clip(image, models.clip_config)
    image_embeds = models.clip().apply(
        {"params": params["clip"]}, clip_in)[:, None, :]   # (B, 1, D)

    k_aug, k_sample = jax.random.split(rng)
    aug = jnp.asarray(noise_aug_strength, jnp.float32).reshape(-1, 1, 1, 1)
    noisy_image = image + aug * jax.random.normal(k_aug, image.shape, jnp.float32)
    vae = models.vae()
    posterior = vae.apply({"params": params["vae"]}, noisy_image.astype(models.dtype),
                          method=vae.encode)
    cond_latent = posterior.sample(k_sample) if sample_posterior else posterior.mode()
    return image_embeds, cond_latent.astype(jnp.float32)


def get_add_time_ids(fps: float, motion_bucket_id: float, noise_aug_strength: Array,
                     batch: int) -> Array:
    """[fps, motion_bucket_id, noise_aug] per sample
    (reference _get_add_time_ids, train_svd.py:878-898)."""
    aug = jnp.broadcast_to(jnp.asarray(noise_aug_strength, jnp.float32).reshape(-1), (batch,))
    return jnp.stack([
        jnp.full((batch,), fps, jnp.float32),
        jnp.full((batch,), motion_bucket_id, jnp.float32),
        aug,
    ], axis=1)


def decode_latents_chunked(models: SVDModels, params: dict, latents: Array,
                           decode_chunk_size: int,
                           quant_mode: Optional[str] = None) -> Array:
    """(B, F, h, w, 4) scaled latents -> (B, F, H, W, 3) pixels in [-1, 1].

    Chunked over frames exactly like the reference pipeline's
    decode_chunk_size=8 (train_svd.py:1135; diffusers decodes
    `latents[i : i + chunk]` for i in range(0, F, chunk)): full chunks via a
    lax.map plus one RAGGED remainder decode. Chunks must contain only real
    frames — the temporal decoder's frame-axis convs (models/vae.py) mix
    frames within a chunk, so padding a chunk with zero latents would bleed
    'black' frames into the real trailing frames (caught in review; the
    previous equal-chunks-with-pad scheme corrupted the last frames whenever
    F was not divisible by the chunk count).
    """
    b, f, h, w, c = latents.shape
    z = latents / models.vae_config.scaling_factor
    cap = min(decode_chunk_size, f)
    n_full = f // cap
    rem = f - n_full * cap

    vae = models.vae()
    decode_one = lambda zc: vae.apply({"params": params["vae"]},
                                      zc.astype(models.dtype), method=vae.decode)
    from ..ops import quant as _q
    ds = models.vae_config.downsample_factor
    parts = []
    with _q.quantized(quant_mode):       # trace-time scope: decoder convs
        if n_full:
            zf = z[:, :n_full * cap].reshape(b, n_full, cap, h, w, c)
            frames = jax.lax.map(decode_one, zf.transpose(1, 0, 2, 3, 4, 5))
            parts.append(frames.transpose(1, 0, 2, 3, 4, 5).reshape(
                b, n_full * cap, ds * h, ds * w, -1))
        if rem:
            parts.append(decode_one(z[:, n_full * cap:]))
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    return out.astype(jnp.float32)


def generate(
    models: SVDModels,
    params: dict,
    image: Array,                  # (B, H, W, 3) in [-1, 1]
    rng: Array,
    config: PipelineConfig = PipelineConfig(),
    boxes: Optional[Array] = None,      # (B, F, N, 4) Tracklet2Video cond
    box_mask: Optional[Array] = None,   # (B, F, N)
    latent_shard: Optional[Any] = None, # NamedSharding for the (B,F,...) video
) -> Array:
    """img2vid: returns (B, F, H, W, 3) pixels in [-1, 1].

    config.unet_quant / config.vae_quant select the opt-in W8A8 paths; the
    quant scopes are set inside _generate around the UNet / decoder apply
    sites (trace-time reads; config is a static jit arg, so each mode
    compiles separately and cache hits are mode-correct).

    latent_shard (multi-chip latency mode — parallel/sharding.py
    make_sharded_generate): a NamedSharding constraining the latent video's
    (B, F) axes, e.g. P('data', 'frames'); None on a single chip.
    """
    return _generate(models, params, image, rng, config, boxes, box_mask,
                     latent_shard=latent_shard)


@functools.partial(jax.jit,
                   static_argnames=("models", "config", "latent_shard"))
def _generate(
    models: SVDModels,
    params: dict,
    image: Array,
    rng: Array,
    config: PipelineConfig = PipelineConfig(),
    boxes: Optional[Array] = None,
    box_mask: Optional[Array] = None,
    latent_shard: Optional[Any] = None,
) -> Array:
    cfg = config
    b = image.shape[0]
    f = cfg.num_frames
    ds = models.vae_config.downsample_factor
    models.check_resolution(cfg.height, cfg.width)
    h8, w8 = cfg.height // ds, cfg.width // ds
    lat_c = models.vae_config.latent_channels
    k_cond, k_init = jax.random.split(rng)

    # --- conditioning (+ zeroed uncond half for CFG) ---
    image_embeds, cond_latent = encode_conditioning(
        models, params, image, cfg.noise_aug_strength, k_cond)
    add_ids = get_add_time_ids(cfg.fps - cfg.fps_offset, cfg.motion_bucket_id,
                               cfg.noise_aug_strength, b)

    # Stacked CFG batch, INTERLEAVED per sample: [u0, c0, u1, c1, ...].
    # Batch elements are independent in the UNet, so this is exactly the
    # reference's [uncond..., cond...] concat up to batch order — but under
    # data-parallel sharding each device keeps BOTH halves of its own
    # samples, so the denoise loop needs zero collectives (a halves-concat
    # layout forces a collective-permute pair around every UNet call when
    # dp == batch; asserted in tests/test_sharding.py dp8).
    def cfg_stack(u: Array, c: Array) -> Array:
        return jnp.stack([u, c], axis=1).reshape((2 * u.shape[0],)
                                                 + u.shape[1:])

    def cfg_unstack(x: Array):
        r = x.reshape((-1, 2) + x.shape[1:])
        return r[:, 0], r[:, 1]

    ehs = cfg_stack(jnp.zeros_like(image_embeds), image_embeds)
    cond_lat_c = jnp.broadcast_to(cond_latent[:, None],
                                  (b, f, h8, w8, lat_c))
    if latent_shard is not None:
        # multi-chip latency mode: pin the video's (B, F) layout so GSPMD
        # shards the whole denoise loop over the frames axis
        cond_lat_c = jax.lax.with_sharding_constraint(cond_lat_c, latent_shard)
    cond_lat2 = cfg_stack(jnp.zeros_like(cond_lat_c), cond_lat_c)
    add_ids2 = cfg_stack(add_ids, add_ids)

    scheduler = models.scheduler()
    sigmas = scheduler.sigmas(cfg.num_inference_steps)
    latents = jax.random.normal(k_init, (b, f, h8, w8, lat_c),
                                jnp.float32) * scheduler.init_noise_sigma()
    if latent_shard is not None:
        latents = jax.lax.with_sharding_constraint(latents, latent_shard)

    guidance = jnp.linspace(cfg.min_guidance_scale, cfg.max_guidance_scale, f,
                            dtype=jnp.float32).reshape(1, f, 1, 1, 1)
    unet = models.unet()

    boxes2 = mask2 = None
    if boxes is not None:
        # CFG: unconditional half gets fully-masked (null) boxes
        boxes2 = cfg_stack(jnp.zeros_like(boxes), boxes)
        if box_mask is None:
            box_mask = jnp.ones(boxes.shape[:3], jnp.float32)
        mask2 = cfg_stack(jnp.zeros_like(box_mask), box_mask)

    def unet_out(x_in, t_b, ehs_, add_ids_, boxes_, mask_, **deep_kw):
        from ..ops import quant as _q
        with _q.quantized(cfg.unet_quant):   # trace-time scope: UNet convs only
            out = unet.apply({"params": params["unet"]},
                             x_in.astype(models.dtype),
                             t_b, ehs_, add_ids_, boxes_, mask_, **deep_kw)
        if isinstance(out, tuple):           # return_deep=True
            return out[0].astype(jnp.float32), out[1]
        return out.astype(jnp.float32)

    def cfg_pair(latents, sigma):
        """(uncond, cond) UNet outputs as one stacked batch (exact path)."""
        x_in = cfg_stack(latents, latents)
        x_in = scheduler.scale_model_input(x_in, sigma)
        x_in = jnp.concatenate([x_in, cond_lat2], axis=-1)   # 8-channel input
        t = jnp.broadcast_to(scheduler.timestep(sigma), (2 * b,))
        out = unet_out(x_in, t, ehs, add_ids2, boxes2, mask2)
        return cfg_unstack(out)

    k_reuse = max(1, cfg.uncond_reuse_interval)
    n_deep = max(1, cfg.deep_cache_interval)
    if n_deep > 1:
        # DeepCache (PipelineConfig.deep_cache_interval, models/unet.py):
        # every n_deep-th step runs the full UNet and caches the deep trunk;
        # in between only the high-res levels recompute around it. Composes
        # with the CFG cache (uncond_reuse_interval): per-branch deep caches
        # live in the interleaved stacked layout, the uncond cache as before.
        d = cfg.deep_cache_depth
        rev_ch = list(reversed(models.unet_config.block_out_channels))
        n_up = len(rev_ch)
        deep_c_ch = rev_ch[n_up - d - 1]
        dshape = (2 * b, f, h8 // 2 ** (d - 1), w8 // 2 ** (d - 1), deep_c_ch)

        def pair_full(latents, sigma):
            x_in = cfg_stack(latents, latents)
            x_in = scheduler.scale_model_input(x_in, sigma)
            x_in = jnp.concatenate([x_in, cond_lat2], axis=-1)
            t = jnp.broadcast_to(scheduler.timestep(sigma), (2 * b,))
            out, deep2 = unet_out(x_in, t, ehs, add_ids2, boxes2, mask2,
                                  return_deep=True, cache_depth=d)
            u, c = cfg_unstack(out)
            return u, c, deep2

        def pair_shallow(latents, sigma, deep2):
            x_in = cfg_stack(latents, latents)
            x_in = scheduler.scale_model_input(x_in, sigma)
            x_in = jnp.concatenate([x_in, cond_lat2], axis=-1)
            t = jnp.broadcast_to(scheduler.timestep(sigma), (2 * b,))
            out = unet_out(x_in, t, ehs, add_ids2, boxes2, mask2,
                           cached_deep=deep2, cache_depth=d)
            return cfg_unstack(out)

        def cond_half(latents, sigma, **deep_kw):
            x_in = scheduler.scale_model_input(latents, sigma)
            x_in = jnp.concatenate([x_in, cond_lat_c], axis=-1)
            t = jnp.broadcast_to(scheduler.timestep(sigma), (b,))
            return unet_out(x_in, t, image_embeds, add_ids, boxes,
                            None if boxes is None else box_mask, **deep_kw)

        steps = sigmas.shape[0] - 1
        xs = (jnp.arange(steps), sigmas[:-1], sigmas[1:])
        deep0 = jnp.zeros(dshape, models.dtype)

        def euler(latents, uncond, cond, sigma, sigma_next):
            model_out = uncond + guidance * (cond - uncond)
            denoised = scheduler.denoised(model_out, latents, sigma)
            return scheduler.step(latents, denoised, sigma, sigma_next)

        if k_reuse == 1:
            def step(carry, xs_t):
                latents, deep2 = carry
                i, sigma, sigma_next = xs_t
                u, c, deep2 = jax.lax.cond(
                    i % n_deep == 0,
                    lambda: pair_full(latents, sigma),
                    lambda: pair_shallow(latents, sigma, deep2) + (deep2,))
                return (euler(latents, u, c, sigma, sigma_next), deep2), None

            (latents, _), _ = jax.lax.scan(step, (latents, deep0), xs)
        else:
            def step(carry, xs_t):
                latents, cached_uncond, deep2 = carry
                i, sigma, sigma_next = xs_t

                def both_fresh():
                    return pair_full(latents, sigma)

                def cond_only_deep_fresh():
                    c, deep_c = cond_half(latents, sigma,
                                          return_deep=True, cache_depth=d)
                    deep_u, _ = cfg_unstack(deep2)
                    return cached_uncond, c, cfg_stack(deep_u, deep_c)

                def cond_only_deep_stale():
                    _, deep_c = cfg_unstack(deep2)
                    c = cond_half(latents, sigma,
                                  cached_deep=deep_c, cache_depth=d)
                    return cached_uncond, c, deep2

                # Uncond-refresh steps (i % k == 0) run the FULL pair even
                # when i % n != 0: the uncond deep trunk otherwise only
                # refreshes where both intervals coincide (up to lcm(k, n)
                # steps stale — ADVICE r4), so its staleness would exceed the
                # per-knob budgets measured individually. This bounds uncond
                # trunk staleness at k and cond trunk staleness at n.
                idx = ((i % k_reuse == 0).astype(jnp.int32) * 2
                       + (i % n_deep == 0).astype(jnp.int32))
                u, c, deep2 = jax.lax.switch(
                    idx, [cond_only_deep_stale, cond_only_deep_fresh,
                          both_fresh, both_fresh])
                nxt = euler(latents, u, c, sigma, sigma_next)
                return (nxt, u, deep2), None

            (latents, _, _), _ = jax.lax.scan(
                step, (latents, jnp.zeros_like(latents), deep0), xs)
    elif k_reuse == 1:
        def step(latents, sig_pair):
            sigma, sigma_next = sig_pair
            uncond, cond = cfg_pair(latents, sigma)
            model_out = uncond + guidance * (cond - uncond)
            denoised = scheduler.denoised(model_out, latents, sigma)
            return scheduler.step(latents, denoised, sigma, sigma_next), None

        latents, _ = jax.lax.scan(step, latents, (sigmas[:-1], sigmas[1:]))
    else:
        # CFG caching (PipelineConfig.uncond_reuse_interval): cond branch
        # every step, uncond refreshed every k-th step and carried between
        def cond_only(latents, sigma, cached_uncond):
            x_in = scheduler.scale_model_input(latents, sigma)
            x_in = jnp.concatenate([x_in, cond_lat_c], axis=-1)
            t = jnp.broadcast_to(scheduler.timestep(sigma), (b,))
            out = unet_out(x_in, t, image_embeds, add_ids, boxes,
                           None if boxes is None else box_mask)
            return cached_uncond, out

        def step(carry, xs):
            latents, cached_uncond = carry
            i, sigma, sigma_next = xs
            uncond, cond = jax.lax.cond(
                i % k_reuse == 0,
                lambda: cfg_pair(latents, sigma),
                lambda: cond_only(latents, sigma, cached_uncond))
            model_out = uncond + guidance * (cond - uncond)
            denoised = scheduler.denoised(model_out, latents, sigma)
            nxt = scheduler.step(latents, denoised, sigma, sigma_next)
            return (nxt, uncond), None

        init = (latents, jnp.zeros_like(latents))
        steps = sigmas.shape[0] - 1
        (latents, _), _ = jax.lax.scan(
            step, init,
            (jnp.arange(steps), sigmas[:-1], sigmas[1:]))
    video = decode_latents_chunked(models, params, latents,
                                   cfg.decode_chunk_size,
                                   quant_mode=cfg.vae_quant)
    return jnp.clip(video, -1.0, 1.0)


def generate_frames_uint8(models: SVDModels, params: dict, image: Array, rng: Array,
                          config: PipelineConfig = PipelineConfig()):
    """Host-side helper: uint8 numpy frames for export (io.media)."""
    import numpy as np
    video = np.asarray(generate(models, params, image, rng, config))
    return list((((video[0] + 1.0) / 2.0).clip(0, 1) * 255).astype(np.uint8))
