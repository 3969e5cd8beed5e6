"""Training-loss assembly: cond-aug, conditioning dropout, EDM loss.

Behavior contract — reference train_svd.py hot loop (:941-1036, SURVEY §3.1):
  - video -> per-frame VAE latents x scaling_factor            (:948, :283-291)
  - first-frame pixel noise-aug with sigma~LogNormal(-3,.5), encode, UNSCALED
    conditioning latent                                        (:954-960)
  - CLIP embedding of the CLEAN first frame                    (:974-976)
  - sigma~LogNormal(0.7,1.6), noisy = x0 + n*sigma, input = noisy*c_in (:963-972)
  - added_time_ids = [fps=7, motion_bucket=127, noise_aug]     (:978-988)
  - InstructPix2Pix-style conditioning dropout: CLIP zeroed when r < 2p,
    image latent zeroed when p <= r < 3p                       (:990-1011)
  - channel-concat cond latent to every frame                  (:1013-1017)
  - EDM denoise + weighted fp32 MSE to the clean latents       (:1020-1036)

Improvements over the reference (documented deltas):
  - per-sample noise_aug_strength (the reference hardcodes cond_sigmas[0]
    with a "batch > 1 unsupported" TODO at :955)
  - VAE encodes run under stop_gradient (the reference keeps them in
    autograd although the VAE is frozen — SURVEY §7 "hard parts")
  - all randomness via explicit jax.random key splits
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import edm
from ..core.config import TrainConfig
from .pipeline import SVDModels, get_add_time_ids

Array = jax.Array


class TrainBatchEncodings(NamedTuple):
    latents: Array            # (B, F, h, w, 4) scaled clean latents
    cond_latents: Array       # (B, h, w, 4) unscaled, noise-augmented
    image_embeds: Array       # (B, 1, D)
    noise_aug: Array          # (B,)


def encode_batch(models: SVDModels, params: dict, pixel_values: Array,
                 rng: Array, cfg: TrainConfig) -> TrainBatchEncodings:
    """Frozen-encoder stage: VAE latents + CLIP embedding (all stop_gradient)."""
    from ..models.clip import preprocess_for_clip

    b, f, h, w, _ = pixel_values.shape
    models.check_resolution(h, w)
    k_lat, k_aug, k_cond = jax.random.split(rng, 3)
    vae = models.vae()
    scaling = models.vae_config.scaling_factor

    # per-frame video latents, sampled from the posterior, scaled. The 2D
    # encoder never mixes frames, so cfg.encode_chunk_size chunks the
    # (b*f) frame batch exactly (full chunks via lax.map + one ragged
    # remainder, like pipeline.decode_latents_chunked) — unchunked, the
    # encoder's top-level activations at 512x320x14f (~3 GB bf16/tensor)
    # exceed a 16 GB chip. Chunked sampling draws the posterior noise
    # per-chunk (same distribution; RNG draw order differs from unchunked).
    frames = pixel_values.reshape(b * f, h, w, 3).astype(models.dtype)
    ds = models.vae_config.downsample_factor
    encode_one = lambda fr, key: vae.apply(
        {"params": params["vae"]}, fr, method=vae.encode).sample(key)
    bf = b * f
    cap = getattr(cfg, "encode_chunk_size", 0) or bf
    cap = min(cap, bf)
    n_full, rem = bf // cap, bf % cap
    parts = []
    keys = jax.random.split(k_lat, n_full + 1)   # last key = ragged remainder
    if n_full:
        stacked = frames[:n_full * cap].reshape(n_full, cap, h, w, 3)
        parts.append(jax.lax.map(
            lambda ck: encode_one(ck[0], ck[1]),
            (stacked, keys[:n_full])).reshape(
            n_full * cap, h // ds, w // ds, -1))
    if rem:
        parts.append(encode_one(frames[n_full * cap:], keys[n_full]))
    sampled = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
    latents = sampled.reshape(b, f, h // ds, w // ds, -1) * scaling

    # noise-augmented first frame -> unscaled conditioning latent
    cond_sigmas = edm.rand_log_normal(k_aug, (b,), cfg.cond_aug_loc, cfg.cond_aug_std)
    first = pixel_values[:, 0].astype(jnp.float32)
    noisy_first = first + cond_sigmas[:, None, None, None] * jax.random.normal(
        k_cond, first.shape, jnp.float32)
    cond_post = vae.apply({"params": params["vae"]},
                          noisy_first.astype(models.dtype), method=vae.encode)
    cond_latents = cond_post.sample(jax.random.fold_in(k_cond, 1))

    # CLIP embedding of the clean first frame
    clip_in = preprocess_for_clip(first, models.clip_config)
    image_embeds = models.clip().apply({"params": params["clip"]}, clip_in)[:, None, :]

    return TrainBatchEncodings(
        latents=jax.lax.stop_gradient(latents.astype(jnp.float32)),
        cond_latents=jax.lax.stop_gradient(cond_latents.astype(jnp.float32)),
        image_embeds=jax.lax.stop_gradient(image_embeds.astype(jnp.float32)),
        noise_aug=cond_sigmas,
    )


def conditioning_dropout(encodings: TrainBatchEncodings, rng: Array,
                         prob: float) -> TrainBatchEncodings:
    """InstructPix2Pix §3.2.1 scheme (reference train_svd.py:990-1011):
    one uniform draw r per sample; CLIP zeroed for r < 2p; image latent zeroed
    for p <= r < 3p — i.e. CLIP-only dropped for r < p, BOTH dropped for
    [p, 2p), image-only for [2p, 3p)."""
    if prob <= 0.0:
        return encodings
    b = encodings.latents.shape[0]
    r = jax.random.uniform(rng, (b,))
    keep_clip = (r >= 2.0 * prob).astype(jnp.float32)[:, None, None]
    drop_image = jnp.logical_and(r >= prob, r < 3.0 * prob)
    keep_image = 1.0 - drop_image.astype(jnp.float32)
    return encodings._replace(
        image_embeds=encodings.image_embeds * keep_clip,
        cond_latents=encodings.cond_latents * keep_image[:, None, None, None],
    )


def edm_denoising_loss(models: SVDModels, unet_params: dict,
                       encodings: TrainBatchEncodings, rng: Array,
                       cfg: TrainConfig, boxes: Array = None,
                       box_mask: Array = None) -> Array:
    """The differentiable tail: sigma sampling, UNet forward, weighted MSE."""
    latents = encodings.latents
    b, f = latents.shape[:2]
    k_sigma, k_noise = jax.random.split(rng)

    sigmas = edm.rand_log_normal(k_sigma, (b,), cfg.p_mean, cfg.p_std)
    sigmas_b = sigmas.reshape(b, 1, 1, 1, 1)
    noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
    noisy = latents + noise * sigmas_b
    model_in = edm.precondition_inputs(noisy, sigmas_b)
    timesteps = edm.sigma_to_t(sigmas)

    cond = jnp.broadcast_to(encodings.cond_latents[:, None],
                            latents.shape[:4] + (encodings.cond_latents.shape[-1],))
    model_in = jnp.concatenate([model_in, cond], axis=-1)

    add_ids = get_add_time_ids(7.0, 127.0, encodings.noise_aug, b)
    pred = models.unet(remat=cfg.remat_policy).apply(
        {"params": unet_params}, model_in.astype(models.dtype), timesteps,
        encodings.image_embeds.astype(models.dtype), add_ids, boxes, box_mask)

    denoised = edm.denoise(pred, noisy, sigmas_b)
    return edm.weighted_denoising_loss(denoised, latents, sigmas_b)


def training_loss(models: SVDModels, unet_params: dict, frozen_params: dict,
                  pixel_values: Array, rng: Array, cfg: TrainConfig,
                  boxes: Array = None, box_mask: Array = None) -> Array:
    """Full loss for one micro-batch of (B, F, H, W, 3) pixels in [-1, 1].

    boxes/box_mask ((B, F, N, 4) / (B, F, N)) enable Tracklet2Video training
    (the capability the reference only teases, README.md:57-70): the gated
    injection is zero-init, so box-conditioned finetuning starts exactly at
    the pretrained model. Box conditioning gets its own per-sample dropout
    (whole mask zeroed with conditioning_dropout_prob, independent of the
    InstructPix2Pix bands) so the model trains on the all-null-token input
    the CFG unconditional half feeds it at inference (pipeline.py:
    uncond half gets fully-masked boxes)."""
    k_enc, k_drop, k_box, k_loss = jax.random.split(rng, 4)
    params = {"unet": unet_params, **frozen_params}
    enc = encode_batch(models, params, pixel_values, k_enc, cfg)
    enc = conditioning_dropout(enc, k_drop, cfg.conditioning_dropout_prob)
    if boxes is not None and cfg.conditioning_dropout_prob > 0:
        if box_mask is None:
            box_mask = jnp.ones(boxes.shape[:3], jnp.float32)
        keep = (jax.random.uniform(k_box, (boxes.shape[0],))
                >= cfg.conditioning_dropout_prob)
        box_mask = box_mask * keep[:, None, None].astype(box_mask.dtype)
    return edm_denoising_loss(models, unet_params, enc, k_loss, cfg,
                              boxes, box_mask)
