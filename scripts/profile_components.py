"""Component-level TPU timing for the bench operating point (512x320x14f).

Times one CFG UNet step, one chunked VAE decode, and the conditioning
encoders separately, so optimization effort goes where the milliseconds are.
Usage: python scripts/profile_components.py [--steps 25]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from svd_xtend_tpu.core.config import PipelineConfig
from svd_xtend_tpu.diffusion.pipeline import (SVDModels, decode_latents_chunked,
                                              encode_conditioning,
                                              init_pipeline_params)


def timed(name, fn, *args, iters=5):
    # device_get of a reduction forces real completion over the axon relay
    pull = lambda out: jax.device_get(
        jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out))
    pull(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        pull(fn(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:34s} {dt:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--frames", type=int, default=14)
    args = ap.parse_args()

    models = SVDModels(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    cfg = PipelineConfig(height=320, width=512, num_frames=args.frames,
                         num_inference_steps=args.steps)
    params = init_pipeline_params(models, jax.random.PRNGKey(0))
    b, f = 1, cfg.num_frames
    h8, w8 = cfg.height // 8, cfg.width // 8

    unet = models.unet()
    x_in = jnp.zeros((2 * b, f, h8, w8, 8), jnp.bfloat16)
    t = jnp.zeros((2 * b,), jnp.float32)
    ehs = jnp.zeros((2 * b, 1, 1024), jnp.bfloat16)
    add_ids = jnp.zeros((2 * b, 3), jnp.float32)

    @jax.jit
    def unet_step(p, x_in, t, ehs, add_ids):
        return unet.apply({"params": p}, x_in, t, ehs, add_ids)

    dt_unet = timed("UNet fwd (CFG batch 2x14f)", unet_step,
                    params["unet"], x_in, t, ehs, add_ids)

    latents = jnp.zeros((b, f, h8, w8, 4), jnp.float32)
    dec = jax.jit(lambda p, z: decode_latents_chunked(models, p, z,
                                                      cfg.decode_chunk_size))
    dt_dec = timed("VAE temporal decode (chunked)", dec, params, latents)

    image = jnp.zeros((b, cfg.height, cfg.width, 3), jnp.float32)
    enc = jax.jit(lambda p, im, key: encode_conditioning(
        models, p, im, cfg.noise_aug_strength, key))
    dt_enc = timed("CLIP + VAE cond encode", enc, params, image,
                   jax.random.PRNGKey(0))

    total = args.steps * dt_unet + dt_dec + dt_enc
    print(f"{'':34s} ---------")
    print(f"{'sum: steps*unet + decode + encode':34s} {total:9.2f} ms "
          f"({args.steps} steps)")
    print(f"frames/sec implied: {args.frames / (total / 1e3):.2f}")


if __name__ == "__main__":
    main()
