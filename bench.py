"""Headline benchmark: img2vid frames/sec/chip at 512x320, 14 frames.

Operating point A of the reference (README.md:17-20 / BASELINE.md): SVD
image-to-video at 512x320, 14 frames, 25 Euler steps, CFG on, chunked
temporal VAE decode (decode_chunk_size=8). Full-size SVD architecture
(1.5B-param UNet, ViT-H CLIP, temporal-decoder VAE) with random bf16 weights
(no pretrained checkpoint is available in this zero-egress environment; the
compute graph is identical to the real checkpoint's).

Prints ONE JSON line:
  {"metric": "img2vid_frames_per_sec_per_chip", "value": N,
   "unit": "frames/sec/chip", "vs_baseline": N}

vs_baseline is value / (2x estimated A100 frames/sec): the BASELINE.json
north star is ">= 2x A100 frames/sec/chip". The reference publishes no
numbers; the A100 estimate (2.8 frames/sec at this operating point, fp16,
25 steps) is derived from commonly reported diffusers SVD timings
(~40 s for 25 frames at 1024x576 on A100 -> scaled by pixel*frame count).
So vs_baseline >= 1.0 means the target is met.
"""

import json
import sys
import time
import traceback

A100_EST_FRAMES_PER_SEC = 2.8
TARGET_MULTIPLIER = 2.0


def run_bench():
    import os

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the full-SVD generate() graph is a long
    # compile over the remote TPU relay; cache it across bench invocations.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize pins the relay platform; honor an explicit
        # CPU request (smoke runs) — env var alone does not stick
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from svd_xtend_tpu.core.config import PipelineConfig
    from svd_xtend_tpu.diffusion.pipeline import SVDModels, generate, init_pipeline_params

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        models = SVDModels(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
        cfg = PipelineConfig(height=320, width=512, num_frames=14,
                             num_inference_steps=25, decode_chunk_size=8)
    else:  # CPU smoke fallback so the bench never hard-fails
        from svd_xtend_tpu.core.config import TINY_CLIP, TINY_UNET, TINY_VAE
        models = SVDModels(unet_config=TINY_UNET, vae_config=TINY_VAE,
                           clip_config=TINY_CLIP, dtype=jnp.float32)
        cfg = PipelineConfig(height=32, width=32, num_frames=2,
                             num_inference_steps=2, decode_chunk_size=2)

    rng = jax.random.PRNGKey(0)
    params = init_pipeline_params(models, rng)  # one jit, lands on device
    image = jax.random.uniform(jax.random.PRNGKey(1),
                               (1, cfg.height, cfg.width, 3)) * 2.0 - 1.0

    # NOTE: on the axon relay block_until_ready() does NOT wait for execution
    # (measured: "33850 TFLOP/s"); a device_get of a scalar reduction does.
    def run_once(key):
        out = generate(models, params, image, key, cfg)
        return float(jax.device_get(jnp.sum(out.astype(jnp.float32))))

    run_once(rng)  # compile (excluded from timing)

    n_iters = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for i in range(n_iters):
        run_once(jax.random.PRNGKey(i))
    dt = (time.perf_counter() - t0) / n_iters

    frames_per_sec = cfg.num_frames / dt

    detail_extra = {}
    if on_tpu:
        # opt-in CFG-cache mode (PERF.md) reported alongside, never as
        # headline — and never allowed to sink the headline: its program is
        # different (lax.cond halves the UNet batch on reuse steps), so it
        # can hit compile issues the exact path doesn't
        try:
            import dataclasses
            cfg3 = dataclasses.replace(cfg, uncond_reuse_interval=3)
            def run3(key):
                out = generate(models, params, image, key, cfg3)
                return float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
            run3(rng)
            t0 = time.perf_counter()
            for i in range(n_iters):
                run3(jax.random.PRNGKey(i))
            dt3 = (time.perf_counter() - t0) / n_iters
            detail_extra["frames_per_sec_cfg_cache_k3"] = round(
                cfg.num_frames / dt3, 3)
        except Exception as e:
            detail_extra["cfg_cache_error"] = f"{type(e).__name__}: {e}"[:200]
        # opt-in W8A8 int8 conv mode (ops/quant.py) reported alongside —
        # same never-the-headline rule as the CFG cache
        try:
            import dataclasses
            cfg8 = dataclasses.replace(cfg, unet_quant="int8",
                                       vae_quant="int8")
            def run8(key):
                out = generate(models, params, image, key, cfg8)
                return float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
            run8(rng)
            t0 = time.perf_counter()
            for i in range(n_iters):
                run8(jax.random.PRNGKey(i))
            dt8 = (time.perf_counter() - t0) / n_iters
            detail_extra["frames_per_sec_int8"] = round(
                cfg.num_frames / dt8, 3)
        except Exception as e:
            detail_extra["int8_error"] = f"{type(e).__name__}: {e}"[:200]
        # fastest defensible mode: DeepCache n3 + int8 + CFG-cache k3
        # composed — measured error budget in eval_approx_r5.json (32.45 dB
        # vs exact ≈ the k3 CFG-lag class; DeepCache n3 and int8 add <1 dB
        # on top). This is the mode that crosses the ≥5.6 f/s/chip north
        # star (6.06 f/s measured, r5).
        try:
            import dataclasses
            cfg83 = dataclasses.replace(cfg, unet_quant="int8",
                                        vae_quant="int8",
                                        uncond_reuse_interval=3,
                                        deep_cache_interval=3)
            def run83(key):
                out = generate(models, params, image, key, cfg83)
                return float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
            run83(rng)
            t0 = time.perf_counter()
            for i in range(n_iters):
                run83(jax.random.PRNGKey(i))
            dt83 = (time.perf_counter() - t0) / n_iters
            detail_extra["frames_per_sec_deep_n3_int8_cfg_k3"] = round(
                cfg.num_frames / dt83, 3)
        except Exception as e:
            detail_extra["deep_n3_int8_cfg_k3_error"] = (
                f"{type(e).__name__}: {e}"[:200])

    return {
        "metric": "img2vid_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(
            frames_per_sec / (TARGET_MULTIPLIER * A100_EST_FRAMES_PER_SEC), 3),
        "detail": {
            "seconds_per_video": round(dt, 3),
            "operating_point": f"{cfg.width}x{cfg.height}x{cfg.num_frames}f, "
                               f"{cfg.num_inference_steps} steps, CFG",
            "platform": "tpu" if on_tpu else "cpu-smoke",
            **detail_extra,
        },
    }


if __name__ == "__main__":
    try:
        result = run_bench()
    except Exception:
        traceback.print_exc(file=sys.stderr)
        result = {"metric": "img2vid_frames_per_sec_per_chip", "value": 0.0,
                  "unit": "frames/sec/chip", "vs_baseline": 0.0,
                  "detail": {"error": "bench failed; see stderr"}}
    print(json.dumps(result))
