"""Quality-vs-speed curves for the approximate inference modes.

The fast numbers in bench.py's `detail` (CFG-cache k=2/3, int8 W8A8) were
previously speed-only; this script attaches an error budget to each by
comparing every mode's output against the EXACT pipeline output generated
from the same seed and weights (r2 VERDICT weak #5; validation contract of
the reference at train_svd.py:1092-1157):

  - PSNR(approx, exact) over the [-1, 1] video (pixel drift),
  - CLIP drift: mean cosine between per-frame CLIP embeddings of approx and
    exact frames (semantic drift, computed with the pipeline's own frozen
    CLIP tower — no extra weights needed),
  - the standard utils/metrics.py report (clip_sim vs cond image, temporal
    consistency, flicker) for each mode side by side,
  - wall-clock s/video for the speed axis.

Weights are fixed-seed random (no pretrained checkpoint ships in this
zero-egress environment) — pixel/embedding DRIFT between two runs of the
same weights is still exact and is the quantity of interest here.

Usage:
  python scripts/eval_approx.py                  # full size on TPU
  JAX_PLATFORMS=cpu python scripts/eval_approx.py --smoke   # tiny CPU
"""

import argparse
import dataclasses
import json
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--iters", type=int, default=2,
                    help="timing iterations per mode (first run excluded)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny configs (CPU CI smoke)")
    ap.add_argument("--out", default=None, help="write the JSON table here")
    args = ap.parse_args()

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from svd_xtend_tpu.core.config import PipelineConfig
    from svd_xtend_tpu.diffusion.pipeline import (SVDModels, generate,
                                                  init_pipeline_params)
    from svd_xtend_tpu.utils import metrics as M

    if args.smoke:
        from svd_xtend_tpu.core.config import TINY_CLIP, TINY_UNET, TINY_VAE
        models = SVDModels(unet_config=TINY_UNET, vae_config=TINY_VAE,
                           clip_config=TINY_CLIP, dtype=jnp.float32)
        base = PipelineConfig(height=32, width=32, num_frames=2,
                              num_inference_steps=3, decode_chunk_size=2)
    else:
        models = SVDModels(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
        base = PipelineConfig(height=args.height, width=args.width,
                              num_frames=args.frames,
                              num_inference_steps=args.steps,
                              decode_chunk_size=8)

    rng = jax.random.PRNGKey(0)
    params = init_pipeline_params(models, rng)
    image = jax.random.uniform(jax.random.PRNGKey(1),
                               (1, base.height, base.width, 3)) * 2.0 - 1.0
    gen_key = jax.random.PRNGKey(111)   # the reference's README seed

    modes = [
        ("exact", base),
        ("cfg_cache_k2", dataclasses.replace(base, uncond_reuse_interval=2)),
        ("cfg_cache_k3", dataclasses.replace(base, uncond_reuse_interval=3)),
        ("int8", dataclasses.replace(base, unet_quant="int8",
                                     vae_quant="int8")),
        ("int8_cfg_k3", dataclasses.replace(base, unet_quant="int8",
                                            vae_quant="int8",
                                            uncond_reuse_interval=3)),
    ]

    def run_mode(cfg):
        video = generate(models, params, image, gen_key, cfg)
        # relay-sync by pulling a scalar (block_until_ready is a no-op on axon)
        float(jax.device_get(jnp.sum(video.astype(jnp.float32))))
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            v = generate(models, params, image, gen_key, cfg)
            float(jax.device_get(jnp.sum(v.astype(jnp.float32))))
            times.append(time.perf_counter() - t0)
        return video, min(times)

    @jax.jit
    def drift_metrics(approx, exact):
        p = M.psnr(approx, exact)[0]
        b, f = approx.shape[:2]
        ea = M._embed_frames(params["clip"], models.clip_config,
                             approx.reshape((b * f,) + approx.shape[2:]))
        ee = M._embed_frames(params["clip"], models.clip_config,
                             exact.reshape((b * f,) + exact.shape[2:]))
        return p, jnp.mean(jnp.sum(ea * ee, axis=-1))

    report_fn = jax.jit(lambda v: M.video_report(
        params["clip"], models.clip_config, image, v))

    results = {}
    exact_video = None
    for name, cfg in modes:
        try:
            video, dt = run_mode(cfg)
        except Exception as e:   # keep the table going if one mode breaks
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            continue
        row = {"s_per_video": round(dt, 3),
               "frames_per_sec": round(cfg.num_frames / dt, 3)}
        if name == "exact":
            exact_video = video
        elif exact_video is not None:
            p, cd = drift_metrics(video, exact_video)
            row["psnr_vs_exact_db"] = round(float(p), 2)
            row["clip_cos_vs_exact"] = round(float(cd), 4)
            row["max_abs_err"] = round(float(jnp.max(jnp.abs(
                video.astype(jnp.float32)
                - exact_video.astype(jnp.float32)))), 4)
        rep = report_fn(video)
        row.update({k: round(float(v), 4) for k, v in rep.items()})
        results[name] = row
        print(f"{name:14s} " + "  ".join(f"{k}={v}" for k, v in row.items()),
              flush=True)

    table = {"operating_point": f"{base.width}x{base.height}x"
                                f"{base.num_frames}f {base.num_inference_steps}st",
             "platform": jax.devices()[0].platform,
             "modes": results}
    print("\n" + json.dumps(table, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(table, f, indent=1)


if __name__ == "__main__":
    main()
