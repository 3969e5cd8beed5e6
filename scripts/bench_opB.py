"""Operating point B: the reference's inference default (infer_svd.ipynb
cell 2; SURVEY.md §6): 1024x576, 25 frames, 25 steps, CFG, decode_chunk 8.

Prints one JSON line per arm. Commonly quoted A100 diffusers timing for
this point is ~40 s/video (fp16, 25 steps) — the direct hardware-for-
hardware comparison, unlike bench.py's scaled estimate.

Usage: python scripts/bench_opB.py [--pallas-conv MODE] [--iters N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas-conv", default=None,
                    help="override SVDX_PALLAS_CONV for this run")
    ap.add_argument("--margin", default=None,
                    help="override SVDX_PALLAS_CONV_MARGIN")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--k", type=int, default=1,
                    help="CFG-cache uncond_reuse_interval (1 = exact)")
    ap.add_argument("--quant", default=None,
                    help="unet/vae quant mode (e.g. int8)")
    ap.add_argument("--deep", type=int, default=1,
                    help="DeepCache deep_cache_interval (1 = exact)")
    ap.add_argument("--deep-depth", type=int, default=1,
                    help="DeepCache deep_cache_depth")
    args = ap.parse_args()
    if args.pallas_conv is not None:
        os.environ["SVDX_PALLAS_CONV"] = args.pallas_conv
    if args.margin is not None:
        os.environ["SVDX_PALLAS_CONV_MARGIN"] = args.margin

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from svd_xtend_tpu.core.config import PipelineConfig
    from svd_xtend_tpu.diffusion.pipeline import (SVDModels, generate,
                                                  init_pipeline_params)

    models = SVDModels(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    cfg = PipelineConfig(height=576, width=1024, num_frames=25,
                         num_inference_steps=25, decode_chunk_size=8,
                         uncond_reuse_interval=args.k,
                         unet_quant=args.quant, vae_quant=args.quant,
                         deep_cache_interval=args.deep,
                         deep_cache_depth=args.deep_depth)
    rng = jax.random.PRNGKey(0)
    params = init_pipeline_params(models, rng)
    image = jax.random.uniform(jax.random.PRNGKey(1),
                               (1, cfg.height, cfg.width, 3)) * 2.0 - 1.0

    def run_once(key):
        out = generate(models, params, image, key, cfg)
        return float(jax.device_get(jnp.sum(out.astype(jnp.float32))))

    t0 = time.perf_counter()
    run_once(rng)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(args.iters):
        run_once(jax.random.PRNGKey(i))
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": "img2vid_seconds_per_video_1024x576x25f",
        "mode": ("exact" if args.k == 1 and not args.quant and args.deep == 1
                 else f"k{args.k}"
                 + (f"+{args.quant}" if args.quant else "")
                 + (f"+deepN{args.deep}d{args.deep_depth}"
                    if args.deep > 1 else "")),
        "value": round(dt, 3),
        "frames_per_sec_per_chip": round(cfg.num_frames / dt, 3),
        "pallas_conv": os.environ.get("SVDX_PALLAS_CONV", "table"),
        "margin": os.environ.get("SVDX_PALLAS_CONV_MARGIN", "10"),
        "vs_a100_40s": round(40.0 / dt, 2),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
