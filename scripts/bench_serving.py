"""Serving-throughput benchmark: img2vid frames/sec/chip vs batch size.

Single-stream latency (bench.py) under-utilizes the MXU at batch 1; a
serving deployment generates several videos concurrently per chip. This
sweeps the batch dimension at the bench operating point and reports
throughput scaling. Usage: python scripts/bench_serving.py [--batches 1 2 4]
"""

import argparse
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

from svd_xtend_tpu.core.config import PipelineConfig
from svd_xtend_tpu.diffusion.pipeline import (SVDModels, generate,
                                              init_pipeline_params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--k", type=int, default=1,
                    help="CFG-cache uncond_reuse_interval arm")
    ap.add_argument("--quant", default=None, choices=[None, "int8"],
                    help="unet/vae quant arm")
    args = ap.parse_args()

    models = SVDModels(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    cfg = PipelineConfig(height=320, width=512, num_frames=14,
                         num_inference_steps=25, decode_chunk_size=8,
                         uncond_reuse_interval=args.k,
                         unet_quant=args.quant, vae_quant=args.quant)
    params = init_pipeline_params(models, jax.random.PRNGKey(0))

    results = []
    for b in args.batches:
        image = jax.random.uniform(jax.random.PRNGKey(1),
                                   (b, cfg.height, cfg.width, 3)) * 2.0 - 1.0

        def run(key):
            out = generate(models, params, image, key, cfg)
            return float(jax.device_get(jnp.sum(out.astype(jnp.float32))))

        run(jax.random.PRNGKey(0))  # compile
        t0 = time.perf_counter()
        for i in range(args.iters):
            run(jax.random.PRNGKey(i))
        dt = (time.perf_counter() - t0) / args.iters
        fps = b * cfg.num_frames / dt
        results.append({"batch": b, "seconds": round(dt, 3),
                        "frames_per_sec_per_chip": round(fps, 3)})
        print(json.dumps(results[-1]))
    print(json.dumps({"metric": "serving_sweep", "k": args.k,
                      "quant": args.quant, "results": results}))


if __name__ == "__main__":
    main()
