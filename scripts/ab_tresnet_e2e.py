"""Whole-pipeline A/B for the fused temporal-resnet kernel.

Runs the bench exact path (generate at operating point A) in THIS process
with SVDX_PALLAS_TRESNET as set by the caller. generate's own jit cache keys
on (models, config) only — the env flag is read at trace time — so each
variant must run in its own process:

    python scripts/ab_tresnet_e2e.py 3                      # OFF
    SVDX_PALLAS_TRESNET=1 python scripts/ab_tresnet_e2e.py 3   # ON

Do NOT wrap generate in another jit here: an outer jit closes over the 4.3GB
param tree as lowered CONSTANTS (r2 incident — the program becomes
multi-GB and the relay cannot take it).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from svd_xtend_tpu.core.config import PipelineConfig
from svd_xtend_tpu.diffusion.pipeline import (SVDModels, generate,
                                              init_pipeline_params)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    flag = os.environ.get("SVDX_PALLAS_TRESNET", "0")
    models = SVDModels(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    cfg = PipelineConfig(height=320, width=512, num_frames=14,
                         num_inference_steps=25, decode_chunk_size=8)
    params = init_pipeline_params(models, jax.random.PRNGKey(0))
    image = jax.random.uniform(jax.random.PRNGKey(1),
                               (1, cfg.height, cfg.width, 3)) * 2.0 - 1.0

    def run(key):
        out = generate(models, params, image, key, cfg)
        return float(jax.device_get(jnp.sum(out.astype(jnp.float32))))

    t0 = time.perf_counter()
    s = run(jax.random.PRNGKey(0))
    print(f"flag={flag}: compile+run {time.perf_counter()-t0:.1f}s "
          f"sum={s:.3f}", flush=True)

    times = []
    for i in range(n):
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(i))
        times.append(time.perf_counter() - t0)
    print(f"tresnet={flag}: {min(times):.3f}s best / "
          f"{sum(times)/len(times):.3f}s mean "
          f"({cfg.num_frames / min(times):.3f} f/s best)", flush=True)


if __name__ == "__main__":
    main()
