"""Sweep XLA TPU compiler options against the CFG UNet step (the 93% component).

XLA_FLAGS in the local process is a dead end on the axon relay: the local
client aborts on unknown TPU flags (parse_flags_from_env) because the TPU
compiler lives server-side. Per-compile PJRT ``compiler_options`` (AOT
``.lower().compile(compiler_options=...)``) ARE shipped to the server-side
compiler, so each option set can be tried in one process against one model.

Usage: python scripts/sweep_xla_flags.py [--iters 10]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = [
    ("baseline", {}),
    ("vmem32M", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64M", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("no_rwb", {"xla_tpu_rwb_fusion": "false"}),
    ("licm10", {"xla_tpu_licm_size_inflation_ratio": "10.0"}),
    ("no_bf16_reduce", {"xla_tpu_use_bfloat16_for_reduced_precision": "false"}),
    ("dot_mf", {"xla_tpu_dot_dot_fusion": "true"}),
    ("flops_sched", {"xla_tpu_enable_dot_strength_reduction": "false"}),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from svd_xtend_tpu.core.config import PipelineConfig
    from svd_xtend_tpu.diffusion.pipeline import SVDModels, init_pipeline_params

    models = SVDModels(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    cfg = PipelineConfig(height=320, width=512, num_frames=14)
    params = init_pipeline_params(models, jax.random.PRNGKey(0))
    b, f = 1, cfg.num_frames
    h8, w8 = cfg.height // 8, cfg.width // 8

    unet = models.unet()
    x_in = jnp.zeros((2 * b, f, h8, w8, 8), jnp.bfloat16)
    t = jnp.zeros((2 * b,), jnp.float32)
    ehs = jnp.zeros((2 * b, 1, 1024), jnp.bfloat16)
    add_ids = jnp.zeros((2 * b, 3), jnp.float32)

    def unet_step(p, x_in, t, ehs, add_ids):
        return unet.apply({"params": p}, x_in, t, ehs, add_ids)

    lowered = jax.jit(unet_step).lower(params["unet"], x_in, t, ehs, add_ids)
    pull = lambda out: jax.device_get(jnp.sum(out.astype(jnp.float32)))

    results = []
    for name, opts in CONFIGS:
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(
                compiler_options=opts) if opts else lowered.compile()
            dt_c = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 - report per-config
            print(f"{name:16s}      ERR   {opts}\n    {str(e)[:300]}")
            continue
        pull(compiled(params["unet"], x_in, t, ehs, add_ids))  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                pull(compiled(params["unet"], x_in, t, ehs, add_ids))
            best = min(best, (time.perf_counter() - t0) / args.iters * 1e3)
        results.append((name, opts, best))
        print(f"{name:16s} {best:8.2f} ms  (compile {dt_c:.0f}s)  {opts}",
              flush=True)

    if results:
        base = dict((n, m) for n, _, m in results).get("baseline")
        print("\nranked:")
        for name, opts, ms in sorted(results, key=lambda r: r[2]):
            rel = f" ({base / ms:.3f}x)" if base else ""
            print(f"  {ms:8.2f} ms{rel}  {name}")


if __name__ == "__main__":
    main()
