"""Training-throughput benchmark: finetune steps/sec at the reference
operating point (512x320, 14 frames, bs=1/chip — README.md:42-54, temporal
scope as shipped at train_svd.py:758-766; pass --mode full for the full-UNet
target in BASELINE.md).

Not the driver entry point (that's bench.py); prints one JSON line too.
"""

import argparse
import json
import sys
import time
import traceback


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["temporal", "full", "lora"],
                   default="temporal")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--frames", type=int, default=14)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--remat", choices=["none", "block", "outer"],
                   default="block")
    p.add_argument("--grad-dtype", choices=["fp32", "bf16"], default="fp32")
    p.add_argument("--max-grad-norm", type=float, default=1.0,
                   help="0 disables global-norm clipping — the reference's "
                        "ACTUAL behavior (train_svd.py parses the flag but "
                        "never clips), and the memory-relevant choice for "
                        "full-FT: the clip's global norm is a barrier that "
                        "forces the whole fp32 grad tree live at once; "
                        "without it XLA folds each leaf's optimizer chain "
                        "into the backward as the grad is produced")
    p.add_argument("--mem-only", action="store_true",
                   help="AOT-compile and print the compiler's memory "
                        "analysis without executing (probe whether a "
                        "size/remat combination fits HBM)")
    p.add_argument("--use-8bit-adam", action="store_true",
                   help="blockwise-int8 Adam moments (the reference's "
                        "bitsandbytes option; REQUIRED for full-mode on one "
                        "16 GB chip: fp32 m/v for 1.5B params alone is 12 GB)")
    p.add_argument("--offload", choices=["none", "masters", "masters+moments"],
                   default="none",
                   help="park the fp32 masters (and optionally the Adam "
                        "moments) in TPU pinned_host memory "
                        "(train/state.py:host_offload_state) — what makes "
                        "single-chip full-FT fit a 16 GB v5e at a PCIe-"
                        "streaming cost per step")
    args = p.parse_args()

    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize pins the relay platform; honor an explicit
        # CPU request (smoke runs) — env var alone does not stick
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from svd_xtend_tpu.core.config import TrainConfig
    from svd_xtend_tpu.diffusion.pipeline import SVDModels, init_pipeline_params
    from svd_xtend_tpu.train.optim import make_optimizer
    from svd_xtend_tpu.train.state import (cast_frozen_to_compute,
                                           create_train_state, make_train_step)

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        # fp32 master params + bf16 compute — MUST match the framework's own
        # training policy (core/dtypes.py); bf16 masters would flatter the
        # measured step (r2 VERDICT weak #3)
        models = SVDModels(dtype=jnp.bfloat16, param_dtype=jnp.float32)
        h, w, f = args.height, args.width, args.frames
    else:
        from svd_xtend_tpu.core.config import TINY_CLIP, TINY_UNET, TINY_VAE
        models = SVDModels(unet_config=TINY_UNET, vae_config=TINY_VAE,
                           clip_config=TINY_CLIP, dtype=jnp.float32)
        h = w = 32
        f = 2

    params = init_pipeline_params(models, jax.random.PRNGKey(0))
    cfg = TrainConfig(train_mode=args.mode, learning_rate=1e-5,
                      lr_scheduler="constant", num_frames=f, height=h, width=w,
                      remat_policy=args.remat, grad_dtype=args.grad_dtype,
                      max_grad_norm=args.max_grad_norm,
                      use_8bit_adam=args.use_8bit_adam,
                      mixed_precision="bf16" if on_tpu else "no")
    opt = make_optimizer(cfg)
    state = create_train_state(cfg, params["unet"], opt,
                               lora_rng=jax.random.PRNGKey(1))
    # bf16 storage for every frozen tree (frozen UNet partition / LoRA base
    # + VAE/CLIP towers) — required to fit the full-size step on one 16 GB
    # chip; see train/state.py:cast_frozen_to_compute. The towers are then
    # passed as jit ARGUMENTS, never closed over: baked-in constants are
    # what actually broke the relay transport on training executables (r4).
    state, frozen = cast_frozen_to_compute(
        state, {"vae": params["vae"], "clip": params["clip"]}, models.dtype)
    # free the init-time fp32 trees (9 GB at full size): the trainable
    # leaves live on in `state` (same buffers); the fp32 frozen/vae/clip
    # originals are dead weight once the bf16 copies exist, and pinning
    # them OOMs the 16 GB chip before the step even runs (AOT
    # memory_analysis: the step itself peaks ~11.5 GB incl. donation)
    del params
    import gc; gc.collect()
    jit_kw = {}
    if args.offload != "none":
        from svd_xtend_tpu.train.state import host_offload_state
        state, out_state_shard = host_offload_state(state, args.offload)
        if out_state_shard is not None:
            from jax.sharding import SingleDeviceSharding
            dev_s = SingleDeviceSharding(jax.devices()[0], memory_kind="device")
            jit_kw["out_shardings"] = (out_state_shard,
                                       {"loss": dev_s, "grad_norm": dev_s,
                                        "lr": dev_s})
    step = jax.jit(make_train_step(models, cfg, opt), donate_argnums=(0,),
                   **jit_kw)
    batch = jax.random.uniform(jax.random.PRNGKey(2), (1, f, h, w, 3)) * 2 - 1

    if args.mem_only:
        compiled = step.lower(state, batch, jax.random.PRNGKey(3),
                              frozen).compile()
        ma = compiled.memory_analysis()
        gb = 1 << 30
        print(json.dumps({
            "metric": f"train_mem_{args.mode}_{args.remat}",
            "value": round((ma.argument_size_in_bytes
                            + ma.output_size_in_bytes
                            - ma.alias_size_in_bytes
                            + ma.temp_size_in_bytes
                            + ma.generated_code_size_in_bytes) / gb, 3),
            "unit": "GB_peak_estimate", "vs_baseline": 0.0,
            "detail": {"args_gb": round(ma.argument_size_in_bytes / gb, 3),
                       "out_gb": round(ma.output_size_in_bytes / gb, 3),
                       "alias_gb": round(ma.alias_size_in_bytes / gb, 3),
                       "temp_gb": round(ma.temp_size_in_bytes / gb, 3),
                       "code_gb": round(
                           ma.generated_code_size_in_bytes / gb, 3),
                       "operating_point": f"{w}x{h}x{f}f bs1 {args.mode}",
                       "remat": args.remat,
                       "grad_dtype": args.grad_dtype,
                       "offload": args.offload},
        }))
        return

    try:
        state, metrics = step(state, batch, jax.random.PRNGKey(3), frozen)
        float(jax.device_get(metrics["loss"]))      # compile + sync
    except Exception as e:
        # Report the failure mode rather than a bare zero (historically the
        # relay transport broke on bloated executables; fixed r4 — frozen
        # towers as jit args + bf16 frozen storage, PERF.md "Training
        # throughput").
        print(json.dumps({
            "metric": f"train_steps_per_sec_{args.mode}",
            "value": 0.0, "unit": "steps/sec/chip", "vs_baseline": 0.0,
            "detail": {"error": f"warmup step failed: {type(e).__name__}: "
                                f"{str(e)[:400]}"},
        }))
        return

    # Time every step individually and report the mean of the steps that
    # completed, so a late relay hiccup still yields a number.
    times = []
    try:
        for _ in range(args.steps):
            t0 = time.perf_counter()
            state, metrics = step(state, batch, jax.random.PRNGKey(3), frozen)
            float(jax.device_get(metrics["loss"]))
            times.append(time.perf_counter() - t0)
    except Exception as e:
        print(f"step {len(times) + 1} failed: {type(e).__name__}",
              file=sys.stderr)
    if not times:
        raise RuntimeError("no timed steps completed")
    dt = sum(times) / len(times)

    print(json.dumps({
        "metric": f"train_steps_per_sec_{args.mode}",
        "value": round(1.0 / dt, 4),
        "unit": "steps/sec/chip",
        "vs_baseline": 0.0,   # reference publishes no steps/sec (BASELINE.md)
        "detail": {"seconds_per_step": round(dt, 3),
                   "operating_point": f"{w}x{h}x{f}f bs1 {args.mode}",
                   "remat": args.remat, "grad_dtype": args.grad_dtype,
                   "offload": args.offload,
                   "platform": "tpu" if on_tpu else "cpu-smoke"},
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({"metric": "train_steps_per_sec", "value": 0.0,
                          "unit": "steps/sec/chip", "vs_baseline": 0.0}))
