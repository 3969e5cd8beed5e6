"""FLOPs accounting for the train step across operating points (CPU-only:
traces + lowers the identical program, no TPU needed).

Purpose: TFLOP/step anchors for the measured steps/sec table in PERF.md
"Training throughput" (all three points now measured directly on the TPU,
r4). It lowers the REAL train step (svd_xtend_tpu.train.state.make_train_step, full SVD architecture) at
both points and prints XLA's own flop/byte counts from
``jitted.lower(...).cost_analysis()`` — unoptimized-HLO counts, dominated
by the conv/dot ops fusion cannot change, so the RATIO between points is
reliable even though each absolute count ignores fusion savings.

Usage: JAX_PLATFORMS=cpu python scripts/train_flops.py [--mode temporal]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

# all H/W divisible by 64 (models.check_resolution)
POINTS = [
    ("256x128x8f", 128, 256, 8),
    ("384x192x10f", 192, 384, 10),
    ("512x320x14f", 320, 512, 14),
]


def step_cost(mode: str, h: int, w: int, f: int) -> dict:
    from svd_xtend_tpu.core.config import TrainConfig
    from svd_xtend_tpu.diffusion.pipeline import SVDModels, init_pipeline_params
    from svd_xtend_tpu.train.optim import make_optimizer
    from svd_xtend_tpu.train.state import create_train_state, make_train_step

    models = SVDModels(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    params = jax.eval_shape(lambda k: init_pipeline_params(models, k),
                            jax.random.PRNGKey(0))
    cfg = TrainConfig(train_mode=mode, learning_rate=1e-5,
                      lr_scheduler="constant", num_frames=f, height=h,
                      width=w, remat_policy="block", mixed_precision="bf16")
    opt = make_optimizer(cfg)
    state = jax.eval_shape(
        lambda p: create_train_state(cfg, p, opt,
                                     lora_rng=jax.random.PRNGKey(1)),
        params["unet"])
    frozen = {"vae": params["vae"], "clip": params["clip"]}

    # frozen params must be lowered as ARGUMENTS — make_train_step closes
    # over them, and closure leaves stay ShapeDtypeStructs (only jit
    # arguments are abstracted by .lower())
    def wrapped(state, batch, rng, frozen):
        return make_train_step(models, cfg, opt, frozen)(state, batch, rng)

    batch = jax.ShapeDtypeStruct((1, f, h, w, 3), jnp.float32)
    lowered = jax.jit(wrapped).lower(state, batch, jax.random.PRNGKey(3),
                                     frozen)
    ca = lowered.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return {"flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="temporal",
                    choices=["temporal", "full", "lora"])
    args = ap.parse_args()
    out = {}
    for name, h, w, f in POINTS:
        c = step_cost(args.mode, h, w, f)
        out[name] = c
        print(f"{name}: {c['flops']/1e12:.2f} TFLOP, "
              f"{c['bytes']/1e9:.1f} GB accessed", flush=True)
    base = POINTS[0][0]
    for name, _, _, _ in POINTS[1:]:
        print(f"{name} / {base}: flops x{out[name]['flops']/out[base]['flops']:.2f}, "
              f"bytes x{out[name]['bytes']/out[base]['bytes']:.2f}")
    print(json.dumps({k: v for k, v in out.items()}))


if __name__ == "__main__":
    main()
