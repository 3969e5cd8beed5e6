"""Interleaved whole-subsystem A/B over an environment toggle.

The repo's measurement law (PERF.md): only interleaved whole-pipeline or
whole-subsystem timing decides a default. This script times the VAE temporal
decode and/or one CFG UNet step with an env var flipped between arms,
re-tracing per arm (the toggles are read at trace time).

Usage:
  python scripts/ab_env.py --target decode --env SVDX_GN_FOLD --values 1,0
  python scripts/ab_env.py --target unet --env SVDX_PALLAS_TRESNET --values 1,0
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


def build_decode(frames, height, width):
    from svd_xtend_tpu.core.config import VAEConfig
    from svd_xtend_tpu.models.vae import TemporalDecoder

    cfg = VAEConfig()
    dec = TemporalDecoder(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(1),
                          (1, frames, height // 8, width // 8,
                           cfg.latent_channels), jnp.bfloat16)
    params = jax.jit(dec.init)(jax.random.PRNGKey(0), z)["params"]
    f = jax.jit(lambda p, z: dec.apply({"params": p}, z))
    return f, (params, z)


def build_unet(frames, height, width):
    from svd_xtend_tpu.core.config import UNetConfig
    from svd_xtend_tpu.models.unet import UNetSpatioTemporalConditionModel

    cfg = UNetConfig()
    unet = UNetSpatioTemporalConditionModel(cfg, dtype=jnp.bfloat16,
                                            param_dtype=jnp.bfloat16)
    bb = 2                                    # CFG-stacked batch
    h8, w8 = height // 8, width // 8
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (bb, frames, h8, w8, 8), jnp.bfloat16)
    t = jnp.full((bb,), 10.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (bb, 1, 1024), jnp.bfloat16)
    added = jnp.ones((bb, 3), jnp.float32)
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), lat, t, ctx,
                                added)["params"]
    f = jax.jit(lambda p, lat: unet.apply({"params": p}, lat, t, ctx, added))
    return f, (params, lat)


def time_arm(build, iters):
    f, args = build()
    pull = lambda o: float(jax.device_get(jnp.sum(o.astype(jnp.float32))))
    t0 = time.perf_counter()
    out0 = pull(f(*args))
    print(f"    compile+warm {time.perf_counter() - t0:.1f}s "
          f"(sum={out0:.4f})", flush=True)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        pull(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", choices=["decode", "unet"], default="decode")
    ap.add_argument("--env", required=True)
    ap.add_argument("--values", default="1,0")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=2,
                    help="interleave rounds (ABAB kills drift)")
    ap.add_argument("--quant", default=None,
                    help="ambient quant mode during tracing (e.g. int8)")
    args = ap.parse_args()

    if args.quant:
        from svd_xtend_tpu.ops import quant
        quant.set_mode(args.quant)

    frames = args.frames or (8 if args.target == "decode" else 14)
    builder = build_decode if args.target == "decode" else build_unet
    build = lambda: builder(frames, args.height, args.width)

    values = args.values.split(",")
    results = {v: [] for v in values}
    sums = {}
    for r in range(args.rounds):
        for v in values:
            os.environ[args.env] = v
            # measured-table modules cache their tables in module globals;
            # reset so env-path toggles (e.g. SVDX_INT8_DENSE_TABLE) re-read
            from svd_xtend_tpu.ops import quant, winograd
            quant._table = quant._dense_table = None
            winograd._table = None
            jax.clear_caches()
            print(f"  round {r} {args.env}={v}:", flush=True)
            t, s = time_arm(build, args.iters)
            results[v].append(t)
            sums.setdefault(v, s)
            print(f"    best {t * 1e3:.1f} ms", flush=True)

    print(f"\n{args.target} @ {args.width}x{args.height}x{frames}f:")
    base = min(results[values[-1]])
    for v in values:
        t = min(results[v])
        print(f"  {args.env}={v}: {t * 1e3:.1f} ms  "
              f"({base / t:.3f}x vs {args.env}={values[-1]})  "
              f"sum={sums[v]:.4f}")


if __name__ == "__main__":
    main()
