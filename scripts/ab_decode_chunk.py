"""Interleaved A/B over decode_chunk_size for the F=14 bench point.

At F=14 the reference's decode_chunk_size=8 (train_svd.py:1135) splits the
temporal VAE decode into an 8-frame program plus a RAGGED 6-frame program
(two compiles, two kernels' worth of cold HBM weight reads). chunk=7 covers
14 frames as 2x7 through ONE compiled shape via lax.map; chunk=14 decodes in
a single pass (bigger live set). All three are exact (frames only mix within
a chunk in every arm, matching diffusers' `latents[i:i+chunk]` semantics);
this measures which chunking the chip prefers.

Usage: python scripts/ab_decode_chunk.py [--chunks 8,7,14] [--frames 14]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="8,7,14")
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    from svd_xtend_tpu.diffusion.pipeline import (SVDModels,
                                                  decode_latents_chunked)

    models = SVDModels(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    vae = models.vae()
    z = jax.random.normal(jax.random.PRNGKey(1),
                          (1, args.frames, args.height // 8, args.width // 8,
                           models.vae_config.latent_channels), jnp.bfloat16)
    params = {"vae": jax.jit(
        lambda k, zc: vae.init(k, zc, method=vae.decode))(
        jax.random.PRNGKey(0), z[:, :1].astype(models.dtype))["params"]}

    pull = lambda o: float(jax.device_get(jnp.sum(o.astype(jnp.float32))))
    chunks = [int(c) for c in args.chunks.split(",")]
    fns = {}
    for c in chunks:
        fns[c] = jax.jit(lambda lat, c=c: decode_latents_chunked(
            models, params, lat, c))

    results = {c: [] for c in chunks}
    sums = {}
    for r in range(args.rounds):
        for c in chunks:
            t0 = time.perf_counter()
            s = pull(fns[c](z))
            print(f"  round {r} chunk={c}: compile+warm "
                  f"{time.perf_counter() - t0:.1f}s (sum={s:.4f})", flush=True)
            sums.setdefault(c, s)
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                pull(fns[c](z))
                best = min(best, time.perf_counter() - t0)
            results[c].append(best)
            print(f"    best {best * 1e3:.1f} ms", flush=True)

    print(f"\ndecode F={args.frames} @ {args.width}x{args.height}:")
    base = min(results[chunks[0]])
    for c in chunks:
        t = min(results[c])
        print(f"  chunk={c}: {t * 1e3:.1f} ms  ({base / t:.3f}x vs "
              f"chunk={chunks[0]})  sum={sums[c]:.4f}")


if __name__ == "__main__":
    main()
