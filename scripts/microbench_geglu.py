"""Validate + time the fused residual-GEGLU kernel on the attached TPU.

Run BEFORE flipping SVDX_PALLAS_GEGLU's default on (ops/pallas/geglu.py):
smallest shape first so a pathological Mosaic/remote compile is caught
cheaply. NEVER kill this mid-compile over the axon relay (r1 session-8
incident). Isolated wins are an UPPER BOUND — the dispatch default is
decided by the UNet-step interleaved A/B (scripts/ab_env.py --env
SVDX_PALLAS_GEGLU), per the PERF.md session-4 methodology rule.

Usage: python scripts/microbench_geglu.py
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

from svd_xtend_tpu.ops.pallas import geglu as gg

# (tokens, C) of every transformer FF site at operating point A
# (512x320x14f, CFG batch 2): L3/mid, L2, L1, L0 — smallest compile first.
SHAPES = [
    (1120, 1280),
    (4480, 1280),
    (17920, 640),
    (71680, 320),
]


def main():
    dt = jnp.bfloat16
    for (t, c) in SHAPES:
        bt, bi = gg._choose_blocks(t, c, 4)
        print(f"--- T{t} C{c} bt={bt} bi={bi}", flush=True)
        if not gg.supports(t, c):
            print("  unsupported, skipped", flush=True)
            continue
        ks = jax.random.split(jax.random.PRNGKey(0), 7)
        inner = 4 * c
        x = jax.random.normal(ks[0], (t, c), dt)
        ls = (jax.random.normal(ks[1], (c,), dt) * 0.1 + 1).astype(dt)
        lb = (jax.random.normal(ks[2], (c,), dt) * 0.1).astype(dt)
        w1 = (jax.random.normal(ks[3], (c, inner * 2), dt) * c ** -0.5)
        b1 = (jax.random.normal(ks[4], (inner * 2,), dt) * 0.1).astype(dt)
        w2 = (jax.random.normal(ks[5], (inner, c), dt) * inner ** -0.5)
        b2 = (jax.random.normal(ks[6], (c,), dt) * 0.1).astype(dt)
        args = (x, ls, lb, w1, b1, w2, b2)
        fker = jax.jit(gg.ln_geglu_residual)
        fref = jax.jit(gg._reference)
        t0 = time.perf_counter()
        ok = fker(*args)
        float(jax.device_get(jnp.sum(ok.astype(jnp.float32))))
        print(f"  kernel compile+run {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        rk = fref(*args)
        float(jax.device_get(jnp.sum(rk.astype(jnp.float32))))
        print(f"  ref    compile+run {time.perf_counter() - t0:.1f}s",
              flush=True)
        err = float(jnp.max(jnp.abs(ok.astype(jnp.float32)
                                    - rk.astype(jnp.float32))))

        def timeit(fn, n=30):
            out = fn(*args)
            float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*args)
            float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
            return (time.perf_counter() - t0) / n * 1e3

        tk, tr = timeit(fker), timeit(fref)
        gflop = 2 * t * (c * 2 * inner + inner * c) / 1e9
        print(f"  pallas {tk:7.3f} ms ({gflop / tk:.0f} TF/s)  "
              f"xla-ref {tr:7.3f} ms ({gflop / tr:.0f} TF/s)  "
              f"speedup {tr / tk:.2f}x  maxerr {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
