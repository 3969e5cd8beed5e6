"""Validate + time the fused temporal-resnet kernel pair on the attached TPU.

Run BEFORE flipping SVDX_PALLAS_TRESNET's default on (see
ops/pallas/temporal_resnet.py: enabled()): smallest shape first so a
pathological Mosaic/remote compile is caught cheaply. NEVER kill this mid-
compile over the axon relay — a killed remote compile wedges the relay's
channel for an hour+ (r1 session-8 incident).

Usage: SVDX_PALLAS_TRESNET=1 python scripts/microbench_tresnet.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SVDX_PALLAS_TRESNET", "1")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from svd_xtend_tpu.ops.pallas import temporal_resnet as trk

# smallest-compile-first: UNet levels L3..L0 at operating point A, then the
# VAE decode top level (chunked f=7)
SHAPES = [
    (2, 14, 40, 1280),
    (2, 14, 160, 1280),
    (2, 14, 640, 640),
    (2, 14, 2560, 320),
    (1, 7, 163840, 128),
]


def main():
    for (b, f, s, c) in SHAPES:
        print(f"--- B{b} F{f} S{s} C{c} sb={trk._choose_sb(f, s, c)}",
              flush=True)
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        x = jax.random.normal(ks[0], (b, f, s, c), jnp.bfloat16)
        t = jax.random.normal(ks[1], (b, f, c), jnp.bfloat16)
        k1 = jax.random.normal(ks[2], (3, c, c), jnp.bfloat16) * 0.05
        k2 = jax.random.normal(ks[3], (3, c, c), jnp.bfloat16) * 0.05
        b1 = jnp.zeros((c,), jnp.bfloat16)
        b2 = jnp.zeros((c,), jnp.bfloat16)
        s1 = jnp.ones((c,))
        bi1 = jnp.zeros((c,))
        s2 = jnp.ones((c,))
        bi2 = jnp.zeros((c,))
        w = jnp.float32(0.4)
        args = (x, t, k1, b1, k2, b2, s1, bi1, s2, bi2, w)
        fker = jax.jit(
            lambda *a: trk.temporal_resnet_block(*a, groups=32, eps=1e-5))
        fref = jax.jit(
            lambda *a: trk.temporal_resnet_reference(*a, 32, 1e-5))
        t0 = time.perf_counter()
        ok = fker(*args)
        ok.block_until_ready()
        print(f"  kernel compile+run {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        rk = fref(*args)
        rk.block_until_ready()
        print(f"  ref    compile+run {time.perf_counter() - t0:.1f}s",
              flush=True)
        err = float(jnp.max(jnp.abs(ok.astype(jnp.float32)
                                    - rk.astype(jnp.float32))))

        def timeit(fn, n=20):
            out = fn(*args)
            # relay block_until_ready does not sync — fetch a scalar
            float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*args)
            float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
            return (time.perf_counter() - t0) / n * 1e3

        tk, tr = timeit(fker), timeit(fref)
        print(f"  pallas {tk:7.3f} ms  xla-ref {tr:7.3f} ms  "
              f"speedup {tr / tk:.2f}x  maxerr {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
