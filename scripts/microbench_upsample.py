"""Fused parity-decomposition upsample (ops/upsample.py) vs naive
repeat+conv3x3, at the VAE-decoder and UNet up-block shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from svd_xtend_tpu.ops.upsample import upsample2x_conv3x3


def timed(name, fn, *args, iters=20):
    f = jax.jit(fn)
    jax.device_get(jnp.sum(f(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt * 1e3:8.3f} ms")
    return dt


def naive(x, k, b):
    x_up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    dn = lax.conv_dimension_numbers(x_up.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x_up, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(x.dtype) + b.astype(x.dtype)


def main():
    key = jax.random.PRNGKey(0)
    # (VAE decode chunk shapes at 512x320x7f, then UNet up blocks at CFG 2x14)
    shapes = [(7, 40, 64, 512), (7, 80, 128, 512), (7, 160, 256, 256),
              (28, 5, 8, 1280), (28, 10, 16, 1280), (28, 20, 32, 640)]
    for (n, h, w, c) in shapes:
        ks = jax.random.split(key, 3)
        x = jax.random.normal(ks[0], (n, h, w, c), jnp.bfloat16)
        k = jax.random.normal(ks[1], (3, 3, c, c), jnp.bfloat16) * 0.05
        b = jax.random.normal(ks[2], (c,), jnp.bfloat16)
        print(f"shape {n}x{h}x{w}x{c}:")
        dn_ = timed("  naive repeat + conv3x3", naive, x, k, b)
        df = timed("  fused parity 2x2 convs", upsample2x_conv3x3, x, k, b)
        ya = jax.jit(naive)(x, k, b).astype(jnp.float32)
        yb = jax.jit(upsample2x_conv3x3)(x, k, b).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(ya - yb)))
        print(f"  max err {err:.2e}  speedup {dn_ / df:.2f}x")


if __name__ == "__main__":
    main()
