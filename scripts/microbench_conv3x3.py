"""XLA conv3x3 vs 9-shifted-matmul formulation at SVD hot shapes.

The temporal (3,1) conv already won by becoming channel matmuls on
frame-shifted views (models/blocks.py TemporalConv). This asks whether the
same trick pays for SPATIAL 3x3 convs at the VAE-decoder / UNet shapes.
"""

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


def timed(name, fn, *args, flops=None, iters=20):
    f = jax.jit(fn)
    jax.device_get(jnp.sum(f(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    rate = f"  {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:44s} {dt * 1e3:8.3f} ms{rate}")
    return dt


def conv_xla(x, k):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(x.dtype)


def conv_shift_matmul(x, k):
    n, h, w, c = x.shape
    out = None
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            xs = jnp.roll(x, (-di, -dj), axis=(1, 2))
            # zero the wrapped rows/cols
            if di == -1:
                xs = xs.at[:, 0].set(0)
            if di == 1:
                xs = xs.at[:, -1].set(0)
            if dj == -1:
                xs = xs.at[:, :, 0].set(0)
            if dj == 1:
                xs = xs.at[:, :, -1].set(0)
            t = jnp.einsum("nhwc,cd->nhwd", xs, k[di + 1, dj + 1],
                           preferred_element_type=jnp.float32)
            out = t if out is None else out + t
    return out.astype(x.dtype)


def main():
    key = jax.random.PRNGKey(0)
    shapes = [(7, 320, 512, 128, 128), (7, 160, 256, 256, 256),
              (7, 80, 128, 512, 512), (28, 40, 64, 320, 320),
              (28, 20, 32, 640, 640), (28, 10, 16, 1280, 1280)]
    for (n, h, w, ci, co) in shapes:
        ks = jax.random.split(key, 2)
        x = jax.random.normal(ks[0], (n, h, w, ci), jnp.bfloat16)
        k = jax.random.normal(ks[1], (3, 3, ci, co), jnp.bfloat16) * 0.05
        flops = 2 * 9 * ci * co * n * h * w
        print(f"shape {n}x{h}x{w}x{ci}->{co}  ({flops/1e9:.0f} GFLOP):")
        da = timed("  XLA conv3x3", conv_xla, x, k, flops=flops)
        db = timed("  9-shift matmuls", conv_shift_matmul, x, k, flops=flops)
        ya = jax.jit(conv_xla)(x, k).astype(jnp.float32)
        yb = jax.jit(conv_shift_matmul)(x, k).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(ya - yb)))
        print(f"  max err {err:.2e}  speedup {da / db:.2f}x")


if __name__ == "__main__":
    main()
