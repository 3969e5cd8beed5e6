"""Micro-benchmarks of the UNet's hot sub-ops at the 512x320x14f operating
point — answers 'where does the 306 ms UNet step go': per-level spatial
attention (flash vs xla), temporal attention, ResNet convs, GroupNorm+SiLU.
FLOP rates printed so utilization vs the v5e MXU (~197 bf16 TFLOP/s) is
readable at a glance.
"""

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

from svd_xtend_tpu.ops.attention import dot_product_attention

B = 28  # CFG(2) x 14 frames


def timed(name, fn, *args, flops=None, iters=20):
    f = jax.jit(fn)
    jax.device_get(jnp.sum(f(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    # one final sync covers the loop: ops are independent and queue on device
    dt = (time.perf_counter() - t0) / iters
    rate = f"  {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:46s} {dt * 1e3:8.2f} ms{rate}")


def attn_inputs(key, b, s, heads, d, t=None):
    t = t or s
    ks = jax.random.split(key, 3)
    mk = lambda k, n: jax.random.normal(k, (b, n, heads, d), jnp.bfloat16)
    return mk(ks[0], s), mk(ks[1], t), mk(ks[2], t)


def main():
    key = jax.random.PRNGKey(0)
    print(f"spatial self-attention (B={B}):")
    for lvl, (s, heads) in enumerate([(2560, 5), (640, 10), (160, 20)]):
        d = 64
        q, k, v = attn_inputs(key, B, s, heads, d)
        flops = 4 * B * heads * s * s * d  # QK^T + PV
        for impl in ("xla", "flash"):
            if impl == "flash" and s % 128:
                continue
            timed(f"  L{lvl} s={s} h={heads} {impl}", lambda q, k, v, i=impl:
                  dot_product_attention(q, k, v, impl=i), q, k, v, flops=flops)

    print("temporal self-attention (seq=14):")
    for lvl, (hw, heads, c) in enumerate([(2560, 5, 320), (640, 10, 640),
                                          (160, 20, 1280)]):
        d = 64
        q, k, v = attn_inputs(key, 2 * hw, 14, heads, d)
        flops = 4 * 2 * hw * heads * 14 * 14 * d
        timed(f"  L{lvl} b={2*hw} h={heads} xla", lambda q, k, v:
              dot_product_attention(q, k, v, impl="xla"), q, k, v, flops=flops)

    print("qkv/out projections (Dense inner=c):")
    for lvl, (s, c) in enumerate([(2560, 320), (640, 640), (160, 1280)]):
        x = jax.random.normal(key, (B, s, c), jnp.bfloat16)
        w = jax.random.normal(key, (c, c), jnp.bfloat16)
        timed(f"  L{lvl} s={s} c={c} matmul", lambda x, w: x @ w, x, w,
              flops=2 * B * s * c * c)

    print("spatial 3x3 conv (ResNet body):")
    for lvl, (h, w_, c) in enumerate([(40, 64, 320), (20, 32, 640),
                                      (10, 16, 1280), (5, 8, 1280)]):
        x = jax.random.normal(key, (B, h, w_, c), jnp.bfloat16)
        kern = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16)
        conv = lambda x, kern: jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        timed(f"  L{lvl} {h}x{w_} c={c}", conv, x, kern,
              flops=2 * B * h * w_ * c * c * 9)

    print("temporal (3,1) conv on (B,F,S,C):")
    for lvl, (s, c) in enumerate([(2560, 320), (640, 640), (160, 1280)]):
        x = jax.random.normal(key, (2, 14, s, c), jnp.bfloat16)
        kern = jax.random.normal(key, (3, 1, c, c), jnp.bfloat16)
        conv = lambda x, kern: jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        timed(f"  L{lvl} s={s} c={c}", conv, x, kern,
              flops=2 * 2 * 14 * s * c * c * 3)

    print("GroupNorm+SiLU (B*F, H, W, C):")
    from svd_xtend_tpu.ops.pallas.groupnorm import group_norm_silu
    for lvl, (h, w_, c) in enumerate([(40, 64, 320), (20, 32, 640)]):
        x = jax.random.normal(key, (B, h, w_, c), jnp.bfloat16)
        sc = jnp.ones((c,), jnp.float32)
        bi = jnp.zeros((c,), jnp.float32)
        for impl in ("xla", "pallas"):
            timed(f"  L{lvl} {h}x{w_} c={c} {impl}",
                  lambda x, sc, bi, i=impl: group_norm_silu(
                      x, sc, bi, groups=32, eps=1e-5, impl=i), x, sc, bi)


if __name__ == "__main__":
    main()
