"""Compare spatial-attention kernels at the SVD L0/L1 shapes: our Pallas
flash attention vs jax.experimental splash attention (the production-tuned
TPU kernel) vs plain XLA. Decides ops/attention.py's dispatch."""

import functools
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

OVERHEAD = 0.00117


def timed(name, fn, *args, flops=None, iters=20):
    f = jax.jit(fn)
    jax.device_get(jnp.sum(f(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters - OVERHEAD
    rate = f"  {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:40s} {dt * 1e3:8.3f} ms{rate}")
    return dt


def make_splash(b, h, s, d):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm)
    mask = sm.MultiHeadMask([sm.FullMask((s, s)) for _ in range(h)])
    kernel = sk.make_splash_mha(mask=mask, head_shards=1, q_seq_shards=1)

    @jax.jit
    def run(q, k, v):
        # splash expects (H, S, D) per batch row; vmap over batch
        f = jax.vmap(kernel)
        return f(q * (d ** -0.5), k, v)
    return run


def main():
    key = jax.random.PRNGKey(0)
    for (b, s, h) in [(28, 2560, 5), (28, 640, 10)]:
        d = 64
        ks = jax.random.split(key, 3)
        # BSHD for ours/xla; BHSD for splash
        q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
        flops = 4 * b * h * s * s * d
        print(f"shape B={b} S={s} H={h} D={d}:")
        timed("  xla", functools.partial(dot_product_attention, impl="xla"),
              q, k, v, flops=flops)
        if s % 128 == 0:
            timed("  ours (flash)", functools.partial(dot_product_attention,
                                                      impl="flash"),
                  q, k, v, flops=flops)
        qh = jnp.swapaxes(q, 1, 2)
        kh = jnp.swapaxes(k, 1, 2)
        vh = jnp.swapaxes(v, 1, 2)
        try:
            run = make_splash(b, h, s, d)
            timed("  splash", run, qh, kh, vh, flops=flops)
            o_s = jnp.swapaxes(run(qh, kh, vh), 1, 2).astype(jnp.float32)
            o_x = dot_product_attention(q, k, v, impl="xla").astype(jnp.float32)
            print(f"  splash vs xla max err: "
                  f"{float(jnp.max(jnp.abs(o_s - o_x))):.2e}")
        except Exception as e:  # pragma: no cover
            print(f"  splash unavailable: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
