"""Probe: can the flash kernels consume the projections' NATIVE (B, S, H*D)
layout by blocking the minor axis per head (64-wide blocks at offsets
h*64), eliminating the BSHD<->(B*H,S,D) transpose pair around every call?

The r3 UNet trace attributes ~0.22 ms/op to ~20 anonymous copies — the
transpose(0,2,1,3) pairs in flash_attention's wrapper (ops/pallas/
flash_attention.py:452-454). This measures, at the L0 shape:

  arm T: the current wrapper (transposes + (B*H, S, D) kernel)
  arm H: a head-sliced kernel — grid (B, H, qi, ki), in_specs block
         (1, bq, 64) with index_map minor-block h on the (B, S, 320) array

plus numerics parity. If Mosaic's DMA handles the 64-wide non-128-aligned
minor blocks at full speed, arm H wins by the transpose cost.
"""

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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svd_xtend_tpu.ops.pallas import flash_attention as fa


def _fwd_headsliced(q, k, v, scale, num_heads):
    """q/k/v: (B, S, H*D). Same kernel body as fa._fwd_kernel (major form),
    grid (B, H, q_tiles, kv_tiles), blocks slice the minor axis per head."""
    b, s_q, hd = q.shape
    d = hd // num_heads
    s_kv = k.shape[1]
    bq, bkm = fa._fwd_blocks(s_q, s_kv)
    kv_tiles = s_kv // bkm
    grid = (b, num_heads, s_q // bq, kv_tiles)

    kern = functools.partial(fa._fwd_kernel, scale=scale, kv_tiles=kv_tiles,
                             bq=bq, bkm=bkm, major=bkm >= 512)

    out, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, h, qi, ki: (b, qi, h)),
            pl.BlockSpec((1, bkm, d), lambda b, h, qi, ki: (b, ki, h)),
            pl.BlockSpec((1, bkm, d), lambda b, h, qi, ki: (b, ki, h)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, h, qi, ki: (b, qi, h)),
            pl.BlockSpec((1, fa.SUBS, bq), lambda b, h, qi, ki: (b, h, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_q, hd), q.dtype),
            jax.ShapeDtypeStruct((b, num_heads * fa.SUBS, s_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, fa.LANES), jnp.float32),
            pltpu.VMEM((bq, fa.LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v)
    return out, lse


def timed(f, *args, iters=12, chain=8):
    @jax.jit
    def chained(*a):
        def body(_, c):
            out = jax.tree.leaves(f(*c))[0]
            bump = jnp.sum(out[..., :1].astype(jnp.float32)) * 0.0
            return (c[0] + bump.astype(c[0].dtype),) + c[1:]
        a2 = jax.lax.fori_loop(0, chain, body, tuple(a))
        return jnp.sum(jax.tree.leaves(f(*a2))[0][..., :1].astype(jnp.float32))

    pull = lambda o: float(jax.device_get(o))
    pull(chained(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        pull(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / (chain + 1)


def main():
    for (b, s, h) in [(28, 2560, 5), (28, 640, 10)]:
        d = 64
        scale = d ** -0.5
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (b, s, h * d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, s, h * d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, s, h * d), jnp.bfloat16)

        # arm T: current wrapper (includes the 4 transposes)
        def arm_t(q, k, v):
            r = lambda x: x.reshape(b, s, h, d)
            return fa.flash_attention(r(q), r(k), r(v), scale=scale).reshape(
                b, s, h * d)

        # arm H: the packed kernel (heads sliced in VMEM, native layout)
        def arm_h(q, k, v):
            return fa.flash_attention_packed(q, k, v, num_heads=h,
                                             scale=scale)

        try:
            o_h = jax.jit(arm_h)(q, k, v)
        except Exception as e:
            print(f"(b={b},s={s},h={h}) arm H failed to compile: "
                  f"{type(e).__name__}: {str(e)[:300]}")
            continue
        o_t = jax.jit(arm_t)(q, k, v)
        err = float(jnp.max(jnp.abs(o_t.astype(jnp.float32)
                                    - o_h.astype(jnp.float32))))
        t_t = timed(arm_t, q, k, v)
        t_h = timed(arm_h, q, k, v)
        print(f"(b={b},s={s},h={h}): transpose-form {t_t*1e3:7.3f} ms | "
              f"head-sliced {t_h*1e3:7.3f} ms ({t_t/t_h:.3f}x)  "
              f"max|diff|={err:.2e}")


if __name__ == "__main__":
    main()
