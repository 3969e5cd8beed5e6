"""Winograd F(2x2,3x3) (pure-XLA, ops/winograd.py) vs XLA direct conv at the
model's heavy 3x3 sites (bf16, f32-accum both arms). Chained in-graph timing
(relay-immune). Also reports bf16 numeric drift vs the f32 direct conv.

Shapes: the top conv sites of the r3 UNet step trace (512x320x14f CFG) and
the decode chunk (8f). Winners go through scripts/tune_winograd-style e2e
A/B before any dispatch default (PERF.md measurement law).
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

from svd_xtend_tpu.ops.convacc import conv_f32acc
from svd_xtend_tpu.ops.winograd import _winograd_conv


def timed(f, *args, iters=10, chain=8):
    @jax.jit
    def chained(*a):
        def body(_, c):
            out = f(*c)
            bump = jnp.sum(out[..., :1].astype(jnp.float32)) * 0.0
            return (c[0] + bump.astype(c[0].dtype),) + c[1:]
        a2 = jax.lax.fori_loop(0, chain, body, tuple(a))
        return jnp.sum(f(*a2)[..., :1].astype(jnp.float32))

    pull = lambda o: float(jax.device_get(o))
    pull(chained(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        pull(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / (chain + 1)


SHAPES = [
    # UNet 512x320x14f CFG step
    ("unet-L0", (28, 40, 64, 320), 320),
    ("unet-L0w", (28, 40, 64, 640), 640),
    ("unet-L1", (28, 20, 32, 640), 640),
    ("unet-L2", (28, 10, 16, 1280), 1280),
    # VAE decode chunk (8f)
    ("dec-top", (8, 320, 512, 128), 128),
    ("dec-up2", (8, 160, 256, 256), 256),
    ("dec-up1", (8, 80, 128, 512), 512),
    ("dec-mid", (8, 40, 64, 512), 512),
]


def main():
    names = os.environ.get("SVDX_WG_SHAPES", "").split(",")
    shapes = [s for s in SHAPES if not names[0] or s[0] in names]
    for tag, xs, co in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), xs, jnp.bfloat16)
        k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, xs[-1], co),
                               jnp.float32) * (9 * xs[-1]) ** -0.5)
        kb = k.astype(jnp.bfloat16)

        direct = lambda x, k: conv_f32acc(x, k, (1, 1), ((1, 1), (1, 1))
                                          ).astype(x.dtype)
        wino = lambda x, k: _winograd_conv(x, k).astype(x.dtype)

        ref32 = conv_f32acc(x.astype(jnp.float32), k, (1, 1),
                            ((1, 1), (1, 1)))
        scale = float(jnp.max(jnp.abs(ref32)))
        e_dir = float(jnp.max(jnp.abs(
            jax.jit(direct)(x, kb).astype(jnp.float32) - ref32))) / scale
        e_win = float(jnp.max(jnp.abs(
            jax.jit(wino)(x, kb).astype(jnp.float32) - ref32))) / scale

        try:
            t_w = timed(wino, x, kb)
        except Exception as e:
            print(f"{tag:9s} {str(xs):>20s}->{co:4d}: winograd FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        t_d = timed(direct, x, kb)
        n, h, w, ci = xs
        tf = 2 * n * h * w * 9 * ci * co / 1e12
        print(f"{tag:9s} {str(xs):>20s}->{co:4d}: direct {t_d*1e3:7.3f} ms "
              f"({tf/t_d:5.1f} TF/s)  winograd {t_w*1e3:7.3f} ms  "
              f"{t_d/t_w:5.2f}x   relerr dir {e_dir:.1e} win {e_win:.1e}",
              flush=True)


if __name__ == "__main__":
    main()
