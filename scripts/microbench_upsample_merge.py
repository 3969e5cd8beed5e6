"""Upsample interleave variants: can the parity-conv stacks be cheaper?

The r3 decode trace bins ~12.7 ms/chunk under 'upsample' — nearly all of it
the jnp.stack interleave passes of ops/upsample.py (XLA lowers each stack as
pad+maximum fusions + copies over the 4x-resolution tensor; ~8 ms at the
decode up2 site alone). Variants measured here, all exact-parity
reparameterizations of conv3x3(nearest_up2x(x)):

  P  current: 4 parity convs (2,2) + two stacks            (16 taps)
  DJ 2 convs (2,3,Ci,2Co) with the column parities embedded in 3-tap
     columns and interleaved across the channel dim — the (w, dj) ->
     2W reshape is then FREE (row-major adjacency); one H-stack remains
                                                           (24 taps)
  FM 1 conv (3,3,Ci,4Co), both parities channel-embedded; dj free, di
     needs one (n,h,w,di,c) -> (n,h,di,w,c) transpose      (36 taps)
  N  naive: materialize nearest-2x, one conv3x3            (36 taps @ 4x res)

Each timed as the full composition (in-graph chained, relay-immune).
Numerics asserted against N. Winners per shape feed a decode/pipeline A/B
before any default changes (PERF.md measurement law).
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from svd_xtend_tpu.ops.convacc import conv_f32acc
from svd_xtend_tpu.ops import upsample as ups


def variant_p(x, kernel, bias):
    return ups.upsample2x_conv3x3(x, kernel, bias)


def _row_taps(k):
    """(3,3,Ci,Co) -> per-row-parity 2-tap kernels (2,3,Ci,Co)."""
    r0 = jnp.stack([k[0], k[1] + k[2]], axis=0)          # di=0: taps {i-1, i}
    r1 = jnp.stack([k[0] + k[1], k[2]], axis=0)          # di=1: taps {i, i+1}
    return r0, r1


def _dj_embed(r):
    """(2,3,Ci,Co) row-parity kernel -> (2,3,Ci,2Co) with the two column
    parities embedded in 3-tap columns, dj interleaved along channels."""
    c0 = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)     # (2,2,Ci,Co)
    c1 = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)
    z = jnp.zeros_like(c0[:, :1])
    k0 = jnp.concatenate([c0, z], axis=1)                    # cols {j-1, j, 0}
    k1 = jnp.concatenate([z, c1], axis=1)                    # cols {0, j, j+1}
    # channel layout (dj, co) -> minor-interleaved as (co-block per dj)? We
    # need out[..., w, dj, co] contiguous as (2W, Co): stack dj ADJACENT to
    # co with dj MAJOR of the pair: (..., dj, co) -> concat along a new axis
    # then fold into channels: kernel (2,3,Ci,2,Co) -> (2,3,Ci,2Co)
    kk = jnp.stack([k0, k1], axis=3)                         # (2,3,Ci,2,Co)
    return kk.reshape(kk.shape[0], 3, kk.shape[2], -1)       # (2,3,Ci,2Co)


def variant_dj(x, kernel, bias):
    n, h, w, ci = x.shape
    co = kernel.shape[-1]
    k = kernel.astype(x.dtype)
    r0, r1 = _row_taps(k)
    b2 = jnp.tile(bias.astype(x.dtype), (2,)).reshape(2, co).reshape(-1)
    ys = []
    for di, r in ((0, r0), (1, r1)):
        kk = _dj_embed(r)                                    # (2,3,Ci,2Co)
        y = conv_f32acc(x, kk, (1, 1),
                        ((1 - di, di), (1, 1))).astype(x.dtype) + b2
        ys.append(y.reshape(n, h, 2 * w, co))                # free dj unfold
    y = jnp.stack(ys, axis=2)                                # (n,h,2,2w,co)
    return y.reshape(n, 2 * h, 2 * w, co)


def variant_fm(x, kernel, bias):
    n, h, w, ci = x.shape
    co = kernel.shape[-1]
    k = kernel.astype(x.dtype)
    r0, r1 = _row_taps(k)
    z = jnp.zeros_like(r0[:1])
    k0 = jnp.concatenate([r0, z], axis=0)                    # rows {i-1, i, 0}
    k1 = jnp.concatenate([z, r1], axis=0)                    # rows {0, i, i+1}
    kk = jnp.stack([_dj_embed(k0), _dj_embed(k1)], axis=3)   # (3,3,Ci,2,2Co)
    kk = kk.reshape(3, 3, ci, -1)                            # (3,3,Ci,4Co)
    b4 = jnp.tile(bias.astype(x.dtype), (4,))
    y = conv_f32acc(x, kk, (1, 1), ((1, 1), (1, 1))).astype(x.dtype) + b4
    y = y.reshape(n, h, w, 2, 2 * co)                        # (n,h,w,di,2co)
    y = jnp.transpose(y, (0, 1, 3, 2, 4))                    # (n,h,di,w,2co)
    return y.reshape(n, 2 * h, 2 * w, co)


def variant_n(x, kernel, bias):
    n, h, w, ci = x.shape
    xup = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    y = conv_f32acc(xup, kernel.astype(x.dtype), (1, 1),
                    ((1, 1), (1, 1))).astype(x.dtype)
    return y + bias.astype(x.dtype)


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
    # decode chunks (8 frames folded into batch)
    ("dec-up0", (8, 40, 64, 512), 512),
    ("dec-up1", (8, 80, 128, 512), 256),
    ("dec-up2", (8, 160, 256, 256), 128),
    # UNet upsamplers at 512x320x14f CFG (28 images)
    ("unet-up0", (28, 5, 8, 1280), 1280),
    ("unet-up1", (28, 10, 16, 1280), 1280),
    ("unet-up2", (28, 20, 32, 640), 640),
]


def main():
    names = os.environ.get("SVDX_UPS_SHAPES", "").split(",")
    shapes = [s for s in SHAPES if not names[0] or s[0] in names]
    for tag, xs, co in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, xs, jnp.bfloat16)
        kernel = jax.random.normal(jax.random.PRNGKey(1),
                                   (3, 3, xs[-1], co), jnp.float32) * 0.05
        bias = jax.random.normal(jax.random.PRNGKey(2), (co,), jnp.float32)

        ref = jax.jit(variant_n)(x, kernel, bias)
        line = [f"{tag:9s} {str(xs):>20s}->{co:4d}:"]
        for vn, fn in (("P", variant_p), ("DJ", variant_dj),
                       ("FM", variant_fm), ("N", variant_n)):
            out = jax.jit(fn)(x, kernel, bias)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            rel = err / max(1e-6, float(jnp.max(jnp.abs(ref.astype(jnp.float32)))))
            assert rel < 3e-2, (tag, vn, err, rel)
            t = timed(fn, x, kernel, bias)
            line.append(f"{vn} {t*1e3:7.3f}ms")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
