"""Measure conv(concat(a, b)) vs conv_a(a) + conv_b(b) at the UNet up-block
conv1 sites.

Motivation (r2 trace, PERF.md): the up-block spatial-resnet conv1 ops read a
skip-concat input (C_in = 2C) and measure ~87 TFLOP/s, while the
same-spatial-size C->C convs in the down blocks run at ~135 TFLOP/s. Since
conv is linear in the input channels, conv(concat(a, b), W) ==
conv(a, W[:, :, :C]) + conv(b, W[:, :, C:]) exactly (same f32 accumulation
order per output element is NOT preserved — the split changes the K-loop
order — so parity is to ~1e-2 in bf16, exact in f32 testing). If the split
form recovers the C->C rate, it also deletes the concat materialization
(pad_maximum fusions, ~0.3 ms each at L0).

Timing protocol: in-graph chain of `reps` dependent applications (relay adds
~1.17 ms/dispatch, PERF.md session-2), fetch a scalar to sync.
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

# (name, B, H, W, C_hidden, C_skip, C_out) — the up-block conv1 sites at the
# bench operating point (512x320x14f, CFG batch 2x14=28)
SITES = [
    ("up3.conv1 (L0)", 28, 40, 64, 320, 320, 320),
    ("up2.conv1 (L1)", 28, 20, 32, 640, 320, 640),
    ("up2.conv1b(L1)", 28, 20, 32, 640, 640, 640),
    ("up1.conv1 (L2)", 28, 10, 16, 1280, 640, 1280),
    ("up1.conv1b(L2)", 28, 10, 16, 1280, 1280, 1280),
]

DN = ("NHWC", "HWIO", "NHWC")


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.float32).astype(x.dtype)


def time_fn(f, args, reps):
    c = jax.jit(f).lower(*args).compile()
    pull = lambda o: jax.device_get(jnp.sum(o.astype(jnp.float32)))
    pull(c(*args))
    t0 = time.perf_counter()
    pull(c(*args))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)
    print(f"{'site':16s} {'fused ms':>9s} {'split ms':>9s} {'ratio':>6s} "
          f"{'TF/s fused':>10s} {'TF/s split':>10s}")
    for name, b, h, w, ch, cs, co in SITES:
        ks = jax.random.split(key, 4)
        a = jax.random.normal(ks[0], (b, h, w, ch), jnp.bfloat16)
        s = jax.random.normal(ks[1], (b, h, w, cs), jnp.bfloat16)
        wt = (jax.random.normal(ks[2], (3, 3, ch + cs, co), jnp.bfloat16)
              * 0.02)

        # dependent chains with constant shapes (co == ch at every site)
        def fused_chain(a, s, wt):
            y = a
            for _ in range(args.reps):
                y = conv(jnp.concatenate([y, s], axis=-1), wt)
            return y

        def split_chain(a, s, wt):
            wa, wb = wt[:, :, :ch], wt[:, :, ch:]
            y = a
            for _ in range(args.reps):
                y = conv(y, wa) + conv(s, wb)
            return y

        tf = time_fn(fused_chain, (a, s, wt), args.reps)
        ts = time_fn(split_chain, (a, s, wt), args.reps)
        fl = 2 * b * h * w * (ch + cs) * co * 9 / 1e12
        print(f"{name:16s} {tf:9.3f} {ts:9.3f} {tf / ts:6.2f} "
              f"{fl / tf * 1e3:10.1f} {fl / ts * 1e3:10.1f}")


if __name__ == "__main__":
    main()
