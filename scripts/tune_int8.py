"""Measure bf16-XLA vs int8 (W8A8 dynamic) conv per model shape and write
the winner table consulted by ops/quant.py:int8_conv_wins.

Same methodology as autotune_conv3x3.py (trace-collected shape set,
relay-robust in-graph-loop timing); the int8 arm times the FULL replaced
subgraph — dynamic activation quantize + int8 conv + dequantize — so the
table's speedups are what the pipeline actually sees. Weight quantization
sits inside the loop body but is loop-invariant (XLA hoists it, exactly as
it does out of the sampler's scan).

Usage:
  python scripts/tune_int8.py                    # 512x320x14f (bench point)
  python scripts/tune_int8.py --height 576 --width 1024 --frames 25
  python scripts/tune_int8.py --out /tmp/t.json
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from autotune_conv3x3 import collect_shapes, conv_xla
from svd_xtend_tpu.ops import quant

BURST = 30


def timed_burst(fn, *args) -> float:
    """Seconds/call: BURST async dispatches, one host sync. Unlike the
    conv autotuner's chained fori_loop (right for comparing two bf16 conv
    impls whose epilogues fuse identically), a chain biases against int8 —
    the feedback carry fuses into the bf16 conv's epilogue but not into the
    int8 dequant, and the dynamic quantize serializes on the previous
    iteration. Burst timing measures each arm's true standalone cost; the
    composition verdict comes from the end-to-end bench A/B as always."""
    import time
    f = jax.jit(fn)
    out = f(*args)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))   # warm + sync
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(BURST):
            out = f(*args)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / BURST)
    return best


def collect_dense_shapes(height, width, frames, batch, dtype):
    """Trace the UNet (CFG batch) under int8 mode: every QDense dispatch
    records its (rows, cin, cout) in the quant registry."""
    from svd_xtend_tpu.core.config import UNetConfig
    from svd_xtend_tpu.models.unet import UNetSpatioTemporalConditionModel

    unet = UNetSpatioTemporalConditionModel(UNetConfig(), dtype=dtype)
    rng = jax.random.PRNGKey(0)
    h8, w8 = height // 8, width // 8
    with quant.quantized("int8"):
        for bb in {2 * batch, batch}:
            lat = jnp.zeros((bb, frames, h8, w8, 8), dtype)
            t = jnp.zeros((bb,), jnp.float32)
            ctx = jnp.zeros((bb, 1, 1024), dtype)
            added = jnp.zeros((bb, 3), jnp.float32)
            jax.eval_shape(unet.init, rng, lat, t, ctx, added)
    return quant.recorded_dense_shapes()


def dense_xla(x, k, b):
    y = x @ k
    return y + b if b is not None else y


def tune_dense(args, dtype):
    shapes = collect_dense_shapes(args.height, args.width, args.frames,
                                  args.batch, dtype)
    print(f"{len(shapes)} dense shapes recorded", flush=True)
    done = quant._load_dense_table() if not args.retune else {}
    entries = {}
    for rows, cin, cout in shapes:
        if quant._dense_key(rows, cin, cout) in done:
            continue
        if rows * max(cin, cout) * 2 > args.max_bytes:
            print(f"skip {rows}x{cin}->{cout} (too large)", flush=True)
            continue
        kx, kk = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(0),
                               hash((rows, cin, cout)) & 0x7FFFFFFF))
        x = jax.random.normal(kx, (rows, cin), dtype)
        k = jax.random.normal(kk, (cin, cout), dtype) * cin ** -0.5
        b = jnp.zeros((cout,), dtype)
        try:
            t_bf = timed_burst(dense_xla, x, k, b)
            t_i8 = timed_burst(quant.int8_dense, x, k, b)
        except Exception as e:
            print(f"{rows}x{cin}->{cout}: FAILED {type(e).__name__}: "
                  f"{str(e)[:80]}", flush=True)
            continue
        r = t_bf / t_i8
        entries[quant._dense_key(rows, cin, cout)] = {
            "speedup": round(r, 3),
            "t_bf16_ms": round(t_bf * 1e3, 4),
            "t_int8_ms": round(t_i8 * 1e3, 4),
        }
        mark = " INT8" if r >= 1.15 else ""
        print(f"{rows:>8d} x {cin:4d} -> {cout:4d}  bf16 {t_bf*1e3:8.3f} ms  "
              f"int8 {t_i8*1e3:8.3f} ms  {r:5.2f}x{mark}", flush=True)
        quant.save_dense_table(dict(entries), path=args.out,
                               device_kind=jax.devices()[0].device_kind)
        del x, k, b
    wins = sum(1 for e in entries.values() if e["speedup"] >= 1.15)
    print(f"\nwrote {len(entries)} dense entries ({wins} winners)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--out", default=None)
    ap.add_argument("--retune", action="store_true")
    ap.add_argument("--dense", action="store_true",
                    help="tune the attention/GEGLU dense projections "
                         "(int8_dense_table) instead of the convs")
    ap.add_argument("--max-bytes", type=int, default=384 * 2 ** 20,
                    help="skip shapes whose bf16 input exceeds this (HBM guard)")
    args = ap.parse_args()

    if args.dense:
        tune_dense(args, jnp.bfloat16)
        return

    dtype = jnp.bfloat16
    shapes = collect_shapes(args.height, args.width, args.frames, args.batch,
                            dtype)
    print(f"{len(shapes)} conv shapes recorded", flush=True)
    key = jax.random.PRNGKey(0)
    entries = {}
    done = quant._load_table() if not args.retune else {}
    for x_shape, co, _ in shapes:
        n, h, w, ci = x_shape
        if quant._key(x_shape, co) in done:
            continue
        if n * h * w * ci * 2 > args.max_bytes:
            print(f"skip {x_shape}->{co} (input too large)", flush=True)
            continue
        kx, kk = jax.random.split(
            jax.random.fold_in(key, hash((x_shape, co)) & 0x7FFFFFFF))
        x = jax.random.normal(kx, x_shape, dtype)
        k = jax.random.normal(kk, (3, 3, ci, co), dtype) * (9 * ci) ** -0.5
        b = jnp.zeros((co,), dtype)
        try:
            t_bf = timed_burst(conv_xla, x, k, b)
            t_i8 = timed_burst(quant.int8_conv3x3, x, k, b)
        except Exception as e:
            print(f"{x_shape}->{co}: FAILED {type(e).__name__}: {str(e)[:80]}",
                  flush=True)
            continue
        r = t_bf / t_i8
        entries[quant._key(x_shape, co)] = {
            "speedup": round(r, 3),
            "t_bf16_ms": round(t_bf * 1e3, 4),
            "t_int8_ms": round(t_i8 * 1e3, 4),
        }
        mark = " INT8" if r >= 1.15 else ""
        print(f"{str(x_shape):>22s} -> {co:4d}  bf16 {t_bf*1e3:8.3f} ms  "
              f"int8 {t_i8*1e3:8.3f} ms  {r:5.2f}x{mark}", flush=True)
        # incremental save: relay compiles are slow and can die mid-run
        quant.save_table(dict(entries), path=args.out,
                         device_kind=jax.devices()[0].device_kind)
        # free per-shape buffers before the next allocation
        del x, k, b
    path = quant.save_table(entries, path=args.out,
                            device_kind=jax.devices()[0].device_kind)
    wins = sum(1 for e in entries.values() if e["speedup"] >= 1.15)
    print(f"\nwrote {len(entries)} entries ({wins} int8 winners) -> {path}")


if __name__ == "__main__":
    main()
