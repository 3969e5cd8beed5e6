"""Measure XLA vs Pallas on the FUSED resnet conv subgraph per model shape
and write the fused-chain winner table (conv3x3_fused_table.json) consulted
by models/blocks.py:pallas_conv_dispatch.

Why a third tuner: the plain conv table (autotune_conv3x3.py) times the bare
conv, and its 17 isolated winners LOST 1.2-4.4% end-to-end (PERF.md
session-4) because a pallas_call is a fusion/layout boundary — every
elementwise neighbor XLA folds into its conv lowering became a separate HBM
pass. This tuner times the WHOLE replaced subgraph instead — folded
GN-normalize+SiLU input affine, conv, t-emb shift / residual add — exactly
the chain ResnetBlock2D hands to Conv3x3 (epi tags "preS", "preS+post",
"preS+res"), so a tabled win already prices the boundary. Composition
verdicts still come from the end-to-end bench A/B as always (the GN stats
reduce and the *next* op's fusion remain outside the subgraph).

Timing is burst-dispatch (tune_int8.py rationale: a chained fori_loop's
feedback carry fuses into the XLA arm's epilogue but not into a pallas
custom call, biasing the comparison).

Usage:
  python scripts/tune_conv_fused.py                  # 512x320x14f bench point
  python scripts/tune_conv_fused.py --height 576 --width 1024 --frames 25
  python scripts/tune_conv_fused.py --out /tmp/t.json
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

from autotune_conv3x3 import collect_shapes_epi, tile_candidates
from svd_xtend_tpu.ops.pallas import autotune
from svd_xtend_tpu.ops.pallas.conv3x3 import (conv3x3_fused_reference,
                                              conv3x3_pallas,
                                              conv3x3_pallas_fits)

BURST = 30


def timed_burst(fn, *args) -> float:
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


def make_args(key, x_shape, co, dtype, epi):
    """Random operands for one fused-chain instance; scales mimic the real
    ranges (GN folds are O(1), activations O(1))."""
    n, h, w, ci = x_shape
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], x_shape, dtype)
    k = jax.random.normal(ks[1], (3, 3, ci, co), dtype) * (ci * 9) ** -0.5
    b = jnp.zeros((co,), dtype)
    kw = {}
    if "pre" in epi:
        kw["pre_scale"] = 1.0 + 0.1 * jax.random.normal(ks[2], (n, ci),
                                                        jnp.float32)
        kw["pre_shift"] = 0.1 * jax.random.normal(ks[3], (n, ci), jnp.float32)
        kw["pre_silu"] = epi.startswith("preS")
    if "post" in epi:
        kw["post_shift"] = jax.random.normal(ks[4], (n, co), jnp.float32)
    if "res" in epi:
        kw["residual"] = jax.random.normal(ks[5], (n, h, w, co), dtype)
    return x, k, b, kw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default=None)
    ap.add_argument("--remeasure", action="store_true")
    ap.add_argument("--max-gb", type=float, default=10.0)
    args = ap.parse_args()

    if jax.default_backend() != "tpu":
        print(f"WARNING: backend {jax.default_backend()}; timings will not "
              "transfer", file=sys.stderr)
    dtype = jnp.dtype(args.dtype)
    shapes = [(s, co, dt, epi) for (s, co, dt, epi) in
              collect_shapes_epi(args.height, args.width, args.frames,
                                 args.batch, dtype) if epi]
    print(f"{len(shapes)} fused conv sites at "
          f"{args.width}x{args.height}x{args.frames}f", flush=True)

    key = jax.random.PRNGKey(0)
    entries = {}
    for (x_shape, co, dtype_str, epi) in shapes:
        n, h, w, ci = x_shape
        tag = f"{n}x{h}x{w}x{ci}->{co} [{epi}]"
        if (not args.remeasure and autotune.lookup_fused(
                x_shape, co, dtype_str, epi) is not None):
            print(f"{tag}: already tabled, skipping", flush=True)
            continue
        with_res = "res" in epi
        if w % 8 or not conv3x3_pallas_fits(x_shape, co, dtype.itemsize,
                                            with_res):
            print(f"{tag}: pallas infeasible, xla", flush=True)
            entries[autotune._fused_key(x_shape, co, dtype_str, epi)] = \
                autotune.make_entry("xla")
            continue
        act = n * h * w * max(ci, co) * dtype.itemsize
        if act * (4.5 if with_res else 3.5) > args.max_gb * 1024 ** 3:
            print(f"{tag}: skipped (HBM guard)", flush=True)
            continue
        key, sub = jax.random.split(key)
        x, k, b, kw = make_args(sub, x_shape, co, dtype, epi)
        # epilogue operands must be jit ARGUMENTS, not closure constants —
        # closed-over arrays are baked into the HLO and a (8,320,512,C)
        # residual blows the relay's compile-request size cap (HTTP 413)
        knames = sorted(kn for kn in kw if kn != "pre_silu")
        kvals = [kw[kn] for kn in knames]
        silu = bool(kw.get("pre_silu", False))

        def xla_arm(x, k, b, *ops):
            d = dict(zip(knames, ops))
            return conv3x3_fused_reference(x, k, b, pre_silu=silu, **d)

        t_xla = timed_burst(xla_arm, x, k, b, *kvals)
        best = (float("inf"), 0, 0)
        for band, bco in tile_candidates(h, w, ci, co, dtype.itemsize,
                                         quick=False):
            def pallas_arm(x, k, b, *ops, _band=band, _bco=bco):
                d = dict(zip(knames, ops))
                return conv3x3_pallas(x, k, b, band=_band, bco=_bco,
                                      pre_silu=silu, **d)
            try:
                t_p = timed_burst(pallas_arm, x, k, b, *kvals)
            except Exception as e:
                print(f"  ({band},{bco}) failed: {type(e).__name__}",
                      flush=True)
                continue
            if t_p < best[0]:
                best = (t_p, band, bco)
        if best[1] == 0:
            print(f"{tag}: no working pallas tiling, xla", flush=True)
            entries[autotune._fused_key(x_shape, co, dtype_str, epi)] = \
                autotune.make_entry("xla")
            continue
        t_p, band, bco = best
        # numerics gate vs the shared contract
        ref = conv3x3_fused_reference(x, k, b, **kw)
        got = conv3x3_pallas(x, k, b, band=band, bco=bco, **kw)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        speed = t_xla / t_p
        ok = err <= 2e-2
        impl = "pallas" if (speed > 1.0 and ok) else "xla"
        print(f"{tag}: xla {t_xla*1e3:7.3f} ms  pallas {t_p*1e3:7.3f} ms "
              f"({band},{bco})  speedup {speed:.2f}x  err {err:.4f}"
              f"{'' if ok else '  NUMERICS-DEMOTED'}", flush=True)
        ent = autotune.make_entry(impl, band, bco, speed)
        entries[autotune._fused_key(x_shape, co, dtype_str, epi)] = ent
        # incremental save: a relay hiccup mid-sweep keeps what's measured
        autotune.save_fused_table(
            entries, args.out, device_kind=jax.devices()[0].device_kind)

    path = autotune.save_fused_table(
        entries, args.out, device_kind=jax.devices()[0].device_kind)
    wins = sum(1 for e in entries.values() if e["impl"] == "pallas")
    print(f"wrote {len(entries)} entries ({wins} pallas) -> {path}")


if __name__ == "__main__":
    main()
