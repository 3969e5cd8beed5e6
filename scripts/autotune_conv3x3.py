"""Autotune the conv3x3 implementation choice per model shape on the
attached TPU and write the winner table consulted by the Conv3x3 dispatch
(svd_xtend_tpu/ops/pallas/autotune.py).

Shape collection is by tracing: jax.eval_shape over the UNet and VAE
decoder at the requested operating point records every Conv3x3 request in
the autotune registry (no FLOPs run). Each recorded shape is then measured
— XLA conv vs the Pallas implicit-GEMM kernel over a small (band, bco)
neighborhood — with relay-robust timing: ITERS chained iterations inside
one jit (single dispatch), synced by pulling the result to host.

Usage:
  python scripts/autotune_conv3x3.py                   # 512x320x14f (bench op-point)
  python scripts/autotune_conv3x3.py --height 576 --width 1024 --frames 25
  python scripts/autotune_conv3x3.py --quick           # XLA vs auto-pick only
  python scripts/autotune_conv3x3.py --out /tmp/t.json # don't touch the package table
"""

import argparse
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

from svd_xtend_tpu.ops.pallas import autotune
from svd_xtend_tpu.ops.pallas.conv3x3 import (_VMEM_BUDGET, _pick_tiles,
                                              _vmem_bytes, conv3x3_pallas,
                                              conv3x3_pallas_fits)

ITERS = 12


def collect_shapes(height: int, width: int, frames: int, batch: int,
                   dtype) -> list:
    """Trace the UNet (CFG-doubled) + VAE decoder/encoder at the operating
    point; the Conv3x3 dispatch records every conv request."""
    from svd_xtend_tpu.core.config import (CLIPVisionConfig, UNetConfig,
                                           VAEConfig)
    from svd_xtend_tpu.models.unet import UNetSpatioTemporalConditionModel
    from svd_xtend_tpu.models.vae import Encoder, TemporalDecoder

    autotune.reset_recorded()
    vae_cfg, clip_cfg = VAEConfig(), CLIPVisionConfig()
    h8, w8 = height // 8, width // 8
    unet = UNetSpatioTemporalConditionModel(UNetConfig(), dtype=dtype)
    rng = jax.random.PRNGKey(0)
    # both UNet batch regimes: the CFG-stacked 2*batch call (exact path) and
    # the single-branch batch call (the CFG-cache mode's lax.cond arms run
    # cond/uncond separately at half batch)
    for bb in {2 * batch, batch}:
        lat = jnp.zeros((bb, frames, h8, w8, 8), dtype)
        t = jnp.zeros((bb,), jnp.float32)
        ctx = jnp.zeros((bb, 1, clip_cfg.projection_dim), dtype)
        added = jnp.zeros((bb, 3), jnp.float32)
        jax.eval_shape(unet.init, rng, lat, t, ctx, added)

    dec = TemporalDecoder(vae_cfg, dtype=dtype)
    chunk = min(8, frames)
    jax.eval_shape(dec.init, rng,
                   jnp.zeros((batch, chunk, h8, w8,
                              vae_cfg.latent_channels), dtype))
    enc = Encoder(vae_cfg, dtype=dtype)
    jax.eval_shape(enc.init, rng, jnp.zeros((frames, height, width, 3), dtype))
    # registry entries are (shape, co, dtype, epi); the plain tuner measures
    # the bare conv, so dedupe epi variants of the same conv
    return sorted({(s, co, dt) for (s, co, dt, _) in
                   autotune.recorded_shapes()})


def collect_shapes_epi(height: int, width: int, frames: int, batch: int,
                       dtype) -> list:
    """Like collect_shapes but keeps the epilogue tag: (shape, co, dtype,
    epi) — the fused-chain tuner's working set."""
    collect_shapes(height, width, frames, batch, dtype)
    return autotune.recorded_shapes()


def timed(fn, x, *args) -> float:
    """Seconds per iteration: ITERS chained calls in one jit, host-synced.

    Square (Cin==Co) shapes chain the output directly — the kernels the
    caller passes are variance-preserving, so no normalizing elementwise op
    is needed between iterations (an add-chain would fuse into XLA's conv
    epilogue but not into a pallas custom call, biasing the comparison)."""
    ci = x.shape[-1]

    def body(i, carry):
        y = fn(carry, *args)
        if y.shape[-1] == ci:
            return y
        if y.shape[-1] > ci:
            return carry + 1e-6 * y[..., :ci]
        return carry + 1e-6 * jnp.pad(
            y, [(0, 0)] * 3 + [(0, ci - y.shape[-1])])

    f = jax.jit(lambda x0: lax.fori_loop(0, ITERS, body, x0))
    r = f(x)
    float(jnp.sum(r.astype(jnp.float32)))            # warm + real sync
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        r = f(x)
        float(jnp.sum(r.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def conv_xla(x, k, b):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return (lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn, preferred_element_type=jnp.float32)
            + b).astype(x.dtype)


def tile_candidates(h: int, w: int, ci: int, co: int, itemsize: int,
                    quick: bool) -> list:
    ci_p = -(-ci // 128) * 128
    auto = _pick_tiles(h, w, ci_p, co, itemsize)
    if auto is None:
        return []
    cands = [auto]
    if quick:
        return cands
    band0, bco0 = auto
    w_env = -(-(w + 2) // 8) * 8
    for band in {band0 * 2, band0 // 2, h}:
        if band and h % band == 0 and band != band0:
            if _vmem_bytes(band, w, w_env, ci_p, bco0, itemsize) <= _VMEM_BUDGET:
                cands.append((band, bco0))
    for bco in {co, 128, 256}:
        if (bco != bco0 and co % bco == 0 and (bco % 128 == 0 or bco == co)
                and _vmem_bytes(band0, w, w_env, ci_p, bco,
                                itemsize) <= _VMEM_BUDGET):
            cands.append((band0, bco))
    return cands[:4]


def _validate(x, k, b, band, bco, key):
    """(plain_err, fused_err) of the winning pallas config vs the XLA
    reference; None in a slot means that variant raised (compile crash /
    OOM) — plain and fused capability are recorded separately so a fused
    failure doesn't discard a plain win (e.g. conv_in shapes never fuse)."""
    from svd_xtend_tpu.ops.pallas.conv3x3 import conv3x3_fused_reference
    n, h, w, ci = x.shape
    co = k.shape[-1]
    ks = jax.random.split(key, 3)
    sc = jax.random.normal(ks[0], (n, ci), jnp.float32) * 0.3 + 1.0
    sh = jax.random.normal(ks[1], (n, ci), jnp.float32) * 0.2
    res = jax.random.normal(ks[2], (n, h, w, co), x.dtype)
    # the module re-picks tiles when the residual block overflows the
    # tuned tiling's VMEM (models/blocks.py) — mirror that here
    ci_p = -(-ci // 128) * 128
    w_env = -(-(w + 2) // 8) * 8
    res_fits = _vmem_bytes(band, w, w_env, ci_p, bco, x.dtype.itemsize,
                           with_res=True) <= _VMEM_BUDGET
    errs = []
    for tiles, kw in (
            ((band, bco), dict()),
            ((band if res_fits else 0, bco if res_fits else 0),
             dict(pre_scale=sc, pre_shift=sh, pre_silu=True,
                  residual=res))):
        try:
            got = jax.jit(lambda x, k, b: conv3x3_pallas(
                x, k, b, band=tiles[0], bco=tiles[1], **kw))(x, k, b)
            want = jax.jit(lambda x, k, b: conv3x3_fused_reference(
                x, k, b, **kw))(x, k, b)
            gf, wf = got.astype(jnp.float32), want.astype(jnp.float32)
            scale = float(jnp.max(jnp.abs(wf))) + 1e-6
            errs.append(float(jnp.max(jnp.abs(gf - wf))) / scale)
        except Exception:
            errs.append(None)
    return tuple(errs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quick", action="store_true",
                    help="XLA vs auto-picked Pallas tiling only")
    ap.add_argument("--validate", action="store_true",
                    help="also numerics-check each pallas winner (plain + "
                         "fused epilogues) against the XLA reference; "
                         "demote to xla on mismatch")
    ap.add_argument("--out", default=None,
                    help="table path (default: the package table)")
    ap.add_argument("--remeasure", action="store_true",
                    help="re-measure shapes already in the table")
    args = ap.parse_args()

    if jax.default_backend() != "tpu":
        print(f"WARNING: backend is {jax.default_backend()}, timings will "
              "not transfer to TPU", file=sys.stderr)
    dtype = jnp.dtype(args.dtype)
    shapes = collect_shapes(args.height, args.width, args.frames, args.batch,
                            dtype)
    print(f"{len(shapes)} conv3x3 shapes recorded at "
          f"{args.width}x{args.height}x{args.frames}f")

    key = jax.random.PRNGKey(0)
    entries = {}
    for (x_shape, co, dtype_str) in shapes:
        n, h, w, ci = x_shape
        if (not args.remeasure
                and autotune.lookup(x_shape, co, dtype_str) is not None):
            print(f"{n}x{h}x{w}x{ci}->{co}: already tabled, skipping "
                  "(--remeasure to redo)")
            continue
        if w % 8 or not conv3x3_pallas_fits(x_shape, co, dtype.itemsize):
            print(f"{n}x{h}x{w}x{ci}->{co}: pallas infeasible, xla")
            entries[autotune._key(x_shape, co, dtype_str)] = \
                autotune.make_entry("xla")
            continue
        # HBM guard: the chained-timing working set is ~3 activations + the
        # weight; skip monsters rather than OOM the chip mid-sweep
        act_bytes = n * h * w * max(ci, co) * dtype.itemsize
        if act_bytes * 3.5 > 10 * 1024 ** 3:
            print(f"{n}x{h}x{w}x{ci}->{co}: skipped (activation "
                  f"{act_bytes/2**30:.1f} GiB, would OOM the sweep)")
            continue
        ks = jax.random.split(key, 3)
        x = jax.random.normal(ks[0], x_shape, dtype)
        # variance-preserving scale: lets square shapes chain outputs
        # directly in timed() without normalization ops
        k = jax.random.normal(ks[1], (3, 3, ci, co), dtype) / (3.0 * ci ** 0.5)
        b = jax.random.normal(ks[2], (co,), dtype) * 0.01
        try:
            t_xla = timed(conv_xla, x, k, b)
        except Exception as e:
            print(f"{n}x{h}x{w}x{ci}->{co}: xla timing failed "
                  f"({type(e).__name__}), skipping shape", flush=True)
            continue
        best = ("xla", 0, 0, t_xla)
        for (band, bco) in tile_candidates(h, w, ci, co, dtype.itemsize,
                                           args.quick):
            try:
                t = timed(lambda x, k, b: conv3x3_pallas(
                    x, k, b, band=band, bco=bco), x, k, b)
            except Exception as e:
                print(f"  band={band} bco={bco}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}")
                continue
            if t < best[3]:
                best = ("pallas", band, bco, t)
        impl, band, bco, t = best
        fused_ok = True
        # the validation arm materializes f32 references + residuals (~4x
        # the activation); at fat shapes that OOMs the chip — trust the
        # family-level validation from smaller shapes instead
        if act_bytes > 512 * 1024 * 1024:
            args_validate_shape = False
        else:
            args_validate_shape = args.validate
        if args_validate_shape and impl == "pallas":
            plain_err, fused_err = _validate(x, k, b, band, bco, key)
            if plain_err is None or plain_err > 2e-2:
                print(f"  plain validation failed (err={plain_err}), "
                      "demoting to xla")
                impl, band, bco, t = "xla", 0, 0, t_xla
            elif fused_err is None or fused_err > 2e-2:
                print(f"  fused validation failed (err={fused_err}); "
                      "pallas kept for plain sites only")
                fused_ok = False
        speedup = t_xla / t if impl == "pallas" else 1.0
        ent = autotune.make_entry(impl, band, bco, speedup)
        if impl == "pallas" and not fused_ok:
            ent["fused"] = False
        entries[autotune._key(x_shape, co, dtype_str)] = ent
        extra = f" band={band} bco={bco} {speedup:.2f}x" if impl == "pallas" else ""
        print(f"{n}x{h}x{w}x{ci}->{co}: {impl}{extra}  "
              f"(xla {t_xla*1e3:.3f} ms, best {t*1e3:.3f} ms)", flush=True)
        # incremental save (merge) — a crash mid-sweep loses nothing
        autotune.save_table(entries, args.out,
                            device_kind=jax.devices()[0].device_kind)
        x = k = b = None
        if act_bytes > 512 * 1024 * 1024:
            # drop the jit executables holding fat-buffer references; the
            # persistent disk cache makes re-tracing cheap
            jax.clear_caches()

    path = autotune.save_table(entries, args.out,
                               device_kind=jax.devices()[0].device_kind)
    print(f"wrote {len(entries)} entries -> {path}")


if __name__ == "__main__":
    main()
