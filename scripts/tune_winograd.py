"""Winograd dispatch tuner: probe the candidate conv families, write
provisional table entries for isolated winners, then decide by the
interleaved UNet-step A/B (the PERF.md measurement law) in the SAME
process — relay setup (~5 min/process right now) is paid once.

The microbench (scripts/microbench_winograd.py) showed the win regime is
deep-channel small-spatial (unet-L2 1.48x) — the same XLA conv lowering
weakness PERF.md session-2 recorded; large-spatial shapes lose 3-10x on
transform-domain HBM traffic. This tuner probes that family (L2/L3 resnet
convs + their split-concat part shapes + the cfg-cache half-batch forms)
and stamps `e2e` only if the whole-UNet A/B confirms.

Usage: python scripts/tune_winograd.py [--skip-ab]
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

from svd_xtend_tpu.ops.convacc import conv_f32acc
from svd_xtend_tpu.ops import winograd as WG

# (tag, x_shape, co): the deep-channel small-spatial family at operating
# point A (512x320 latent 40x64; CFG batch N=28, cfg-cache reuse steps N=14)
CANDIDATES = [
    ("L2 resnet",        (28, 10, 16, 1280), 1280),
    ("L3/mid resnet",    (28, 5, 8, 1280), 1280),
    ("down2/up1 part",   (28, 10, 16, 640), 1280),
    ("L2 k-cache",       (14, 10, 16, 1280), 1280),
    ("L3 k-cache",       (14, 5, 8, 1280), 1280),
    ("part k-cache",     (14, 10, 16, 640), 1280),
    ("L1 resnet",        (28, 20, 32, 640), 640),      # 0.81x in microbench; re-check
]


def timed(f, *args, iters=8, chain=8):
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


def probe(margin: float):
    entries = {}
    for tag, xs, co in CANDIDATES:
        x = jax.random.normal(jax.random.PRNGKey(0), xs, jnp.bfloat16)
        k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, xs[-1], co),
                               jnp.bfloat16) * (9 * xs[-1]) ** -0.5)
        direct = lambda x, k: conv_f32acc(x, k, (1, 1), ((1, 1), (1, 1))
                                          ).astype(x.dtype)
        wino = lambda x, k: WG._winograd_conv(x, k).astype(x.dtype)
        t_d = timed(direct, x, k)
        t_w = timed(wino, x, k)
        r = t_d / t_w
        win = r >= margin
        print(f"{tag:16s} {str(xs):>20s}->{co:4d}: direct {t_d*1e3:7.3f} ms  "
              f"winograd {t_w*1e3:7.3f} ms  {r:5.2f}x{'  WIN' if win else ''}",
              flush=True)
        if win:
            entries[WG._key(xs, co, "bfloat16")] = {
                "impl": "winograd", "speedup": round(r, 3), "e2e": True}
        del x, k
    return entries


def unet_ab(rounds=2, iters=5):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ab_env import build_unet

    results = {}
    for r in range(rounds):
        for mode in ("table", "0"):
            os.environ["SVDX_WINOGRAD"] = mode
            jax.clear_caches()
            f, args = build_unet(14, 320, 512)
            pull = lambda o: float(jax.device_get(jnp.sum(o.astype(jnp.float32))))
            t0 = time.perf_counter()
            s0 = pull(f(*args))
            print(f"  round {r} SVDX_WINOGRAD={mode}: compile+warm "
                  f"{time.perf_counter()-t0:.1f}s (sum={s0:.4f})", flush=True)
            best = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                pull(f(*args))
                best = min(best, time.perf_counter() - t0)
            results.setdefault(mode, []).append(best)
            print(f"    best {best*1e3:.1f} ms", flush=True)
    on, off = min(results["table"]), min(results["0"])
    print(f"\nUNet step: winograd-on {on*1e3:.1f} ms vs off {off*1e3:.1f} ms "
          f"= {off/on:.3f}x", flush=True)
    return off / on


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--margin", type=float, default=1.10)
    ap.add_argument("--skip-ab", action="store_true")
    args = ap.parse_args()

    entries = probe(args.margin)
    if not entries:
        print("no isolated winners; nothing to stamp")
        return
    # provisional table (e2e-stamped) in a temp file for the A/B arm
    tmp = "/tmp/winograd_table_candidate.json"
    os.environ[WG._TABLE_ENV] = tmp
    WG._table = None
    WG.save_table(entries, jax.devices()[0].device_kind, path=tmp)
    print(f"\n{len(entries)} candidate entries -> {tmp}", flush=True)

    if args.skip_ab:
        return
    ratio = unet_ab()
    if ratio >= 1.005:
        del os.environ[WG._TABLE_ENV]
        WG._table = None
        path = WG.save_table(entries, jax.devices()[0].device_kind)
        print(f"e2e CONFIRMED ({ratio:.3f}x): {len(entries)} entries -> {path}")
    else:
        print(f"e2e REFUTED ({ratio:.3f}x): table not written")


if __name__ == "__main__":
    main()
