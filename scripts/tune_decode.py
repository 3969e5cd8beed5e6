"""Whole-decode interleaved A/B for decode-scoped conv-table engagements.

The r1/r2 lesson (PERF.md sessions 4/10): isolated and even fused-subgraph
conv wins routinely lose in composition, so table entries only engage behind
a high margin. The decode shapes have two big isolated winners the margin
blocks — decoder conv_in (8,40,64,4->512: 1.39x) and conv_out
(8,320,512,128->3: 4.18x, a 32 ms XLA call) — plus whatever a re-tune finds.
This script decides by the only evidence that counts: the whole temporal
decode, timed interleaved with the candidate set on and off.

A candidate set that wins gets its entries stamped with "e2e": true
(models/blocks.py pallas_conv_dispatch bypasses the margin for e2e entries).

Usage (each arm re-traces; decode-only compiles are minutes over the relay):
  python scripts/tune_decode.py --frames 8            # baseline vs candidates
  python scripts/tune_decode.py --frames 8 --commit   # stamp winners
  python scripts/tune_decode.py --keys "8,40,64,4,512,bfloat16" ...
"""

import argparse
import json
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

from svd_xtend_tpu.ops.pallas import autotune


def decode_candidates(frames: int, h8: int, w8: int, min_speedup: float):
    """Decode-chunk conv shapes whose plain-table entries are pallas winners
    above min_speedup (isolated)."""
    table = autotune._load_table()
    out = []
    for key, ent in table.items():
        if ent.get("impl") != "pallas":
            continue
        if ent.get("speedup", 0.0) < min_speedup:
            continue
        n = key.split(",")
        if int(n[0]) != frames:
            continue
        # decode shapes: spatial from latent (h8, w8) up to (8*h8, 8*w8)
        hh, ww = int(n[1]), int(n[2])
        if hh % h8 == 0 and ww % w8 == 0 and 1 <= hh // h8 <= 8:
            out.append((key, ent))
    return out


def time_decode(frames: int, height: int, width: int, iters: int) -> float:
    """Build + time the full-size temporal decode in THIS process state
    (the autotune table is read at trace time)."""
    from svd_xtend_tpu.core.config import VAEConfig
    from svd_xtend_tpu.models.vae import TemporalDecoder

    cfg = VAEConfig()
    dec = TemporalDecoder(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(1),
                          (1, frames, height // 8, width // 8,
                           cfg.latent_channels), jnp.bfloat16)
    params = jax.jit(dec.init)(jax.random.PRNGKey(0), z)["params"]
    f = jax.jit(lambda p, z: dec.apply({"params": p}, z))
    pull = lambda o: float(jax.device_get(jnp.sum(o.astype(jnp.float32))))
    t0 = time.perf_counter()
    pull(f(params, z))
    print(f"  compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        pull(f(params, z))
        best = min(best, time.perf_counter() - t0)
    return best


def run_arm(engaged_keys, args) -> float:
    """Write a temp table with e2e stamps on engaged_keys, clear jit caches,
    re-trace + time the decode."""
    base = autotune._load_table()
    entries = dict(base)
    for k in engaged_keys:
        ent = dict(entries[k])
        ent["e2e"] = True
        entries[k] = ent
    tmp = "/tmp/tune_decode_table.json"
    with open(tmp, "w") as f:
        json.dump({"device_kind": jax.devices()[0].device_kind,
                   "entries": entries}, f)
    os.environ["SVDX_AUTOTUNE_TABLE"] = tmp
    autotune._table = None           # force reload
    jax.clear_caches()
    t = time_decode(args.frames, args.height, args.width, args.iters)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--min_speedup", type=float, default=1.15)
    ap.add_argument("--keys", nargs="*", default=None,
                    help="explicit table keys to engage (skip discovery)")
    ap.add_argument("--commit", action="store_true",
                    help="stamp the winning set into the package table")
    args = ap.parse_args()

    if args.keys:
        cands = [(k, autotune._load_table()[k]) for k in args.keys]
    else:
        cands = decode_candidates(args.frames, args.height // 8,
                                  args.width // 8, args.min_speedup)
    print(f"candidates ({len(cands)}):")
    for k, e in cands:
        print(f"  {k}: {e.get('speedup')}x band={e.get('band')} "
              f"bco={e.get('bco')}")
    if not cands:
        print("nothing to try")
        return

    saved_env = os.environ.get("SVDX_AUTOTUNE_TABLE")
    print("\narm OFF (baseline, current defaults):", flush=True)
    t_off = run_arm([], args)
    print(f"  baseline decode: {t_off*1e3:.1f} ms", flush=True)

    keys = [k for k, _ in cands]
    print("\narm ON (all candidates engaged):", flush=True)
    t_on = run_arm(keys, args)
    print(f"  engaged decode: {t_on*1e3:.1f} ms "
          f"({t_off / t_on:.3f}x)", flush=True)

    # interleave once more to kill drift
    print("\narm OFF again:", flush=True)
    t_off2 = run_arm([], args)
    print(f"  baseline decode: {t_off2*1e3:.1f} ms", flush=True)
    t_off = min(t_off, t_off2)

    win = t_on < t_off * 0.99
    print(f"\nresult: off {t_off*1e3:.1f} ms, on {t_on*1e3:.1f} ms -> "
          f"{'WIN' if win else 'no win'}")

    # per-key leave-one-in if the bundle lost but has a dominant candidate
    if not win and len(keys) > 1:
        for k in keys:
            print(f"\narm ON ({k} only):", flush=True)
            t_k = run_arm([k], args)
            print(f"  {k}: {t_k*1e3:.1f} ms ({t_off / t_k:.3f}x)", flush=True)
            if t_k < t_off * 0.99:
                keys = [k]
                t_on = t_k
                win = True
                break

    if saved_env is None:
        os.environ.pop("SVDX_AUTOTUNE_TABLE", None)
    else:
        os.environ["SVDX_AUTOTUNE_TABLE"] = saved_env
    autotune._table = None

    if win and args.commit:
        table = autotune._load_table()
        updates = {}
        for k in keys:
            ent = dict(table[k])
            ent["e2e"] = True
            ent["e2e_evidence"] = (f"decode {args.frames}f A/B "
                                   f"{t_off*1e3:.1f}->{t_on*1e3:.1f} ms")
            updates[k] = ent
        path = autotune.save_table(updates,
                                   device_kind=jax.devices()[0].device_kind)
        print(f"stamped {len(updates)} e2e entries -> {path}")
    elif win:
        print("win NOT committed (pass --commit)")


if __name__ == "__main__":
    main()
