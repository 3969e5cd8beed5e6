"""Device trace of one VAE temporal-decode chunk (bench operating point) with
per-category and per-level attribution — the decode analog of trace_unet.py.

The r2 component budget (PERF.md) put decode at 449 ms/video with its spatial
convs in XLA's ~41 TF/s large-spatial lowering regime, but that number
predates the fused temporal-resnet default-ON; this script re-measures where
the time actually goes before any further decode work.

Usage: python scripts/trace_decode.py [--frames 8] [--out /tmp/decode_trace]
"""

import argparse
import glob
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def categorize(name: str, op: str) -> str:
    n = name.lower()
    if "conv_general_dilated" in op or "conv" in n:
        return "convolution"
    if "tres" in n or "temporal_res" in op or "TemporalResnetBlock" in op:
        return "temporal-resnet"
    if "gn_" in n or "GroupNormSiLU" in op or "group_norm" in op:
        return "groupnorm"
    if "VAEAttention" in op or "attention" in op.lower():
        return "vae-attention"
    if "Upsample" in op or "upsample" in op.lower():
        return "upsample"
    if "AlphaBlender" in op or "mix_factor" in op:
        return "alpha-blend"
    if "dot_general" in op or "dot" in n or "einsum" in op:
        return "matmul"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "layout/copy"
    if "reduce" in n or "reduce" in op:
        return "reduce"
    return "other"


_MODULE_RE = re.compile(
    r"(mid_resnets_\d|mid_attentions_\d|up_blocks_\d|conv_in|conv_out|"
    r"conv_norm_out|time_conv_out)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--out", default="/tmp/decode_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--all_categories", action="store_true")
    ap.add_argument("--dump_hlo", default=None)
    args = ap.parse_args()

    from svd_xtend_tpu.core.config import VAEConfig
    from svd_xtend_tpu.models.vae import TemporalDecoder

    cfg = VAEConfig()
    dec = TemporalDecoder(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    h8, w8 = args.height // 8, args.width // 8
    z = jnp.zeros((1, args.frames, h8, w8, cfg.latent_channels), jnp.bfloat16)
    params = jax.jit(dec.init)(jax.random.PRNGKey(0), z)["params"]

    f = jax.jit(lambda p, z: dec.apply({"params": p}, z))
    pull = lambda o: jax.device_get(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    compiled = f.lower(params, z).compile()
    print(f"compile {time.perf_counter() - t0:.1f}s", flush=True)
    pull(compiled(params, z))     # warm

    # wall-clock decode time (relay-synced by the scalar pull)
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        pull(compiled(params, z))
        times.append(time.perf_counter() - t0)
    print(f"decode chunk ({args.frames}f @ {args.width}x{args.height}): "
          f"best {min(times)*1e3:.1f} ms, mean {sum(times)/len(times)*1e3:.1f} ms",
          flush=True)

    hlo_text = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as fh:
            fh.write(hlo_text)
    op_of = {}
    for m in re.finditer(r"%([\w.\-]+) = [^\n]*?op_name=\"([^\"]+)\"",
                         hlo_text):
        op_of[m.group(1)] = m.group(2)

    jax.profiler.start_trace(args.out)
    for _ in range(3):
        pull(compiled(params, z))
    jax.profiler.stop_trace()

    import gzip
    import json
    traces = glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        print("no trace captured (relay may not support device tracing)")
        return
    with gzip.open(sorted(traces)[-1], "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    proc_names = {e.get("pid"): e.get("args", {}).get("name", "")
                  for e in events if e.get("ph") == "M"
                  and e.get("name") == "process_name"}
    device_pids = {pid for pid, n in proc_names.items()
                   if any(s in n for s in ("TPU", "Device", "device"))}
    per_op = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_") or name.startswith("jit__"):
            continue
        per_op[name] += e.get("dur", 0) / 1e3
    if not per_op:
        print("no device events; processes:", proc_names)
        return

    from hlo_flops import kernel_flops
    kflops = kernel_flops(hlo_text)

    total = sum(per_op.values())
    cats = defaultdict(float)
    cat_fl = defaultdict(float)
    mods = defaultdict(float)
    for name, ms in per_op.items():
        op = op_of.get(name, "")
        c = categorize(name, op)
        cats[c] += ms
        cat_fl[c] += kflops.get(name, 0.0)
        seg = _MODULE_RE.search(op)
        mods[seg.group(1) if seg else "(unattributed)"] += ms
    print(f"\ntotal device time (3 decodes): {total:.1f} ms "
          f"({total / 3:.1f} ms/decode); "
          f"{sum(kflops.values())/1e12:.2f} TFLOP/decode mapped\n")
    print("by category:")
    for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        fl = cat_fl[c]
        tfs = fl / 1e12 / (ms / 3 / 1e3) if ms else 0.0
        print(f"  {c:38s} {ms / 3:8.2f} ms  {100 * ms / total:5.1f}%"
              + (f"  {fl/1e12:6.2f} TF @ {tfs:6.1f} TF/s" if fl else ""))
    print("\nby module:")
    for c, ms in sorted(mods.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {c:38s} {ms / 3:8.2f} ms  {100 * ms / total:5.1f}%")
    print(f"\ntop {args.top} ops:")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        op = op_of.get(name, "")
        print(f"  {ms / 3:8.3f} ms  {name[:40]:40s} {op[-72:]}")
    if args.all_categories:
        for cat in sorted(cats, key=lambda c: -cats[c]):
            print(f"\n--- top ops in {cat} ({cats[cat] / 3:.2f} ms):")
            sub = [(n, ms) for n, ms in sorted(per_op.items(),
                                               key=lambda kv: -kv[1])
                   if categorize(n, op_of.get(n, "")) == cat]
            for name, ms in sub[:12]:
                op = op_of.get(name, "")
                print(f"  {ms / 3:8.3f} ms  {name[:44]:44s} {op[-72:]}")


if __name__ == "__main__":
    main()
