"""Capture a device trace of one UNet step (bench operating point) and print
per-op time grouped by category AND by module, using the compiled HLO's
op_name metadata to attribute fusion kernels correctly — XLA lowers e.g.
the up-block concat-input convs as `fusion.N` ops, so name-only
categorization badly misbins them (an early version reported 40%
"elementwise" that was mostly convolutions).

Usage: python scripts/trace_unet.py [--out /tmp/unet_trace]
"""

import argparse
import glob
import os
import re
import sys
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
    if "conv_general_dilated" in op:
        return "convolution"
    if "flash" in n or "attn1" in n:
        return "flash-attention (pallas)"
    if "gn_" in n or "GroupNormSiLU" in op or "group_norm" in op:
        return "groupnorm"
    if "FrameAxisAttention" in op:
        return "temporal-attention"
    if "TemporalConv" in op or "temporal_res_block" in op:
        return "temporal-resnet"
    if "AlphaBlender" in op or "mix_factor" in op:
        return "alpha-blend"
    if "dot_general" in op or "einsum" in op:
        # split the GEMM surface by module role — the FF family alone is
        # ~6 TFLOP/step and needs its own roofline line
        if "/ff" in op or "net_0_proj" in op or "net_2" in op:
            return "matmul: feed-forward"
        if "to_q" in op or "to_k" in op or "to_v" in op or "to_out" in op:
            return "matmul: qkv/out proj"
        if "proj_in" in op or "proj_out" in op:
            return "matmul: transformer in/out proj"
        return "matmul: other"
    if "conv" in n:
        return "convolution"
    if "dot" in n:
        return "matmul: other"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "layout/copy"
    if "reduce" in n or "reduce" in op:
        return "reduce"
    return "other"


_MODULE_RE = re.compile(
    r"(down_blocks_\d|mid_block|up_blocks_\d|conv_in|conv_out|conv_norm_out|"
    r"time_embedding|add_embedding)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/unet_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--category", default=None,
                    help="restrict the top-op listing to one category "
                         "(e.g. 'layout/copy')")
    ap.add_argument("--all_categories", action="store_true",
                    help="print the top 15 ops of every category")
    ap.add_argument("--dump_hlo", default=None,
                    help="write the compiled HLO text to this path")
    args = ap.parse_args()

    from svd_xtend_tpu.diffusion.pipeline import SVDModels, init_pipeline_params

    models = SVDModels(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    params = init_pipeline_params(models, jax.random.PRNGKey(0))
    unet = models.unet()
    x = jnp.zeros((2, 14, 40, 64, 8), jnp.bfloat16)
    t = jnp.zeros((2,), jnp.float32)
    ehs = jnp.zeros((2, 1, 1024), jnp.bfloat16)
    ids = jnp.zeros((2, 3), jnp.float32)
    f = jax.jit(lambda p, x: unet.apply({"params": p}, x, t, ehs, ids))
    pull = lambda o: jax.device_get(jnp.sum(o.astype(jnp.float32)))
    compiled = f.lower(params["unet"], x).compile()
    pull(compiled(params["unet"], x))     # warm

    # hlo-name -> op_name metadata (module path) map for attribution
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
        pull(compiled(params["unet"], x))
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
            continue  # whole-program span (would double-count)
        per_op[name] += e.get("dur", 0) / 1e3  # us -> ms
    if not per_op:
        print("no device events; processes:", proc_names)
        return

    # FLOPs attribution: dot/conv FLOPs inside each kernel (incl. fusion
    # bodies) -> per-category TFLOP/s alongside the ms shares
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
    print(f"\ntotal device time (3 steps): {total:.1f} ms "
          f"({total / 3:.1f} ms/step); "
          f"{sum(kflops.values())/1e12:.2f} TFLOP/step mapped\n")
    print("by category:")
    for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        fl = cat_fl[c]  # per step (kflops is per program = per step)
        tfs = fl / 1e12 / (ms / 3 / 1e3) if ms else 0.0
        print(f"  {c:38s} {ms / 3:8.2f} ms/step  {100 * ms / total:5.1f}%"
              + (f"  {fl/1e12:6.2f} TF @ {tfs:6.1f} TF/s" if fl else ""))
    print("\nby module:")
    for c, ms in sorted(mods.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {c:38s} {ms / 3:8.2f} ms/step  {100 * ms / total:5.1f}%")
    print(f"\ntop {args.top} ops:")
    ranked = sorted(per_op.items(), key=lambda kv: -kv[1])
    if args.category:
        ranked = [(n, ms) for n, ms in ranked
                  if categorize(n, op_of.get(n, "")) == args.category]
    def _tfs(name, ms):
        fl = kflops.get(name, 0.0)
        return f"{fl/1e12/(ms/3/1e3):6.1f} TF/s" if fl and ms else "          "

    for name, ms in ranked[:args.top]:
        op = op_of.get(name, "")
        print(f"  {ms / 3:8.3f} ms/step {_tfs(name, ms)} {name[:36]:36s} "
              f"{op[-64:]}")

    if args.all_categories:
        for cat in sorted(cats, key=lambda c: -cats[c]):
            print(f"\n--- top ops in {cat} ({cats[cat] / 3:.2f} ms/step):")
            sub = [(n, ms) for n, ms in sorted(per_op.items(),
                                               key=lambda kv: -kv[1])
                   if categorize(n, op_of.get(n, "")) == cat]
            for name, ms in sub[:15]:
                op = op_of.get(name, "")
                print(f"  {ms / 3:8.3f} ms/step {_tfs(name, ms)} "
                      f"{name[:40]:40s} {op[-70:]}")


if __name__ == "__main__":
    main()
