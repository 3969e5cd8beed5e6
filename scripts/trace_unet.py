"""Capture a device trace of one UNet step (bench operating point) and print
the per-op time breakdown, grouped by op category. Uses jax.profiler +
tensorboard_plugin_profile's xplane parser.

Usage: python scripts/trace_unet.py [--out /tmp/unet_trace]
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

# the installed tensorboard_plugin_profile ships old-style generated protos
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def categorize(name: str) -> str:
    n = name.lower()
    if "conv" in n:
        return "convolution"
    if "attn" in n or "flash" in n:
        return "flash-attention (pallas)"
    if "group_norm" in n or "groupnorm" in n or "gn_" in n:
        return "groupnorm (pallas)"
    if "dot" in n or "einsum" in n or "matmul" in n:
        return "matmul"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "layout/copy"
    if "fusion" in n:
        return "fusion (elementwise/softmax/etc)"
    if "reduce" in n:
        return "reduce"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/unet_trace")
    ap.add_argument("--top", type=int, default=25)
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
    pull(f(params["unet"], x))     # compile

    jax.profiler.start_trace(args.out)
    for _ in range(3):
        pull(f(params["unet"], x))
    jax.profiler.stop_trace()

    # parse the chrome-trace JSON the profiler writes alongside the xplane
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
    # device lanes: pick pids whose process name mentions TPU/device; fall
    # back to every complete ('X') event if none matches
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

    total = sum(per_op.values())
    cats = defaultdict(float)
    for name, ms in per_op.items():
        cats[categorize(name)] += ms
    print(f"\ntotal device time (3 steps): {total:.1f} ms "
          f"({total / 3:.1f} ms/step)\n")
    print("by category:")
    for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {c:38s} {ms / 3:8.2f} ms/step  {100 * ms / total:5.1f}%")
    print(f"\ntop {args.top} ops:")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {ms / 3:8.3f} ms/step  {name[:100]}")


if __name__ == "__main__":
    main()
