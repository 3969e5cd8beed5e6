"""Probe: does this TPU runtime (axon relay) support host-memory offload?

Full-UNet finetuning at 512x320x14f needs ~19.3 GB on a 15.75 GB chip
(PERF.md "Training throughput" — the measured fix-ladder all refuted). The
remaining single-chip lever is host offload: park the optimizer moments (and
possibly the fp32 masters) in `pinned_host` memory and pay PCIe transfers
per step. This probe checks, cheaply and in escalating order, whether the
relay exposes the machinery at all:

  1. device memories()/memory kinds visible?
  2. jax.device_put to TransferToMemoryKind("pinned_host") executes?
  3. a jit whose INPUT lives in pinned_host and output on device runs?
  4. round-trip timing of a 256 MB tensor (the per-step PCIe cost anchor).

Run:  python scripts/probe_host_offload.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", flush=True)

    # 1. memory spaces
    try:
        mems = dev.addressable_memories()
        print(f"addressable_memories: {[m.kind for m in mems]}", flush=True)
    except Exception as e:
        print(f"addressable_memories FAILED: {type(e).__name__}: {e}", flush=True)

    from jax.sharding import SingleDeviceSharding
    try:
        host_shard = SingleDeviceSharding(dev, memory_kind="pinned_host")
        dev_shard = SingleDeviceSharding(dev, memory_kind="device")
    except Exception as e:
        print(f"memory_kind shardings FAILED: {type(e).__name__}: {e}", flush=True)
        return

    # 2. put to host memory
    x = jnp.arange(1024, dtype=jnp.float32)
    try:
        xh = jax.device_put(x, host_shard)
        s = float(jax.device_get(jnp.sum(xh)))
        print(f"device_put(pinned_host) OK, sum={s}", flush=True)
    except Exception as e:
        print(f"device_put(pinned_host) FAILED: {type(e).__name__}: {e}",
              flush=True)
        return

    # 3. jit with host-resident input / output annotations
    try:
        f = jax.jit(lambda a: a * 2.0 + 1.0,
                    in_shardings=host_shard, out_shardings=dev_shard)
        y = f(xh)
        s = float(jax.device_get(jnp.sum(y)))
        print(f"jit(host->device) OK, sum={s}", flush=True)
    except Exception as e:
        print(f"jit(host->device) FAILED: {type(e).__name__}: {e}", flush=True)

    # 4. PCIe round-trip anchor: 256 MB fp32
    try:
        big = jnp.ones((64, 1024, 1024), jnp.float32)  # 256 MB
        bh = jax.device_put(big, host_shard)
        float(jax.device_get(jnp.sum(bh.astype(jnp.float32)[:1])))
        to_dev = jax.jit(lambda a: jnp.sum(a),
                         in_shardings=host_shard)
        float(jax.device_get(to_dev(bh)))  # warm
        t0 = time.perf_counter()
        for _ in range(3):
            float(jax.device_get(to_dev(bh)))
        dt = (time.perf_counter() - t0) / 3
        print(f"256MB host->device reduce: {dt*1e3:.1f} ms "
              f"({0.25/dt:.1f} GB/s)", flush=True)
    except Exception as e:
        print(f"bandwidth probe FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
