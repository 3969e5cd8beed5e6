"""Probe: would int8 QK^T / PV contractions speed up the flash kernel?

The one un-probed int8 surface (r4 VERDICT task 7). The flash forward's
MXU work per tile is the chain scores = Q(bq,64)@K^T(64,bkm) followed by
out += P(bq,bkm)@V(bkm,64). This probe times that CHAIN (p -> q -> p ...,
real data dependence so nothing hoists; v1 of this script accumulated
loop-invariant dots and measured only VPU adds) fully VMEM-resident:

  bf16     — today's kernel math (f32-accumulated bf16 dots),
  int8_qd  — K^T/V pre-quantized (amortizable across q-tiles), Q and P
             dynamically quantized per iteration (what a real flash
             integration must pay — P is produced by the softmax every
             tile and CANNOT be pre-quantized), int32 MXU accumulate,
             f32 dequantize.

Decision rule (stated before measurement): a real integration replaces
~60% of flash kernel time and flash is ~18% of the UNet step, so unless
int8_qd >= ~1.5x bf16 on the chain the e2e ceiling is <2% and the
int8-flash frontier gets the closing refutation.

Usage: python scripts/probe_int8_flash.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

N_INNER = 60
D = 64

# flash fwd tile shapes at the SVD bench shapes (bq, bkm):
# s=640 blocks (640,640); s=2560 (1280,1280); s=9216-class (1024,1536)
TILES = [(640, 640), (1280, 1280), (1024, 1536)]


def _chain_bf16(q_ref, kT_ref, v_ref, o_ref):
    kT = kT_ref[...]
    v = v_ref[...]
    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    def body(i, q):
        p = dot(q, kT)                                   # (bq, bkm) f32
        p = (p * (1.0 / p.shape[1])).astype(jnp.bfloat16)
        o = dot(p, v)                                    # (bq, D) f32
        return (o * 0.25).astype(jnp.bfloat16)

    o_ref[...] = jax.lax.fori_loop(
        0, N_INNER, body, q_ref[...]).astype(jnp.float32)


def _chain_int8_qd(q_ref, kT_ref, v_ref, o_ref):
    kT = kT_ref[...]                                     # int8, static
    v = v_ref[...]                                       # int8, static
    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    def quant(x):
        s = jnp.max(jnp.abs(x)) / 127.0 + 1e-12
        return jnp.round(x / s).astype(jnp.int8), s

    def body(i, q):
        qi, sq = quant(q)
        p = dot(qi, kT).astype(jnp.float32) * sq         # dequant (x k-scale
        p = p * (1.0 / p.shape[1])                       #  folded into norm)
        pi, sp = quant(p)
        o = dot(pi, v).astype(jnp.float32) * sp
        return (o * 0.25).astype(jnp.float32)

    o_ref[...] = jax.lax.fori_loop(
        0, N_INNER, body, q_ref[...].astype(jnp.float32))


def run(kernel, q, kT, v, bq):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bq, D), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )
    jf = jax.jit(lambda a, b, c: f(a, b, c))
    out = jf(q, kT, v)
    float(jax.device_get(jnp.sum(out)))
    t0 = time.perf_counter()
    for _ in range(10):
        out = jf(q, kT, v)
    float(jax.device_get(jnp.sum(out)))
    return (time.perf_counter() - t0) / 10 / N_INNER * 1e6   # us/chain-iter


def main():
    key = jax.random.PRNGKey(0)
    for bq, bkm in TILES:
        q = jax.random.normal(key, (bq, D), jnp.bfloat16)
        kT = jax.random.normal(key, (D, bkm), jnp.bfloat16)
        v = jax.random.normal(key, (bkm, D), jnp.bfloat16)
        kTi = jnp.clip(jnp.round(kT.astype(jnp.float32) * 20), -127,
                       127).astype(jnp.int8)
        vi = jnp.clip(jnp.round(v.astype(jnp.float32) * 20), -127,
                      127).astype(jnp.int8)
        t_bf = run(_chain_bf16, q, kT, v, bq)
        t_qd = run(_chain_int8_qd, q, kTi, vi, bq)
        fl = (2 * bq * D * bkm + 2 * bq * bkm * D) / 1e6     # MFLOP/iter
        print(f"chain QK+PV bq={bq} bkm={bkm}: bf16 {t_bf:7.2f}us "
              f"({fl / t_bf:.0f} TF/s)  int8_qd {t_qd:7.2f}us "
              f"({fl / t_qd:.0f} TF/s)  speedup {t_bf / t_qd:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
