"""Probe: would int8 QK^T / PV contractions speed up the flash kernel?

The one un-probed int8 surface (r4 VERDICT task 7). The flash forward's
MXU work is two d=64 contractions per tile: scores = Q(bq,64)@K^T(64,bkm)
and out += P(bq,bkm)@V(bkm,64). At d=64 the bf16 contraction already runs
at ~half MXU feed (PERF.md session-12: block-diag d=128 packing measured
net 0.99x); the int8 question is whether the 2x int8 MXU rate survives the
d=64 feed plus the in-kernel quantize/dequantize VPU work that a real
kernel would add on top.

This probe times Pallas kernels that run ONLY the contraction pattern
(N inner iterations over resident VMEM operands, no HBM streaming) in
three arms per shape:
  bf16      — today's kernel math,
  int8_raw  — operands pre-quantized, int32 accumulate (the pure MXU
              ceiling for int8),
  int8_qd   — int8 with the per-tile dynamic quantize of Q/K (resp. P) and
              f32 dequantize of the result folded in (what a real flash
              integration must pay; K/V quantization is amortizable across
              q-tiles, P quantization is not).

Decision rule (stated before measurement): a real integration replaces
~60% of kernel time (the contractions) and flash is ~18% of the UNet step,
so unless int8_qd >= ~1.5x bf16 on BOTH contraction patterns the e2e
ceiling is <2% and the int8-flash frontier gets the closing refutation.

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

N_INNER = 40

# flash fwd tile shapes at the SVD bench shapes (bq, bkm) with d=64:
# s=2560 blocks (1280,1280); s=640 (640,640); s=9216-class (1024,1536)
TILES = [(640, 640), (1280, 1280), (1024, 1536)]


def _qk_bf16(q_ref, k_ref, o_ref):
    acc = jnp.zeros(o_ref.shape, jnp.float32)

    def body(i, acc):
        s = jax.lax.dot_general(q_ref[...], k_ref[...],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return acc + s

    o_ref[...] = jax.lax.fori_loop(0, N_INNER, body, acc)


def _qk_int8_raw(q_ref, k_ref, o_ref):
    acc = jnp.zeros(o_ref.shape, jnp.float32)

    def body(i, acc):
        s = jax.lax.dot_general(q_ref[...], k_ref[...],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return acc + s.astype(jnp.float32)

    o_ref[...] = jax.lax.fori_loop(0, N_INNER, body, acc)


def _qk_int8_qd(q_ref, k_ref, o_ref):
    """bf16 in, per-tile dynamic quant + int8 dot + f32 dequant inside."""
    acc = jnp.zeros(o_ref.shape, jnp.float32)

    def body(i, acc):
        q = q_ref[...].astype(jnp.float32)
        sq = jnp.max(jnp.abs(q)) / 127.0 + 1e-12
        qi = jnp.round(q / sq).astype(jnp.int8)
        k = k_ref[...].astype(jnp.float32)
        sk = jnp.max(jnp.abs(k)) / 127.0 + 1e-12
        ki = jnp.round(k / sk).astype(jnp.int8)
        s = jax.lax.dot_general(qi, ki, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return acc + s.astype(jnp.float32) * (sq * sk)

    o_ref[...] = jax.lax.fori_loop(0, N_INNER, body, acc)


def run(kernel, a, b, out_rows, out_cols):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, out_cols), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )
    jf = jax.jit(lambda x, y: f(x, y))
    out = jf(a, b)
    float(jax.device_get(jnp.sum(out)))
    t0 = time.perf_counter()
    for _ in range(10):
        out = jf(a, b)
    float(jax.device_get(jnp.sum(out)))
    return (time.perf_counter() - t0) / 10 / N_INNER * 1e6   # us/contraction


def main():
    key = jax.random.PRNGKey(0)
    for bq, bkm in TILES:
        d = 64
        # ---- QK^T pattern: (bq, d) @ (d, bkm) ----
        q = jax.random.normal(key, (bq, d), jnp.bfloat16)
        kT = jax.random.normal(key, (d, bkm), jnp.bfloat16)
        qi = jnp.clip(jnp.round(q.astype(jnp.float32) * 20), -127,
                      127).astype(jnp.int8)
        kTi = jnp.clip(jnp.round(kT.astype(jnp.float32) * 20), -127,
                       127).astype(jnp.int8)
        t_bf = run(_qk_bf16, q, kT, bq, bkm)
        t_raw = run(_qk_int8_raw, qi, kTi, bq, bkm)
        t_qd = run(_qk_int8_qd, q, kT, bq, bkm)
        fl = 2 * bq * d * bkm / 1e6                          # MFLOP
        print(f"QK^T ({bq},{d})@({d},{bkm}): bf16 {t_bf:7.2f}us "
              f"({fl / t_bf:.0f} TF/s)  int8_raw {t_raw:7.2f}us "
              f"({fl / t_raw:.0f}, {t_bf / t_raw:.2f}x)  int8_qd "
              f"{t_qd:7.2f}us ({t_bf / t_qd:.2f}x)", flush=True)

        # ---- PV pattern: (bq, bkm) @ (bkm, d) ----
        p = jax.random.uniform(key, (bq, bkm), jnp.bfloat16)
        v = jax.random.normal(key, (bkm, d), jnp.bfloat16)
        pi = jnp.clip(jnp.round(p.astype(jnp.float32) * 127), -127,
                      127).astype(jnp.int8)
        vi = jnp.clip(jnp.round(v.astype(jnp.float32) * 20), -127,
                      127).astype(jnp.int8)
        t_bf = run(_qk_bf16, p, v, bq, d)
        t_raw = run(_qk_int8_raw, pi, vi, bq, d)
        t_qd = run(_qk_int8_qd, p, v, bq, d)
        fl = 2 * bq * bkm * d / 1e6
        print(f"PV   ({bq},{bkm})@({bkm},{d}): bf16 {t_bf:7.2f}us "
              f"({fl / t_bf:.0f} TF/s)  int8_raw {t_raw:7.2f}us "
              f"({fl / t_raw:.0f}, {t_bf / t_raw:.2f}x)  int8_qd "
              f"{t_qd:7.2f}us ({t_bf / t_qd:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
