"""Ablate the flash-attention forward kernel's softmax organization at the
SVD spatial shapes (L0 512x320: s=2560; op-B L0: s=9216; L1 op-B: s=2304).

Variants:
  base       — shipped kernel (inner 128-wide KV sub-tiles, per-sub-tile stats)
  major      — one (bq, bkm) score dot per KV major tile; one max/alpha/exp
               pass per major tile (4x fewer stat updates, 1.25x vs 2x exp
               elements per score)
  major_exp2 — major + exp2 with log2(e) folded into the QK scale
  nosoftmax  — p = s (timing-only ablation: isolates the matmul+DMA floor)
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

NEG_INF = -1e30
LANES = 128
SUBS = 8
LOG2E = 1.4426950408889634
OVERHEAD = 0.00117


def _choose_block(s, candidates=(512, 256, 128)):
    for c in candidates:
        if s % c == 0:
            return c
    raise ValueError(s)


def _kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
            *, scale, kv_tiles, bq, bkm, mode):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    d = acc_scr.shape[-1]
    exp = jnp.exp2 if mode == "major_exp2" else jnp.exp
    eff_scale = scale * LOG2E if mode == "major_exp2" else scale

    if mode in ("major", "major_exp2", "nosoftmax"):
        k = k_ref[0]                                  # (bkm, D)
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * eff_scale
        if mode == "nosoftmax":
            p = s
            l_curr = jax.lax.broadcast_in_dim(jnp.sum(p, axis=1), (bq, LANES), (0,))
            l_scr[...] = l_scr[...] + l_curr
            acc_scr[...] = acc_scr[...] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        else:
            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_curr = jax.lax.broadcast_in_dim(jnp.max(s, axis=1), (bq, LANES), (0,))
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = exp(m_prev - m_next)
            p = exp(s - jax.lax.broadcast_in_dim(m_next[:, 0], (bq, bkm), (0,)))
            l_curr = jax.lax.broadcast_in_dim(jnp.sum(p, axis=1), (bq, LANES), (0,))
            l_scr[...] = alpha * l_prev + l_curr
            m_scr[...] = m_next
            acc_scr[...] = acc_scr[...] * alpha[:, :d] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    else:  # base: shipped inner-loop form
        for j in range(bkm // 128):
            k = k_ref[0, pl.ds(j * 128, 128), :]
            v = v_ref[0, pl.ds(j * 128, 128), :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_curr = jax.lax.broadcast_in_dim(jnp.max(s, axis=1), (bq, LANES), (0,))
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :128])
            l_curr = jax.lax.broadcast_in_dim(jnp.sum(p, axis=1), (bq, LANES), (0,))
            l_scr[...] = alpha * l_prev + l_curr
            m_scr[...] = m_next
            acc_scr[...] = acc_scr[...] * alpha[:, :d] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(ki == kv_tiles - 1)
    def _finalize():
        l = l_scr[...]
        o_ref[0] = (acc_scr[...] / jnp.where(l[:, :d] == 0.0, 1.0, l[:, :d])
                    ).astype(o_ref.dtype)
        if mode == "major_exp2":
            lse = m_scr[...] / LOG2E + jnp.log(jnp.maximum(l, 1e-30))
        else:
            lse = m_scr[...] + jnp.log(jnp.maximum(l, 1e-30))
        lse_ref[0] = lse[:, :SUBS].T


def run(q, k, v, scale, mode, bq=None, bkm=None):
    bh, s_q, d = q.shape
    s_kv = k.shape[1]
    bq = bq or _choose_block(s_q)
    bkm = bkm or _choose_block(s_kv)
    kv_tiles = s_kv // bkm
    grid = (bh, s_q // bq, kv_tiles)
    out, lse = pl.pallas_call(
        functools.partial(_kernel, scale=scale, kv_tiles=kv_tiles,
                          bq=bq, bkm=bkm, mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bkm, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bkm, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, SUBS, bq), lambda b, qi, ki: (b, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
            jax.ShapeDtypeStruct((bh, SUBS, s_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q, k, v)
    return out


def timed(name, fn, *args, flops=None, iters=30):
    f = jax.jit(fn)
    ref = jax.device_get(jnp.sum(f(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters - OVERHEAD
    rate = f"  {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:44s} {dt * 1e3:8.3f} ms{rate}", flush=True)
    return dt, ref


def main():
    key = jax.random.PRNGKey(0)
    shapes = [("L0 512x320 (bh=140, s=2560)", 140, 2560),
              ("L1 opB (bh=280, s=2304)", 280, 2304),
              ("L0 opB (bh=250, s=9216)", 250, 9216)]
    d = 64
    for label, bh, s in shapes:
        print(f"\n=== {label} ===")
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (bh, s, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (bh, s, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (bh, s, d), jnp.bfloat16)
        scale = d ** -0.5
        flops = 4 * bh * s * s * d
        res = {}
        for mode in ("base", "major", "major_exp2", "nosoftmax"):
            dt, chk = timed(mode, functools.partial(run, scale=scale, mode=mode),
                            q, k, v, flops=flops)
            res[mode] = (dt, chk)
        # numerics: major variants must match base
        ob = jax.device_get(run(q, k, v, scale, "base"))
        for mode in ("major", "major_exp2"):
            om = jax.device_get(run(q, k, v, scale, mode))
            import numpy as np
            print(f"  max|{mode}-base| = {np.abs(om.astype(np.float32) - ob.astype(np.float32)).max():.2e}")


if __name__ == "__main__":
    main()
