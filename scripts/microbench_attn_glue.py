"""Measure the flash-attention head-split glue cost at the L0 spatial shape.

The trace (r2 session-12) shows each L0 spatial attention paying a chain of
per-head dynamic-update-slice fusions plus a ~0.22 ms layout copy per Q/K/V
operand to go from the projections' (B, S, H*D) output to the kernel's
(B*H, S, D) operand layout, and the mirror glue on the output. This bench
isolates that glue with IN-GRAPH loop timing (the axon relay adds ~20 ms per
dispatched program, so each variant is applied CHAIN times inside one jit
with a data dependency between iterations).

Usage: python scripts/microbench_attn_glue.py
"""

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

from svd_xtend_tpu.ops.pallas.flash_attention import _flash, flash_attention

B, S, H, D = 28, 2560, 5, 64
C = H * D
SCALE = D ** -0.5
CHAIN = 10
REPS = 3


def timed(name, step, x0):
    """step: x -> x (same shape), chained CHAIN times in one jit."""
    def loop(x):
        return jax.lax.fori_loop(0, CHAIN, lambda i, t: step(t), x)
    pull = lambda out: jax.device_get(jnp.sum(out.astype(jnp.float32)))
    f = jax.jit(loop)
    pull(f(x0))
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        pull(f(x0))
        best = min(best, (time.perf_counter() - t0) / CHAIN * 1e3)
    print(f"{name:48s} {best:8.3f} ms/call")
    return best


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B, S, C), jnp.bfloat16)
    wq = jax.random.normal(ks[1], (C, C), jnp.bfloat16) * 0.02
    wk = jax.random.normal(ks[2], (C, C), jnp.bfloat16) * 0.02
    wv = jax.random.normal(ks[3], (C, C), jnp.bfloat16) * 0.02
    wo = jax.random.normal(ks[4], (C, C), jnp.bfloat16) * 0.02
    qp = jax.random.normal(ks[5], (B * H, S, D), jnp.bfloat16)

    # 1. kernel alone on pre-packed operands (the compute floor)
    timed("kernel only (BH,S,D) packed",
          lambda q: _flash(q, q, q, SCALE), qp)

    # 2. full block as the model runs it: proj -> wrapper glue -> attn ->
    #    inverse glue -> out proj
    def block_current(x):
        q = (x @ wq).reshape(B, S, H, D)
        k = (x @ wk).reshape(B, S, H, D)
        v = (x @ wv).reshape(B, S, H, D)
        o = flash_attention(q, k, v, scale=SCALE)
        return (o.reshape(B, S, C) @ wo).astype(x.dtype)

    timed("proj + wrapper glue + attn + out proj", block_current, x)

    # 3. projections + out proj alone (no attention): the matmul floor
    def projs_only(x):
        q = x @ wq
        k = x @ wk
        v = x @ wv
        return (((q + k + v) @ wo)).astype(x.dtype)

    timed("projections + out proj only", projs_only, x)

    # 4. out-proj folded over (B,H,S,D) via dot_general contracting (h,d) --
    #    candidate to delete the output-side transpose
    wo4 = wo.reshape(H, D, C)

    def block_fold_out(x):
        q = (x @ wq).reshape(B, S, H, D)
        k = (x @ wk).reshape(B, S, H, D)
        v = (x @ wv).reshape(B, S, H, D)
        to_bh = lambda t: t.transpose(0, 2, 1, 3).reshape(B * H, S, D)
        o = _flash(to_bh(q), to_bh(k), to_bh(v), SCALE)     # (BH, S, D)
        o4 = o.reshape(B, H, S, D)
        return jax.lax.dot_general(
            o4, wo4, (((1, 3), (0, 1)), ((), ()))).astype(x.dtype)

    timed("same but out-proj contracts (h,d) directly", block_fold_out, x)

    # 5. per-head projections via einsum (bsc,chd->bhsd): does XLA write the
    #    head-split directly from the matmul epilogue?
    wq4 = wq.reshape(C, H, D)
    wk4 = wk.reshape(C, H, D)
    wv4 = wv.reshape(C, H, D)

    def block_headmm(x):
        q = jnp.einsum("bsc,chd->bhsd", x, wq4).reshape(B * H, S, D)
        k = jnp.einsum("bsc,chd->bhsd", x, wk4).reshape(B * H, S, D)
        v = jnp.einsum("bsc,chd->bhsd", x, wv4).reshape(B * H, S, D)
        o4 = _flash(q, k, v, SCALE).reshape(B, H, S, D)
        return jax.lax.dot_general(
            o4, wo4, (((1, 3), (0, 1)), ((), ()))).astype(x.dtype)

    timed("per-head proj einsum + fold-out", block_headmm, x)


if __name__ == "__main__":
    main()
