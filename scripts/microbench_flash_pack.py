"""VERDICT-r2 #7 arms: can the d=64 flash-attention 'kernel ceiling' be
beaten by (a) packing two heads per MXU contraction or (b) cheaper softmax
stats?

Arm (a) measures the primitive truth underneath the packing idea: a d=64
score contraction vs a d=128 block-diagonal packed form. Packing heads
h0,h1 as Q=[q0|q1], K=[k0|k1] (contraction 128) computes q0·k0 + q1·k1 —
WRONG scores (cross-head sum). The only correct packing is block-diagonal
([q0|0] and [0|q1] stacked), which doubles the MAC count — so the packed
dot must run >=2x faster than the d=64 dot for a net win. This script
times both on the L0 shape family so the refutation (or win) is measured,
not argued.

Arm (b): the fwd kernel's remaining softmax cost is the exp2 + max/sum
reduces (PERF.md session-7 closed ~half the nosoftmax gap). Here we time
the current kernel vs a stats-in-bf16 variant of the score->p pipeline in
isolation (VPU ops are f32-native on TPU, so bf16 stats predictably do NOT
help; measured to close the question).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def timed(f, *args, iters=20, chain=10):
    """In-graph chained timing: relay round-trip cost is amortized over
    `chain` dependent iterations (the conv-autotuner method, PERF.md
    session-3 measurement-integrity note)."""

    @jax.jit
    def chained(*a):
        def body(_, carry):
            out = jax.tree.leaves(f(*carry))[0]
            # fold a scalar of the output back into arg 0 to force a
            # data dependence between iterations without changing shape
            bump = jnp.sum(out[..., :1].astype(jnp.float32)) * 0.0
            return (carry[0] + bump.astype(carry[0].dtype),) + carry[1:]
        a = jax.lax.fori_loop(0, chain, body, tuple(a))
        return jnp.sum(jax.tree.leaves(f(*a))[0][..., :1].astype(jnp.float32))

    pull = lambda o: float(jax.device_get(o))
    pull(chained(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        pull(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / (chain + 1)


def main():
    bh, s, d = 140, 2560, 64          # L0 spatial attention, CFG batch

    kq = jax.random.PRNGKey(0)
    q = jax.random.normal(kq, (bh, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, s, d), jnp.bfloat16)

    # arm (a) reference: the d=64 score dot as the kernel computes it
    @jax.jit
    def score64(q, k):
        return jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    # block-diagonal d=128 packed form for head pairs: same scores, 2x MACs
    bh2 = bh // 2
    qp = jnp.zeros((bh2, 2 * s, 2 * d), jnp.bfloat16)
    qp = qp.at[:, :s, :d].set(q[0::2]).at[:, s:, d:].set(q[1::2])
    kp = jnp.zeros((bh2, 2 * s, 2 * d), jnp.bfloat16)
    kp = kp.at[:, :s, :d].set(k[0::2]).at[:, s:, d:].set(k[1::2])

    @jax.jit
    def score128(qp, kp):
        return jax.lax.dot_general(qp, kp, (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    t64 = timed(score64, q, k)
    t128 = timed(score128, qp, kp)
    flops64 = 2 * bh * s * s * d
    print(f"score d=64   : {t64*1e3:7.2f} ms  {flops64/t64/1e12:6.1f} TF/s")
    print(f"score d=128bd: {t128*1e3:7.2f} ms  (2x MACs, same useful work)")
    print(f"packed net   : {t64/t128:.3f}x vs d=64 "
          f"({'WIN' if t128 < t64*0.95 else 'REFUTED — as expected, '}"
          f"block-diag packing must amortize 2x MACs)")

    # arm (b): f32 vs bf16 softmax-stat pipeline on a (1280, 1280) score tile
    sscore = jax.random.normal(jax.random.PRNGKey(2), (1280, 1280),
                               jnp.float32)

    @jax.jit
    def stats_f32(s):
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        return p, jnp.sum(p, axis=1, keepdims=True)

    @jax.jit
    def stats_bf16(s):
        sb = s.astype(jnp.bfloat16)
        m = jnp.max(sb, axis=1, keepdims=True)
        p = jnp.exp2((sb - m).astype(jnp.bfloat16))
        return p, jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)

    tf32 = timed(stats_f32, sscore, iters=50)
    tbf = timed(stats_bf16, sscore, iters=50)
    print(f"softmax stats f32 : {tf32*1e3:7.3f} ms")
    print(f"softmax stats bf16: {tbf*1e3:7.3f} ms "
          f"({tf32/tbf:.3f}x, {'WIN' if tbf < tf32*0.95 else 'no win'})")


if __name__ == "__main__":
    main()
