"""Temporal self-attention score-layout microbench (L0 SVD shape).

The trace (scripts/trace_unet.py) shows ~0.9 ms 'attn1/sub' softmax fusions
per L0 temporal attention: logits are (b, s, h, f, g) with the g=14 frame
axis minor, so every elementwise/reduce op in the softmax chain runs at
14/128 lane utilization. Variant B reorients the contraction so the
2560-token s axis is minor (softmax reduces over the 2nd-minor g axis).

Usage: python scripts/microbench_temporal_softmax.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SHAPES = [
    # (b, f, s, heads, d) — CFG-stacked L0/L1/L2 temporal attention shapes
    (2, 14, 2560, 5, 64),
    (2, 14, 640, 10, 64),
    (2, 14, 160, 20, 64),
]


def variant_a(q, k, v):
    """current FrameAxisAttention orientation: logits (b,s,h,f,g), g minor."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bfshd,bgshd->bshfg", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bshfg,bgshd->bfshd", w, v)


def variant_b(q, k, v):
    """lane-friendly: logits (b,h,f,g,s), softmax over g (2nd-minor)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bfshd,bgshd->bhfgs", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-2).astype(q.dtype)
    return jnp.einsum("bhfgs,bgshd->bfshd", w, v)


def variant_c(q, k, v):
    """transpose to (b*s, f, h, d) temporal tokens + standard attention."""
    b, f, s, h, d = q.shape
    t = lambda x: x.transpose(0, 2, 1, 3, 4).reshape(b * s, f, h, d)
    scale = d ** -0.5
    qt, kt, vt = t(q), t(k), t(v)
    logits = jnp.einsum("nfhd,nghd->nhfg", qt, kt,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    o = jnp.einsum("nhfg,nghd->nfhd", w, vt)
    return o.reshape(b, s, f, h, d).transpose(0, 2, 1, 3, 4)


def main():
    # relay round-trips cost ~30 ms in the degraded state; time N in-graph
    # iterations per dispatch (autotuner methodology, PERF.md session-3) so
    # the additive cost cancels. The carried q perturbation defeats CSE.
    N = 50
    pull = lambda out: jax.device_get(jnp.sum(out.astype(jnp.float32)))
    for shape in SHAPES:
        b, f, s, h, d = shape
        key = jax.random.PRNGKey(0)
        q, k, v = (jax.random.normal(jax.random.fold_in(key, i),
                                     (b, f, s, h, d), jnp.bfloat16)
                   for i in range(3))
        ref = None
        print(f"shape b{b} f{f} s{s} h{h} d{d}:")
        for name, fn in [("A bshfg/minor-g", variant_a),
                         ("B bhfgs/minor-s", variant_b),
                         ("C transpose+std", variant_c)]:
            out = jax.jit(fn)(q, k, v)
            if ref is None:
                ref = out
            else:
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
                assert err < 2e-2, (name, err)

            @jax.jit
            def loop(q, k, v):
                def body(_, qc):
                    o = fn(qc, k, v)
                    return qc + 1e-6 * o.astype(qc.dtype)
                return jax.lax.fori_loop(0, N, body, q)

            pull(loop(q, k, v))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                pull(loop(q, k, v))
                best = min(best, (time.perf_counter() - t0) / N * 1e3)
            print(f"  {name:18s} {best:7.3f} ms/iter")


if __name__ == "__main__":
    main()
