"""Full temporal-attention microbench INCLUDING projections (L0 SVD shape).

trace_unet.py shows the temporal attention's cost is NOT the f=14 core math
(~1.3 GFLOP) but the layout copies XLA inserts around it: q/k/v reshape
copies (0.25-0.26 ms each), the output transpose (0.23 ms), and the f32
softmax fusions (0.92 ms) — ~2.5 ms per L0 call vs a ~0.3 ms HBM roofline.
The earlier core-only microbench (microbench_temporal_softmax.py) hoisted
k/v projections out of the loop and undercounted this.

Variants (x loop-carried so nothing hoists; all include q/k/v/out proj):
  A: current FrameAxisAttention orientation (reshape + bshfg einsum)
  D: head-major — project straight to (b,h,s,f,d) so every core einsum's
     operands are already in dot-native (batch..., f, d) order.
  E: like D but logits batch (b,h,s) grouped as one leading dim via reshape.

Usage: python scripts/microbench_temporal_attn_full.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SHAPES = [
    # (b, f, s, heads, d, c)
    (2, 14, 2560, 5, 64, 320),
    (2, 14, 640, 10, 64, 640),
    (2, 14, 160, 20, 64, 1280),
]


def make_weights(key, c, h, d):
    n = h * d
    ks = jax.random.split(key, 4)
    wq = jax.random.normal(ks[0], (c, n), jnp.bfloat16) / (c ** 0.5)
    wk = jax.random.normal(ks[1], (c, n), jnp.bfloat16) / (c ** 0.5)
    wv = jax.random.normal(ks[2], (c, n), jnp.bfloat16) / (c ** 0.5)
    wo = jax.random.normal(ks[3], (n, c), jnp.bfloat16) / (n ** 0.5)
    return wq, wk, wv, wo


def variant_a(x, wq, wk, wv, wo, h, d):
    b, f, s, c = x.shape
    scale = d ** -0.5
    q = (x @ wq).reshape(b, f, s, h, d)
    k = (x @ wk).reshape(b, f, s, h, d)
    v = (x @ wv).reshape(b, f, s, h, d)
    logits = jnp.einsum("bfshd,bgshd->bshfg", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bshfg,bgshd->bfshd", w, v).reshape(b, f, s, h * d)
    return o @ wo


def variant_d(x, wq, wk, wv, wo, h, d):
    b, f, s, c = x.shape
    scale = d ** -0.5
    wq3 = wq.reshape(c, h, d)
    wk3 = wk.reshape(c, h, d)
    wv3 = wv.reshape(c, h, d)
    q = jnp.einsum("bfsc,chd->bhsfd", x, wq3)
    k = jnp.einsum("bfsc,chd->bhsfd", x, wk3)
    v = jnp.einsum("bfsc,chd->bhsfd", x, wv3)
    logits = jnp.einsum("bhsfd,bhsgd->bhsfg", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhsfg,bhsgd->bhsfd", w, v)
    return jnp.einsum("bhsfd,hdn->bfsn", o, wo.reshape(h, d, c))


def variant_e(x, wq, wk, wv, wo, h, d):
    b, f, s, c = x.shape
    scale = d ** -0.5
    n = h * d
    # project in the native (b,f,s,n) layout, then ONE explicit transpose to
    # head-major (letting XLA fuse the three into the dots if it can)
    q = (x @ wq).reshape(b, f, s, h, d).transpose(0, 3, 2, 1, 4)
    k = (x @ wk).reshape(b, f, s, h, d).transpose(0, 3, 2, 1, 4)
    v = (x @ wv).reshape(b, f, s, h, d).transpose(0, 3, 2, 1, 4)
    logits = jnp.einsum("bhsfd,bhsgd->bhsfg", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhsfg,bhsgd->bhsfd", w, v)
    return o.transpose(0, 3, 2, 1, 4).reshape(b, f, s, n) @ wo


def variant_pallas(x, wq, wk, wv, wo, h, d):
    from svd_xtend_tpu.ops.pallas.temporal_attention import frame_attention
    b, f, s, c = x.shape
    q = x @ wq
    k = x @ wk
    v = x @ wv
    o = frame_attention(q, k, v, num_heads=h, scale=d ** -0.5)
    return o @ wo


def main():
    N = 30
    pull = lambda out: jax.device_get(jnp.sum(out.astype(jnp.float32)))
    for b, f, s, h, d, c in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, f, s, c), jnp.bfloat16)
        ws = make_weights(jax.random.fold_in(key, 1), c, h, d)
        ref = None
        print(f"shape b{b} f{f} s{s} h{h} d{d} c{c}:")
        for name, fn in [("A current", variant_a), ("D head-major", variant_d),
                         ("E proj+1transpose", variant_e),
                         ("P pallas fused", variant_pallas)]:
            try:
                out = jax.jit(lambda x: fn(x, *ws, h, d))(x)
            except ValueError as e:
                print(f"  {name:20s} unsupported ({e})")
                continue
            if ref is None:
                ref = out
            else:
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
                # bf16 attention at c=1280: |out| ~ 30, bf16 eps ~ 0.008
                assert err < 1.0, (name, err)

            @jax.jit
            def loop(x0):
                def body(_, xc):
                    o = fn(xc, *ws, h, d)
                    return xc + 1e-6 * o.astype(xc.dtype)
                return jax.lax.fori_loop(0, N, body, x0)

            pull(loop(x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                pull(loop(x))
                best = min(best, (time.perf_counter() - t0) / N * 1e3)
            print(f"  {name:20s} {best:7.3f} ms/iter")


if __name__ == "__main__":
    main()
