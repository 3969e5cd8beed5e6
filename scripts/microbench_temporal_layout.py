"""Does the temporal transformer need the (B*F,S,C) -> (B*S,F,C) transpose?

Compares, at the UNet L0 operating-point shape (CFG batch 2 x 14 frames,
S=2560 tokens, C=320), a full temporal-attention round trip:
  A) current: tokens_to_temporal -> attention over F -> temporal_to_tokens
  B) layout-preserving: (B,F,S,C) view, attention over F as an einsum with
     (b, s) batch dims — no materialized transpose.
Also times the two bare transposes so their cost is separately visible.
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

from svd_xtend_tpu.ops.video import temporal_to_tokens, tokens_to_temporal


def timed(name, fn, *args, iters=20):
    f = jax.jit(fn)
    jax.device_get(jnp.sum(f(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    for (B, F, S, C, H) in [(2, 14, 2560, 320, 5), (2, 14, 640, 640, 10),
                            (2, 14, 160, 1280, 20)]:
        Dh = 64
        inner = H * Dh
        scale = Dh ** -0.5
        ks = jax.random.split(key, 5)
        x = jax.random.normal(ks[0], (B * F, S, C), jnp.bfloat16)
        wq = jax.random.normal(ks[1], (C, inner), jnp.bfloat16) * 0.05
        wk = jax.random.normal(ks[2], (C, inner), jnp.bfloat16) * 0.05
        wv = jax.random.normal(ks[3], (C, inner), jnp.bfloat16) * 0.05
        wo = jax.random.normal(ks[4], (inner, C), jnp.bfloat16) * 0.05

        def path_a(x):
            t = tokens_to_temporal(x, F)                      # (B*S, F, C)
            n = t.shape[0]
            q = (t @ wq).reshape(n, F, H, Dh)
            k = (t @ wk).reshape(n, F, H, Dh)
            v = (t @ wv).reshape(n, F, H, Dh)
            logits = jnp.einsum("bfhd,bghd->bhfg", q, k,
                                preferred_element_type=jnp.float32) * scale
            w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            o = jnp.einsum("bhfg,bghd->bfhd", w, v).reshape(n, F, inner) @ wo
            return x + temporal_to_tokens(o, F, S)

        def path_b(x):
            t = x.reshape(B, F, S, C)
            q = (t @ wq).reshape(B, F, S, H, Dh)
            k = (t @ wk).reshape(B, F, S, H, Dh)
            v = (t @ wv).reshape(B, F, S, H, Dh)
            logits = jnp.einsum("bfshd,bgshd->bshfg", q, k,
                                preferred_element_type=jnp.float32) * scale
            w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            o = jnp.einsum("bshfg,bgshd->bfshd", w, v).reshape(B, F, S, inner) @ wo
            return x + o.reshape(B * F, S, C)

        print(f"shape B={B} F={F} S={S} C={C} H={H}:")
        da = timed("  A: transpose round trip + attention", path_a, x)
        db = timed("  B: layout-preserving einsum attention", path_b, x)
        timed("  bare tokens_to_temporal", lambda x: tokens_to_temporal(x, F), x)
        timed("  bare temporal_to_tokens",
              lambda t: temporal_to_tokens(t, F, S), tokens_to_temporal(x, F))
        # numerical agreement
        ya = jax.jit(path_a)(x).astype(jnp.float32)
        yb = jax.jit(path_b)(x).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(ya - yb)))
        print(f"  max |A-B| = {err:.2e}   speedup B vs A: {da / db:.2f}x")


if __name__ == "__main__":
    main()
