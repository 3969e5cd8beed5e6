"""Multi-head scaled-dot-product attention with pluggable implementations.

The reference relies on torch SDPA / xformers (train_svd.py:681-693).
TPU-natively we expose one functional op with three interchangeable backends:

  - "xla":   plain einsum attention — XLA fuses it well for short sequences
             (the temporal f<=25-token attention) and is the correctness oracle.
  - "flash": Pallas online-softmax flash attention (ops/pallas/flash_attention.py)
             for the spatial h*w-token attention (up to 4608 tokens at 576x1024).
  - "auto":  flash on TPU when the sequence is long enough to benefit and
             shapes are tile-aligned, else xla.

Shapes follow the TPU-friendly BSHD convention:
  q: (B, S, H, D), k/v: (B, T, H, D) -> out (B, S, H, D)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _xla_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    # fp32 softmax accumulation regardless of input dtype
    logits = jnp.einsum("bshd,bthd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bthd->bshd", weights, v)


def _flash_ok(q: Array, k: Array) -> bool:
    if jax.default_backend() != "tpu":
        return False
    s, t, d = q.shape[1], k.shape[1], q.shape[3]
    # With the major-tile/exp2 forward (PERF.md session-7) flash beats the
    # XLA einsum at every measured 128-aligned length (s=640: 1.29 -> 0.78
    # ms, even s=256 wins) — the old >=1024 threshold dated from the
    # 128-wide-block kernel. Only tile alignment gates now.
    return s % 128 == 0 and t % 128 == 0 and d <= 128


def dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> Array:
    """softmax(q k^T * scale) v over the T axis, heads batched."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "auto":
        impl = "flash" if _flash_ok(q, k) else "xla"
    if impl == "flash":
        from .pallas.flash_attention import flash_attention
        return flash_attention(q, k, v, scale=scale)
    if impl == "xla":
        return _xla_attention(q, k, v, scale)
    raise ValueError(f"unknown attention impl {impl!r}")


def dot_product_attention_packed(
    q: Array,
    k: Array,
    v: Array,
    *,
    num_heads: int,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> Array:
    """Like dot_product_attention but on UNSPLIT (B, S, H*D) projections.

    When flash dispatch applies and SVDX_PACKED_FLASH is on, routes to the
    packed-layout kernel (ops/pallas/flash_attention.py:_fwd_packed) that
    slices heads in VMEM — eliminating the four (B,S,H,D)<->(B*H,S,D)
    transposes the head-major kernel pays per call (~0.22 ms each at the
    L0 SVD shape, r3 trace). Otherwise identical to
    merge_heads(dot_product_attention(split_heads(...)))."""
    d = q.shape[-1] // num_heads
    if scale is None:
        scale = d ** -0.5
    if impl in ("auto", "flash"):
        from .pallas.flash_attention import (flash_attention_packed,
                                             packed_default)
        s, t = q.shape[1], k.shape[1]
        if (packed_default() and jax.default_backend() == "tpu"
                and s % 128 == 0 and t % 128 == 0 and d <= 128):
            return flash_attention_packed(q, k, v, num_heads=num_heads,
                                          scale=scale)
    o = dot_product_attention(
        split_heads(q, num_heads), split_heads(k, num_heads),
        split_heads(v, num_heads), scale=scale, impl=impl)
    return merge_heads(o)


def split_heads(x: Array, num_heads: int) -> Array:
    """(B, S, H*D) -> (B, S, H, D)."""
    b, s, hd = x.shape
    return x.reshape(b, s, num_heads, hd // num_heads)


def merge_heads(x: Array) -> Array:
    """(B, S, H, D) -> (B, S, H*D)."""
    b, s, h, d = x.shape
    return x.reshape(b, s, h * d)


@functools.partial(jax.jit, static_argnames=("num_heads", "impl"))
def mha(q: Array, k: Array, v: Array, num_heads: int, impl: str = "auto") -> Array:
    """Convenience: (B, S, C) projected inputs -> attention -> (B, S, C)."""
    out = dot_product_attention(
        split_heads(q, num_heads), split_heads(k, num_heads),
        split_heads(v, num_heads), impl=impl)
    return merge_heads(out)
