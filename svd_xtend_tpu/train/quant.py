"""Blockwise int8-quantized Adam moments — the TPU analog of bitsandbytes
AdamW8bit (reference --use_8bit_adam, train_svd.py:414-417,746-756).

Both Adam moments live in HBM as int8 with one fp32 absmax scale per
`block_size` elements: the first moment linearly signed, the second moment
through a sqrt transform (it is non-negative and spans ~2x the dynamic range
in log space; sqrt halves that, so 7 magnitude bits cover it). This is ~3.6x
less optimizer memory than fp32 moments — for the 1.5B-param full finetune,
12.2 GB of moments become 3.3 GB, which is the difference between full-FT
AdamW fitting a 16 GB v5e chip or not.

TPU-first design: quantize/dequantize are pure elementwise VPU ops that XLA
fuses straight into the Adam update — a single HBM round-trip per moment per
step, no custom kernel needed. bitsandbytes uses a nonlinear "dynamic" 8-bit
code plus per-block absmax; per-block absmax LINEAR (+ sqrt for the second
moment) has the same worst-case relative error envelope per block (1/254 of
the block absmax) and is trivially vectorizable. Like bitsandbytes
(min_8bit_size=4096), leaves smaller than `min_quant_size` keep fp32 moments
— biases and norm scales are tiny and disproportionately precision-sensitive.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

Array = jax.Array


class Quantized(struct.PyTreeNode):
    """Blockwise int8 tensor: q (nblocks, block) int8, scale (nblocks, 1) f32.

    The original shape is NOT stored (pytree leaves must stay arrays);
    dequantize takes it from the gradient/param leaf at use time.
    """

    q: Array
    scale: Array


def _is_quantized(x) -> bool:
    return isinstance(x, Quantized)


def quantize_blockwise(x: Array, block_size: int = 2048) -> Quantized:
    """Linear signed-int8 absmax quantization over flat blocks."""
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.size
    nb = -(-n // block_size)
    flat = jnp.pad(flat, (0, nb * block_size - n))
    blocks = flat.reshape(nb, block_size)
    absmax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    scale = absmax / 127.0
    q = jnp.round(blocks / jnp.maximum(scale, 1e-30))
    return Quantized(q=q.astype(jnp.int8), scale=scale)


def dequantize_blockwise(qt: Quantized, shape) -> Array:
    flat = (qt.q.astype(jnp.float32) * qt.scale).reshape(-1)
    n = 1
    for s in shape:
        n *= s
    return flat[:n].reshape(shape)


def quantize_sqrt(x: Array, block_size: int = 2048) -> Quantized:
    """For non-negative tensors (the second moment): quantize sqrt(x)."""
    return quantize_blockwise(jnp.sqrt(x), block_size)


def dequantize_sqrt(qt: Quantized, shape) -> Array:
    s = dequantize_blockwise(qt, shape)
    return s * s


class ScaleByAdam8bitState(NamedTuple):
    count: Array
    mu: Any   # param-tree of Quantized | fp32 Array (small leaves)
    nu: Any


def scale_by_adam_8bit(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    block_size: int = 2048,
    min_quant_size: int = 4096,
) -> optax.GradientTransformation:
    """optax transformation: Adam with blockwise-int8 moment storage.

    Update math is bit-identical to ``optax.scale_by_adam`` except that the
    moments read/written each step pass through the int8 code; leaves with
    fewer than `min_quant_size` elements skip quantization entirely (their
    trajectory matches fp32 Adam exactly).
    """

    def big(p) -> bool:
        return p.size >= min_quant_size

    def init_fn(params):
        mu = jax.tree.map(
            lambda p: quantize_blockwise(jnp.zeros(p.shape, jnp.float32), block_size)
            if big(p) else jnp.zeros(p.shape, jnp.float32), params)
        nu = jax.tree.map(
            lambda p: quantize_sqrt(jnp.zeros(p.shape, jnp.float32), block_size)
            if big(p) else jnp.zeros(p.shape, jnp.float32), params)
        return ScaleByAdam8bitState(count=jnp.zeros((), jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, mq, nq):
            g32 = g.astype(jnp.float32)
            m = dequantize_blockwise(mq, g.shape) if _is_quantized(mq) else mq
            v = dequantize_sqrt(nq, g.shape) if _is_quantized(nq) else nq
            m = b1 * m + (1.0 - b1) * g32
            v = b2 * v + (1.0 - b2) * g32 * g32
            u = (m / c1) / (jnp.sqrt(v / c2) + eps)
            m_out = quantize_blockwise(m, block_size) if _is_quantized(mq) else m
            v_out = quantize_sqrt(v, block_size) if _is_quantized(nq) else v
            return u.astype(g.dtype), m_out, v_out

        tri = jax.tree.map(upd, updates, state.mu, state.nu)
        is_tri = lambda t: isinstance(t, tuple) and len(t) == 3
        new_updates = jax.tree.map(lambda t: t[0], tri, is_leaf=is_tri)
        mu = jax.tree.map(lambda t: t[1], tri, is_leaf=is_tri)
        nu = jax.tree.map(lambda t: t[2], tri, is_leaf=is_tri)
        return new_updates, ScaleByAdam8bitState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_8bit(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    block_size: int = 2048,
    min_quant_size: int = 4096,
    mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """AdamW with int8 moments — drop-in for ``optax.adamw`` (the reference's
    ``bitsandbytes.optim.AdamW8bit``, train_svd.py:746-756)."""
    return optax.chain(
        scale_by_adam_8bit(b1=b1, b2=b2, eps=eps, block_size=block_size,
                           min_quant_size=min_quant_size),
        optax.add_decayed_weights(weight_decay, mask=mask),
        optax.scale_by_learning_rate(learning_rate),
    )
