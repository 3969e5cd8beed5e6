"""Blockwise-int8 Adam (train/quant.py) — the reference's --use_8bit_adam
analog (train_svd.py:746-756). Round-trip error bounds, trajectory parity
with fp32 Adam, memory layout, and jit/sharding compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from svd_xtend_tpu.train.quant import (Quantized, adamw_8bit,
                                       dequantize_blockwise, dequantize_sqrt,
                                       quantize_blockwise, quantize_sqrt,
                                       scale_by_adam_8bit)


def test_quantize_roundtrip_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(0), (300, 37)) * 3.0
    qt = quantize_blockwise(x, block_size=256)
    y = dequantize_blockwise(qt, x.shape)
    assert qt.q.dtype == jnp.int8
    # per-block error <= absmax/254 (round-to-nearest of absmax/127 steps)
    err = np.abs(np.asarray(y - x))
    assert err.max() <= float(jnp.max(jnp.abs(x))) / 127.0 * 0.5 + 1e-7


def test_quantize_sqrt_nonneg_roundtrip():
    x = jax.random.uniform(jax.random.PRNGKey(1), (5000,)) ** 2
    y = dequantize_sqrt(quantize_sqrt(x, 512), x.shape)
    assert float(jnp.min(y)) >= 0.0
    # relative error in sqrt space ~1/254 of block absmax -> ~1% of max here
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-2)


def test_zero_roundtrip_exact():
    x = jnp.zeros((4096,))
    assert float(jnp.abs(dequantize_blockwise(quantize_blockwise(x), x.shape)).max()) == 0.0


def test_small_leaves_match_fp32_adam_exactly():
    """Leaves below min_quant_size keep fp32 moments — trajectory must be
    bit-identical to optax.scale_by_adam."""
    params = {"w": jnp.ones((16, 8)), "b": jnp.zeros((8,))}
    g = jax.tree.map(lambda p: jnp.full(p.shape, 0.1), params)
    t8, t32 = scale_by_adam_8bit(min_quant_size=10**9), optax.scale_by_adam()
    s8, s32 = t8.init(params), t32.init(params)
    for _ in range(5):
        u8, s8 = t8.update(g, s8)
        u32, s32 = t32.update(g, s32)
    for a, b in zip(jax.tree.leaves(u8), jax.tree.leaves(u32)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_large_leaves_quantized_and_close_to_fp32():
    k = jax.random.PRNGKey(2)
    params = {"w": jax.random.normal(k, (64, 128))}
    t8 = scale_by_adam_8bit(block_size=256, min_quant_size=1024)
    t32 = optax.scale_by_adam()
    s8, s32 = t8.init(params), t32.init(params)
    assert isinstance(s8.mu["w"], Quantized)
    for i in range(10):
        g = {"w": jax.random.normal(jax.random.fold_in(k, i), (64, 128))}
        u8, s8 = t8.update(g, s8)
        u32, s32 = t32.update(g, s32)
    # Adam updates are ~unit scale; int8 moment noise stays small
    np.testing.assert_allclose(np.asarray(u8["w"]), np.asarray(u32["w"]),
                               atol=0.08)


def test_adamw_8bit_converges_on_quadratic():
    """min ||Wx - y||^2: 8-bit AdamW must reach ~the fp32 loss."""
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (256, 64))
    w_true = jax.random.normal(jax.random.fold_in(k, 1), (64, 64))
    y = x @ w_true

    def loss_fn(w):
        return jnp.mean((x @ w - y) ** 2)

    def run(opt):
        w = jnp.zeros((64, 64))
        s = opt.init(w)
        step = jax.jit(lambda w, s: _step(w, s))
        def _step(w, s):
            l, g = jax.value_and_grad(loss_fn)(w)
            u, s2 = opt.update(g, s, w)
            return optax.apply_updates(w, u), s2, l
        for _ in range(300):
            w, s, l = jax.jit(_step)(w, s)
        return float(loss_fn(w))

    l8 = run(adamw_8bit(5e-2, weight_decay=0.0, block_size=256,
                        min_quant_size=1024))
    l32 = run(optax.adamw(5e-2, weight_decay=0.0))
    assert l8 < 0.05 and l8 < max(l32 * 3.0, 0.02)


def test_8bit_state_memory_is_int8():
    params = {"w": jnp.zeros((512, 64))}
    s = scale_by_adam_8bit(block_size=256, min_quant_size=1024).init(params)
    n_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(s))
    fp32_bytes = 2 * 512 * 64 * 4
    assert n_bytes < fp32_bytes / 3  # ~3.6x smaller incl. scales


def test_make_optimizer_8bit_via_config():
    from svd_xtend_tpu.core.config import TrainConfig
    from svd_xtend_tpu.train.optim import make_optimizer
    cfg = TrainConfig(use_8bit_adam=True, max_train_steps=10)
    opt = make_optimizer(cfg)
    params = {"w": jnp.zeros((128, 64))}
    s = opt.init(params)
    u, s = jax.jit(opt.update)({"w": jnp.ones((128, 64))}, s, params)
    assert u["w"].shape == (128, 64)


def test_8bit_handles_none_partitioned_leaves():
    """The temporal scope trains a partitioned tree with None leaves
    (train/state.py partition) — the transform must pass them through."""
    params = {"a": jnp.zeros((128, 64)), "b": None}
    t = scale_by_adam_8bit(min_quant_size=1024)
    s = t.init(params)
    u, s = t.update({"a": jnp.ones((128, 64)), "b": None}, s)
    assert u["b"] is None and u["a"].shape == (128, 64)
