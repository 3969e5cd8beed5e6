"""Flash-attention kernel parity vs the XLA oracle (interpret mode on CPU).

Forward AND backward (custom VJP) must match plain attention to fp32
tolerance at the SVD spatial shapes (S=128k multiples, D=64)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svd_xtend_tpu.ops.attention import _xla_attention
from svd_xtend_tpu.ops.pallas.flash_attention import flash_attention, supports


def _qkv(b=2, s=256, h=2, d=64, dtype=jnp.float32, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    mk = lambda k: jax.random.normal(k, (b, s, h, d), dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


def test_supports_gate():
    assert supports((1, 2560, 5, 64), 2560)
    assert supports((1, 640, 10, 64), 640)
    assert not supports((1, 160, 20, 64), 160)   # not 128-aligned
    assert not supports((1, 256, 2, 256), 256)   # head_dim too large


# s=512 exercises the major-tile exp2 forward organization (bkm >= 512);
# smaller sequences take the per-128-sub-tile base path
@pytest.mark.parametrize("s,d", [(128, 64), (256, 64), (384, 128), (512, 64),
                                 (1024, 64)])
def test_forward_parity(s, d):
    q, k, v = _qkv(s=s, d=d)
    scale = d ** -0.5
    out = flash_attention(q, k, v, scale=scale)
    expected = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-5, rtol=1e-5)


def test_forward_parity_bf16():
    q, k, v = _qkv(s=256, d=64, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v, scale=0.125)
    expected = _xla_attention(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(expected, np.float32),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("s", [128, 512])
def test_forward_extreme_logits(s):
    """Online softmax must stay stable for large-magnitude scores
    (both the base and major-tile exp2 organizations)."""
    q, k, v = _qkv(s=s, d=64)
    out = flash_attention(10.0 * q, 10.0 * k, v, scale=1.0)
    expected = _xla_attention(10.0 * q, 10.0 * k, v, 1.0)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)


# s=512: backward consumes the LSE emitted by the major-tile exp2 forward
# (base-2 stats converted to natural log at finalize) — parity checks that
@pytest.mark.parametrize("s", [256, 512])
def test_backward_parity(s):
    q, k, v = _qkv(s=s, d=64)
    scale = 64 ** -0.5
    cot = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=scale) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) * cot)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, gf, gr in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-5, rtol=1e-4,
                                   err_msg=f"grad d{name} mismatch")


def test_cross_shape_rejected():
    q, k, v = _qkv(s=100, d=64)
    with pytest.raises(ValueError, match="flash_attention needs"):
        flash_attention(q, k, v, scale=1.0)


# ------------------------------------------- packed (transpose-free) -------

def _qkv_packed(b=2, s=256, h=5, d=64, dtype=jnp.float32, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    mk = lambda k: jax.random.normal(k, (b, s, h * d), dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


@pytest.mark.parametrize("s,h", [(256, 5), (512, 10), (1024, 2)])
def test_packed_forward_parity(s, h):
    from svd_xtend_tpu.ops.pallas.flash_attention import flash_attention_packed
    d = 64
    q, k, v = _qkv_packed(s=s, h=h)
    scale = d ** -0.5
    out = flash_attention_packed(q, k, v, num_heads=h, scale=scale)
    r = lambda x: x.reshape(x.shape[0], x.shape[1], h, d)
    expected = _xla_attention(r(q), r(k), r(v), scale).reshape(q.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-5, rtol=1e-5)


def test_packed_backward_parity():
    from svd_xtend_tpu.ops.pallas.flash_attention import flash_attention_packed
    h, d, s = 5, 64, 512              # s=512: major-tile exp2 fwd LSE path
    q, k, v = _qkv_packed(s=s, h=h)
    scale = d ** -0.5
    cot = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss_packed(q, k, v):
        return jnp.sum(flash_attention_packed(q, k, v, num_heads=h,
                                              scale=scale) * cot)

    def loss_ref(q, k, v):
        r = lambda x: x.reshape(x.shape[0], s, h, d)
        return jnp.sum(_xla_attention(r(q), r(k), r(v), scale
                                      ).reshape(q.shape) * cot)

    g_p = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, gf, gr in zip("qkv", g_p, g_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-5, rtol=1e-4,
                                   err_msg=f"packed grad d{name} mismatch")


def test_packed_matches_module_dispatch(monkeypatch):
    """dot_product_attention_packed with SVDX_PACKED_FLASH=1 (forced through
    the kernel in interpret mode) equals the split-head dispatch path."""
    from svd_xtend_tpu.ops import attention as att
    h, d, s = 5, 64, 256
    q, k, v = _qkv_packed(s=s, h=h)
    base = att.dot_product_attention_packed(q, k, v, num_heads=h, impl="xla")
    monkeypatch.setenv("SVDX_PACKED_FLASH", "1")
    # the packed gate requires backend == tpu; call the kernel directly in
    # interpret mode to cover the wiring-equivalence
    from svd_xtend_tpu.ops.pallas.flash_attention import flash_attention_packed
    out = flash_attention_packed(q, k, v, num_heads=h, scale=d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               atol=2e-5, rtol=1e-5)
