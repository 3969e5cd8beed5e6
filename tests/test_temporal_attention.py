"""Fused temporal (frame-axis) attention kernel parity vs the XLA oracle.

The kernel (ops/pallas/temporal_attention.py) consumes (B, F, S, N) in the
projections' native layout; this suite runs it in interpret mode on CPU and
asserts forward parity against the einsum reference and backward parity of
its custom VJP (which routes through the same einsum math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svd_xtend_tpu.ops.pallas.temporal_attention import (
    _xla_reference, frame_attention, supports)


def _qkv(b=1, f=14, s=128, n=128, dtype=jnp.float32, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    mk = lambda k: jax.random.normal(k, (b, f, s, n), dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


def test_supports_gate():
    assert supports(14, 2560, 320)     # L0 SVD shape
    assert supports(25, 640, 640)      # L1, 25 frames
    assert supports(14, 128, 1280)
    assert not supports(14, 160, 1280)   # s not lane-aligned
    assert not supports(14, 256, 96)     # n not a head multiple
    assert not supports(40, 256, 320)    # too many frames


@pytest.mark.parametrize("b,f,s,n", [
    (1, 14, 128, 128),     # single head
    (2, 14, 256, 320),     # 5 heads — the L0 family
    (1, 25, 128, 640),     # 25 frames, 10 heads
    (1, 8, 128, 128),      # few frames (== sublane pad)
])
def test_forward_parity(b, f, s, n):
    q, k, v = _qkv(b, f, s, n)
    scale = 64 ** -0.5
    out = frame_attention(q, k, v, num_heads=n // 64, scale=scale)
    expected = _xla_reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-5, rtol=1e-5)


def test_forward_parity_bf16():
    q, k, v = _qkv(2, 14, 128, 320, dtype=jnp.bfloat16)
    out = frame_attention(q, k, v, num_heads=5, scale=0.125)
    expected = _xla_reference(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(expected, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_forward_extreme_logits():
    q, k, v = _qkv(1, 14, 128, 128)
    out = frame_attention(10.0 * q, 10.0 * k, v, num_heads=2, scale=1.0)
    expected = _xla_reference(10.0 * q, 10.0 * k, v, 1.0)
    assert np.isfinite(np.asarray(out)).all()
    # logits reach |800|: f32 reduction-order noise in the scores is amplified
    # through exp, so parity here is looser than the normal-scale tests
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-3, rtol=1e-3)


def test_backward_parity():
    q, k, v = _qkv(1, 14, 128, 320)
    scale = 64 ** -0.5

    def loss_kernel(q, k, v):
        return jnp.sum(jnp.sin(
            frame_attention(q, k, v, num_heads=5, scale=scale)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_xla_reference(q, k, v, scale)))

    g = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    ge = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, e, name in zip(g, ge, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=2e-5, rtol=1e-5, err_msg=name)


def test_shape_errors():
    q, k, v = _qkv(1, 14, 128, 128)
    with pytest.raises(ValueError):
        frame_attention(q, k, v, num_heads=3, scale=1.0)
    q2, k2, v2 = _qkv(1, 14, 96, 128)
    with pytest.raises(ValueError):
        frame_attention(q2, k2, v2, num_heads=2, scale=1.0)
