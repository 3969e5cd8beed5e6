"""Winograd F(2x2,3x3) conv (ops/winograd.py) vs the direct conv oracle.

The transform-domain identity must hold exactly at f32 (tests here), and the
custom_vjp backward is the direct conv's VJP by construction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svd_xtend_tpu.ops.convacc import conv_f32acc
from svd_xtend_tpu.ops.winograd import (_winograd_conv, winograd_conv3x3,
                                        winograd_wins)


def _ref(x, k):
    return conv_f32acc(x, k, (1, 1), ((1, 1), (1, 1)))


@pytest.mark.parametrize("shape,co", [((2, 8, 10, 16), 8),
                                      ((1, 7, 9, 4), 6),      # odd H/W crop
                                      ((2, 16, 16, 32), 32)])
def test_forward_matches_direct(shape, co):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, shape[-1], co),
                          jnp.float32) * 0.1
    np.testing.assert_allclose(np.asarray(_winograd_conv(x, k)),
                               np.asarray(_ref(x, k)), atol=2e-5, rtol=1e-4)


def test_epilogues():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 16, 8), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(2), (8,), jnp.float32)
    ps = jax.random.normal(jax.random.PRNGKey(3), (2, 8), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 8), jnp.float32)
    out = winograd_conv3x3(x, k, b, post_shift=ps, residual=res)
    ref = (_ref(x, k) + b + ps[:, None, None, :]).astype(x.dtype) + res
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_gradients_match_direct():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 16, 8), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 8), jnp.float32)
    gw = jax.grad(lambda x, k: jnp.sum(_winograd_conv(x, k) * g), (0, 1))(x, k)
    gr = jax.grad(lambda x, k: jnp.sum(_ref(x, k) * g), (0, 1))(x, k)
    for a, b in zip(gw, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_dispatch_default_off(monkeypatch):
    monkeypatch.delenv("SVDX_WINOGRAD", raising=False)
    # empty/absent table -> off everywhere by default
    assert not winograd_wins((2, 8, 8, 16), 8, jnp.float32)
    monkeypatch.setenv("SVDX_WINOGRAD", "force")
    assert winograd_wins((2, 8, 8, 16), 8, jnp.float32)
    monkeypatch.setenv("SVDX_WINOGRAD", "0")
    assert not winograd_wins((2, 8, 8, 16), 8, jnp.float32)


def test_conv3x3_module_winograd_route(monkeypatch):
    """Conv3x3 under SVDX_WINOGRAD=force equals its default path (f32)."""
    from svd_xtend_tpu.models.blocks import Conv3x3
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16), jnp.float32)
    m = Conv3x3(8)
    params = m.init(jax.random.PRNGKey(1), x)
    base = m.apply(params, x)
    monkeypatch.setenv("SVDX_WINOGRAD", "force")
    out = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               atol=2e-5, rtol=1e-4)
