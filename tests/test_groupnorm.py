"""Fused GroupNorm+SiLU: pallas kernel parity vs nn.GroupNorm oracle."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svd_xtend_tpu.models.blocks import GroupNormSiLU
from svd_xtend_tpu.ops.pallas.groupnorm import (group_norm_silu,
                                                group_norm_silu_reference)


def _oracle(x, groups, eps):
    m = nn.GroupNorm(num_groups=groups, epsilon=eps)
    params = m.init(jax.random.PRNGKey(0), x)
    # randomize affine params
    c = x.shape[-1]
    params = {"params": {
        "scale": jax.random.normal(jax.random.PRNGKey(1), (c,)) + 1.0,
        "bias": jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1,
    }}
    return nn.silu(m.apply(params, x)), params["params"]


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 64), 32),
                                          ((3, 40, 320), 32),
                                          ((2, 5, 6, 6, 64), 16)])
def test_reference_matches_flax_groupnorm(shape, groups):
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    expected, p = _oracle(x, groups, 1e-5)
    got = group_norm_silu_reference(x, p["scale"], p["bias"], groups, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5, rtol=1e-5)


def test_pallas_matches_reference():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 320))
    scale = jax.random.normal(jax.random.PRNGKey(1), (320,)) + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (320,)) * 0.1
    got = group_norm_silu(x, scale, bias, groups=32, eps=1e-5, impl="pallas")
    expected = group_norm_silu_reference(x, scale, bias, 32, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)


def test_pallas_grad_matches_reference():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 64))
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))

    g_pallas = jax.grad(lambda x, s, b: jnp.sum(
        group_norm_silu(x, s, b, groups=8, impl="pallas") ** 2),
        argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(lambda x, s, b: jnp.sum(
        group_norm_silu_reference(x, s, b, 8, 1e-5) ** 2),
        argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_module_param_names_unchanged():
    m = GroupNormSiLU(groups=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 32))
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    assert set(params) == {"scale", "bias"}
    out = m.apply({"params": params}, x)
    expected = nn.silu(nn.GroupNorm(num_groups=8, epsilon=1e-5).apply(
        {"params": params}, x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-5, rtol=1e-5)


def test_pallas_tiled_path_matches_reference(monkeypatch):
    """Samples too large for single-pass VMEM route to the two-pass tiled
    kernel (exercised here by shrinking the budget)."""
    from svd_xtend_tpu.ops.pallas import groupnorm as gn

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 8, 64))
    scale = jax.random.normal(jax.random.PRNGKey(1), (64,)) + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.1
    expected = gn.group_norm_silu_reference(x, scale, bias, 8, 1e-5)

    monkeypatch.setattr(gn, "_VMEM_BUDGET_BYTES", 40_000)
    assert not gn.fits_vmem(x.shape)
    assert gn._choose_tile(48, 64, 4) == 8
    got = gn.group_norm_silu(x, scale, bias, groups=8, eps=1e-5, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5, rtol=1e-5)

    # grad flows through the custom_vjp on the tiled path too
    g = jax.grad(lambda x: jnp.sum(
        gn.group_norm_silu(x, scale, bias, groups=8, impl="pallas") ** 2))(x)
    g_ref = jax.grad(lambda x: jnp.sum(
        gn.group_norm_silu_reference(x, scale, bias, 8, 1e-5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)
