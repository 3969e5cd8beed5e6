"""Fused residual-GEGLU kernel (ops/pallas/geglu.py): parity vs the
module path, gradients, block chooser, and model-level engagement.

Runs in interpret mode on the CPU mesh (conftest); the TPU win is measured
by scripts/microbench_geglu.py + the UNet-step A/B (PERF.md r5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svd_xtend_tpu.ops.pallas import geglu as gg


def _make(t, c, mult=4, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    inner = c * mult
    x = jax.random.normal(ks[0], (t, c), dtype)
    ls = jax.random.normal(ks[1], (c,), dtype) * 0.1 + 1.0
    lb = jax.random.normal(ks[2], (c,), dtype) * 0.1
    w1 = jax.random.normal(ks[3], (c, inner * 2), dtype) / np.sqrt(c)
    b1 = jax.random.normal(ks[4], (inner * 2,), dtype) * 0.1
    w2 = jax.random.normal(ks[5], (inner, c), dtype) / np.sqrt(inner)
    b2 = jax.random.normal(ks[6], (c,), dtype) * 0.1
    return x, ls, lb, w1, b1, w2, b2


@pytest.mark.parametrize("t,c", [(256, 128), (160, 320), (64, 64)])
def test_matches_reference(t, c):
    args = _make(t, c)
    assert gg.supports(t, c)
    out = gg.ln_geglu_residual(*args)
    ref = gg._reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_multi_inner_block_accumulation():
    """4C wider than the bi cap: the inner grid axis must accumulate."""
    t, c = 64, 384                       # inner = 1536 -> bi 768, n_inner 2
    args = _make(t, c)
    bt, bi = gg._choose_blocks(t, c, 4)
    assert bi < 4 * c and (4 * c) % bi == 0
    out = gg.ln_geglu_residual(*args)
    ref = gg._reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_leading_dims_flattened():
    x, *rest = _make(8 * 2 * 16, 128)
    x4 = x.reshape(8, 2, 16, 128)
    out = gg.ln_geglu_residual(x4, *rest)
    assert out.shape == x4.shape
    np.testing.assert_allclose(np.asarray(out.reshape(-1, 128)),
                               np.asarray(gg.ln_geglu_residual(x, *rest)),
                               rtol=1e-6, atol=1e-6)


def test_gradients_match_reference():
    args = _make(128, 128)

    def loss_k(*a):
        return jnp.sum(gg.ln_geglu_residual(*a) ** 2)

    def loss_r(*a):
        return jnp.sum(gg._reference(*a) ** 2)

    gk = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_supports_gate():
    assert not gg.supports(7, 128)       # token count not 8-aligned
    assert not gg.supports(128, 12)      # channels not 8-aligned
    assert gg.supports(71680, 320)       # the L0 site
    assert gg.supports(17920, 640)       # L1
    assert gg.supports(4480, 1280)       # L2


def test_model_level_engagement_and_parity():
    """TransformerSpatioTemporalModel under SVDX_PALLAS_GEGLU=force matches
    the unfused module path (same params, all four FF sites fused)."""
    from svd_xtend_tpu.models.transformer import TransformerSpatioTemporalModel
    m = TransformerSpatioTemporalModel(num_heads=2, head_dim=16, num_layers=1,
                                       num_frames=2, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 64))
    params = m.init(jax.random.PRNGKey(2), x, ctx)["params"]
    y_ref = m.apply({"params": params}, x, ctx)
    old = os.environ.get("SVDX_PALLAS_GEGLU")
    os.environ["SVDX_PALLAS_GEGLU"] = "force"
    try:
        import flax
        p2 = m.init(jax.random.PRNGKey(2), x, ctx)["params"]
        f1 = flax.traverse_util.flatten_dict(params)
        f2 = flax.traverse_util.flatten_dict(p2)
        assert sorted(f1) == sorted(f2)
        for k in f1:
            np.testing.assert_array_equal(np.asarray(f1[k]),
                                          np.asarray(f2[k]))
        y = m.apply({"params": params}, x, ctx)
    finally:
        if old is None:
            del os.environ["SVDX_PALLAS_GEGLU"]
        else:
            os.environ["SVDX_PALLAS_GEGLU"] = old
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=5e-5, atol=5e-5)
