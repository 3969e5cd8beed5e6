"""UNet forward-contract tests on the tiny config (SURVEY.md §2.3/§3.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svd_xtend_tpu.core.config import TINY_UNET
from svd_xtend_tpu.models.unet import UNetSpatioTemporalConditionModel


@pytest.fixture(scope="module")
def unet_and_params():
    model = UNetSpatioTemporalConditionModel(TINY_UNET, dtype=jnp.float32)
    b, f, h, w = 1, 2, 8, 8
    sample = jnp.zeros((b, f, h, w, TINY_UNET.in_channels))
    variables = model.init(jax.random.PRNGKey(0), sample, jnp.zeros(()),
                           jnp.zeros((b, 1, TINY_UNET.cross_attention_dim)),
                           jnp.zeros((b, 3)))
    return model, variables["params"]


def _inputs(b=1, f=2, h=8, w=8, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    return (
        jax.random.normal(ks[0], (b, f, h, w, TINY_UNET.in_channels)),
        jnp.float32(1.5),
        jax.random.normal(ks[1], (b, 1, TINY_UNET.cross_attention_dim)),
        jax.random.normal(ks[2], (b, 3)),
    )


def test_forward_shape_and_dtype(unet_and_params):
    model, params = unet_and_params
    sample, t, ehs, ids = _inputs()
    out = model.apply({"params": params}, sample, t, ehs, ids)
    assert out.shape == (1, 2, 8, 8, TINY_UNET.out_channels)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_timestep_broadcast_scalar_vs_vector(unet_and_params):
    """Scalar and per-batch timesteps must agree
    (reference broadcast at src/unet_spatio_temporal_condition.py:386-401)."""
    model, params = unet_and_params
    sample, _, ehs, ids = _inputs()
    out_scalar = model.apply({"params": params}, sample, jnp.float32(0.7), ehs, ids)
    out_vec = model.apply({"params": params}, sample, jnp.full((1,), 0.7), ehs, ids)
    np.testing.assert_allclose(out_scalar, out_vec, atol=1e-6)


def test_conditioning_sensitivity(unet_and_params):
    """Output must depend on encoder_hidden_states and added_time_ids."""
    model, params = unet_and_params
    sample, t, ehs, ids = _inputs()
    base = model.apply({"params": params}, sample, t, ehs, ids)
    out_ehs = model.apply({"params": params}, sample, t, ehs + 1.0, ids)
    out_ids = model.apply({"params": params}, sample, t, ehs, ids + 1.0)
    assert np.abs(np.asarray(base - out_ehs)).max() > 1e-6
    assert np.abs(np.asarray(base - out_ids)).max() > 1e-6


def test_batch_independence(unet_and_params):
    """Per-sample results identical whether run alone or batched (no cross-
    batch leakage through the folded-frame reshapes)."""
    model, params = unet_and_params
    s2, t, ehs2, ids2 = _inputs(b=2)
    out2 = model.apply({"params": params}, s2, t, ehs2, ids2)
    out_a = model.apply({"params": params}, s2[:1], t, ehs2[:1], ids2[:1])
    np.testing.assert_allclose(np.asarray(out2[:1]), np.asarray(out_a),
                               atol=2e-5, rtol=1e-5)


def test_remat_matches(unet_and_params):
    model, params = unet_and_params
    model_r = UNetSpatioTemporalConditionModel(TINY_UNET, dtype=jnp.float32,
                                               remat=True)
    sample, t, ehs, ids = _inputs()
    out = model.apply({"params": params}, sample, t, ehs, ids)
    out_r = model_r.apply({"params": params}, sample, t, ehs, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-4)


def test_grad_flows_to_temporal_params(unet_and_params):
    model, params = unet_and_params
    sample, t, ehs, ids = _inputs()

    def loss_fn(p):
        return jnp.mean(model.apply({"params": p}, sample, t, ehs, ids) ** 2)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    temporal = [v for path, v in flat
                if "temporal_transformer_block" in "/".join(
                    str(getattr(k, "key", k)) for k in path)]
    assert temporal and any(float(jnp.abs(g).max()) > 0 for g in temporal)
