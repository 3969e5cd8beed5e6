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


def test_deep_cache_shallow_matches_full(unet_and_params):
    """DeepCache contract (models/unet.py): the shallow pass seeded with the
    deep feature from the SAME inputs reproduces the full forward exactly —
    the two paths are the same computation graph split at the cache point."""
    model, params = unet_and_params
    sample, t, ehs, ids = _inputs()
    full = model.apply({"params": params}, sample, t, ehs, ids)
    out, deep = model.apply({"params": params}, sample, t, ehs, ids,
                            return_deep=True, cache_depth=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=1e-6)
    assert deep.shape[:2] == (1, 2)
    shallow = model.apply({"params": params}, sample, t, ehs, ids,
                          cached_deep=deep, cache_depth=1)
    np.testing.assert_allclose(np.asarray(shallow), np.asarray(full), atol=1e-6)


def test_deep_cache_depths_four_level():
    """Residual/skip bookkeeping at every cache depth of a 4-level UNet
    (the real SVD topology, SURVEY.md §2.3): shallow(deep_d) == full for
    d = 1, 2, 3 — in particular the partial down blocks must produce exactly
    the skip tensors the retained up blocks pop."""
    from svd_xtend_tpu.core.config import UNetConfig
    cfg4 = UNetConfig(
        sample_size=16,
        block_out_channels=(32, 32, 64, 64),
        down_block_types=("CrossAttnDownBlockSpatioTemporal",) * 3
        + ("DownBlockSpatioTemporal",),
        up_block_types=("UpBlockSpatioTemporal",)
        + ("CrossAttnUpBlockSpatioTemporal",) * 3,
        layers_per_block=2,
        transformer_layers_per_block=(1, 1, 1, 1),
        num_attention_heads=(1, 1, 2, 2),
        cross_attention_dim=16,
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=24,
        num_frames=2,
    )
    model = UNetSpatioTemporalConditionModel(cfg4, dtype=jnp.float32)
    b, f, h, w = 1, 2, 16, 16
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    sample = jax.random.normal(ks[0], (b, f, h, w, cfg4.in_channels))
    ehs = jax.random.normal(ks[1], (b, 1, cfg4.cross_attention_dim))
    ids = jax.random.normal(ks[2], (b, 3))
    variables = model.init(ks[3], sample, jnp.zeros(()), ehs, ids)
    params = variables["params"]
    t = jnp.float32(0.9)
    full = model.apply({"params": params}, sample, t, ehs, ids)
    for depth in (1, 2, 3):
        out, deep = model.apply({"params": params}, sample, t, ehs, ids,
                                return_deep=True, cache_depth=depth)
        # deep sits at the retained/skipped boundary: latent res / 2^(d-1),
        # channels of the first skipped up block's output
        assert deep.shape == (b, f, h >> (depth - 1), w >> (depth - 1),
                              tuple(reversed(cfg4.block_out_channels))[
                                  len(cfg4.up_block_types) - depth - 1])
        shallow = model.apply({"params": params}, sample, t, ehs, ids,
                              cached_deep=deep, cache_depth=depth)
        np.testing.assert_allclose(np.asarray(shallow), np.asarray(full),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"cache_depth={depth}")


def test_deep_cache_depth_validation(unet_and_params):
    model, params = unet_and_params
    sample, t, ehs, ids = _inputs()
    with pytest.raises(ValueError, match="cache_depth"):
        model.apply({"params": params}, sample, t, ehs, ids,
                    return_deep=True, cache_depth=2)  # TINY has 2 levels
