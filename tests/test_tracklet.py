"""Tracklet2Video conditioning branch (designed from Boximator/TrackDiffusion;
reference README.md:57-70 describes but does not ship it)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from svd_xtend_tpu.core.config import TINY_UNET
from svd_xtend_tpu.models.tracklet import (BoxTokenizer, GatedSelfAttention,
                                           InstanceEnhancer, TrackletConditioner,
                                           fourier_embed)
from svd_xtend_tpu.models.unet import UNetSpatioTemporalConditionModel

TRACKLET_UNET = dataclasses.replace(TINY_UNET, tracklet_dim=32, tracklet_heads=2)


def _boxes(b=1, f=2, n=3, key=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    xy = jax.random.uniform(k1, (b, f, n, 2)) * 0.5
    wh = jax.random.uniform(k2, (b, f, n, 2)) * 0.4
    boxes = jnp.concatenate([xy, xy + wh], axis=-1)
    mask = jnp.ones((b, f, n)).at[:, :, -1].set(0.0)   # last box absent
    return boxes, mask


def test_fourier_embed_shape():
    x = jnp.zeros((2, 3, 4))
    assert fourier_embed(x, num_freqs=8).shape == (2, 3, 4 * 16)


def test_box_tokenizer_null_token_for_masked():
    boxes, mask = _boxes()
    m = BoxTokenizer(dim=16)
    params = m.init(jax.random.PRNGKey(0), boxes, mask)
    out = m.apply(params, boxes, mask)
    assert out.shape == (1, 2, 3, 16)
    null = params["params"]["null_token"]
    np.testing.assert_allclose(np.asarray(out[0, 0, -1]), np.asarray(null),
                               atol=1e-6)


def test_instance_enhancer_shape():
    tokens = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3, 16))
    m = InstanceEnhancer(num_heads=2)
    params = m.init(jax.random.PRNGKey(1), tokens)
    assert m.apply(params, tokens).shape == tokens.shape


def test_gated_attention_noop_at_init():
    """Zero-init gates: injection must not change activations at init."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
    objs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16))
    m = GatedSelfAttention(num_heads=2, head_dim=16)
    params = m.init(jax.random.PRNGKey(2), x, objs)
    np.testing.assert_allclose(np.asarray(m.apply(params, x, objs)),
                               np.asarray(x), atol=1e-6)


def test_unet_with_tracklet_noop_at_init_and_trainable():
    model = UNetSpatioTemporalConditionModel(TRACKLET_UNET, dtype=jnp.float32)
    base = UNetSpatioTemporalConditionModel(TINY_UNET, dtype=jnp.float32)
    b, f = 1, 2
    sample = jax.random.normal(jax.random.PRNGKey(0),
                               (b, f, 8, 8, TRACKLET_UNET.in_channels))
    t = jnp.float32(1.0)
    ehs = jax.random.normal(jax.random.PRNGKey(1),
                            (b, 1, TRACKLET_UNET.cross_attention_dim))
    ids = jnp.zeros((b, 3))
    boxes, mask = _boxes(b, f)
    variables = model.init(jax.random.PRNGKey(2), sample, t, ehs, ids,
                           boxes, mask)
    params = variables["params"]
    assert "tracklet_conditioner" in params

    out_with = model.apply({"params": params}, sample, t, ehs, ids, boxes, mask)
    out_without = model.apply({"params": params}, sample, t, ehs, ids)
    # zero gates -> tracklet branch is a no-op at init
    np.testing.assert_allclose(np.asarray(out_with), np.asarray(out_without),
                               atol=1e-5)

    # after nudging a gate, boxes must influence the output
    import flax.traverse_util as tu
    flat = tu.flatten_dict(params)
    for k in flat:
        if k[-1] == "alpha_attn":
            flat[k] = jnp.ones_like(flat[k])
    params2 = tu.unflatten_dict(flat)
    out2 = model.apply({"params": params2}, sample, t, ehs, ids, boxes, mask)
    boxes2 = jnp.clip(boxes + 0.3, 0, 1)
    out3 = model.apply({"params": params2}, sample, t, ehs, ids, boxes2, mask)
    assert np.abs(np.asarray(out2 - out3)).max() > 1e-6
