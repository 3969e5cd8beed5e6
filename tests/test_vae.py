"""Temporal KL-VAE behavior tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svd_xtend_tpu.core.config import TINY_VAE
from svd_xtend_tpu.models.vae import (AutoencoderKLTemporalDecoder,
                                      DiagonalGaussian)


@pytest.fixture(scope="module")
def vae_and_params():
    model = AutoencoderKLTemporalDecoder(TINY_VAE, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                   jax.random.PRNGKey(1))
    return model, v["params"]


def test_encode_shapes_and_posterior(vae_and_params):
    model, params = vae_and_params
    ds = TINY_VAE.downsample_factor
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    post = model.apply({"params": params}, x, method=model.encode)
    assert post.mean.shape == (2, 16 // ds, 16 // ds, TINY_VAE.latent_channels)
    z1 = post.sample(jax.random.PRNGKey(1))
    z2 = post.sample(jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    assert np.abs(np.asarray(post.sample(jax.random.PRNGKey(2)) - z1)).max() > 0
    np.testing.assert_array_equal(np.asarray(post.mode()), np.asarray(post.mean))


def test_decode_shape_and_temporal_mixing(vae_and_params):
    model, params = vae_and_params
    ds = TINY_VAE.downsample_factor
    b, f, h, w = 1, 4, 4, 4
    z = jnp.zeros((b, f, h, w, TINY_VAE.latent_channels))
    out0 = model.apply({"params": params}, z, method=model.decode)
    assert out0.shape == (b, f, h * ds, w * ds, 3)
    # a perturbation in frame 1 must reach neighboring frames (temporal convs)
    z1 = z.at[0, 1].set(1.0)
    out1 = model.apply({"params": params}, z1, method=model.decode)
    delta = np.abs(np.asarray(out1 - out0)).reshape(f, -1).max(axis=1)
    assert delta[1] > 0 and delta[0] > 0 and delta[2] > 0


def test_full_roundtrip_finite(vae_and_params):
    model, params = vae_and_params
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3)) * 2 - 1
    rec, post = model.apply({"params": params}, x, jax.random.PRNGKey(1))
    assert rec.shape == x.shape
    assert np.isfinite(np.asarray(rec)).all()
    assert post.kl().shape == (1,)
    assert float(post.kl()[0]) >= 0.0


def test_diagonal_gaussian_math():
    mean = jnp.zeros((2, 3))
    logvar = jnp.zeros((2, 3))
    g = DiagonalGaussian(mean, logvar)
    np.testing.assert_allclose(np.asarray(g.kl()), 0.0, atol=1e-6)
    g2 = DiagonalGaussian(jnp.ones((2, 3)), jnp.zeros((2, 3)))
    np.testing.assert_allclose(np.asarray(g2.kl()), 1.5, atol=1e-6)  # 3*(1/2)
    moments = jnp.concatenate([jnp.full((1, 4, 4, 2), 0.5),
                               jnp.full((1, 4, 4, 2), -40.0)], axis=-1)
    g3 = DiagonalGaussian.from_moments(moments)
    assert float(g3.logvar.min()) == -30.0  # clamped
