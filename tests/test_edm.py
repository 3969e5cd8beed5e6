"""EDM math against closed-form identities (SURVEY.md §2.1 rows)."""

import jax
import jax.numpy as jnp
import numpy as np

from svd_xtend_tpu.core import edm


def test_edm_scalings_identities():
    sigma = jnp.array([0.002, 0.1, 1.0, 10.0, 700.0], jnp.float32)
    c_skip, c_out, c_in = edm.edm_scalings(sigma)
    np.testing.assert_allclose(c_skip, 1.0 / (sigma**2 + 1.0), rtol=1e-6)
    np.testing.assert_allclose(c_out, -sigma / np.sqrt(sigma**2 + 1.0), rtol=1e-6)
    np.testing.assert_allclose(c_in, 1.0 / np.sqrt(sigma**2 + 1.0), rtol=1e-6)
    # EDM consistency: c_skip^2 + c_out^2 * (1 + 1/sigma^2) relation isn't the
    # point here — the boundary conditions are: sigma->0 => c_skip->1, c_out->0
    assert float(edm.edm_scalings(jnp.float32(1e-6))[0]) > 0.999


def test_sigma_to_t():
    np.testing.assert_allclose(edm.sigma_to_t(jnp.float32(1.0)), 0.0, atol=1e-7)
    np.testing.assert_allclose(edm.sigma_to_t(jnp.float32(np.e**4)), 1.0, atol=1e-5)


def test_rand_log_normal_moments():
    key = jax.random.PRNGKey(0)
    s = edm.rand_log_normal(key, (200_000,), loc=0.7, scale=1.6)
    logs = np.log(np.asarray(s))
    assert abs(logs.mean() - 0.7) < 0.02
    assert abs(logs.std() - 1.6) < 0.02


def test_loss_weight_and_loss():
    sigma = jnp.array([0.5, 2.0], jnp.float32).reshape(2, 1, 1, 1, 1)
    w = edm.loss_weight(sigma)
    np.testing.assert_allclose(w, (1 + sigma**2) / sigma**2, rtol=1e-6)
    denoised = jnp.ones((2, 3, 4, 4, 4), jnp.float32)
    target = jnp.zeros_like(denoised)
    loss = edm.weighted_denoising_loss(denoised, target, sigma)
    expected = float(jnp.mean(w))  # err == 1 everywhere
    np.testing.assert_allclose(loss, expected, rtol=1e-6)


def test_denoise_reconstructs_clean_given_perfect_model():
    """If model output F = (x0 - c_skip*x)/c_out then denoise == x0."""
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (2, 8, 8))
    sigma = jnp.float32(3.0)
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    noisy = x0 + sigma * noise
    c_skip, c_out, _ = edm.edm_scalings(sigma)
    perfect = (x0 - c_skip * noisy) / c_out
    np.testing.assert_allclose(edm.denoise(perfect, noisy, sigma), x0, atol=1e-5)


def test_karras_sigmas():
    s = np.asarray(edm.karras_sigmas(25, 0.002, 700.0, 7.0))
    assert s.shape == (26,)
    np.testing.assert_allclose(s[0], 700.0, rtol=1e-5)
    np.testing.assert_allclose(s[-2], 0.002, rtol=1e-4)
    assert s[-1] == 0.0
    assert np.all(np.diff(s) < 0)


def test_euler_step_exact_for_linear_ode():
    """With denoised == 0 the EDM ODE is x' = x/sigma: Euler step gives
    x_next = x * sigma_next/sigma exactly."""
    x = jnp.full((4,), 2.0)
    out = edm.euler_step(x, jnp.zeros_like(x), jnp.float32(10.0), jnp.float32(5.0))
    np.testing.assert_allclose(out, np.full(4, 1.0), rtol=1e-6)
