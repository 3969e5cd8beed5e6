"""EDM (Karras et al. 2022) diffusion math — pure jnp functions.

Behavior contracts (reference train_svd.py):
  - lognormal sigma sampler            :64-67  (sigma ~ exp(Normal(loc, scale)))
  - timestep embedding  t = 0.25 ln s  :969-970
  - c_in  = 1/sqrt(s^2+1)              :972
  - c_out = -s/sqrt(s^2+1)             :1025
  - c_skip = 1/(s^2+1)                 :1026
  - denoised = pred*c_out + noisy*c_skip :1027
  - loss weight = (1+s^2)/s^2          :1028
  - Karras sigma schedule (EulerDiscreteScheduler, use_karras_sigmas)

All functions take/return fp32 regardless of model compute dtype: loss math
stays fp32 (mirrors reference :1030-1036).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rand_log_normal(key: Array, shape, loc: float = 0.0, scale: float = 1.0) -> Array:
    """sigma ~ exp(N(loc, scale^2)). Matches k-diffusion's rand_log_normal
    (reference train_svd.py:64-67) in distribution; sampled directly from a
    normal rather than via inverse-CDF of a uniform."""
    return jnp.exp(jax.random.normal(key, shape, dtype=jnp.float32) * scale + loc)


def sigma_to_t(sigma: Array) -> Array:
    """Continuous EDM timestep fed to the UNet (reference train_svd.py:969)."""
    return 0.25 * jnp.log(sigma)


def edm_scalings(sigma: Array):
    """(c_skip, c_out, c_in) for sigma_data = 1 (SVD convention).

    denoised = c_out * F(c_in * x; t) + c_skip * x
    """
    sigma = jnp.asarray(sigma, jnp.float32)
    s2p1 = sigma * sigma + 1.0
    c_skip = 1.0 / s2p1
    c_out = -sigma * jax.lax.rsqrt(s2p1)
    c_in = jax.lax.rsqrt(s2p1)
    return c_skip, c_out, c_in


def denoise(model_out: Array, noisy: Array, sigma: Array) -> Array:
    """EDM preconditioned denoiser output (reference train_svd.py:1024-1027).

    `sigma` broadcasts against the sample: pass shape (b, 1, 1, 1, 1) for
    (b, f, h, w, c) samples.
    """
    c_skip, c_out, _ = edm_scalings(sigma)
    return model_out.astype(jnp.float32) * c_out + noisy.astype(jnp.float32) * c_skip


def loss_weight(sigma: Array) -> Array:
    """lambda(sigma) = (1 + sigma^2) / sigma^2 (reference train_svd.py:1028)."""
    sigma = jnp.asarray(sigma, jnp.float32)
    return (1.0 + sigma * sigma) / (sigma * sigma)


def weighted_denoising_loss(denoised: Array, target: Array, sigma: Array) -> Array:
    """Mean over batch of per-sample-mean weighted MSE, fp32
    (reference train_svd.py:1028-1036). `sigma` shape: broadcastable (b,1,...)."""
    w = loss_weight(sigma)
    err = (denoised.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    per_sample = jnp.mean((w * err).reshape(err.shape[0], -1), axis=1)
    return jnp.mean(per_sample)


def karras_sigmas(num_steps: int, sigma_min: float = 0.002, sigma_max: float = 700.0,
                  rho: float = 7.0) -> Array:
    """Karras et al. (2022) eq. 5 noise schedule, descending, with terminal 0.

    Returns shape (num_steps + 1,): [sigma_max, ..., sigma_min, 0].
    """
    ramp = jnp.linspace(0.0, 1.0, num_steps, dtype=jnp.float32)
    min_inv_rho = sigma_min ** (1.0 / rho)
    max_inv_rho = sigma_max ** (1.0 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return jnp.concatenate([sigmas, jnp.zeros((1,), jnp.float32)])


def precondition_inputs(noisy: Array, sigma: Array) -> Array:
    """x * c_in — the scale-model-input step (reference train_svd.py:972 /
    EulerDiscreteScheduler.scale_model_input)."""
    _, _, c_in = edm_scalings(sigma)
    return noisy.astype(jnp.float32) * c_in


def euler_step(sample: Array, denoised: Array, sigma: Array, sigma_next: Array) -> Array:
    """One Euler (1st order, EDM ODE) step:
    x <- x + (sigma_next - sigma) * (x - denoised) / sigma.
    """
    d = (sample.astype(jnp.float32) - denoised.astype(jnp.float32)) / sigma
    return sample.astype(jnp.float32) + d * (sigma_next - sigma)
