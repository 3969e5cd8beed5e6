"""EulerDiscreteScheduler in EDM (Karras) mode — functional, scan-friendly.

Behavior contract (SURVEY.md §2.2 EulerDiscreteScheduler): Karras sigma
schedule over `num_inference_steps`, sigma_max ~ 700, latent init
randn*sigma_max, per-step input scaling 1/sqrt(sigma^2+1), Euler step
x <- x + (sigma_next - sigma) * (x - denoised) / sigma, model timestep
0.25*log(sigma).

TPU-first design: the scheduler is a frozen table of sigmas plus pure
step functions — no Python-side state, so the whole denoise loop lives inside
one jit as a ``lax.scan`` (vs. the reference's per-step host round-trips).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import edm
from ..core.config import SchedulerConfig

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class EulerDiscreteScheduler:
    config: SchedulerConfig = SchedulerConfig()

    def sigmas(self, num_inference_steps: int) -> Array:
        """Descending Karras sigmas with terminal zero, shape (steps+1,)."""
        c = self.config
        return edm.karras_sigmas(num_inference_steps, c.sigma_min, c.sigma_max, c.rho)

    def init_noise_sigma(self) -> float:
        return self.config.sigma_max

    @staticmethod
    def scale_model_input(sample: Array, sigma: Array) -> Array:
        return edm.precondition_inputs(sample, sigma)

    @staticmethod
    def timestep(sigma: Array) -> Array:
        return edm.sigma_to_t(sigma)

    @staticmethod
    def denoised(model_output: Array, sample: Array, sigma: Array) -> Array:
        """EDM preconditioned prediction of the clean latent."""
        return edm.denoise(model_output, sample, sigma)

    @staticmethod
    def step(sample: Array, denoised: Array, sigma: Array, sigma_next: Array) -> Array:
        return edm.euler_step(sample, denoised, sigma, sigma_next)
