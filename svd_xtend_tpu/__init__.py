"""svd_xtend_tpu — a TPU-native JAX/XLA/Pallas image-to-video latent diffusion framework.

A from-scratch rebuild of the capabilities of pixeli99/SVD_Xtend (Stable Video
Diffusion finetuning + inference) designed TPU-first:

- bf16 compute / fp32 master params, everything under ``jax.jit``
- NHWC / (B, F, H, W, C) canonical layouts (TPU-native, channels-last)
- ``jax.sharding.Mesh`` + NamedSharding data/tensor parallelism (GSPMD)
- Pallas flash-attention and fused-norm kernels for the hot paths
- optax optimizers, Orbax checkpointing, grain-style deterministic data

Subpackages:
    core       configs, EDM (Karras) diffusion math, mesh/dtype policy
    ops        attention, resize/blur, layout helpers, Pallas kernels
    models     UNetSpatioTemporalConditionModel, temporal KL-VAE, CLIP vision, LoRA
    diffusion  EulerDiscreteScheduler, img2vid pipeline, training-loss assembly
    data       frame-folder video dataset with deterministic sharded sampling
    train      train step, EMA, checkpoint manager, CLI entry points
    io         diffusers-format import/export, video/GIF writers
"""

__version__ = "0.1.0"
