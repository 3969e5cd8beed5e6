"""Optimizers and LR schedules (optax).

Behavior contract: AdamW with the reference's betas/eps/weight-decay flags
(train_svd.py:767-773) and the six named LR schedules of
diffusers.optimization.get_scheduler (train_svd.py:396-399): linear, cosine,
cosine_with_restarts, polynomial, constant, constant_with_warmup — all with
`lr_warmup_steps` linear warmup. The reference's bitsandbytes 8-bit Adam
(train_svd.py:746-756) maps to `quant.adamw_8bit` — blockwise-int8 moment
storage (cfg.use_8bit_adam); `mu_dtype=jnp.bfloat16` is the lighter-touch
alternative.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..core.config import TrainConfig


def global_norm_f32(tree) -> jnp.ndarray:
    """optax.global_norm with the per-leaf sum-of-squares accumulated in f32.

    With grad_dtype=bf16 the plain version sums millions of squares at ~8
    mantissa bits (~1% norm error — ADVICE r4); the f32 upcast fuses into the
    reduce under jit, so this costs no extra HBM pass. Bit-identical to
    optax.global_norm for f32 trees.
    """
    return optax.global_norm(jax.tree.map(
        lambda g: g.astype(jnp.float32), tree))


def clip_by_global_norm_f32(max_norm: float) -> optax.GradientTransformation:
    """optax.clip_by_global_norm with the norm (and scale) computed in f32.

    Matches optax semantics exactly for f32 grads (same formula, same norm);
    for bf16 grads the threshold comparison no longer carries the bf16
    accumulation error. Stateless.
    """
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = global_norm_f32(updates)
        def clip(t):
            scaled = (t.astype(jnp.float32) / g_norm * max_norm).astype(t.dtype)
            return jax.lax.select(g_norm < max_norm, t, scaled)
        return jax.tree.map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def get_schedule(name: str, base_lr: float, warmup_steps: int, total_steps: int,
                 num_cycles: float = 0.5, power: float = 1.0) -> optax.Schedule:
    warmup_steps = max(0, warmup_steps)

    if warmup_steps == 0:
        def warmup_frac(step):
            return 1.0
    else:
        def warmup_frac(step):
            return jnp.minimum(1.0, step / warmup_steps)

    decay_steps = max(1, total_steps - warmup_steps)

    if name == "constant":
        return lambda step: jnp.asarray(base_lr)
    if name == "constant_with_warmup":
        return lambda step: base_lr * warmup_frac(step)
    if name == "linear":
        def sched(step):
            p = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
            return base_lr * warmup_frac(step) * (1.0 - p)
        return sched
    if name == "cosine":
        def sched(step):
            p = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
            return base_lr * warmup_frac(step) * 0.5 * (
                1.0 + jnp.cos(math.pi * 2.0 * num_cycles * p))
        return sched
    if name == "cosine_with_restarts":
        cycles = max(1, int(num_cycles) if num_cycles >= 1 else 1)
        def sched(step):
            p = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
            frac = (p * cycles) % 1.0
            alive = (p < 1.0).astype(jnp.float32)
            return base_lr * warmup_frac(step) * alive * 0.5 * (
                1.0 + jnp.cos(math.pi * frac))
        return sched
    if name == "polynomial":
        lr_end = 1e-7
        def sched(step):
            p = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
            return (base_lr - lr_end) * (1.0 - p) ** power * warmup_frac(step) + lr_end
        return sched
    raise ValueError(f"unknown lr_scheduler {name!r}")


def training_schedule(cfg: TrainConfig, num_processes: int = 1):
    """THE LR schedule the optimizer applies — also what loggers must report
    (a second schedule built from unscaled cfg values diverges under
    --scale_lr / multi-process warmup scaling; caught in review)."""
    lr = cfg.learning_rate
    if cfg.scale_lr:
        # reference scaling: lr * grad_accum * per_device_bs * num_processes
        # (train_svd.py:803-805)
        lr = lr * cfg.gradient_accumulation_steps * cfg.per_device_batch_size * num_processes
    return get_schedule(cfg.lr_scheduler, lr,
                        cfg.lr_warmup_steps * num_processes,
                        cfg.max_train_steps * num_processes)


def make_optimizer(cfg: TrainConfig, num_processes: int = 1,
                   mu_dtype: Optional[jnp.dtype] = None) -> optax.GradientTransformation:
    schedule = training_schedule(cfg, num_processes)
    chain = []
    if cfg.max_grad_norm and cfg.max_grad_norm > 0:
        chain.append(clip_by_global_norm_f32(cfg.max_grad_norm))
    if getattr(cfg, "use_8bit_adam", False):
        from .quant import adamw_8bit
        chain.append(adamw_8bit(
            learning_rate=schedule, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon, weight_decay=cfg.adam_weight_decay))
    else:
        chain.append(optax.adamw(
            learning_rate=schedule, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon, weight_decay=cfg.adam_weight_decay,
            mu_dtype=mu_dtype))
    return optax.chain(*chain)
