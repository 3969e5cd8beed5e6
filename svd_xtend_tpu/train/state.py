"""Train state, trainable-scope partitioning, EMA, and the jitted train step.

Behavior contracts:
  - trainable scopes: 'full' (every UNet param — README.md:41 claim),
    'temporal' (params whose path contains 'temporal_transformer_block', the
    code-as-shipped default, train_svd.py:758-766), 'lora' (adapter tree only,
    train_svd_lora.py:744-751).
  - EMA with (1+step)/(10+step) decay warmup clamped at max decay
    (diffusers EMAModel contract; stepped after each optim step,
    train_svd.py:1053-1054).
  - gradient accumulation: micro-batches reduced in-graph
    (reference: accelerate accumulate contexts, train_svd.py:941).

TPU-first design: one pure ``train_step(state, batch, rng) -> (state, metrics)``
jitted over the mesh with donated state. Frozen params (VAE/CLIP and, for
temporal/lora scopes, the non-trainable UNet leaves) live OUTSIDE the
differentiated tree, so AD never materializes their cotangents — the
temporal-only scope backprops through but allocates gradients only for the
~blend of temporal params (vs. the reference which zeroes requires_grad but
still runs DDP over the full module).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..core.config import TrainConfig
from ..diffusion.pipeline import SVDModels
from ..diffusion.training import training_loss
from .optim import global_norm_f32
from ..models import lora as lora_lib

Array = jax.Array


# ---------------------------------------------------------------- masks ----

from ..core.mesh import path_str as _path_str


def trainable_mask(params: Any, mode: str) -> Any:
    """Bool pytree marking trainable leaves ('full', 'temporal', or
    'tracklet' scope)."""
    if mode == "full":
        return jax.tree.map(lambda _: True, params)
    if mode == "temporal":
        return jax.tree_util.tree_map_with_path(
            lambda p, _: "temporal_transformer_block" in _path_str(p), params)
    if mode == "tracklet":
        # Boximator-style: train ONLY the inserted conditioning branch (box
        # tokenizer + instance enhancer + zero-gated injections), freezing
        # the pretrained UNet (models/tracklet.py)
        return jax.tree_util.tree_map_with_path(
            lambda p, _: ("tracklet_conditioner" in _path_str(p)
                          or "gated_attentions" in _path_str(p)), params)
    raise ValueError(f"trainable_mask undefined for mode {mode!r}")


def partition(params: Any, mask: Any) -> Tuple[Any, Any]:
    """Split params into (trainable, frozen) trees; leaves are None on the
    other side (optax-style partition that jax.grad skips entirely)."""
    train = jax.tree.map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree.map(lambda p, m: None if m else p, params, mask)
    return train, frozen


def combine(train: Any, frozen: Any) -> Any:
    return jax.tree.map(lambda t, f: t if f is None else f, train, frozen,
                        is_leaf=lambda x: x is None)


def param_audit(params: Any, mask: Any) -> Tuple[list, list]:
    """(frozen_names, trainable_names) — the reference's params_freeze.txt /
    params_train.txt dump (train_svd.py:776-785)."""
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    frozen, trainable = [], []
    for path, m in flat:
        (trainable if m else frozen).append(_path_str(path))
    return frozen, trainable


# ------------------------------------------------------------------ EMA ----

def ema_decay_schedule(step: Array, max_decay: float = 0.9999) -> Array:
    return jnp.minimum(max_decay, (1.0 + step) / (10.0 + step))


def ema_update(ema_params: Any, new_params: Any, step: Array,
               max_decay: float = 0.9999) -> Any:
    d = ema_decay_schedule(step.astype(jnp.float32), max_decay)
    return jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                        ema_params, new_params)


# ---------------------------------------------------------------- state ----

class TrainState(struct.PyTreeNode):
    step: Array
    params: Any                        # trainable tree (unet subtree or lora tree)
    opt_state: Any
    ema_params: Optional[Any] = None   # full-FT only (reference: --use_ema)

    frozen_unet: Any = None            # non-trainable unet leaves (None for full)
    base_unet: Any = None              # full base tree (lora mode only)


def unet_params_of(state: TrainState, cfg: TrainConfig) -> Any:
    """Materialize the effective full UNet param tree from a state."""
    if cfg.train_mode == "lora":
        return lora_lib.merge(state.base_unet, state.params,
                              rank=cfg.lora_rank, alpha=cfg.lora_alpha)
    if cfg.train_mode in ("temporal", "tracklet"):
        return combine(state.params, state.frozen_unet)
    return state.params


def create_train_state(cfg: TrainConfig, unet_params: Any,
                       optimizer: optax.GradientTransformation,
                       lora_rng: Optional[Array] = None) -> TrainState:
    if cfg.train_mode == "lora":
        if lora_rng is None:
            lora_rng = jax.random.PRNGKey(0)
        lora_params = lora_lib.init(lora_rng, unet_params,
                                    rank=cfg.lora_rank, alpha=cfg.lora_alpha)
        return TrainState(step=jnp.zeros((), jnp.int32), params=lora_params,
                          opt_state=optimizer.init(lora_params),
                          base_unet=unet_params)
    if cfg.train_mode in ("temporal", "tracklet"):
        train, frozen = partition(
            unet_params, trainable_mask(unet_params, cfg.train_mode))
        return TrainState(step=jnp.zeros((), jnp.int32), params=train,
                          opt_state=optimizer.init(train), frozen_unet=frozen)
    if cfg.train_mode == "full":
        # real copies: aliasing the param buffers makes the donated sharded
        # step fail with "donate the same buffer twice"
        ema = (jax.tree.map(lambda x: x.copy(), unet_params)
               if cfg.use_ema else None)
        return TrainState(step=jnp.zeros((), jnp.int32), params=unet_params,
                          opt_state=optimizer.init(unet_params), ema_params=ema)
    raise ValueError(f"unknown train_mode {cfg.train_mode!r}")


def cast_frozen_to_compute(state: TrainState, frozen: dict,
                           dtype) -> Tuple[TrainState, dict]:
    """Store every NON-TRAINED tree at the compute dtype.

    Frozen leaves (the temporal/tracklet frozen_unet partition, the LoRA
    base_unet, and the VAE/CLIP towers) carry no optimizer state and are
    cast to the compute dtype at every use anyway, so fp32 storage buys
    nothing numerically: bf16-at-use from an fp32 store equals bf16-at-use
    from a bf16 store (single rounding; exact for temporal/tracklet and
    VAE/CLIP, ≤1 ulp for the LoRA base+delta merge). It costs real HBM —
    at full size, 2.3 GB (frozen spatial partition) + 1.4 GB (VAE+CLIP)
    [+3 GB LoRA base] — the difference between fitting the 512×320×14f
    step on one 16 GB chip or not (PERF.md "Training throughput").
    Matches the reference, which moves the frozen vae/image_encoder to
    weight_dtype under AMP (train_svd.py:597-610) while keeping fp32
    masters for TRAINED leaves only (core/dtypes.py policy).
    """
    cast = lambda t: jax.tree.map(lambda x: x.astype(dtype), t)
    if state.frozen_unet is not None:
        state = state.replace(frozen_unet=cast(state.frozen_unet))
    if state.base_unet is not None:
        state = state.replace(base_unet=cast(state.base_unet))
    return state, cast(frozen)


# ---------------------------------------------------- host offload (TPU) ----

def host_offload_state(state: TrainState, offload: str,
                       device=None) -> Tuple[TrainState, Any]:
    """Park optimizer-domain trees in TPU host memory (``pinned_host``).

    The single-chip answer to full-FT's >16 GB device footprint (PERF.md
    "Training throughput": fp32 masters 6.07 GB + grads + moments exceed a
    16 GB v5e even with every on-device lever refuted). The fp32 MASTER
    params carry no forward-pass role beyond a one-time bf16 cast and are
    read/written once per step by the optimizer — classic offload targets;
    XLA streams them per-buffer over PCIe around the step.

    offload: "none" | "masters" (state.params) | "masters+moments"
    (also the Adam m/v tree). Returns the state with those trees moved to
    pinned_host plus an out-shardings pytree for the step's updated state
    (donation then keeps each leaf in its memory space). The reference has
    no counterpart (it trains full-FT on an 80 GB A100); bitsandbytes'
    paged optimizers are the CUDA-world analog.
    """
    if offload == "none":
        return state, None
    if device is None:
        device = jax.devices()[0]
    from jax.sharding import SingleDeviceSharding
    host = SingleDeviceSharding(device, memory_kind="pinned_host")
    dev = SingleDeviceSharding(device, memory_kind="device")

    def place(tree, shard):
        return jax.tree.map(lambda x: jax.device_put(x, shard), tree)

    state = state.replace(params=place(state.params, host))
    if offload == "masters+moments":
        state = state.replace(opt_state=place(state.opt_state, host))
    elif offload != "masters":
        raise ValueError(f"unknown offload mode {offload!r}")

    def shard_like(tree, shard):
        return jax.tree.map(lambda _: shard, tree)

    out_shardings = TrainState(
        step=dev, params=shard_like(state.params, host),
        opt_state=shard_like(state.opt_state,
                             host if offload == "masters+moments" else dev),
        ema_params=(None if state.ema_params is None
                    else shard_like(state.ema_params, dev)),
        frozen_unet=(None if state.frozen_unet is None
                     else shard_like(state.frozen_unet, dev)),
        base_unet=(None if state.base_unet is None
                   else shard_like(state.base_unet, dev)))
    return state, out_shardings


# ------------------------------------------------------------ train step ----

def make_train_step(models: SVDModels, cfg: TrainConfig,
                    optimizer: optax.GradientTransformation,
                    frozen_params: Optional[dict] = None) -> Callable:
    """Build the pure train step. `batch` is (accum, B, F, H, W, 3) pixels
    when gradient_accumulation_steps > 1, else (B, F, H, W, 3).

    frozen_params: {"vae": ..., "clip": ...}. Two ways to supply them:
      - here (closed over) — convenient for tests/small configs, BUT under
        jit closed-over device trees are baked into the executable as
        CONSTANTS (~2.66 GB at full size: fp32 ViT-H + VAE), which bloats
        every executable and breaks the axon relay transport (PERF.md
        "Training throughput", r4 root cause);
      - as the returned step's 4th ARGUMENT (pass None here) — the device
        path: `step(state, batch, rng, frozen)` keeps them jit arguments,
        so the executable stays small. make_sharded_train_step and
        bench_train.py use this form.
    """
    accum = cfg.gradient_accumulation_steps

    def unet_tree(trainable, state: TrainState):
        if cfg.train_mode == "lora":
            return lora_lib.merge(state.base_unet, trainable,
                                  rank=cfg.lora_rank, alpha=cfg.lora_alpha)
        if cfg.train_mode in ("temporal", "tracklet"):
            return combine(trainable, state.frozen_unet)
        return trainable

    def micro_loss(trainable, state, micro_batch, rng, fp):
        unet_p = unet_tree(trainable, state)
        if isinstance(micro_batch, dict):
            # Tracklet2Video batches: {"pixel_values", "boxes", "box_mask"}
            return training_loss(models, unet_p, fp,
                                 micro_batch["pixel_values"], rng, cfg,
                                 boxes=micro_batch.get("boxes"),
                                 box_mask=micro_batch.get("box_mask"))
        return training_loss(models, unet_p, fp, micro_batch, rng, cfg)

    grad_fn = jax.value_and_grad(micro_loss)
    # "bf16" differentiates w.r.t. the bf16 compute copy of the params —
    # same backward math (compute is bf16 under jit either way), but the
    # materialized cotangent tree is half the bytes (core/config.py
    # grad_dtype). The optimizer applies bf16 grads to the fp32 masters.
    gdt = (jnp.bfloat16 if getattr(cfg, "grad_dtype", "fp32") == "bf16"
           else None)

    def train_step(state: TrainState, batch: Array, rng: Array,
                   frozen: Optional[dict] = None):
        fp = frozen if frozen is not None else frozen_params
        if fp is None:
            raise ValueError("frozen vae/clip params must be given to "
                             "make_train_step or passed as step(..., frozen)")
        rng = jax.random.fold_in(rng, state.step)
        diff_params = (state.params if gdt is None else
                       jax.tree.map(lambda x: x.astype(gdt), state.params))
        if accum > 1:
            def body(carry, xs):
                loss_sum, grads_sum = carry
                pixels, key = xs
                loss, grads = grad_fn(diff_params, state, pixels, key, fp)
                return (loss_sum + loss,
                        jax.tree.map(jnp.add, grads_sum, grads)), None
            keys = jax.random.split(rng, accum)
            zero = jax.tree.map(jnp.zeros_like, diff_params)
            (loss, grads), _ = jax.lax.scan(body, (0.0, zero), (batch, keys))
            loss = loss / accum
            grads = jax.tree.map(lambda g: g / accum, grads)
        else:
            loss, grads = grad_fn(diff_params, state, batch, rng, fp)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        ema = state.ema_params
        if ema is not None:
            ema = ema_update(ema, params, step, cfg.ema_decay)
        metrics = {
            "loss": loss,
            "grad_norm": global_norm_f32(grads),
            "lr": jnp.asarray(0.0),  # filled by caller from schedule if needed
        }
        return state.replace(step=step, params=params, opt_state=opt_state,
                             ema_params=ema), metrics

    return train_step
