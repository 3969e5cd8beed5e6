"""Sharded training: place state/batch on the mesh, jit the train step.

The reference's entire distributed story is accelerate-DDP (SURVEY.md §2.5).
TPU-natively this file is the replacement: parameters (and optimizer moments,
EMA, frozen trees — anything parameter-shaped) get NamedShardings from the
name-based TP rules in core/mesh.py; batches shard over the 'data' axis; the
train step is jitted with donated state and XLA GSPMD inserts all collectives
(grad psum over 'data', activation all-reduces over 'model') over ICI.

Parallelism coverage (SURVEY.md §2.5 table):
  DP  — batch axis over 'data' (+= optimizer sharding via TP rules)
  TP  — attention qkv/out + GEGLU matrices column/row-parallel over 'model'
  PP  — n/a by design (UNet skip topology; model fits per chip in bf16)
  SP  — frames axis over 'frames' (MeshConfig.frames; GSPMD gathers for
        temporal attention/convs) — tests/test_sharding.py dp2xsp2 exactness
  EP  — n/a (no MoE in the model family)
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import TrainConfig
from ..core.mesh import DATA_AXIS, FRAMES_AXIS, MODEL_AXIS, param_pspec
from ..diffusion.pipeline import SVDModels
from ..train.state import TrainState, make_train_step


from ..core.mesh import path_str as _path_str


def state_shardings(state: Any, mesh: Mesh, zero1: bool = False,
                    host_offload: str = "none") -> Any:
    """NamedSharding tree for a TrainState (or any pytree whose leaf paths end
    in parameter names — optimizer moments and EMA mirror the param tree, so
    the same name-based rules apply to them).

    zero1: additionally shard optimizer moments (and EMA) over the 'data'
    axis — ZeRO stage 1 (SURVEY.md §2.5 FSDP row). Params/grads stay
    replicated across dp; the Adam update runs on each rank's moment shard
    and GSPMD all-gathers the updated params — for full-UNet AdamW this cuts
    the fp32 mu/nu (2x params) to 2x/N per chip. Exact: the update is
    elementwise, so sharding changes layout only (tests/test_sharding.py).

    host_offload: "none" | "masters" | "masters+moments" — park the fp32
    master params (and the optimizer-moment tree) in TPU host memory
    (``pinned_host``), the single-chip answer to full-FT's >16 GB device
    footprint (PERF.md "Training throughput": the on-device fix ladder is
    measured-refuted; the reference trains full-FT on an 80 GB A100). XLA
    streams the offloaded leaves over PCIe around the step. EMA and the
    frozen trees stay on device (EMA is read by validation every step
    window; the frozen towers are forward-pass inputs)."""
    tp = mesh.shape.get(MODEL_AXIS, 1) > 1
    dp = mesh.shape.get(DATA_AXIS, 1)
    if host_offload not in ("none", "masters", "masters+moments"):
        raise ValueError(f"unknown host_offload mode {host_offload!r}")

    def _offloaded(pstr: str) -> bool:
        if host_offload == "none":
            return False
        head = pstr.split("/", 1)[0].lstrip(".")
        if head == "params":
            return True
        return host_offload == "masters+moments" and head == "opt_state"

    def rule(path, leaf):
        if leaf is None:
            return None
        pstr = _path_str(path)
        spec = param_pspec(pstr, leaf, tp=tp)
        if (zero1 and dp > 1 and getattr(leaf, "ndim", 0) >= 1
                and ("opt_state" in pstr or "ema_params" in pstr)):
            parts = list(spec) + [None] * (leaf.ndim - len(spec))
            # largest still-unsharded dim divisible by dp
            cands = [d for d in range(leaf.ndim)
                     if parts[d] is None and leaf.shape[d] % dp == 0
                     and leaf.shape[d] > 0]
            if cands:
                d = max(cands, key=lambda i: leaf.shape[i])
                parts[d] = DATA_AXIS
                spec = P(*parts)
        sh = NamedSharding(mesh, spec)
        if _offloaded(pstr):
            sh = sh.with_memory_kind("pinned_host")
        return sh

    return jax.tree_util.tree_map_with_path(rule, state)


def shard_train_state(state: TrainState, mesh: Mesh, zero1: bool = False,
                      host_offload: str = "none") -> TrainState:
    shardings = state_shardings(state, mesh, zero1=zero1,
                                host_offload=host_offload)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), state, shardings)


def shard_batch(batch: Any, mesh: Mesh, batch_axis: int = 0,
                frames: bool = True) -> Any:
    """Shard pixel batches (..., B, F, H, W, C): B over 'data' and, when the
    mesh has a 'frames' axis, F over 'frames' (sequence parallelism — the
    temporal attention/conv gathers are inserted by GSPMD).

    frames=False skips the F-axis rule — for inputs with no frame axis
    (inference conditioning images are (B, H, W, 3); the frame axis only
    exists on the latents created inside generate, which carry their own
    sharding constraint — see make_sharded_generate)."""
    sp = frames and mesh.shape.get(FRAMES_AXIS, 1) > 1

    def place(x):
        spec = [None] * x.ndim
        spec[batch_axis] = DATA_AXIS
        if sp and x.ndim > batch_axis + 1:
            spec[batch_axis + 1] = FRAMES_AXIS
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree.map(place, batch)


def make_sharded_train_step(
    models: SVDModels,
    cfg: TrainConfig,
    optimizer,
    frozen_params: dict,
    mesh: Mesh,
) -> Tuple[Callable, Callable, Callable]:
    """Returns (jitted_step, place_state, place_batch).

    The frozen VAE/CLIP params are device_put with the same name rules
    (replicated unless a rule matches) and passed to the step as a jit
    ARGUMENT — closing over them bakes ~2.7 GB of fp32 ViT-H/VAE constants
    into the executable (breaks the axon relay transport; PERF.md). State
    is donated: params/opt-state buffers are reused in place, halving peak
    HBM.
    """
    frozen_sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, s), frozen_params,
        state_shardings(frozen_params, mesh))
    step_fn = make_train_step(models, cfg, optimizer)
    # batch micro-axis: with grad accumulation the leading axis is the accum
    # scan axis and axis 1 is the device batch
    batch_axis = 1 if cfg.gradient_accumulation_steps > 1 else 0

    zero1 = getattr(cfg, "zero1", False)
    host_offload = getattr(cfg, "host_offload", "none")
    _jit_cache: dict = {}

    def jitted(state, batch, rng):
        # pin the output state to the input shardings (donation reuses the
        # buffers; under ZeRO-1 this keeps moments dp-sharded across steps
        # instead of letting GSPMD re-replicate them, and under host
        # offload it keeps the masters/moments in pinned_host); built once
        # — the sharding tree needs a concrete state structure
        if "fn" not in _jit_cache:
            out_sh = (state_shardings(state, mesh, zero1=zero1,
                                      host_offload=host_offload), None)
            _jit_cache["fn"] = jax.jit(step_fn, donate_argnums=(0,),
                                       out_shardings=out_sh)
        return _jit_cache["fn"](state, batch, rng, frozen_sharded)

    def place_state(state: TrainState) -> TrainState:
        return shard_train_state(state, mesh, zero1=zero1,
                                 host_offload=host_offload)

    def place_batch(batch):
        return shard_batch(batch, mesh, batch_axis=batch_axis)

    return jitted, place_state, place_batch


def make_sharded_generate(models: SVDModels, mesh: Mesh):
    """Multi-chip inference: returns (generate_fn, place_params, place_images).

    Batch shards over 'data' (throughput), params replicate (or TP-shard by
    the name rules when the mesh has a model axis). When the mesh has a
    'frames' axis (single-video latency mode — PERF.md "frames-8"), the
    latent video created inside generate carries an explicit
    (data, frames, ...) sharding constraint; GSPMD inserts the
    temporal-attention/conv gathers (SURVEY.md §2.5). The conditioning
    images have NO frame axis, so they shard over 'data' only.
    """
    from ..core.config import PipelineConfig
    from ..diffusion.pipeline import generate

    latent_shard = None
    if mesh.shape.get(FRAMES_AXIS, 1) > 1:
        latent_shard = NamedSharding(mesh, P(DATA_AXIS, FRAMES_AXIS))

    def place_params(params):
        return jax.tree.map(lambda x, s: jax.device_put(x, s), params,
                            state_shardings(params, mesh))

    def place_images(images):
        return shard_batch(images, mesh, batch_axis=0, frames=False)

    def generate_fn(params, images, rng, config: "PipelineConfig", **kw):
        with mesh:
            return generate(models, params, images, rng, config,
                            latent_shard=latent_shard, **kw)

    return generate_fn, place_params, place_images
