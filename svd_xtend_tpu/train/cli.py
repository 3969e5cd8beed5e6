"""Training CLI — the train_svd.py / train_svd_lora.py replacement.

Behavior contract: the reference's flag surface (train_svd.py:294-569,
train_svd_lora.py adds --rank) and main() call order (SURVEY.md §3.1):
load models -> freeze encoders -> select trainable scope -> optimizer ->
dataset/loader -> (resume) -> hot loop [encode, EDM loss, update, EMA] ->
checkpoint/rotate -> validation sampling -> final export.

Usage:
  python -m svd_xtend_tpu.train.cli --base_folder ./frames --train_mode temporal
  python -m svd_xtend_tpu.train.cli --base_folder ./frames --train_mode lora --rank 4

TPU-native deltas: one jitted sharded step over a ('data','model') mesh
replaces accelerate/DDP; bf16 replaces fp16+scaler; resume is exact
(deterministic data sampling); loss is averaged in-graph.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import (CLIPVisionConfig, MeshConfig, PipelineConfig,
                           TrainConfig, UNetConfig, VAEConfig)
from ..core.mesh import create_mesh
from ..data.dataset import FrameFolderDataset, ShardedLoader
from ..diffusion.pipeline import SVDModels, generate, init_pipeline_params
from ..io.media import export_to_gif
from ..parallel import make_sharded_train_step
from ..train import checkpoint as ckpt_lib
from ..train.optim import make_optimizer, training_schedule
from ..train.state import (cast_frozen_to_compute, create_train_state,
                           param_audit, trainable_mask, unet_params_of)
from ..utils.logging import MetricWriter, get_logger


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="TPU-native SVD finetuning")
    # data (reference --base_folder/--width/--height/--num_frames)
    p.add_argument("--base_folder", required=True)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--num_workers", type=int, default=8)
    # scope
    p.add_argument("--train_mode",
                   choices=["full", "temporal", "lora", "tracklet"],
                   default="temporal")
    p.add_argument("--rank", type=int, default=4, help="LoRA rank (=alpha)")
    # Tracklet2Video (README.md:57-70 — the reference never shipped this):
    # 'tracklet' mode trains only the box-conditioning branch on videos with
    # <video>/boxes.npz annotations (boxes (T,N,4) normalized xyxy [+ mask])
    p.add_argument("--tracklet_dim", type=int, default=1024,
                   help="box-token width (used when --train_mode tracklet)")
    p.add_argument("--tracklet_dim_full", action="store_true",
                   help="with --train_mode full: also build + train the "
                        "tracklet branch at --tracklet_dim")
    p.add_argument("--tracklet_gate_init", type=float, default=0.0,
                   help="GLIGEN gate init (0 = exact no-op at init; warm "
                        ">0 for joint from-scratch training)")
    p.add_argument("--max_boxes", type=int, default=16,
                   help="per-frame box slots (padding/truncation)")
    # optimization
    p.add_argument("--per_device_batch_size", type=int, default=1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--max_train_steps", type=int, default=50000)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--scale_lr", action="store_true")
    p.add_argument("--lr_scheduler", default="constant")
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="blockwise-int8 Adam moments (reference bitsandbytes "
                        "AdamW8bit, train_svd.py:746-756)")
    p.add_argument("--host_offload",
                   choices=["none", "masters", "masters+moments"],
                   default="none",
                   help="park fp32 masters (and Adam moments) in TPU host "
                        "memory, streamed over PCIe per step — fits "
                        "full-UNet finetunes that exceed device HBM "
                        "(PERF.md 'Training throughput'); TPU-only")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: shard optimizer moments (and EMA) over the "
                        "data axis — full-UNet AdamW states drop to 1/N per "
                        "chip; numerically exact")
    p.add_argument("--conditioning_dropout_prob", type=float, default=0.1)
    p.add_argument("--p_mean", type=float, default=0.7,
                   help="EDM sigma-sampling log-mean (reference hardcodes "
                        "0.7 at train_svd.py:1014; exposed because branch-"
                        "only finetunes may want a high-sigma bias — box "
                        "conditioning only disambiguates where the noisy "
                        "latents don't)")
    p.add_argument("--p_std", type=float, default=1.6,
                   help="EDM sigma-sampling log-std (train_svd.py:1014)")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--mixed_precision", choices=["no", "bf16"], default="bf16")
    p.add_argument("--grad_dtype", choices=["fp32", "bf16"], default="fp32",
                   help="gradient STORAGE dtype (backward math is bf16 under "
                        "mixed precision either way); bf16 halves the "
                        "transient grad tree — required for single-chip "
                        "full-UNet finetuning at full size (core/config.py)")
    p.add_argument("--seed", type=int, default=123)
    # checkpointing / validation / logging
    p.add_argument("--output_dir", default="./outputs/svd-finetune")
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=2)
    p.add_argument("--resume_from_checkpoint", default="",
                   help="path or 'latest'")
    p.add_argument("--validation_steps", type=int, default=500)
    p.add_argument("--validation_image", default="",
                   help="conditioning image for validation videos")
    p.add_argument("--num_validation_images", type=int, default=1)
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--report_to", default="tensorboard",
                   help="tensorboard|wandb|comet_ml|all (train_svd.py:508-516; "
                        "each used when importable)")
    p.add_argument("--push_to_hub", action="store_true",
                   help="upload final model to the HF hub (needs network)")
    p.add_argument("--hub_model_id", default="")
    # model init
    p.add_argument("--pretrained_model_path", default="",
                   help="dir with diffusers-format unet/vae/clip safetensors")
    p.add_argument("--pretrain_unet", default="",
                   help="alternative UNet init dir (reference --pretrain_unet)")
    p.add_argument("--tiny_model", action="store_true",
                   help="debug: use the tiny test configs")
    p.add_argument("--attn_impl", choices=["auto", "flash", "xla"], default="auto")
    # mesh
    p.add_argument("--mesh_data", type=int, default=-1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--remat", choices=["none", "block", "outer"],
                   default="block")
    return p.parse_args(argv)


def build_train_config(args) -> TrainConfig:
    return TrainConfig(
        base_folder=args.base_folder, width=args.width, height=args.height,
        num_frames=args.num_frames, per_device_batch_size=args.per_device_batch_size,
        num_workers=args.num_workers, learning_rate=args.learning_rate,
        scale_lr=args.scale_lr, lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps, max_train_steps=args.max_train_steps,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        adam_beta1=args.adam_beta1, adam_beta2=args.adam_beta2,
        adam_weight_decay=args.adam_weight_decay, adam_epsilon=args.adam_epsilon,
        max_grad_norm=args.max_grad_norm, use_8bit_adam=args.use_8bit_adam,
        zero1=args.zero1, grad_dtype=args.grad_dtype,
        host_offload=args.host_offload,
        p_mean=args.p_mean, p_std=args.p_std,
        conditioning_dropout_prob=args.conditioning_dropout_prob,
        train_mode=args.train_mode, lora_rank=args.rank, lora_alpha=args.rank,
        # 'tracklet' trains the branch alone (frozen backbone); 'full' may
        # ALSO carry the branch (--tracklet_dim > 0 explicitly) so box
        # conditioning can be learned jointly with the backbone — the
        # scripts/eval_tracklet.py overfit protocol uses this
        tracklet_dim=(args.tracklet_dim
                      if args.train_mode == "tracklet"
                      else (args.tracklet_dim
                            if args.train_mode == "full"
                            and args.tracklet_dim_full else 0)),
        tracklet_gate_init=args.tracklet_gate_init,
        max_boxes=args.max_boxes,
        use_ema=args.use_ema, mixed_precision=args.mixed_precision,
        output_dir=args.output_dir, checkpointing_steps=args.checkpointing_steps,
        checkpoints_total_limit=args.checkpoints_total_limit,
        resume_from_checkpoint=args.resume_from_checkpoint,
        validation_steps=args.validation_steps, seed=args.seed,
        report_to=args.report_to, remat_policy=args.remat,
        mesh=MeshConfig(data=args.mesh_data, model=args.mesh_model),
    )


def load_or_init_params(models: SVDModels, args, rng):
    """Pretrained diffusers-format weights if given, else random init."""
    params = init_pipeline_params(models, rng)
    if args.pretrained_model_path:
        from ..io import convert
        params = convert.load_diffusers_checkpoint(
            args.pretrained_model_path, params,
            clip_patch_size=models.clip_config.patch_size)
    if getattr(args, "pretrain_unet", ""):
        # reference --pretrain_unet (train_svd.py:553-558): start the UNet
        # from a different finetune than the rest of the pipeline
        from ..io import convert
        unet_sd = convert.load_component_state(
            args.pretrain_unet, "diffusion_pytorch_model.safetensors")
        params["unet"] = convert.diffusers_to_flax(unet_sd, params["unet"])
    return params


def _synthetic_validation_image(height: int, width: int) -> jnp.ndarray:
    """Deterministic (1, H, W, 3) conditioning image in [-1, 1]: a smooth
    two-axis gradient with a bright disc off-center — enough structure for
    CLIP conditioning and for eyeballing motion in the sampled video."""
    y = np.linspace(-1.0, 1.0, height, dtype=np.float32)[:, None]
    x = np.linspace(-1.0, 1.0, width, dtype=np.float32)[None, :]
    r = np.sqrt((x - 0.3) ** 2 + (y + 0.2) ** 2)
    disc = np.clip(1.0 - r / 0.35, 0.0, 1.0)
    img = np.stack([0.5 * x + 0.9 * disc,
                    0.5 * y + 0.6 * disc,
                    0.25 * (x + y) + 0.3 * disc], axis=-1)
    return jnp.asarray(np.clip(img, -1.0, 1.0))[None]


def run_validation(models: SVDModels, params: dict, args, cfg: TrainConfig,
                   step: int, logger, writer=None) -> None:
    """Generate a video from the fixed validation image and save a GIF
    (reference train_svd.py:1092-1157), plus quantitative metrics the
    reference never computes (utils/eval.py: CLIP frame score, temporal
    consistency, pixel dynamics) into the metric writer."""
    if jax.process_index() != 0:
        return
    from PIL import Image
    if args.validation_image and os.path.exists(args.validation_image):
        img = Image.open(args.validation_image).convert("RGB").resize(
            (cfg.width, cfg.height), Image.Resampling.BICUBIC)
        image = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]
    else:
        # The reference ALWAYS validates (bundled demo.jpg,
        # train_svd.py:1131); with no image supplied, synthesize a
        # deterministic conditioning image so a default run still produces a
        # visual signal every validation step.
        logger.info("no --validation_image; using synthetic fallback image")
        image = _synthetic_validation_image(cfg.height, cfg.width)
    pipe_cfg = PipelineConfig(height=cfg.height, width=cfg.width,
                              num_frames=cfg.num_frames,
                              num_inference_steps=args.num_inference_steps,
                              fps_offset=0)   # training convention: raw fps
    out_dir = os.path.join(cfg.output_dir, "validation_images")
    os.makedirs(out_dir, exist_ok=True)
    for i in range(max(1, args.num_validation_images)):
        video = generate(models, params, image,
                         jax.random.PRNGKey(step * 1000 + i), pipe_cfg)
        frames = [np.asarray((video[0, j] + 1) / 2)
                  for j in range(video.shape[1])]
        suffix = f"_{i}" if args.num_validation_images > 1 else ""
        export_to_gif(frames, os.path.join(out_dir, f"val_img_{step}{suffix}.gif"))
        if writer is not None and i == 0:
            from ..utils.eval import video_metrics
            m = video_metrics(models, params, video, image)
            writer.write(step, {f"val/{k}": float(v) for k, v in m.items()})
    logger.info("validation GIF(s) saved at step %d", step)


def main(argv=None):
    args = parse_args(argv)
    cfg = build_train_config(args)
    logger = get_logger()

    # preemption handling (SURVEY.md §5: reference has none): flag on SIGTERM,
    # checkpoint at the next step boundary. Registered first so a signal
    # during model init/compile is not fatal.
    import signal
    preempted = {"flag": False}
    signal.signal(signal.SIGTERM, lambda *_: preempted.__setitem__("flag", True))

    if jax.process_count() > 1:  # pragma: no cover — multi-host entry
        jax.distributed.initialize()

    mesh = create_mesh(cfg.mesh)
    logger.info("mesh: %s over %d devices", dict(mesh.shape), mesh.size)

    dtype = jnp.bfloat16 if cfg.mixed_precision == "bf16" else jnp.float32
    if args.tiny_model:
        from ..core.config import TINY_CLIP, TINY_UNET, TINY_VAE
        models = SVDModels(unet_config=TINY_UNET, vae_config=TINY_VAE,
                           clip_config=TINY_CLIP, dtype=dtype,
                           attn_impl=args.attn_impl)
    else:
        models = SVDModels(dtype=dtype, attn_impl=args.attn_impl)
    if cfg.tracklet_dim > 0:
        models = models.with_tracklet(cfg.tracklet_dim,
                                      gate_init=cfg.tracklet_gate_init)

    rng = jax.random.PRNGKey(cfg.seed)
    params = load_or_init_params(models, args, rng)
    frozen = {"vae": params["vae"], "clip": params["clip"]}

    optimizer = make_optimizer(cfg, num_processes=jax.process_count())
    schedule = training_schedule(cfg, num_processes=jax.process_count())
    state = create_train_state(cfg, params["unet"], optimizer,
                               lora_rng=jax.random.fold_in(rng, 1))

    # param audit (reference params_freeze.txt/params_train.txt)
    if jax.process_index() == 0 and cfg.train_mode in ("full", "temporal",
                                                       "tracklet"):
        mask = trainable_mask(params["unet"], cfg.train_mode)
        frozen_names, train_names = param_audit(params["unet"], mask)
        os.makedirs(cfg.output_dir, exist_ok=True)
        with open(os.path.join(cfg.output_dir, "params_freeze.txt"), "w") as f:
            f.write("\n".join(frozen_names))
        with open(os.path.join(cfg.output_dir, "params_train.txt"), "w") as f:
            f.write("\n".join(train_names))

    if models.dtype != jnp.float32:
        # bf16 storage for all frozen trees (before restore, so checkpoint
        # save/restore round-trips the same structure) + drop the fp32 init
        # tree: together worth ~4-9 GB of HBM at full size — see
        # cast_frozen_to_compute and PERF.md "Training throughput"
        state, frozen = cast_frozen_to_compute(state, frozen, models.dtype)
        del params      # trainable leaves live in state; towers in frozen
        import gc
        gc.collect()

    manager = ckpt_lib.CheckpointManager(cfg.output_dir,
                                         cfg.checkpoints_total_limit)
    data_step = 0
    if cfg.resume_from_checkpoint:
        abstract = jax.eval_shape(lambda s: s, state)
        state, _, data_state = manager.restore(cfg.resume_from_checkpoint, abstract)
        data_step = int(data_state.get("step", int(state.step)))
        logger.info("resumed at step %d", int(state.step))

    step_fn, place_state, place_batch = make_sharded_train_step(
        models, cfg, optimizer, frozen, mesh)

    dataset = FrameFolderDataset(
        cfg.base_folder, cfg.width, cfg.height, cfg.num_frames,
        max_boxes=cfg.max_boxes if cfg.tracklet_dim > 0 else 0)
    accum = cfg.gradient_accumulation_steps
    local_bs = cfg.per_device_batch_size * max(
        1, mesh.shape["data"] // jax.process_count()) * accum
    loader = ShardedLoader(dataset, local_bs, seed=cfg.seed, start_step=data_step,
                           num_workers=cfg.num_workers,
                           process_index=jax.process_index(),
                           process_count=jax.process_count())
    writer = MetricWriter(os.path.join(cfg.output_dir, "logs"),
                          report_to=cfg.report_to)

    with mesh:
        state = place_state(state)
        start = int(state.step)
        t_last = time.perf_counter()
        last_logged = start
        for step in range(start, cfg.max_train_steps):
            if preempted["flag"]:
                manager.save(step, state, cfg, loader.state(),
                             blocking=True)
                logger.warning("preemption signal: checkpoint saved at step %d",
                               step)
                break
            batch = next(loader)
            if accum > 1:
                batch = jax.tree.map(
                    lambda x: x.reshape(accum, local_bs // accum,
                                        *x.shape[1:]), batch)
            state, metrics = step_fn(state, place_batch(batch), rng)

            if (step + 1) % 10 == 0 or step == start:
                loss = float(metrics["loss"])
                now = time.perf_counter()
                # actual steps since the last log (the first post-resume
                # window can be <10 steps — a constant 10 inflates steps/sec)
                sps = (step + 1 - last_logged) / (now - t_last)
                last_logged = step + 1
                t_last = now
                writer.write(step + 1, {"train_loss": loss,
                                        "grad_norm": float(metrics["grad_norm"]),
                                        "lr": float(schedule(step)),
                                        "steps_per_sec": sps})
                logger.info("step %d loss %.4f (%.2f steps/s)",
                            step + 1, loss, sps)

            if (step + 1) % cfg.checkpointing_steps == 0:
                manager.save(step + 1, state, cfg,
                             loader.state())
                logger.info("checkpoint saved at step %d", step + 1)

            if (step + 1) % cfg.validation_steps == 0 or step == start:
                # vae/clip from `frozen` (the fp32 init tree is dropped
                # under bf16); generate computes in models.dtype either way
                eval_params = dict(frozen)
                eval_params["unet"] = (state.ema_params if state.ema_params
                                       is not None else unet_params_of(state, cfg))
                run_validation(models, eval_params, args, cfg, step + 1,
                               logger, writer=writer)

    # final export (reference train_svd.py:1166-1189)
    loader.close()
    manager.wait()                  # in-flight async checkpoint -> durable
    if jax.process_index() == 0:
        final_unet = (state.ema_params if state.ema_params is not None
                      else unet_params_of(state, cfg))
        # uniform-fp32 artifact: under bf16 the frozen partition is stored
        # bf16 (cast_frozen_to_compute) while trained leaves keep fp32
        # masters — upcasting is exact and keeps the diffusers checkpoint
        # single-dtype like the reference's save_pretrained
        final_unet = jax.tree.map(lambda x: x.astype(jnp.float32), final_unet)
        ckpt_lib.export_unet_diffusers(
            jax.device_get(final_unet), os.path.join(cfg.output_dir, "unet"),
            config_json=models.unet_config.to_json())
        if cfg.train_mode == "lora":
            ckpt_lib.export_lora_diffusers(jax.device_get(state.params),
                                           cfg.output_dir)
        if cfg.tracklet_dim > 0:
            # LoRA-like exchange artifact: just the trained box branch (the
            # diffusers export above excludes it — no torch counterpart);
            # written for ANY mode that carries the branch (tracklet, or
            # full + --tracklet_dim_full)
            from ..io import convert
            convert.save_safetensors(
                os.path.join(cfg.output_dir, "tracklet_weights.safetensors"),
                convert.tracklet_branch_to_flat(
                    jax.device_get(final_unet)))
        logger.info("final model exported to %s", cfg.output_dir)
        if args.push_to_hub:
            # reference uploads via huggingface_hub (train_svd.py:1182-1188)
            try:
                from huggingface_hub import HfApi
                api = HfApi()
                repo_id = args.hub_model_id or os.path.basename(cfg.output_dir)
                api.create_repo(repo_id, exist_ok=True)
                api.upload_folder(repo_id=repo_id, folder_path=cfg.output_dir)
                logger.info("pushed to hub: %s", repo_id)
            except Exception as e:  # zero-egress environments
                logger.warning("hub upload failed/skipped: %s", e)
    writer.close()


if __name__ == "__main__":
    main()
