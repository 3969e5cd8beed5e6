"""img2vid inference example — the infer_svd.ipynb equivalent.

Behavior contract (reference infer_svd.ipynb cells 0-2): load a finetuned
UNet into the SVD pipeline, generate 14 frames at 1024x576 with 30 steps,
decode_chunk_size=8, motion_bucket_id=127, fps=8, export mp4 at fps 7.

Usage:
  python examples/infer_svd.py --image demo.jpg --model_path ./svd-checkpoint \
      [--unet_path ./outputs/unet] [--width 1024 --height 576] \
      [--num_frames 14 --steps 30] [--lora_path ./outputs] [--out generated.mp4]

Tracklet2Video: pass --boxes '[[x1,y1,x2,y2],...]' (per-frame static boxes)
with a tracklet-enabled UNet config.
"""

import argparse
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--model_path", default="",
                   help="diffusers-format pipeline dir (unet/vae/image_encoder)")
    p.add_argument("--unet_path", default="", help="override UNet weights dir")
    p.add_argument("--lora_path", default="", help="pytorch_lora_weights dir")
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--motion_bucket_id", type=int, default=127)
    p.add_argument("--noise_aug_strength", type=float, default=0.02)
    p.add_argument("--decode_chunk_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=111)
    p.add_argument("--out", default="generated.mp4")
    p.add_argument("--boxes", default="", help="JSON [[x1,y1,x2,y2],...] in [0,1]")
    p.add_argument("--tracklet_path", default="",
                   help="dir with tracklet_weights.safetensors "
                        "(cli --train_mode tracklet output)")
    p.add_argument("--tracklet_dim", type=int, default=1024,
                   help="box-token width the branch was trained with")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from svd_xtend_tpu.core.config import PipelineConfig
    from svd_xtend_tpu.diffusion.pipeline import (SVDModels, generate,
                                                  init_pipeline_params)
    from svd_xtend_tpu.io import convert
    from svd_xtend_tpu.io.media import export_to_gif, export_to_video

    models = SVDModels()
    if args.tracklet_path or args.boxes:
        models = models.with_tracklet(args.tracklet_dim)
    params = init_pipeline_params(models, jax.random.PRNGKey(0))
    if args.model_path:
        params = convert.load_diffusers_checkpoint(
            args.model_path, params,
            clip_patch_size=models.clip_config.patch_size)
    if args.unet_path:
        params["unet"] = convert.diffusers_to_flax(
            convert.load_component_state(
                args.unet_path, "diffusion_pytorch_model.safetensors"),
            params["unet"])
    if args.tracklet_path:
        params["unet"] = convert.tracklet_branch_into_tree(
            convert.load_safetensors(os.path.join(
                args.tracklet_path, "tracklet_weights.safetensors")),
            params["unet"])
    if args.lora_path:
        from svd_xtend_tpu.models import lora as lora_lib
        template = lora_lib.init(jax.random.PRNGKey(0), params["unet"])
        tree = convert.lora_diffusers_to_flax(convert.load_safetensors(
            os.path.join(args.lora_path, "pytorch_lora_weights.safetensors")),
            template)
        params["unet"] = lora_lib.merge(params["unet"], tree)

    img = Image.open(args.image).convert("RGB").resize(
        (args.width, args.height), Image.Resampling.BICUBIC)
    image = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]

    cfg = PipelineConfig(
        height=args.height, width=args.width, num_frames=args.num_frames,
        num_inference_steps=args.steps, fps=args.fps,
        motion_bucket_id=args.motion_bucket_id,
        noise_aug_strength=args.noise_aug_strength,
        decode_chunk_size=args.decode_chunk_size)

    boxes = mask = None
    if args.boxes:
        raw = np.asarray(json.loads(args.boxes), np.float32)  # (N, 4)
        boxes = jnp.broadcast_to(raw[None, None],
                                 (1, args.num_frames, *raw.shape))
        mask = jnp.ones(boxes.shape[:3], jnp.float32)

    video = generate(models, params, image, jax.random.PRNGKey(args.seed),
                     cfg, boxes, mask)
    frames = [np.asarray((video[0, i] + 1) / 2) for i in range(args.num_frames)]
    export_to_video(frames, args.out, fps=7)
    export_to_gif(frames, args.out.replace(".mp4", ".gif"))
    print(f"wrote {args.out} ({args.num_frames} frames, "
          f"{args.width}x{args.height})")


if __name__ == "__main__":
    main()
