#!/usr/bin/env bash
# The reference's published BDD100K training configuration (README.md:42-54
# in pixeli99/SVD_Xtend), mapped onto the svd_xtend_tpu CLI.
#
#   accelerate launch train_svd.py \
#     --pretrained_model_name_or_path=stabilityai/stable-video-diffusion-img2vid
#     --per_gpu_batch_size=1 --gradient_accumulation_steps=1 \
#     --max_train_steps=50000 --width=512 --height=320 \
#     --checkpointing_steps=1000 --checkpoints_total_limit=1 \
#     --learning_rate=1e-5 --lr_warmup_steps=0 --seed=123 \
#     --mixed_precision="fp16" --validation_steps=200
#
# Differences by design: one CLI covers full/temporal/LoRA scopes
# (--train_mode); fp16 -> bf16 (TPU norm, no grad scaler); multi-chip via
# --mesh_* instead of `accelerate launch`; resume is exact.

python -m svd_xtend_tpu.train.cli \
  --base_folder ./bdd100k/images/track/mini \
  --pretrained_model_path ./stable-video-diffusion-img2vid \
  --train_mode temporal \
  --per_device_batch_size 1 --gradient_accumulation_steps 1 \
  --max_train_steps 50000 --width 512 --height 320 --num_frames 14 \
  --checkpointing_steps 1000 --checkpoints_total_limit 1 \
  --learning_rate 1e-5 --lr_warmup_steps 0 --seed 123 \
  --mixed_precision bf16 --validation_steps 200 \
  --validation_image ./demo.jpg \
  --output_dir ./outputs/svd-bdd100k \
  --mesh_data -1 --mesh_model 1 \
  "$@"
# resume: add --resume_from_checkpoint latest
# LoRA:   --train_mode lora --rank 4 (targets to_q/to_k/to_v/to_out)
# full:   --train_mode full --use_ema
