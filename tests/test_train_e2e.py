"""End-to-end training smoke tests (SURVEY.md §4 implication list):
tiny-model train runs, loss is finite, checkpoint round-trips, resume
reproduces, LoRA exports. Runs the real CLI main()."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from svd_xtend_tpu.data.dataset import FrameFolderDataset, ShardedLoader


@pytest.fixture(scope="module")
def frame_folder(tmp_path_factory):
    """3 synthetic 'videos' x 6 frames of 64x64 jpegs."""
    root = tmp_path_factory.mktemp("frames")
    rng = np.random.RandomState(0)
    for v in range(3):
        d = root / f"video{v}"
        d.mkdir()
        base = rng.randint(0, 255, (64, 64, 3), np.uint8)
        for f in range(6):
            arr = np.clip(base.astype(int) + f * 10, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{f:04d}.jpg")
    return str(root)


def test_dataset_contract(frame_folder):
    ds = FrameFolderDataset(frame_folder, width=32, height=24, sample_frames=4)
    assert len(ds) == 100_000
    x = ds.get(seed=0, step=0, position=0)
    assert x.shape == (4, 24, 32, 3)
    assert -1.0 <= x.min() and x.max() <= 1.0
    # determinism: same (seed, step, pos) -> same sample
    np.testing.assert_array_equal(x, ds.get(0, 0, 0))
    # different step -> (almost surely) different window
    specs = {ds.sample_spec(0, s, 0) for s in range(20)}
    assert len(specs) > 1


def test_dataset_too_few_frames(frame_folder):
    with pytest.raises(ValueError, match="fewer|<"):
        FrameFolderDataset(frame_folder, sample_frames=10)


def test_loader_exact_resume(frame_folder):
    ds = FrameFolderDataset(frame_folder, width=16, height=16, sample_frames=2)
    l1 = ShardedLoader(ds, local_batch_size=2, seed=5, num_workers=2)
    b0, b1, b2 = next(l1), next(l1), next(l1)
    state = l1.state()
    l1.close()
    # new loader from checkpointed state must continue with the same data
    l2 = ShardedLoader(ds, local_batch_size=2, seed=state["seed"],
                       start_step=state["step"], num_workers=2)
    b3 = next(l2)
    l2.close()
    l3 = ShardedLoader(ds, local_batch_size=2, seed=5, start_step=3,
                       num_workers=2)
    np.testing.assert_array_equal(b3, next(l3))
    l3.close()


def test_cli_train_checkpoint_resume(frame_folder, tmp_path):
    """Run the real CLI twice: 4 steps + checkpoint, then resume to 6."""
    from svd_xtend_tpu.train import cli

    out = str(tmp_path / "run")
    common = [
        "--base_folder", frame_folder, "--tiny_model",
        "--width", "32", "--height", "32", "--num_frames", "2",
        "--train_mode", "temporal", "--learning_rate", "1e-3",
        "--lr_scheduler", "constant", "--lr_warmup_steps", "0",
        "--output_dir", out, "--checkpointing_steps", "2",
        "--checkpoints_total_limit", "2", "--validation_steps", "100",
        "--mixed_precision", "no", "--remat", "none",
        "--num_workers", "2", "--seed", "7",
    ]
    cli.main(common + ["--max_train_steps", "4"])

    assert os.path.isdir(os.path.join(out, "checkpoint-4"))
    assert os.path.isdir(os.path.join(out, "checkpoint-2"))
    assert os.path.exists(os.path.join(out, "params_train.txt"))
    with open(os.path.join(out, "params_train.txt")) as f:
        assert "temporal_transformer_block" in f.read()
    # metrics written
    with open(os.path.join(out, "logs", "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert any(np.isfinite(l["train_loss"]) for l in lines)
    # final export in diffusers format
    assert os.path.exists(os.path.join(
        out, "unet", "diffusion_pytorch_model.safetensors"))

    # resume from 'latest' and continue to step 6
    cli.main(common + ["--max_train_steps", "6",
                       "--resume_from_checkpoint", "latest"])
    assert os.path.isdir(os.path.join(out, "checkpoint-6"))
    # rotation kept <= 2 checkpoints
    cks = [d for d in os.listdir(out) if d.startswith("checkpoint-")]
    assert len(cks) <= 2


def test_cli_train_bf16_frozen_storage(frame_folder, tmp_path):
    """--mixed_precision bf16 stores frozen trees at the compute dtype
    (state.cast_frozen_to_compute): train + checkpoint + resume + validation
    + export must round-trip with the bf16 frozen_unet partition, and the
    exported diffusers artifact must be uniform fp32."""
    from svd_xtend_tpu.train import cli

    out = str(tmp_path / "run_bf16")
    common = [
        "--base_folder", frame_folder, "--tiny_model",
        "--width", "32", "--height", "32", "--num_frames", "2",
        "--train_mode", "temporal", "--learning_rate", "1e-3",
        "--lr_scheduler", "constant", "--lr_warmup_steps", "0",
        "--output_dir", out, "--checkpointing_steps", "2",
        "--validation_steps", "100", "--mixed_precision", "bf16",
        "--remat", "none", "--num_workers", "2", "--seed", "7",
    ]
    cli.main(common + ["--max_train_steps", "2"])
    with open(os.path.join(out, "logs", "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert any(np.isfinite(l["train_loss"]) for l in lines)
    # resume restores into the bf16-frozen state structure
    cli.main(common + ["--max_train_steps", "4",
                       "--resume_from_checkpoint", "latest"])
    assert os.path.isdir(os.path.join(out, "checkpoint-4"))
    # exported artifact is uniform fp32 (frozen leaves upcast at export)
    from svd_xtend_tpu.io.convert import load_safetensors
    sd = load_safetensors(os.path.join(
        out, "unet", "diffusion_pytorch_model.safetensors"))
    assert all(np.asarray(v).dtype == np.float32 for v in sd.values())


def test_cli_lora_bf16_base(frame_folder, tmp_path):
    """LoRA under bf16: the 'base_unet' tree is stored bf16 while the
    adapters keep fp32 masters; training and export still work."""
    from svd_xtend_tpu.train import cli

    out = str(tmp_path / "lora_bf16")
    cli.main([
        "--base_folder", frame_folder, "--tiny_model",
        "--width", "32", "--height", "32", "--num_frames", "2",
        "--train_mode", "lora", "--rank", "2",
        "--learning_rate", "1e-3", "--lr_scheduler", "constant",
        "--output_dir", out, "--max_train_steps", "2",
        "--checkpointing_steps", "100", "--validation_steps", "100",
        "--mixed_precision", "bf16", "--remat", "none", "--num_workers", "2",
    ])
    assert os.path.exists(os.path.join(out, "pytorch_lora_weights.safetensors"))


def test_cli_lora_export(frame_folder, tmp_path):
    from svd_xtend_tpu.train import cli

    out = str(tmp_path / "lora_run")
    cli.main([
        "--base_folder", frame_folder, "--tiny_model",
        "--width", "32", "--height", "32", "--num_frames", "2",
        "--train_mode", "lora", "--rank", "2",
        "--learning_rate", "1e-3", "--lr_scheduler", "constant",
        "--output_dir", out, "--max_train_steps", "2",
        "--checkpointing_steps", "100", "--validation_steps", "100",
        "--mixed_precision", "no", "--remat", "none", "--num_workers", "2",
    ])
    assert os.path.exists(os.path.join(out, "pytorch_lora_weights.safetensors"))
    from svd_xtend_tpu.io.convert import load_safetensors
    sd = load_safetensors(os.path.join(out, "pytorch_lora_weights.safetensors"))
    assert any("lora_A" in k for k in sd)


def test_cli_full_8bit_adam_checkpoint_resume(frame_folder, tmp_path):
    """Full-FT with blockwise-int8 Adam moments (--use_8bit_adam): trains,
    checkpoints the quantized state through Orbax, and resumes."""
    from svd_xtend_tpu.train import cli

    out = str(tmp_path / "run8")
    common = [
        "--base_folder", frame_folder, "--tiny_model",
        "--width", "32", "--height", "32", "--num_frames", "2",
        "--train_mode", "full", "--use_8bit_adam",
        "--learning_rate", "1e-3", "--lr_scheduler", "constant",
        "--lr_warmup_steps", "0", "--output_dir", out,
        "--checkpointing_steps", "2", "--validation_steps", "100",
        "--mixed_precision", "no", "--remat", "none",
        "--num_workers", "2", "--seed", "7",
    ]
    cli.main(common + ["--max_train_steps", "2"])
    assert os.path.isdir(os.path.join(out, "checkpoint-2"))
    with open(os.path.join(out, "logs", "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert any(np.isfinite(l["train_loss"]) for l in lines)
    cli.main(common + ["--max_train_steps", "4",
                       "--resume_from_checkpoint", "latest"])
    assert os.path.isdir(os.path.join(out, "checkpoint-4"))


def test_cli_tracklet_train(frame_folder, tmp_path):
    """Tracklet2Video finetune through the real CLI: boxes.npz annotations,
    'tracklet' scope, dict batches end-to-end."""
    import os

    from svd_xtend_tpu.train import cli

    # annotate one of the synthetic videos
    vid_dir = os.path.join(frame_folder, "video0")
    t, n = 6, 2
    boxes = np.zeros((t, n, 4), np.float32)
    boxes[:, 0] = [0.1, 0.1, 0.6, 0.6]
    np.savez(os.path.join(vid_dir, "boxes.npz"), boxes=boxes)
    try:
        out = str(tmp_path / "run_tracklet")
        val_img = os.path.join(frame_folder, "video0", "0000.jpg")
        cli.main([
            "--base_folder", frame_folder, "--tiny_model",
            "--width", "32", "--height", "32", "--num_frames", "2",
            "--train_mode", "tracklet", "--tracklet_dim", "32",
            "--max_boxes", "3", "--learning_rate", "1e-3",
            "--lr_scheduler", "constant", "--lr_warmup_steps", "0",
            "--output_dir", out, "--checkpointing_steps", "100",
            "--validation_steps", "100", "--validation_image", val_img,
            "--num_inference_steps", "2", "--mixed_precision", "no",
            "--remat", "none", "--num_workers", "2", "--seed", "7",
            "--max_train_steps", "2",
        ])
        train_names = open(os.path.join(out, "params_train.txt")).read()
        assert "tracklet_conditioner" in train_names
        assert "gated_attentions" in train_names
        frozen_names = open(os.path.join(out, "params_freeze.txt")).read()
        assert "temporal_transformer_block" in frozen_names
        # final exports: the full UNet must NOT be empty (unet_params_of
        # must recombine frozen+trainable for this mode) and the branch
        # artifact must round-trip
        from svd_xtend_tpu.io import convert
        sd = convert.load_safetensors(os.path.join(
            out, "unet", "diffusion_pytorch_model.safetensors"))
        assert len(sd) > 50 and any("conv_in" in k for k in sd)
        tw = convert.load_safetensors(os.path.join(
            out, "tracklet_weights.safetensors"))
        assert tw and all("tracklet_conditioner" in k
                          or "gated_attentions" in k for k in tw)
    finally:
        os.remove(os.path.join(vid_dir, "boxes.npz"))
