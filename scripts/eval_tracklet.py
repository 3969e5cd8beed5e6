"""Does Tracklet2Video conditioning STEER generation? (r4 VERDICT task 5)

The reference README teases Tracklet2Video (README.md:57-70) without
shipping it; models/tracklet.py implements the branch and tests assert its
wiring (zero-gate init, gradient flow). This script closes the remaining
evidence gap: a tiny CPU overfit showing that the GENERATED VIDEO follows
the boxes it is conditioned on, quantitatively above a no-box baseline.

Protocol
  1. Synthesize videos of a bright square moving along distinct linear
     trajectories over a textured background; boxes.npz = the square's
     bbox per frame. Several TRAIN trajectories + held-out ones that share
     the same first frame as a train video (so only the boxes, not the
     conditioning image, disambiguate the motion).
  2. Overfit through the real CLI: --train_mode tracklet (branch-only
     training, backbone frozen).
  3. Generate from a first frame with (a) the TRUE boxes of a trajectory,
     (b) null boxes (all-zero mask — the branch's "no annotation" input),
     (c) WRONG boxes (a different trajectory). Score each frame's motion
     map (|frame - frame0|) by the fraction of motion energy inside the
     conditioning box ("inside fraction") and by IoU of the thresholded
     motion mask vs the box.
  4. Adherence = mean inside-fraction over frames. PASS if
     adherence(true) > adherence(null) and adherence(true) > adherence(wrong).

Usage:
  JAX_PLATFORMS=cpu python scripts/eval_tracklet.py \
      --steps 400 --out eval_tracklet_r5.json
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# FORCE CPU: the axon sitecustomize exports JAX_PLATFORMS=axon, so a
# setdefault would silently route this tiny-model experiment through the
# remote TPU relay (round-trip-bound AND contending with relay benchmarks)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

H = W = 32
SQ = 10           # square side in pixels
FRAMES = 4        # frames per training sample == generated frames


def _traj_boxes(kind: str) -> np.ndarray:
    """(FRAMES, 4) normalized xyxy along a named straight-line trajectory.

    EVERY lane starts at the image center, so every video shares the SAME
    first frame — the conditioning image carries zero information about the
    motion direction and the boxes are the only disambiguator for every
    training sample (maximizes the box-usage gradient; the r5 v1 design had
    only 2 of 4 train lanes ambiguous and the optimizer learned to suppress
    the obj-token attention instead)."""
    c0 = ((W - SQ) // 2, (H - SQ) // 2)
    lanes = {
        # center -> (x1, y1) of the square's top-left corner, in pixels
        "right": (c0, (W - SQ - 2, c0[1])),
        "left": (c0, (2, c0[1])),
        "down": (c0, (c0[0], H - SQ - 2)),
        "up": (c0, (c0[0], 2)),
        "diag": (c0, (W - SQ - 2, H - SQ - 2)),
        "antidiag": (c0, (2, 2)),
    }
    (x0, y0), (x1, y1) = lanes[kind]
    out = np.zeros((FRAMES, 4), np.float32)
    for f in range(FRAMES):
        a = f / (FRAMES - 1)
        x = x0 + a * (x1 - x0)
        y = y0 + a * (y1 - y0)
        out[f] = [x / W, y / H, (x + SQ) / W, (y + SQ) / H]
    return out


def _render(boxes: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """(FRAMES, H, W, 3) uint8: bright square on a fixed textured bg."""
    bg = rng.randint(0, 60, (H, W, 3), np.uint8)
    vid = np.zeros((FRAMES, H, W, 3), np.uint8)
    for f in range(FRAMES):
        img = bg.copy()
        x1, y1, x2, y2 = (boxes[f] * [W, H, W, H]).astype(int)
        img[y1:y2, x1:x2] = [250, 240, 60]
        vid[f] = img
    return vid


def build_dataset(root: str, train_kinds, seed=0):
    from PIL import Image
    rng = np.random.RandomState(seed)
    bg_rng_state = rng.get_state()
    for i, kind in enumerate(train_kinds):
        d = os.path.join(root, f"video_{kind}")
        os.makedirs(d, exist_ok=True)
        rng.set_state(bg_rng_state)        # SAME background for every video:
        boxes = _traj_boxes(kind)          # only the boxes tell motions apart
        vid = _render(boxes, rng)
        for f in range(FRAMES):
            Image.fromarray(vid[f]).save(os.path.join(d, f"{f:04d}.jpg"),
                                         quality=95)
        np.savez(os.path.join(d, "boxes.npz"), boxes=boxes[:, None, :])


def train(data_root: str, out_dir: str, steps: int, lr: float, dim: int,
          mode: str = "full", gate_init: float = 0.0, batch: int = 1,
          pretrain_unet: str = "", p_mean: float = 0.7, p_std: float = 1.6):
    from svd_xtend_tpu.train import cli
    argv = [
        "--p_mean", str(p_mean), "--p_std", str(p_std),
        "--tracklet_gate_init", str(gate_init),
        "--per_device_batch_size", str(batch),
        # no decoupled weight decay: with near-zero early gradient through
        # the gates, AdamW's decay is pure shrinkage pressure on the branch
        "--adam_weight_decay", "0.0",
        "--base_folder", data_root, "--tiny_model",
        "--width", str(W), "--height", str(H), "--num_frames", str(FRAMES),
        "--train_mode", mode, "--tracklet_dim", str(dim),
        "--max_boxes", "1", "--learning_rate", str(lr),
        "--lr_scheduler", "constant", "--lr_warmup_steps", "0",
        "--output_dir", out_dir, "--checkpointing_steps", str(steps),
        "--validation_steps", str(steps * 2), "--num_inference_steps", "2",
        "--mixed_precision", "no", "--remat", "none", "--num_workers", "2",
        "--seed", "7", "--max_train_steps", str(steps),
        "--conditioning_dropout_prob", "0.0",
    ]
    if mode == "full":
        # joint backbone+branch overfit: the capability claim is "the model
        # can USE box conditioning", and the train lanes sharing one first
        # frame are only separable through the boxes
        argv.append("--tracklet_dim_full")
    if pretrain_unet:
        argv += ["--pretrain_unet", pretrain_unet]
    cli.main(argv)


def load_models_and_params(out_dir: str, dim: int):
    from svd_xtend_tpu.core.config import TINY_CLIP, TINY_UNET, TINY_VAE
    from svd_xtend_tpu.diffusion.pipeline import SVDModels, init_pipeline_params
    from svd_xtend_tpu.io import convert
    models = SVDModels(unet_config=TINY_UNET, vae_config=TINY_VAE,
                       clip_config=TINY_CLIP,
                       dtype=jnp.float32).with_tracklet(dim)
    params = init_pipeline_params(models, jax.random.PRNGKey(0))
    unet_sd = convert.load_component_state(
        os.path.join(out_dir, "unet"), "diffusion_pytorch_model.safetensors")
    params["unet"] = convert.diffusers_to_flax(unet_sd, params["unet"])
    flat = convert.load_safetensors(
        os.path.join(out_dir, "tracklet_weights.safetensors"))
    params["unet"] = convert.tracklet_branch_into_tree(flat, params["unet"])
    gates = {k: float(v) for k, v in flat.items()
             if "alpha_" in k and v.size == 1}
    if gates:
        mags = [abs(g) for g in gates.values()]
        print(f"gate alphas: n={len(mags)} max|a|={max(mags):.4f} "
              f"mean|a|={float(np.mean(mags)):.4f}", flush=True)
    return models, params


def adherence(video: np.ndarray, boxes: np.ndarray):
    """Mean inside-fraction + IoU of per-frame motion vs the box (f >= 1)."""
    v = (video[0] + 1.0) / 2.0                       # (F, H, W, 3) in [0,1]
    motion = np.abs(v[1:] - v[:1]).mean(-1)          # (F-1, H, W)
    ins, ious = [], []
    for f in range(1, FRAMES):
        m = motion[f - 1]
        x1, y1, x2, y2 = (boxes[f] * [W, H, W, H]).astype(int)
        rect = np.zeros((H, W), bool)
        rect[y1:y2, x1:x2] = True
        tot = float(m.sum()) + 1e-8
        ins.append(float(m[rect].sum()) / tot)
        thr = m.mean() + m.std()
        mask = m > thr
        inter = float((mask & rect).sum())
        union = float((mask | rect).sum()) + 1e-8
        ious.append(inter / union)
    return float(np.mean(ins)), float(np.mean(ious))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--mode", default="full", choices=["full", "tracklet"],
                    help="'full' = joint backbone+branch overfit (default); "
                         "'tracklet' = branch-only on the frozen backbone")
    ap.add_argument("--gate_init", type=float, default=0.5,
                    help="warm GLIGEN gate init for the joint from-scratch "
                         "overfit (0.0 = the pretrained-backbone contract; "
                         "measured r5: zero gates on a RANDOM tiny backbone "
                         "collapse into ignoring the box tokens — the "
                         "optimizer suppresses obj attention before the "
                         "gates open)")
    ap.add_argument("--infer_steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=2,
                    help="training batch size (SGD-noise lever: the box-"
                         "usage gradient is 4th-decimal at init and drowns "
                         "in the EDM sigma-sampling variance at bs=1)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse an existing --workdir run (eval iteration)")
    ap.add_argument("--two_phase", action="store_true",
                    help="phase 1: overfit the BACKBONE without the branch "
                         "(it converges to the ambiguous-average motion); "
                         "phase 2: freeze it (tracklet scope) and train the "
                         "warm-gated branch from --pretrain_unet. This is "
                         "the GLIGEN setting (pretrained backbone) — joint "
                         "from-scratch training measurably suppresses the "
                         "obj attention instead (r5 refutation ladder)")
    ap.add_argument("--steps1", type=int, default=6000,
                    help="phase-1 backbone steps (--two_phase)")
    ap.add_argument("--p2_mean", type=float, default=0.7,
                    help="phase-2 EDM sigma log-mean. The box-usage loss "
                         "signal lives at HIGH sigma: at low/mid sigma the "
                         "noisy latents already identify the lane and the "
                         "optimizer suppresses obj-token attention instead "
                         "(measured: warm gates stay open but the output is "
                         "box-value-independent). E.g. 1.8 with --p2_std "
                         "0.8 concentrates phase-2 training where only the "
                         "boxes disambiguate")
    ap.add_argument("--p2_std", type=float, default=1.6,
                    help="phase-2 EDM sigma log-std")
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="tracklet_eval_")
    data_root = os.path.join(work, "data")
    run_dir = os.path.join(work, "run")
    os.makedirs(data_root, exist_ok=True)

    # all six lanes share one background AND one first frame (center start);
    # the four TRAIN lanes cover the axis directions, the two diagonal
    # lanes are held out
    train_kinds = ["right", "left", "down", "up"]
    held_out = ["diag", "antidiag"]
    build_dataset(data_root, train_kinds)

    if not (args.skip_train
            and os.path.exists(os.path.join(run_dir,
                                            "tracklet_weights.safetensors"))):
        if args.two_phase:
            base_dir = os.path.join(work, "base")
            if not (args.skip_train
                    and os.path.exists(os.path.join(base_dir, "unet"))):
                print(f"phase 1: {args.steps1} backbone-only steps...",
                      flush=True)
                # plain 'full' mode WITHOUT the branch (no box conditioning)
                from svd_xtend_tpu.train import cli
                cli.main([
                    "--base_folder", data_root, "--tiny_model",
                    "--width", str(W), "--height", str(H),
                    "--num_frames", str(FRAMES), "--train_mode", "full",
                    "--per_device_batch_size", str(args.batch),
                    "--adam_weight_decay", "0.0",
                    "--max_boxes", "1",
                    "--learning_rate", str(args.lr),
                    "--lr_scheduler", "constant", "--lr_warmup_steps", "0",
                    "--output_dir", base_dir,
                    "--checkpointing_steps", str(args.steps1),
                    "--validation_steps", str(args.steps1 * 2),
                    "--num_inference_steps", "2", "--mixed_precision", "no",
                    "--remat", "none", "--num_workers", "2", "--seed", "7",
                    "--max_train_steps", str(args.steps1),
                    "--conditioning_dropout_prob", "0.0",
                ])
            print(f"phase 2: {args.steps} branch-only steps on the frozen "
                  f"phase-1 backbone...", flush=True)
            train(data_root, run_dir, args.steps, args.lr, args.dim,
                  "tracklet", args.gate_init, args.batch,
                  pretrain_unet=os.path.join(base_dir, "unet"),
                  p_mean=args.p2_mean, p_std=args.p2_std)
        else:
            print(f"training {args.steps} steps (tiny model, CPU, mode="
                  f"{args.mode})...", flush=True)
            train(data_root, run_dir, args.steps, args.lr, args.dim,
                  args.mode, args.gate_init, args.batch)

    models, params = load_models_and_params(run_dir, args.dim)
    from svd_xtend_tpu.core.config import PipelineConfig
    from svd_xtend_tpu.diffusion.pipeline import generate

    cfg = PipelineConfig(height=H, width=W, num_frames=FRAMES,
                         num_inference_steps=args.infer_steps,
                         decode_chunk_size=2, noise_aug_strength=0.0,
                         min_guidance_scale=1.0, max_guidance_scale=1.0)
    rng = np.random.RandomState(0)

    results = {}
    for kind in train_kinds + held_out:
        boxes = _traj_boxes(kind)
        rng_img = np.random.RandomState(0)
        first = _render(boxes, rng_img)[0]
        image = jnp.asarray(first, jnp.float32)[None] / 127.5 - 1.0
        btrue = jnp.asarray(boxes)[None, :, None, :]          # (1,F,1,4)
        mask1 = jnp.ones((1, FRAMES, 1), jnp.float32)
        # wrong boxes: a max-distance other lane
        wrong_kind = {"right": "left", "left": "right",
                      "down": "up", "up": "down",
                      "diag": "antidiag", "antidiag": "diag"}[kind]
        bwrong = jnp.asarray(_traj_boxes(wrong_kind))[None, :, None, :]

        key = jax.random.PRNGKey(11)
        v_true = np.asarray(generate(models, params, image, key, cfg,
                                     boxes=btrue, box_mask=mask1))
        v_null = np.asarray(generate(models, params, image, key, cfg,
                                     boxes=jnp.zeros_like(btrue),
                                     box_mask=jnp.zeros_like(mask1)))
        v_wrong = np.asarray(generate(models, params, image, key, cfg,
                                      boxes=bwrong, box_mask=mask1))
        row = {}
        for name, v, b in (("true", v_true, boxes),
                           ("null", v_null, boxes),
                           ("wrong", v_wrong, boxes)):
            ins, iou = adherence(v, b)
            row[name] = {"inside_frac": round(ins, 4), "iou": round(iou, 4)}
        # does the wrong-box video follow the WRONG boxes instead?
        ins_w, iou_w = adherence(v_wrong, _traj_boxes(wrong_kind))
        row["wrong_vs_its_own_boxes"] = {"inside_frac": round(ins_w, 4),
                                         "iou": round(iou_w, 4)}
        row["held_out"] = kind in held_out
        results[kind] = row
        print(f"{kind:10s} held_out={kind in held_out} "
              f"true={row['true']} null={row['null']} wrong={row['wrong']}",
              flush=True)

    # ---- denoiser-level steering probe (sharper than the sampled video):
    # noise the 'right' lane's latents at a mid sigma, denoise once with
    # each lane's boxes, and ask which lane's CLEAN latents the prediction
    # moved toward. A steering model pulls toward the conditioned lane.
    from svd_xtend_tpu.core import edm
    from svd_xtend_tpu.diffusion.training import encode_batch
    from svd_xtend_tpu.core.config import TrainConfig
    from svd_xtend_tpu.diffusion.training import training_loss  # noqa: F401
    tcfg = TrainConfig(train_mode=args.mode, tracklet_dim=args.dim,
                       max_boxes=1, conditioning_dropout_prob=0.0)
    lanes = ("right", "left") if "right" in results else tuple(results)[:2]
    vids = {k: jnp.asarray(_render(_traj_boxes(k), np.random.RandomState(0))
                           .astype(np.float32)[None] / 127.5 - 1.0)
            for k in lanes}
    enc = {k: encode_batch(models, params, vids[k], jax.random.PRNGKey(9),
                           tcfg) for k in lanes}
    unet = models.unet()
    denoise_probe = {}
    # probe at a mid sigma AND a high one: box conditioning can only matter
    # where the noisy latents don't already identify the lane (high sigma)
    for s in (2.0, 8.0):
        sigma = jnp.asarray([s])
        sig_b = sigma.reshape(1, 1, 1, 1, 1)
        for src in lanes:
            e = enc[src]
            noise = jax.random.normal(jax.random.PRNGKey(10), e.latents.shape)
            noisy = e.latents + noise * sig_b
            model_in = edm.precondition_inputs(noisy, sig_b)
            cond = jnp.broadcast_to(e.cond_latents[:, None],
                                    e.latents.shape[:4]
                                    + (e.cond_latents.shape[-1],))
            model_in = jnp.concatenate([model_in, cond], axis=-1)
            from svd_xtend_tpu.diffusion.pipeline import get_add_time_ids
            add_ids = get_add_time_ids(7.0, 127.0, e.noise_aug, 1)
            row = {}
            for cond_lane in lanes:
                bxp = jnp.asarray(_traj_boxes(cond_lane))[None, :, None, :]
                pred = unet.apply({"params": params["unet"]},
                                  model_in.astype(models.dtype),
                                  edm.sigma_to_t(sigma),
                                  e.image_embeds.astype(models.dtype), add_ids,
                                  bxp, jnp.ones((1, FRAMES, 1), jnp.float32))
                den = edm.denoise(pred.astype(jnp.float32), noisy, sig_b)
                row[cond_lane] = {
                    k2: round(float(jnp.mean((den - enc[k2].latents) ** 2)), 5)
                    for k2 in lanes}
            denoise_probe[f"noisy_{src}@s{s:g}"] = row
        # margin > 0 == conditioning pulls the prediction toward its own lane
        m = 0.0
        for src in lanes:
            row = denoise_probe[f"noisy_{src}@s{s:g}"]
            for cl in lanes:
                other = [k2 for k2 in lanes if k2 != cl][0]
                m += row[cl][other] - row[cl][cl]
        denoise_probe[f"steer_margin@s{s:g}"] = round(m / (len(lanes) ** 2), 6)
    denoise_probe["steer_margin"] = denoise_probe[f"steer_margin@s8"]

    def _mean(sel, key_):
        vals = [r[sel]["inside_frac"] for r in results.values()
                if r["held_out"] == key_]
        return round(float(np.mean(vals)), 4)

    summary = {
        "steps": args.steps, "lr": args.lr, "dim": args.dim,
        "mode": args.mode, "gate_init": args.gate_init, "batch": args.batch,
        "denoiser_probe": denoise_probe,
        "train_inside_frac": {s: _mean(s, False)
                              for s in ("true", "null", "wrong")},
        "held_out_inside_frac": {s: _mean(s, True)
                                 for s in ("true", "null", "wrong")},
    }
    summary["steers_train"] = (summary["train_inside_frac"]["true"]
                               > max(summary["train_inside_frac"]["null"],
                                     summary["train_inside_frac"]["wrong"]))
    summary["steers_held_out"] = (summary["held_out_inside_frac"]["true"]
                                  > max(summary["held_out_inside_frac"]["null"],
                                        summary["held_out_inside_frac"]["wrong"]))
    out = {"summary": summary, "per_trajectory": results}
    print(json.dumps(summary, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    if not args.workdir:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
