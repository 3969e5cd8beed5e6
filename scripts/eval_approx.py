"""Quality-vs-speed curves for the approximate inference modes.

The fast numbers in bench.py's `detail` (CFG-cache k=2/3, int8 W8A8) were
previously speed-only; this script attaches an error budget to each by
comparing every mode's output against the EXACT pipeline output generated
from the same seed and weights (r2 VERDICT weak #5; validation contract of
the reference at train_svd.py:1092-1157):

  - PSNR(approx, exact) over the [-1, 1] video (pixel drift),
  - CLIP drift: mean cosine between per-frame CLIP embeddings of approx and
    exact frames (semantic drift, computed with the pipeline's own frozen
    CLIP tower — no extra weights needed),
  - the standard utils/metrics.py report (clip_sim vs cond image, temporal
    consistency, flicker) for each mode side by side,
  - wall-clock s/video for the speed axis.

Weights are fixed-seed random (no pretrained checkpoint ships in this
zero-egress environment) — pixel/embedding DRIFT between two runs of the
same weights is still exact and is the quantity of interest here.

TWO-PHASE on TPU (r4): a fresh jit of the CLIP-metric graph over the axon
relay broke its remote-compile channel (multi-MB program + 14-frame ViT-H
batch; PERF.md "relay transport"), so the TPU leg only runs the already-
cached generate() graphs and SAVES the videos; metrics run on CPU from the
saved files. The videos are bit-identical either way — metrics are a pure
function of them.

Usage:
  python scripts/eval_approx.py --phase generate --videos /tmp/evap   # TPU
  JAX_PLATFORMS=cpu python scripts/eval_approx.py --phase metrics \
      --videos /tmp/evap --out eval_approx_r4.json                    # CPU
  JAX_PLATFORMS=cpu python scripts/eval_approx.py --smoke   # tiny, one shot
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def build(args):
    from svd_xtend_tpu.core.config import PipelineConfig
    from svd_xtend_tpu.diffusion.pipeline import SVDModels

    if args.smoke:
        from svd_xtend_tpu.core.config import TINY_CLIP, TINY_UNET, TINY_VAE
        models = SVDModels(unet_config=TINY_UNET, vae_config=TINY_VAE,
                           clip_config=TINY_CLIP, dtype=jnp.float32)
        base = PipelineConfig(height=32, width=32, num_frames=2,
                              num_inference_steps=3, decode_chunk_size=2)
    else:
        models = SVDModels(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
        base = PipelineConfig(height=args.height, width=args.width,
                              num_frames=args.frames,
                              num_inference_steps=args.steps,
                              decode_chunk_size=8)
    image = jax.random.uniform(jax.random.PRNGKey(1),
                               (1, base.height, base.width, 3)) * 2.0 - 1.0
    modes = [
        ("exact", base),
        ("cfg_cache_k2", dataclasses.replace(base, uncond_reuse_interval=2)),
        ("cfg_cache_k3", dataclasses.replace(base, uncond_reuse_interval=3)),
        ("int8", dataclasses.replace(base, unet_quant="int8",
                                     vae_quant="int8")),
        ("int8_cfg_k3", dataclasses.replace(base, unet_quant="int8",
                                            vae_quant="int8",
                                            uncond_reuse_interval=3)),
        # DeepCache modes (PipelineConfig.deep_cache_interval/_depth)
        ("deep_n2", dataclasses.replace(base, deep_cache_interval=2)),
        ("deep_n3", dataclasses.replace(base, deep_cache_interval=3)),
        ("deep_n2_d2", dataclasses.replace(base, deep_cache_interval=2,
                                           deep_cache_depth=2)),
        ("deep_n2_cfg_k3", dataclasses.replace(base, deep_cache_interval=2,
                                               uncond_reuse_interval=3)),
        ("deep_n2_int8_cfg_k3", dataclasses.replace(
            base, deep_cache_interval=2, uncond_reuse_interval=3,
            unet_quant="int8", vae_quant="int8")),
        # n=k=3 aligns the two caches: i%3==0 steps run the full pair, all
        # other steps are cond-half shallow — the cheapest schedule per
        # step of full-pair refresh (r5; deep staleness == uncond staleness)
        ("deep_n3_cfg_k3", dataclasses.replace(base, deep_cache_interval=3,
                                               uncond_reuse_interval=3)),
        ("deep_n3_int8_cfg_k3", dataclasses.replace(
            base, deep_cache_interval=3, uncond_reuse_interval=3,
            unet_quant="int8", vae_quant="int8")),
    ]
    if args.only:
        keep = set(args.only.split(","))
        modes = [m for m in modes if m[0] in keep or m[0] == "exact"]
    return models, base, image, modes


def phase_generate(args, vdir):
    """Generate + time each mode (TPU or CPU), save videos + timings."""
    from svd_xtend_tpu.diffusion.pipeline import generate, init_pipeline_params

    models, base, image, modes = build(args)
    params = init_pipeline_params(models, jax.random.PRNGKey(0))
    gen_key = jax.random.PRNGKey(111)   # the reference's README seed

    os.makedirs(vdir, exist_ok=True)
    timings_path = os.path.join(vdir, "timings.json")
    timings = (json.load(open(timings_path))
               if os.path.exists(timings_path) else {})

    np.save(os.path.join(vdir, "cond_image.npy"),
            np.asarray(image, np.float32))
    for name, cfg in modes:
        vpath = os.path.join(vdir, f"{name}.npy")
        if name in timings and os.path.exists(vpath):
            print(f"{name}: cached ({timings[name]['s_per_video']} s)",
                  flush=True)
            continue
        try:
            video = generate(models, params, image, gen_key, cfg)
            # relay-sync by pulling a scalar (block_until_ready is a no-op
            # on axon)
            float(jax.device_get(jnp.sum(video.astype(jnp.float32))))
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                v = generate(models, params, image, gen_key, cfg)
                float(jax.device_get(jnp.sum(v.astype(jnp.float32))))
                times.append(time.perf_counter() - t0)
            dt = min(times)
        except Exception as e:   # keep the table going if one mode breaks
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            timings[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            json.dump(timings, open(timings_path, "w"), indent=1)
            continue
        np.save(vpath, np.asarray(video.astype(jnp.float32)))
        timings[name] = {"s_per_video": round(dt, 3),
                         "frames_per_sec": round(cfg.num_frames / dt, 3)}
        # write-through after every mode: a relay break preserves the rest
        json.dump(timings, open(timings_path, "w"), indent=1)
        print(f"{name:14s} {dt:.3f} s/video", flush=True)
    print(f"videos + timings in {vdir}", flush=True)


def phase_metrics(args, vdir):
    """Compute drift + report metrics from saved videos (CPU-friendly)."""
    from svd_xtend_tpu.utils import metrics as M

    models, base, image, modes = build(args)
    timings_path = os.path.join(vdir, "timings.json")
    timings = (json.load(open(timings_path))
               if os.path.exists(timings_path) else {})

    # Only the CLIP tower is needed for metrics; init just it (the UNet/VAE
    # trees are ~6 GB fp32 on CPU and irrelevant to a saved video). Key
    # split mirrors init_pipeline_params so the tower matches the TPU run's.
    _, _, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    c = models.clip_config
    clip_params = jax.jit(lambda k: models.clip().init(
        k, jnp.zeros((1, c.image_size, c.image_size, 3))))(k3)["params"]

    cpath = os.path.join(vdir, "cond_image.npy")
    if os.path.exists(cpath):
        image = jnp.asarray(np.load(cpath))

    def embed(video):
        b, f = video.shape[:2]
        flat = video.reshape((b * f,) + video.shape[2:])
        # frame-chunked so the CPU (or any device) never sees a giant
        # one-program ViT-H batch
        outs = [M._embed_frames(clip_params, c, flat[i:i + 2])
                for i in range(0, b * f, 2)]
        return jnp.concatenate(outs, 0)

    results = {}
    exact_video = None
    exact_embed = None
    for name, _cfg in modes:
        row = dict(timings.get(name, {}))
        vpath = os.path.join(vdir, f"{name}.npy")
        if not os.path.exists(vpath):
            if row:
                results[name] = row
            continue
        video = jnp.asarray(np.load(vpath))
        ev = embed(video)
        if name == "exact":
            exact_video, exact_embed = video, ev
        elif exact_video is not None:
            row["psnr_vs_exact_db"] = round(float(M.psnr(video,
                                                         exact_video)[0]), 2)
            row["clip_cos_vs_exact"] = round(float(jnp.mean(jnp.sum(
                ev * exact_embed, axis=-1))), 4)
            row["max_abs_err"] = round(float(jnp.max(jnp.abs(
                video - exact_video))), 4)
        rep = M.video_report(clip_params, c, image, video)
        row.update({k: round(float(v), 4) for k, v in rep.items()})
        results[name] = row
        print(f"{name:14s} " + "  ".join(f"{k}={v}" for k, v in row.items()),
              flush=True)

    table = {"operating_point": f"{base.width}x{base.height}x"
                                f"{base.num_frames}f "
                                f"{base.num_inference_steps}st",
             "modes": results}
    print("\n" + json.dumps(table, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(table, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["all", "generate", "metrics"],
                    default="all")
    ap.add_argument("--videos", default="/tmp/eval_approx_videos",
                    help="directory for the saved per-mode videos")
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--iters", type=int, default=2,
                    help="timing iterations per mode (first run excluded)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny configs (CPU CI smoke)")
    ap.add_argument("--only", default=None,
                    help="comma-separated mode names to run (exact always kept)")
    ap.add_argument("--out", default=None, help="write the JSON table here")
    args = ap.parse_args()

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if args.phase in ("all", "generate"):
        phase_generate(args, args.videos)
    if args.phase in ("all", "metrics"):
        phase_metrics(args, args.videos)


if __name__ == "__main__":
    main()
