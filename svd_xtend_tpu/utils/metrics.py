"""Video quality metrics (evaluation utilities).

The reference's only evaluation is eyeballing validation GIFs (SURVEY.md §4).
Here: quantitative per-video metrics computable with the in-framework frozen
CLIP tower — used by validation logging and offline eval.

  - clip_frame_similarity: cosine(CLIP(cond image), CLIP(frame_t)) — subject
    fidelity over time (the CLIP-score family used in SVD evals).
  - temporal_consistency: mean cosine between consecutive frame embeddings.
  - psnr / flicker: pixel-level sanity stats.

All functions are jittable; embeddings run through models/clip.py.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core.config import CLIPVisionConfig
from ..models.clip import CLIPVisionModelWithProjection, preprocess_for_clip

Array = jax.Array


def _embed_frames(clip_params, cfg: CLIPVisionConfig, frames: Array,
                  dtype=jnp.float32) -> Array:
    """(N, H, W, 3) in [-1,1] -> (N, D) L2-normalized CLIP embeddings."""
    model = CLIPVisionModelWithProjection(cfg, dtype=dtype)
    x = preprocess_for_clip(frames, cfg)
    emb = model.apply({"params": clip_params}, x).astype(jnp.float32)
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


def clip_frame_similarity(clip_params, cfg: CLIPVisionConfig, cond_image: Array,
                          video: Array) -> Array:
    """(B, H, W, 3), (B, F, H, W, 3) -> (B, F) cosine similarities."""
    b, f = video.shape[:2]
    ref = _embed_frames(clip_params, cfg, cond_image)                # (B, D)
    frames = _embed_frames(clip_params, cfg,
                           video.reshape((b * f,) + video.shape[2:]))
    frames = frames.reshape(b, f, -1)
    return jnp.einsum("bd,bfd->bf", ref, frames)


def temporal_consistency(clip_params, cfg: CLIPVisionConfig, video: Array) -> Array:
    """(B, F, H, W, 3) -> (B,) mean consecutive-frame embedding cosine."""
    b, f = video.shape[:2]
    emb = _embed_frames(clip_params, cfg,
                        video.reshape((b * f,) + video.shape[2:]))
    emb = emb.reshape(b, f, -1)
    return jnp.mean(jnp.sum(emb[:, 1:] * emb[:, :-1], axis=-1), axis=1)


def psnr(a: Array, b: Array, data_range: float = 2.0) -> Array:
    """Per-sample PSNR over all trailing dims; inputs in [-1, 1]."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                   axis=tuple(range(1, a.ndim)))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def flicker(video: Array) -> Array:
    """(B, F, H, W, 3) -> (B,) mean absolute inter-frame pixel change."""
    return jnp.mean(jnp.abs(jnp.diff(video.astype(jnp.float32), axis=1)),
                    axis=(1, 2, 3, 4))


def video_report(clip_params, cfg: CLIPVisionConfig, cond_image: Array,
                 video: Array) -> Dict[str, Array]:
    sim = clip_frame_similarity(clip_params, cfg, cond_image, video)
    return {
        "clip_sim_mean": jnp.mean(sim),
        "clip_sim_last": jnp.mean(sim[:, -1]),
        "temporal_consistency": jnp.mean(
            temporal_consistency(clip_params, cfg, video)),
        "flicker": jnp.mean(flicker(video)),
    }
