"""Quantitative video-quality metrics.

The reference's only "evaluation" is visual before/after grids
(README.md:16-26) and eyeballed validation GIFs (train_svd.py:1092-1157) —
SURVEY.md §4/§6. This module adds the standard quick img2vid metrics so
finetune quality can be tracked numerically alongside the loss:

  - CLIP frame score: cosine similarity between each generated frame's CLIP
    embedding and the conditioning image's (subject fidelity; the same
    frozen tower the pipeline conditions on — no extra weights).
  - Temporal consistency: mean CLIP cosine between consecutive frames
    (the CLIP-T metric; flicker/identity drift shows up as a drop).
  - Pixel dynamics: mean |frame_t+1 - frame_t| (motion magnitude — a
    degenerate "static video" solution scores high on consistency but ~0
    here, so the pair is read together).

All functions take [-1, 1] videos shaped (B, F, H, W, 3) and are jittable;
everything runs on device in one call per metric set.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Array = jax.Array


def _clip_embed_frames(models, params: dict, frames: Array) -> Array:
    """(N, H, W, 3) in [-1,1] -> L2-normalized (N, D) CLIP embeddings."""
    from ..models.clip import preprocess_for_clip
    x = preprocess_for_clip(frames, models.clip_config)
    emb = models.clip().apply({"params": params["clip"]}, x)
    emb = emb.astype(jnp.float32)
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True).clip(1e-8)


def video_metrics(models, params: dict, video: Array,
                  cond_image: Array) -> Dict[str, Array]:
    """All metrics for (B, F, H, W, 3) videos against (B, H, W, 3) images.

    Returns scalar f32 arrays: clip_frame_score (mean over B, F),
    clip_temporal_consistency (mean over B, F-1), pixel_dynamics.
    """
    b, f = video.shape[:2]
    flat = video.reshape((b * f,) + video.shape[2:])
    emb = _clip_embed_frames(models, params, flat).reshape(b, f, -1)
    cond = _clip_embed_frames(models, params, cond_image)     # (B, D)
    frame_score = jnp.mean(jnp.sum(emb * cond[:, None], axis=-1))
    if f > 1:
        consistency = jnp.mean(jnp.sum(emb[:, 1:] * emb[:, :-1], axis=-1))
        dynamics = jnp.mean(jnp.abs(video[:, 1:] - video[:, :-1]))
    else:
        consistency = jnp.float32(1.0)
        dynamics = jnp.float32(0.0)
    return {"clip_frame_score": frame_score,
            "clip_temporal_consistency": consistency,
            "pixel_dynamics": dynamics}
