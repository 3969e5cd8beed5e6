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


# ---------------------------------------------------------- FVD machinery --

def gaussian_stats(features: Array):
    """(N, D) features -> (mean (D,), covariance (D, D)) in fp64-ish fp32."""
    x = features.astype(jnp.float32)
    mu = jnp.mean(x, axis=0)
    xc = x - mu
    cov = (xc.T @ xc) / jnp.maximum(x.shape[0] - 1, 1)
    return mu, cov


def frechet_distance(mu1: Array, cov1: Array, mu2: Array, cov2: Array,
                     eps: float = 1e-6) -> Array:
    """Fréchet distance between two Gaussians — the FVD/FID statistic.

    tr(c1 + c2 - 2 (c1 c2)^{1/2}) computed via eigendecomposition of the
    symmetrized product (stable without a matrix sqrt of a non-symmetric
    matrix): sqrt(c1) c2 sqrt(c1) is PSD and similar to c1 c2.
    """
    d2 = jnp.sum((mu1 - mu2) ** 2)
    e1, v1 = jnp.linalg.eigh(cov1 + eps * jnp.eye(cov1.shape[0]))
    sqrt1 = (v1 * jnp.sqrt(jnp.maximum(e1, 0.0))) @ v1.T
    inner = sqrt1 @ cov2 @ sqrt1
    ev = jnp.linalg.eigvalsh(inner + eps * jnp.eye(inner.shape[0]))
    tr_sqrt = jnp.sum(jnp.sqrt(jnp.maximum(ev, 0.0)))
    return d2 + jnp.trace(cov1) + jnp.trace(cov2) - 2.0 * tr_sqrt


def clip_video_features(clip_params, cfg: CLIPVisionConfig, videos: Array) -> Array:
    """(B, F, H, W, 3) -> (B, 2D) per-video features: mean frame embedding
    concat mean consecutive-frame difference — a CLIP-based stand-in for the
    I3D features of reference FVD (no pretrained I3D ships in this
    environment; with an I3D port, pass its features to gaussian_stats/
    frechet_distance directly — the statistic is extractor-agnostic)."""
    b, f = videos.shape[:2]
    emb = _embed_frames(clip_params, cfg,
                        videos.reshape((b * f,) + videos.shape[2:]))
    emb = emb.reshape(b, f, -1)
    return jnp.concatenate(
        [jnp.mean(emb, axis=1), jnp.mean(jnp.abs(jnp.diff(emb, axis=1)), axis=1)],
        axis=-1)


def clip_fvd(clip_params, cfg: CLIPVisionConfig, real: Array, fake: Array) -> Array:
    """CLIP-feature Fréchet video distance between two (B, F, H, W, 3) sets."""
    fr = clip_video_features(clip_params, cfg, real)
    ff = clip_video_features(clip_params, cfg, fake)
    return frechet_distance(*gaussian_stats(fr), *gaussian_stats(ff))


# ------------------------------------------------- motion-bucket estimate --

def estimate_motion_bucket(video: Array, max_bucket: int = 255,
                           scale: float = 2400.0) -> Array:
    """(B, F, H, W, 3) in [-1,1] -> (B,) integer motion_bucket_id estimate.

    The SVD authors never published the motion-score computation and the
    reference hardcodes motion_bucket_id=127 with a note to that effect
    (reference train_svd.py:978-980). This estimator maps mean absolute
    inter-frame pixel change (a dense optical-flow-magnitude proxy) onto the
    [0, max_bucket] id range so per-clip conditioning can be data-driven
    instead of constant; `scale` calibrates flicker -> bucket units.
    """
    score = flicker(video) * scale
    return jnp.clip(score, 0, max_bucket).astype(jnp.int32)
