"""Layout helpers for the factorized spatio-temporal computation.

Canonical video tensor: (B, F, H, W, C) — channels last (TPU-native).

The reference's fold/unfold pattern (src/unet_spatio_temporal_condition.py:418-425,
SURVEY.md §3.3) alternates between (b·f, h·w, c) spatial-token and
(b·h·w, f, c) temporal-token views. In channels-last these are pure reshapes
plus one (well-laid-out) transpose; keeping C innermost means the lane
dimension never moves, which is what makes the transposes cheap on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def fold_frames(x: Array) -> Array:
    """(B, F, H, W, C) -> (B*F, H, W, C)."""
    b, f, h, w, c = x.shape
    return x.reshape(b * f, h, w, c)


def unfold_frames(x: Array, num_frames: int) -> Array:
    """(B*F, H, W, C) -> (B, F, H, W, C)."""
    bf, h, w, c = x.shape
    return x.reshape(bf // num_frames, num_frames, h, w, c)


def spatial_tokens(x: Array) -> Array:
    """(BF, H, W, C) -> (BF, H*W, C)."""
    bf, h, w, c = x.shape
    return x.reshape(bf, h * w, c)


def spatial_grid(x: Array, h: int, w: int) -> Array:
    """(BF, H*W, C) -> (BF, H, W, C)."""
    bf, hw, c = x.shape
    return x.reshape(bf, h, w, c)


def tokens_to_temporal(x: Array, num_frames: int) -> Array:
    """(B*F, S, C) spatial tokens -> (B*S, F, C) temporal tokens."""
    bf, s, c = x.shape
    b = bf // num_frames
    return x.reshape(b, num_frames, s, c).transpose(0, 2, 1, 3).reshape(b * s, num_frames, c)


def temporal_to_tokens(x: Array, num_frames: int, s: int) -> Array:
    """(B*S, F, C) -> (B*F, S, C) with explicit spatial token count S."""
    bs, f, c = x.shape
    b = bs // s
    return x.reshape(b, s, f, c).transpose(0, 2, 1, 3).reshape(b * f, s, c)


def repeat_per_frame(x: Array, num_frames: int) -> Array:
    """Repeat a per-sample tensor per frame: (B, ...) -> (B*F, ...).

    Matches the reference's repeat_interleave on embeddings/encoder states
    (src/unet_spatio_temporal_condition.py:421-425).
    """
    return jnp.repeat(x, num_frames, axis=0)
