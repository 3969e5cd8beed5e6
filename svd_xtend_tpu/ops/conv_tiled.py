"""Halo-tiled 3x3 conv: fold spatial tiles into the batch axis.

XLA's TPU conv lowering runs ~2x faster when the spatial extent per image is
small and the batch is large (measured on v5e: (7,160,256,256)x3x3 at
63 TFLOP/s vs the identical-FLOPs (112,40,64,256) at 123 TFLOP/s —
scripts/microbench_conv3x3.py probes). The VAE temporal decoder's top levels
(160x256, 320x512 spatial) sit squarely in the slow regime.

This op SAME-pads once, slices overlapping (tile+2)-sized tiles (1-pixel
halo), folds them into batch, runs one VALID conv, and stitches the
non-overlapping outputs back with a reshape/transpose. Bit-identical to the
direct SAME conv (zero halo at the borders comes from the global pad);
overhead is the halo duplication (~8% at 40x64 tiles) plus one gather and
one scatter relayout — measured net win ~1.5-1.9x at the slow shapes, no win
at batch-heavy small-spatial shapes (use it only where profiling says so).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

# per-image spatial extents at/above which the direct conv is in the slow
# regime and tiling pays (measured crossover, scripts/microbench_conv3x3.py)
_TILE_H = 40
_TILE_W = 64


def should_tile(h: int, w: int) -> bool:
    # Default OFF: the isolated-op win (1.25-1.54x at the VAE top levels) is
    # eaten by lost producer/consumer fusion in composition — the full
    # temporal decode measured 521 ms tiled vs 480 ms direct (A/B on v5e,
    # PERF.md). Kept as an opt-in (SVDX_TILED_CONV=1) because the crossover
    # is shape- and toolchain-dependent.
    if os.environ.get("SVDX_TILED_CONV", "0") != "1":
        return False
    return h * w >= 4 * _TILE_H * _TILE_W


def conv3x3_tiled(x: Array, kernel: Array, bias: Optional[Array] = None,
                  tile: Tuple[int, int] = (_TILE_H, _TILE_W)) -> Array:
    """(N, H, W, Ci), (3, 3, Ci, Co) -> (N, H, W, Co), SAME zero padding.

    Requires tile sizes dividing (H, W); callers fall back to the direct conv
    otherwise (UNet/VAE resolutions are powers-of-two multiples of 8, so the
    40x64 default divides every level the slow regime contains)."""
    n, h, w, ci = x.shape
    th, tw = tile
    if h % th or w % tw:
        raise ValueError(f"tile {tile} must divide spatial dims {(h, w)}")
    nh, nw = h // th, w // tw
    co = kernel.shape[-1]

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = [xp[:, i * th:i * th + th + 2] for i in range(nh)]
    tiles = [r[:, :, j * tw:j * tw + tw + 2] for r in rows for j in range(nw)]
    t = jnp.stack(tiles, axis=1).reshape(n * nh * nw, th + 2, tw + 2, ci)

    from .convacc import conv_f32acc
    y = conv_f32acc(t, kernel.astype(x.dtype), (1, 1),
                    ((0, 0), (0, 0))).astype(x.dtype)

    y = y.reshape(n, nh, nw, th, tw, co).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(n, h, w, co)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y
