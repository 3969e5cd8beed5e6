"""Fused nearest-2x-upsample + 3x3 conv via parity decomposition.

The reference's Upsample2D (diffusers; driven inside every UNet up block and
the VAE temporal decoder) computes ``conv3x3(nearest_upsample_2x(x))``. On
TPU the naive form materializes the 4x-upsampled tensor in HBM (at the VAE's
top level that is a (14, 320, 512, 128) bf16 intermediate per chunk) and then
convolves 4x the pixels with a 3x3 kernel.

Identity used here: with X_up[p, q] = x[p//2, q//2] (nearest), the output at
parity (di, dj) in {0,1}^2 is

  y[2i+di, 2j+dj] = sum_{u,v in {-1,0,1}} K[u,v] * X_up[2i+di+u, 2j+dj+v]

and the floor-division collapses each 3-tap axis to 2 taps:

  rows, di=0: row i-1 gets K[0];     row i   gets K[1]+K[2]
  rows, di=1: row i   gets K[0]+K[1]; row i+1 gets K[2]

(and identically for columns). So the whole op is FOUR 2x2 convs at the
ORIGINAL resolution whose kernels are tap-sums of the one stored (3,3,Ci,Co)
parameter, interleaved back by a reshape: 16 effective taps instead of 36
(2.25x fewer FLOPs) and no 4x intermediate. Zero SAME padding in upsampled
space maps exactly to zero padding of the parity convs, so the result is
bit-identical in exact arithmetic (tests/test_ops.py compares against the
materialized reference path).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def fused_enabled() -> bool:
    """SVDX_FUSED_UPSAMPLE=0 falls back to the naive repeat+conv (A/B knob)."""
    return os.environ.get("SVDX_FUSED_UPSAMPLE", "1") != "0"


def _conv2x2(x: Array, k: Array, pad_lo: tuple) -> Array:
    """2x2 VALID conv with explicit (top/left) zero padding selection.

    pad_lo = (1, 1) pads top+left (parity 0: taps {i-1, i}); (0, 0) pads
    bottom+right (parity 1: taps {i, i+1})."""
    from .convacc import conv_f32acc
    pr, pc = pad_lo
    return conv_f32acc(x, k, (1, 1),
                       ((pr, 1 - pr), (pc, 1 - pc))).astype(x.dtype)


def upsample2x_conv3x3(x: Array, kernel: Array, bias: Array) -> Array:
    """(N, H, W, C_in), (3, 3, C_in, C_out), (C_out,) -> (N, 2H, 2W, C_out).

    Equals ``conv3x3_same(nearest_upsample_2x(x))`` with zero SAME padding.
    """
    n, h, w, _ = x.shape
    co = kernel.shape[-1]
    k = kernel.astype(x.dtype)

    # tap-sums along rows: index 0 -> taps {i-1, i} (parity 0),
    #                      index 1 -> taps {i, i+1} (parity 1)
    r0 = jnp.stack([k[0], k[1] + k[2]], axis=0)          # (2, 3, Ci, Co)
    r1 = jnp.stack([k[0] + k[1], k[2]], axis=0)
    kk = {}
    for di, r in ((0, r0), (1, r1)):
        c0 = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)   # (2, 2, Ci, Co)
        c1 = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)
        kk[(di, 0)] = c0
        kk[(di, 1)] = c1

    # bias rides each parity conv's epilogue (XLA fuses the add into the
    # conv fusion) instead of a separate HBM pass over the 4x interleaved
    # output (measured 0.29 ms/site at the up2 upsampler, r2 trace)
    bb = bias.astype(x.dtype)
    ys = [[_conv2x2(x, kk[(di, dj)], (1 - di, 1 - dj)) + bb for dj in (0, 1)]
          for di in (0, 1)]
    # interleave parities: out[n, 2i+di, 2j+dj] = ys[di][dj][n, i, j]
    y = jnp.stack([jnp.stack(row, axis=3) for row in ys], axis=2)
    return y.reshape(n, 2 * h, 2 * w, co)
