"""Antialiased bicubic resize as two constant matmuls — the CLIP-preprocessing
resize used before the image encoder.

Behavior contract (reference train_svd.py:140-248): gaussian-blur the image
with skimage-style sigma = max((in/out - 1)/2, 0.001) per axis, kernel size
max(4*sigma, 3) rounded up to odd, reflect padding; then bicubic interpolation
with align_corners=True (A = -0.75 cubic kernel).

TPU-first design: both the separable blur and the cubic interpolation are
linear maps along one axis, so we precompute (out, in) row/col operator
matrices with numpy at trace time (shapes are static under jit) and apply
them as two einsums. One fused MXU pass per axis — no gathers, no pad ops,
no dynamic shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _cubic_weight(x: np.ndarray, A: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with a = -0.75 (torch/OpenCV convention)."""
    ax = np.abs(x)
    w = np.zeros_like(ax)
    m1 = ax <= 1.0
    m2 = (ax > 1.0) & (ax < 2.0)
    w[m1] = ((A + 2.0) * ax[m1] - (A + 3.0)) * ax[m1] * ax[m1] + 1.0
    w[m2] = (((ax[m2] - 5.0) * ax[m2] + 8.0) * ax[m2] - 4.0) * A
    return w


def _bicubic_matrix(n_in: int, n_out: int, align_corners: bool = True) -> np.ndarray:
    """(n_out, n_in) operator for 1-D bicubic interpolation."""
    if n_out == n_in:
        return np.eye(n_in, dtype=np.float64)
    if align_corners and n_out > 1:
        src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    else:
        scale = n_in / n_out
        src = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for tap in range(-1, 3):
        idx = np.clip(i0 + tap, 0, n_in - 1)   # edge-replicate out-of-range taps
        w = _cubic_weight(frac - tap)
        np.add.at(mat, (np.arange(n_out), idx), w)
    return mat


def _gaussian_1d(ksize: int, sigma: float) -> np.ndarray:
    x = np.arange(ksize, dtype=np.float64) - ksize // 2
    if ksize % 2 == 0:
        x = x + 0.5
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return g / g.sum()


def _blur_matrix(n: int, ksize: int, sigma: float) -> np.ndarray:
    """(n, n) operator for 1-D gaussian blur with 'reflect' padding."""
    kern = _gaussian_1d(ksize, sigma)
    pad_front = (ksize - 1) // 2
    # reflect (no edge repeat) index map for positions [-pad_front, n+pad_rear)
    total = n + ksize - 1
    idx = np.arange(total) - pad_front
    period = 2 * n - 2 if n > 1 else 1
    idx = np.mod(idx, period)
    idx = np.where(idx >= n, period - idx, idx)
    mat = np.zeros((n, n), dtype=np.float64)
    for tap in range(ksize):
        np.add.at(mat, (np.arange(n), idx[np.arange(n) + tap]), kern[tap])
    return mat


@functools.lru_cache(maxsize=64)
def _resize_operators(h_in: int, w_in: int, h_out: int, w_out: int):
    factors = (h_in / h_out, w_in / w_out)
    sigmas = (max((factors[0] - 1.0) / 2.0, 0.001), max((factors[1] - 1.0) / 2.0, 0.001))
    ks = [int(max(4.0 * sigmas[0], 3)), int(max(4.0 * sigmas[1], 3))]
    ks = [k + 1 if k % 2 == 0 else k for k in ks]
    op_h = _bicubic_matrix(h_in, h_out) @ _blur_matrix(h_in, ks[0], sigmas[0])
    op_w = _bicubic_matrix(w_in, w_out) @ _blur_matrix(w_in, ks[1], sigmas[1])
    return np.asarray(op_h, np.float32), np.asarray(op_w, np.float32)


def resize_antialiased(x: Array, size: tuple) -> Array:
    """Blur + bicubic resize of NHWC images to (size[0], size[1])."""
    h_out, w_out = size
    *_, h_in, w_in, _ = x.shape
    op_h, op_w = _resize_operators(h_in, w_in, h_out, w_out)
    x32 = x.astype(jnp.float32)
    out = jnp.einsum("oh,...hwc->...owc", jnp.asarray(op_h), x32)
    out = jnp.einsum("pw,...hwc->...hpc", jnp.asarray(op_w), out)
    return out.astype(x.dtype)
