"""Pallas TPU 3x3 conv (stride 1, SAME, NHWC) as implicit GEMM.

Why: XLA's conv lowering measures ~40-100 TFLOP/s at the SVD/VAE shapes
(scripts/microbench_conv3x3.py) while the same contraction as an explicit
matmul runs at ~136-178 TFLOP/s — the conv is not memory-bound, the lowering
just tiles the large-spatial cases poorly. This kernel streams row bands of
the (already SAME-padded) input into VMEM and accumulates the nine taps as
(band*W, C) @ (C, Co) MXU dots — im2col never exists in HBM.

Mechanics (Mosaic constraints shaped the design):
  - the input is SAME-padded once in XLA and its channel dim padded to a
    multiple of 128: HBM->VMEM DMAs of tiled memrefs may only slice the
    minor (sublane, lane) dims tile-aligned, so the DMA takes full W+2 and
    full padded C and slices only the (outer) row dim — always legal;
  - the three column shifts are materialized in VMEM by offset vector loads
    (one sublane-rotate pass each, 3 total instead of 9 if done per tap);
  - tap (di, dj) is then a free first-axis slice of shift buffer dj,
    reshaped to (band*W, Cp) for the MXU dot; zero-padded channels multiply
    zero-padded kernel rows, so the result is exact;
  - f32 accumulation in VMEM scratch; bias fused; one cast on the way out.

Grid: (N, Co_tiles, H/band) — h innermost so the (3, 3, Cp, bco) weight
block stays resident across the sweep.

Used where measured faster than the XLA conv; correctness is tested in
interpret mode on CPU against lax.conv (tests/test_ops.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(xp_ref, k_ref, b_ref, o_ref, win, wcat, sem,
            *, band: int, width: int, cin_p: int):
    n = pl.program_id(0)
    hb = pl.program_id(2)
    r0 = hb * band

    dma = pltpu.make_async_copy(xp_ref.at[n, pl.ds(r0, band + 2)], win, sem)
    dma.start()
    dma.wait()

    # column-im2col in VMEM: wcat[r, c, dj*Cp:(dj+1)*Cp] = win[r, c+dj, :].
    # One sublane-rotate pass per dj; afterwards the three column taps are a
    # single contraction dimension of 3*Cp (3x fewer, 3x deeper MXU dots).
    for dj in range(3):
        wcat[:, :, pl.ds(dj * cin_p, cin_p)] = win[:, pl.ds(dj, width), :]

    out = b_ref[0].astype(jnp.float32)
    for di in range(3):
        a = wcat[pl.ds(di, band)].reshape(band * width, 3 * cin_p)
        out = out + jax.lax.dot(a, k_ref[di],
                                preferred_element_type=jnp.float32)
    o_ref[0] = out.reshape(band, width, -1).astype(o_ref.dtype)


def _pick_band(h: int, w: int) -> int:
    """Smallest divisor of h with band*w in [512, 4096] (measured sweet spot:
    bigger MXU M-dim wins until VMEM pressure), else the largest under 4096."""
    best = 1
    for band in range(1, h + 1):
        if h % band:
            continue
        if band * w <= 4096:
            best = band
        if band * w >= 512 and band * w <= 4096:
            return band
    return best


# Mosaic's scoped-VMEM ceiling is 16 MiB; leave slack for the compiler's own
# stack temporaries (dot staging, the reshape view, DMA bookkeeping).
_VMEM_BUDGET = 12 * 1024 * 1024


def _vmem_bytes(band: int, w: int, w_env: int, ci_p: int, bco: int,
                itemsize: int) -> int:
    win = (band + 2) * w_env * ci_p * itemsize          # DMA landing buffer
    wcat = (band + 2) * w * 3 * ci_p * itemsize         # column-im2col scratch
    kblk = 3 * 3 * ci_p * bco * itemsize                # weight block
    oblk = band * w * bco * itemsize                    # output block
    acc = band * w * bco * 4 * 2                        # f32 acc + dot result
    return win + wcat + kblk + oblk + acc


def _pick_tiles(h: int, w: int, ci_p: int, co: int,
                itemsize: int) -> Optional[tuple]:
    """(band, bco) fitting the VMEM budget, or None if nothing fits.
    Prefers the measured-best band, then sheds Co tile size (weight block is
    the usual offender at deep-UNet channel counts), then shrinks the band."""
    w_env = -(-(w + 2) // 8) * 8
    bands = [b for b in range(h, 0, -1) if h % b == 0]
    band0 = _pick_band(h, w)
    bands.sort(key=lambda b: (b != band0, abs(b * w - 2048)))
    # Mosaic block legality: the last block dim must be lane-aligned (128)
    # or span the whole array — sub-128 tiles are NOT legal even though
    # they'd fit VMEM.
    bcos = [c for c in range(co, 0, -1)
            if co % c == 0 and (c % 128 == 0 or c == co)]
    for band in bands:
        for bco in bcos:
            if _vmem_bytes(band, w, w_env, ci_p, bco, itemsize) <= _VMEM_BUDGET:
                return band, bco
    return None


def conv3x3_pallas_fits(x_shape, co: int, itemsize: int = 2) -> bool:
    """True if some (band, bco) tiling fits the shape in scoped VMEM."""
    _, h, w, ci = x_shape
    ci_p = -(-ci // 128) * 128
    return _pick_tiles(h, w, ci_p, co, itemsize) is not None


def conv3x3_pallas_wins(x_shape, co: int, itemsize: int = 2) -> bool:
    """Measured dispatch rule (v5p, scripts/microbench_conv3x3.py +
    full-model-shape validation): the Pallas kernel beats XLA's conv lowering
    when the input channel count is lane-aligned (no padded-channel waste in
    the 3*Cp contraction) or tiny (where XLA's conv is weakest: conv_in-style
    ci<=16 measured 1.5-1.8x), AND the output has at least one full lane tile
    (co < 128 starves the MXU N-dim: measured 0.7x at conv_out shapes).
    ci%128 != 0 at ci=320/960 pads 6-20% dead FLOPs and measured 0.8-1.0x,
    so those stay on XLA."""
    _, h, w, ci = x_shape
    if not conv3x3_pallas_fits(x_shape, co, itemsize):
        return False
    return co >= 128 and (ci % 128 == 0 or ci <= 64)


def conv3x3_pallas(x: Array, kernel: Array, bias: Optional[Array] = None,
                   band: int = 0, bco: int = 0) -> Array:
    """(N, H, W, Cin) x (3, 3, Cin, Co) -> (N, H, W, Co), SAME, stride 1.

    Differentiable: forward runs the Pallas kernel, backward uses the
    standard XLA conv-transpose formulas (tests/test_ops.py checks both)."""
    if bias is None:
        bias = jnp.zeros((kernel.shape[-1],), x.dtype)
    if not (band and bco):
        ci_p = (-(-x.shape[3] // 128) * 128 if not _interpret()
                else x.shape[3])
        tiles = _pick_tiles(x.shape[1], x.shape[2], ci_p, kernel.shape[-1],
                            jnp.dtype(x.dtype).itemsize)
        if tiles is None:
            raise ValueError(f"no VMEM-feasible tiling for {x.shape} -> "
                             f"{kernel.shape[-1]} channels")
        band, bco = band or tiles[0], bco or tiles[1]
    return _conv3x3_vjp(x, kernel, bias, band, bco)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv3x3_vjp(x, kernel, bias, band, bco):
    return _conv3x3_fwd_impl(x, kernel, bias, band, bco)


def _conv3x3_vjp_fwd(x, kernel, bias, band, bco):
    return _conv3x3_fwd_impl(x, kernel, bias, band, bco), (x, kernel)


def _conv3x3_vjp_bwd(band, bco, res, dy):
    from jax import lax
    x, kernel = res
    # dx: SAME conv of dy with the spatially-flipped, io-swapped kernel
    k_t = jnp.flip(kernel, axis=(0, 1)).swapaxes(2, 3)
    dn = lax.conv_dimension_numbers(dy.shape, k_t.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    dx = lax.conv_general_dilated(
        dy, k_t.astype(dy.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(x.dtype)
    # dk: correlate x with dy — treat Cin as the conv batch, N as the
    # contraction ("feature") dim, dy as an (H, W, N, Co) kernel; the (3, 3)
    # output spatial positions are exactly the taps
    xt = x.transpose(3, 1, 2, 0)        # (Cin, H, W, N)
    dyt = dy.transpose(1, 2, 0, 3)      # (H, W, N, Co) as HWIO kernel
    dn2 = lax.conv_dimension_numbers(xt.shape, dyt.shape,
                                     ("NHWC", "HWIO", "NHWC"))
    dk = lax.conv_general_dilated(
        xt, dyt.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=dn2,
        preferred_element_type=jnp.float32)   # (Cin, 3, 3, Co)
    dk = dk.transpose(1, 2, 0, 3).astype(kernel.dtype)
    db = jnp.sum(dy.astype(jnp.float32),
                 axis=(0, 1, 2)).astype(dy.dtype)
    return dx, dk, db


_conv3x3_vjp.defvjp(_conv3x3_vjp_fwd, _conv3x3_vjp_bwd)


def _conv3x3_fwd_impl(x: Array, kernel: Array, bias: Array,
                      band: int = 8, bco: int = 0) -> Array:
    """Forward Pallas kernel (no AD)."""
    n, h, w, ci = x.shape
    co = kernel.shape[-1]
    if w % 8:
        raise ValueError(f"W must be a multiple of 8, got {w}")
    band = min(band, h)
    while h % band:
        band -= 1
    bco = bco or co
    if co % bco:
        raise ValueError(f"bco {bco} must divide Co {co}")
    if bias is None:
        bias = jnp.zeros((co,), x.dtype)

    # tiled-memref DMA slices must be tile-aligned in the minor two dims:
    # pad C to a lane multiple (128) and the W envelope to a sublane
    # multiple (8); the zero padding is inert (zero kernel rows / unread cols)
    ci_p = -(-ci // 128) * 128 if not _interpret() else ci
    w_env = -(-(w + 2) // 8) * 8 if not _interpret() else w + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, w_env - w - 1), (0, ci_p - ci)))
    # kernel laid out (di, dj*Cp + ci, co) to match the column-im2col buffer
    kp = jnp.pad(kernel, ((0, 0), (0, 0), (0, ci_p - ci), (0, 0)))
    kp = kp.reshape(3, 3 * ci_p, co)
    grid = (n, co // bco, h // band)

    out = pl.pallas_call(
        functools.partial(_kernel, band=band, width=w, cin_p=ci_p),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),                    # padded x
            pl.BlockSpec((3, 3 * ci_p, bco), lambda n, c, hb: (0, 0, c)),
            pl.BlockSpec((1, bco), lambda n, c, hb: (0, c)),
        ],
        out_specs=pl.BlockSpec((1, band, w, bco),
                               lambda n, c, hb: (n, hb, 0, c)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((band + 2, w_env, ci_p), x.dtype),
            pltpu.VMEM((band + 2, w, 3 * ci_p), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(xp, kp, bias.reshape(1, co))
    return out
