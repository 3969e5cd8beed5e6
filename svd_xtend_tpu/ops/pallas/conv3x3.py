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


def _kernel(*refs, band: int, width: int, cin_p: int, hbands: int,
            nbatch: int, cotiles: int,
            has_pre: bool, pre_silu: bool, has_post: bool, has_res: bool):
    it = iter(refs)
    xp_ref, k_ref, b_ref = next(it), next(it), next(it)
    pre_sc_ref = next(it) if has_pre else None
    pre_sh_ref = next(it) if has_pre else None
    post_ref = next(it) if has_post else None
    res_ref = next(it) if has_res else None
    o_ref = next(it)
    win2, wcat, sem = next(it), next(it), next(it)

    n = pl.program_id(0)
    c = pl.program_id(1)
    hb = pl.program_id(2)

    # double-buffered input stream: the band DMA for grid step i+1 is issued
    # before computing step i, so the HBM fetch overlaps the MXU dots — the
    # serial start();wait() form measured DMA-latency-bound at big-spatial
    # shapes (band*W small relative to the fetch latency)
    idx = (n * cotiles + c) * hbands + hb
    total = nbatch * cotiles * hbands
    slot = jax.lax.rem(idx, 2)

    def _issue(i, s):
        hb_i = jax.lax.rem(i, hbands)
        n_i = jax.lax.div(i, hbands * cotiles)
        return pltpu.make_async_copy(
            xp_ref.at[n_i, pl.ds(hb_i * band, band + 2)], win2.at[s],
            sem.at[s])

    @pl.when(idx == 0)
    def _first():
        _issue(idx, slot).start()

    @pl.when(idx + 1 < total)
    def _prefetch():
        _issue(idx + 1, 1 - slot).start()

    _issue(idx, slot).wait()
    win = win2.at[slot]

    if has_pre:
        # input epilogue: y = [silu](x * sc + sh) with per-(sample, channel)
        # f32 affine — the folded GroupNorm-normalize. Applied in VMEM on the
        # landed band; the SAME zero padding must then be RESTORED (the
        # affine maps pad zeros to silu(sh) != 0): interior pad columns are
        # 0 and width+1 (cols beyond are never read by the shifts), pad rows
        # exist only in the first/last band.
        xv = win[...].astype(jnp.float32)
        xv = xv * pre_sc_ref[0].reshape(1, 1, cin_p)
        xv = xv + pre_sh_ref[0].reshape(1, 1, cin_p)
        if pre_silu:
            xv = xv * jax.nn.sigmoid(xv)
        win[...] = xv.astype(win.dtype)
        czero = jnp.zeros((band + 2, 1, cin_p), win.dtype)
        win[:, pl.ds(0, 1), :] = czero
        win[:, pl.ds(width + 1, 1), :] = czero

        @pl.when(hb == 0)
        def _zero_top():
            win[pl.ds(0, 1)] = jnp.zeros((1,) + win.shape[1:], win.dtype)

        @pl.when(hb == hbands - 1)
        def _zero_bottom():
            win[pl.ds(band + 1, 1)] = jnp.zeros((1,) + win.shape[1:],
                                                win.dtype)

    # column-im2col in VMEM: wcat[r, c, dj*Cp:(dj+1)*Cp] = win[r, c+dj, :].
    # One sublane-rotate pass per dj; afterwards the three column taps are a
    # single contraction dimension of 3*Cp (3x fewer, 3x deeper MXU dots).
    for dj in range(3):
        wcat[:, :, pl.ds(dj * cin_p, cin_p)] = win[:, pl.ds(dj, width), :]

    out = b_ref[0].astype(jnp.float32)
    if has_post:
        # output epilogue: per-(sample, channel) shift (the UNet resnet's
        # broadcast time-embedding add), free in the f32 accumulator init
        out = out + post_ref[0].astype(jnp.float32)
    for di in range(3):
        a = wcat[pl.ds(di, band)].reshape(band * width, 3 * cin_p)
        out = out + jax.lax.dot(a, k_ref[di],
                                preferred_element_type=jnp.float32)
    out = out.reshape(band, width, -1)
    if has_res:
        # output epilogue: fused residual add (the resnet skip) — the add
        # never round-trips HBM as a separate XLA pass
        out = out + res_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


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


# Mosaic's scoped-VMEM ceiling is 16 MiB. The compiler's stack temporaries
# (dot staging, reshape views) track the DOT-side buffers, not the streaming
# ones: a config modeled [1.5M stream + 8.4M dot] hit a real 16.9M stack OOM
# (~1.9x on the dot terms), so the estimate weights those terms and the
# budget leaves headroom under the ceiling.
_VMEM_BUDGET = int(15.5 * 1024 * 1024)


def _vmem_bytes(band: int, w: int, w_env: int, ci_p: int, bco: int,
                itemsize: int, with_res: bool = False) -> int:
    win = 2 * (band + 2) * w_env * ci_p * itemsize      # double-buffered DMA
    wcat = (band + 2) * w * 3 * ci_p * itemsize         # column-im2col scratch
    kblk = 3 * 3 * ci_p * bco * itemsize                # weight block
    oblk = band * w * bco * itemsize                    # output block
    acc = band * w * bco * 4 * 2                        # f32 acc + dot result
    res = band * w * bco * itemsize if with_res else 0  # residual block
    return win + wcat + int(1.9 * (kblk + oblk + acc + res))


def _pick_tiles(h: int, w: int, ci_p: int, co: int,
                itemsize: int, with_res: bool = False) -> Optional[tuple]:
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
            if _vmem_bytes(band, w, w_env, ci_p, bco, itemsize,
                           with_res) <= _VMEM_BUDGET:
                return band, bco
    return None


def conv3x3_pallas_fits(x_shape, co: int, itemsize: int = 2,
                        with_res: bool = False) -> bool:
    """True if some (band, bco) tiling fits the shape in scoped VMEM."""
    _, h, w, ci = x_shape
    ci_p = -(-ci // 128) * 128
    return _pick_tiles(h, w, ci_p, co, itemsize, with_res) is not None


def conv3x3_pallas_wins(x_shape, co: int, itemsize: int = 2,
                        with_res: bool = False) -> bool:
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


def conv3x3_fused_reference(x, kernel, bias, pre_scale=None, pre_shift=None,
                            post_shift=None, residual=None,
                            pre_silu: bool = False):
    """XLA reference of the fused op (tests + numerics contract):
    y = conv3x3([silu](x*sc + sh)) + bias [+ post[:,None,None,:]] [+ res].
    pre_scale/pre_shift: (N, Cin) f32; post_shift: (N, Co) f32."""
    from jax import lax
    if pre_scale is not None:
        xv = (x.astype(jnp.float32) * pre_scale[:, None, None, :]
              + pre_shift[:, None, None, :])
        if pre_silu:
            xv = xv * jax.nn.sigmoid(xv)
        x = xv.astype(x.dtype)
    from ..convacc import conv_f32acc
    y = conv_f32acc(x, kernel, (1, 1),
                    ((1, 1), (1, 1))) + bias.astype(jnp.float32)
    if post_shift is not None:
        y = y + post_shift[:, None, None, :]
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(x.dtype)


def _plain_dispatch(x_shape, co: int, dtype) -> Optional[tuple]:
    """(band, bco) when a plain (no-residual) conv at this shape should take
    the Pallas kernel — autotune table first, then the measured heuristic;
    None -> XLA. Same env gating as the module-level dispatch
    (models/blocks.py: pallas_conv_dispatch)."""
    import os
    mode = os.environ.get("SVDX_PALLAS_CONV", "table")
    if mode == "0" or x_shape[2] % 8 != 0:
        return None
    if jax.default_backend() != "tpu" and mode != "force":
        return None
    from . import autotune
    itemsize = jnp.dtype(dtype).itemsize
    ent = autotune.lookup(tuple(x_shape), co, jnp.dtype(dtype).name)
    if ent is not None:
        if (ent.get("impl") != "pallas"
                or not conv3x3_pallas_fits(x_shape, co, itemsize)):
            return None
        # same composition margin as the module dispatch (models/blocks.py)
        margin = float(os.environ.get("SVDX_PALLAS_CONV_MARGIN", "10"))
        if ent.get("speedup", float("inf")) < margin:
            return None
        band, bco = ent.get("band", 0), ent.get("bco", 0)
    elif mode != "table" and conv3x3_pallas_wins(x_shape, co, itemsize):
        band = bco = 0
    else:
        return None
    if not (band and bco):
        _, h, w, ci = x_shape
        ci_p = -(-ci // 128) * 128 if not _interpret() else ci
        band, bco = _pick_tiles(h, w, ci_p, co, itemsize)
    return band, bco


def conv3x3_pallas(x: Array, kernel: Array, bias: Optional[Array] = None,
                   band: int = 0, bco: int = 0, *,
                   pre_scale: Optional[Array] = None,
                   pre_shift: Optional[Array] = None,
                   pre_silu: bool = False,
                   post_shift: Optional[Array] = None,
                   residual: Optional[Array] = None) -> Array:
    """(N, H, W, Cin) x (3, 3, Cin, Co) -> (N, H, W, Co), SAME, stride 1,
    with optional fused epilogues (conv3x3_fused_reference is the contract):
      - input:  per-(sample, channel) affine + SiLU — the folded
        GroupNorm-normalize(+SiLU), so the normalized activation never
        exists in HBM;
      - output: per-(sample, channel) shift (time-embedding add) and/or a
        residual add (resnet skip) — no separate XLA add passes.

    Differentiable: forward runs the Pallas kernel; backward uses the
    standard XLA conv-transpose formulas chained with hand-derived epilogue
    gradients — no forward recompute beyond the cheap elementwise input
    epilogue (tests/test_ops.py checks all paths)."""
    if bias is None:
        bias = jnp.zeros((kernel.shape[-1],), x.dtype)
    if (pre_scale is None) != (pre_shift is None):
        raise ValueError("pre_scale and pre_shift must be given together")
    if not (band and bco):
        ci_p = (-(-x.shape[3] // 128) * 128 if not _interpret()
                else x.shape[3])
        tiles = _pick_tiles(x.shape[1], x.shape[2], ci_p, kernel.shape[-1],
                            jnp.dtype(x.dtype).itemsize,
                            with_res=residual is not None)
        if tiles is None:
            raise ValueError(f"no VMEM-feasible tiling for {x.shape} -> "
                             f"{kernel.shape[-1]} channels")
        band, bco = band or tiles[0], bco or tiles[1]
    if pre_scale is not None:
        pre_scale = pre_scale.astype(jnp.float32)
        pre_shift = pre_shift.astype(jnp.float32)
    if post_shift is not None:
        post_shift = post_shift.astype(jnp.float32)
    return _conv3x3_vjp(x, kernel, bias, pre_scale, pre_shift, post_shift,
                        residual, band, bco, pre_silu)


@functools.lru_cache(maxsize=None)
def _partitioned_impl(band: int, bco: int, has_pre: bool, pre_silu: bool,
                      has_post: bool, has_res: bool):
    """SPMD-partitionable fwd (ops/pallas/partition.py): batch-dim-only
    sharding, per-shard Pallas lowering. One wrapper per static config."""
    from .partition import batch_partitioned

    def impl(*arrays):
        it = iter(arrays)
        x, kernel, bias = next(it), next(it), next(it)
        pre_sc = next(it) if has_pre else None
        pre_sh = next(it) if has_pre else None
        post = next(it) if has_post else None
        res = next(it) if has_res else None
        return _conv3x3_fwd_impl(x, kernel, bias, band, bco, pre_sc, pre_sh,
                                 pre_silu, post, res)

    batch_dims = [0, None, None]
    lhs = ["b h w c", "p q c o", "o"]
    if has_pre:
        batch_dims += [0, 0]
        lhs += ["b c", "b c"]
    if has_post:
        batch_dims.append(0)
        lhs.append("b o")
    if has_res:
        batch_dims.append(0)
        lhs.append("b h w o")
    rule = ", ".join(lhs) + " -> b h w o"
    return batch_partitioned(impl, batch_dims, 0, rule,
                             need_replication=("h", "w", "c", "o", "p", "q"))


def _conv3x3_fwd(x, kernel, bias, band, bco, pre_scale, pre_shift, pre_silu,
                 post_shift, residual):
    import os
    if os.environ.get("SVDX_PARTITIONED_KERNELS", "1") == "0":
        return _conv3x3_fwd_impl(x, kernel, bias, band, bco, pre_scale,
                                 pre_shift, pre_silu, post_shift, residual)
    wrapper = _partitioned_impl(band, bco, pre_scale is not None, pre_silu,
                                post_shift is not None, residual is not None)
    args = [x, kernel, bias] + [a for a in (pre_scale, pre_shift, post_shift,
                                            residual) if a is not None]
    return wrapper(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _conv3x3_vjp(x, kernel, bias, pre_scale, pre_shift, post_shift,
                 residual, band, bco, pre_silu):
    return _conv3x3_fwd(x, kernel, bias, band, bco, pre_scale,
                        pre_shift, pre_silu, post_shift, residual)


def _conv3x3_vjp_fwd(x, kernel, bias, pre_scale, pre_shift, post_shift,
                     residual, band, bco, pre_silu):
    out = _conv3x3_fwd(x, kernel, bias, band, bco, pre_scale,
                       pre_shift, pre_silu, post_shift, residual)
    has_post = post_shift is not None
    has_res = residual is not None
    return out, (x, kernel, pre_scale, pre_shift, has_post, has_res)


def _conv3x3_vjp_bwd(band, bco, pre_silu, res, dy):
    from jax import lax
    x, kernel, pre_scale, pre_shift, has_post, has_res = res
    dyf = dy.astype(jnp.float32)
    db = jnp.sum(dyf, axis=(0, 1, 2)).astype(dy.dtype)
    dpost = jnp.sum(dyf, axis=(1, 2)) if has_post else None
    dres = dy if has_res else None

    # recompute the conv's actual input u (cheap elementwise; avoids saving
    # a second activation-sized residual)
    if pre_scale is not None:
        v = (x.astype(jnp.float32) * pre_scale[:, None, None, :]
             + pre_shift[:, None, None, :])
        if pre_silu:
            sig = jax.nn.sigmoid(v)
            u = (v * sig).astype(x.dtype)
        else:
            u = v.astype(x.dtype)
    else:
        u = x

    # du: SAME conv of dy with the spatially-flipped, io-swapped kernel —
    # itself a 3x3 SAME conv, so it takes the Pallas kernel at winning
    # shapes (training-path analog of the forward dispatch; bf16 du, the
    # standard mixed-precision conv-bwd dtype)
    k_t = jnp.flip(kernel, axis=(0, 1)).swapaxes(2, 3)
    ci = x.shape[-1]
    disp = _plain_dispatch(dy.shape, ci, dy.dtype)
    if disp is not None:
        du = _conv3x3_fwd(dy, k_t.astype(dy.dtype),
                          jnp.zeros((ci,), dy.dtype), disp[0], disp[1],
                          None, None, False, None, None).astype(jnp.float32)
    else:
        dn = lax.conv_dimension_numbers(dy.shape, k_t.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        du = lax.conv_general_dilated(
            dy, k_t.astype(dy.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn, preferred_element_type=jnp.float32)
    # dk: correlate u with dy — treat Cin as the conv batch, N as the
    # contraction ("feature") dim, dy as an (H, W, N, Co) kernel; the (3, 3)
    # output spatial positions are exactly the taps
    ut = u.transpose(3, 1, 2, 0)        # (Cin, H, W, N)
    dyt = dy.transpose(1, 2, 0, 3)      # (H, W, N, Co) as HWIO kernel
    dn2 = lax.conv_dimension_numbers(ut.shape, dyt.shape,
                                     ("NHWC", "HWIO", "NHWC"))
    dk = lax.conv_general_dilated(
        ut, dyt.astype(u.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=dn2,
        preferred_element_type=jnp.float32)   # (Cin, 3, 3, Co)
    dk = dk.transpose(1, 2, 0, 3).astype(kernel.dtype)

    if pre_scale is not None:
        # chain through u = [silu](v), v = x*sc + sh
        if pre_silu:
            dact = sig * (1.0 + v * (1.0 - sig))
            dv = du * dact
        else:
            dv = du
        dx = (dv * pre_scale[:, None, None, :]).astype(x.dtype)
        dsc = jnp.sum(dv * x.astype(jnp.float32), axis=(1, 2))
        dsh = jnp.sum(dv, axis=(1, 2))
    else:
        dx = du.astype(x.dtype)
        dsc = dsh = None
    return dx, dk, db, dsc, dsh, dpost, dres


_conv3x3_vjp.defvjp(_conv3x3_vjp_fwd, _conv3x3_vjp_bwd)


def _conv3x3_fwd_impl(x: Array, kernel: Array, bias: Array,
                      band: int = 8, bco: int = 0,
                      pre_scale: Optional[Array] = None,
                      pre_shift: Optional[Array] = None,
                      pre_silu: bool = False,
                      post_shift: Optional[Array] = None,
                      residual: Optional[Array] = None) -> Array:
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
    has_pre = pre_scale is not None
    has_post = post_shift is not None
    has_res = residual is not None

    # tiled-memref DMA slices must be tile-aligned in the minor two dims:
    # pad C to a lane multiple (128) and the W envelope to a sublane
    # multiple (8); the zero padding is inert (zero kernel rows / unread
    # cols; zero pre_scale/pre_shift rows keep padded channels at
    # silu(0*x+0) = 0)
    ci_p = -(-ci // 128) * 128 if not _interpret() else ci
    w_env = -(-(w + 2) // 8) * 8 if not _interpret() else w + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, w_env - w - 1), (0, ci_p - ci)))
    # kernel laid out (di, dj*Cp + ci, co) to match the column-im2col buffer
    kp = jnp.pad(kernel, ((0, 0), (0, 0), (0, ci_p - ci), (0, 0)))
    kp = kp.reshape(3, 3 * ci_p, co)
    grid = (n, co // bco, h // band)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),                    # padded x
        pl.BlockSpec((3, 3 * ci_p, bco), lambda n, c, hb: (0, 0, c)),
        pl.BlockSpec((1, bco), lambda n, c, hb: (0, c)),
    ]
    operands = [xp, kp, bias.reshape(1, co)]
    if has_pre:
        # (N, 1, Cp) with (1, 1, Cp) blocks: a (1, Cp) block over (N, Cp)
        # would be Mosaic-illegal (second-minor 1 neither sublane-aligned
        # nor spanning N)
        pad_c = ((0, 0), (0, ci_p - ci))
        operands += [
            jnp.pad(pre_scale.astype(jnp.float32), pad_c).reshape(n, 1, ci_p),
            jnp.pad(pre_shift.astype(jnp.float32), pad_c).reshape(n, 1, ci_p)]
        in_specs += [pl.BlockSpec((1, 1, ci_p), lambda n, c, hb: (n, 0, 0)),
                     pl.BlockSpec((1, 1, ci_p), lambda n, c, hb: (n, 0, 0))]
    if has_post:
        operands.append(post_shift.astype(jnp.float32).reshape(n, 1, co))
        in_specs.append(pl.BlockSpec((1, 1, bco), lambda n, c, hb: (n, 0, c)))
    if has_res:
        operands.append(residual)
        in_specs.append(pl.BlockSpec((1, band, w, bco),
                                     lambda n, c, hb: (n, hb, 0, c)))

    out = pl.pallas_call(
        functools.partial(_kernel, band=band, width=w, cin_p=ci_p,
                          hbands=h // band, nbatch=n, cotiles=co // bco,
                          has_pre=has_pre,
                          pre_silu=pre_silu and has_pre, has_post=has_post,
                          has_res=has_res),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, band, w, bco),
                               lambda n, c, hb: (n, hb, 0, c)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, band + 2, w_env, ci_p), x.dtype),
            pltpu.VMEM((band + 2, w, 3 * ci_p), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(*operands)
    return out
