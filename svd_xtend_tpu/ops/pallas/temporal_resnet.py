"""Fused Pallas TPU temporal-resnet block.

Motivation (PERF.md session-8): the temporal resnets are 15.2 ms of the
189.6 ms UNet step (trace_unet.py) yet their FLOPs are trivial — the chain
GN→SiLU→(3,1)-frame-conv→+temb→GN→SiLU→(3,1)-frame-conv→alpha-blend makes
~15 HBM passes over the activation (two GN read+write pairs, two pad
materializations + three shifted reads per conv, the shortcut add and the
blend), i.e. it is bandwidth-bound at <50 % of roofline. This module fuses
the whole block into TWO pallas_calls plus tiny XLA folds:

  stats1 (XLA read of x)                      — 1 read
  kernel A: conv1(silu(x·sc1+sh1)) + b1 + temb, emitting per-tile channel
            partial sums of its own output for norm2            — 1R + 1W
  fold2 (XLA on (B, nS, C) partials — negligible)
  kernel B: res + conv2'(silu(h·sc2+sh2))                       — 2R + 1W

Two algebraic collapses make the single-output fusion exact:
  - With `image_only_indicator=None` (the SVD UNet always — the reference
    passes zeros at src/unet_spatio_temporal_condition.py:430, selecting the
    plain blend) and matching channels (always: the temporal resnet sees the
    spatial resnet's output), AlphaBlender(x, x + h2) == x + (1-α)·h2.
  - The temporal-branch weight w = 1-α folds into conv2's weights/bias
    (conv is linear), so kernel B needs no scalar operand.

The (3,1) frame conv itself is three channel matmuls on frame-shifted VMEM
views (the TemporalConv formulation, models/blocks.py) — with all F frames
of an S-slab resident, the shifts are free slices instead of the two HBM
pad materializations XLA emits.

Backward: custom_vjp through `temporal_resnet_reference` (pure XLA, the
same math) — the block's training cost is dominated by convs/flash-bwd, so
the kernel needs no bwd twin and training numerics are the oracle's.

Reference behavior contract: diffusers TemporalResnetBlock + AlphaBlender
as driven by SpatioTemporalResBlock (SURVEY.md §2.2; reference wiring at
src/unet_spatio_temporal_condition.py:432-477).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_VMEM_LIMIT = 100 * 1024 * 1024
_VMEM_BUDGET = 60 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def enabled() -> bool:
    # Default ON since r2: hardware-validated on the v5e relay
    # (scripts/microbench_tresnet.py 2026-08-18/19 — compiles in 3-5 s/shape,
    # wins 1.09-1.78x at the UNet shapes and 7.65x at the VAE-decode top
    # level; the one losing shape class is routed to XLA by `supports`) and
    # whole-pipeline A/B-confirmed (PERF.md session-9). SVDX_PALLAS_TRESNET=0
    # is the kill switch; "force" additionally engages it off-TPU.
    return os.environ.get("SVDX_PALLAS_TRESNET", "1") in ("1", "force")


def _choose_sb(f: int, s: int, c: int) -> int:
    """Largest divisor of S (multiple of 8) whose working set fits VMEM.

    Per grid cell: x/out/res blocks bf16 double-buffered (3·2·2 bytes/elt),
    the f32 pre-activation + accumulator + tap temporaries (~16 bytes/elt),
    and the (3, C, C) weights.
    """
    weights = 3 * c * c * 2 + 8 * c * 4
    for sb in range(min(s, 2048), 0, -8):
        if s % sb:
            continue
        if f * sb * c * 28 + weights <= _VMEM_BUDGET:
            return sb
    return 0


def supports(b: int, f: int, s: int, c: int) -> bool:
    """Shape gate: frame axis VMEM-resident, S tileable, square channels.

    Perf clause (measured on v5e, scripts/microbench_tresnet.py 2026-08-18):
    when C >= 1280 AND S must be split into multiple tiles, each S-tile
    re-streams the (3, C, C) bf16 weights (9.8 MB at C=1280) and the kernel
    LOSES to XLA (0.83x at F14 S160 C1280); every single-tile or
    C<=640 shape wins (1.12-7.47x). Route the losing class to XLA."""
    if f > 32 or s % 8 or _choose_sb(f, s, c) == 0:
        return False
    return not (c >= 1280 and _choose_sb(f, s, c) < s)


def _tconv_core(x_ref, k_ref, sc_ref, sh_ref, *, f: int):
    """silu(x·sc+sh) then the 3-tap frame conv; returns the f32 accumulator.

    x_ref block (1, F, sb, C); k_ref (3, C, C); sc/sh (1, 1, C) f32 per-batch
    GN folds (trailing-singleton layout so the block's last two dims equal
    the array's — Mosaic's 8×128 block rule rejects a (1, C) block over a
    (B, C) operand). The taps are matmuls over frame-shifted slices — output
    frame t takes x[t-1]@k0 + x[t]@k1 + x[t+1]@k2 (SAME zero padding).
    """
    x = x_ref[0].astype(jnp.float32)                     # (F, sb, C)
    sb, c = x.shape[1], x.shape[2]
    xv = x * sc_ref[0][:, None, :] + sh_ref[0][:, None, :]
    xv = (xv * jax.nn.sigmoid(xv)).astype(k_ref.dtype)
    k = k_ref[...]                                       # (3, C, Co)
    co = k.shape[2]
    dot = lambda a, w: jax.lax.dot_general(
        a.reshape(-1, c), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = dot(xv, k[1]).reshape(f, sb, co)
    if f > 1:
        zeros = jnp.zeros((1, sb, co), jnp.float32)
        prev = dot(xv[:f - 1], k[0]).reshape(f - 1, sb, co)
        nxt = dot(xv[1:], k[2]).reshape(f - 1, sb, co)
        acc = acc + jnp.concatenate([zeros, prev], 0)
        acc = acc + jnp.concatenate([nxt, zeros], 0)
    return acc


def _kernel_a(x_ref, k_ref, b_ref, sc_ref, sh_ref, t_ref, o_ref, ps_ref,
              pq_ref, *, f: int):
    acc = _tconv_core(x_ref, k_ref, sc_ref, sh_ref, f=f)
    acc = (acc + b_ref[...][:, None, :]
           + t_ref[0].astype(jnp.float32)[:, None, :])
    hb = acc.astype(o_ref.dtype)
    o_ref[0] = hb
    # norm2 partial stats from the STORED (rounded) value, matching what the
    # unfused GN would read back from HBM
    hf = hb.astype(jnp.float32)
    ps_ref[...] = jnp.sum(hf, axis=(0, 1))[None, None, None, :]
    pq_ref[...] = jnp.sum(hf * hf, axis=(0, 1))[None, None, None, :]


def _kernel_b(x_ref, k_ref, b_ref, sc_ref, sh_ref, res_ref, o_ref, *, f: int):
    acc = _tconv_core(x_ref, k_ref, sc_ref, sh_ref, f=f)
    acc = acc + b_ref[...][:, None, :]
    o_ref[0] = (res_ref[0].astype(jnp.float32) + acc).astype(o_ref.dtype)


def _call_a(x: Array, k: Array, b: Array, sc: Array, sh: Array, t: Array):
    bsz, f, s, c = x.shape
    co = k.shape[2]
    sb = _choose_sb(f, s, c)
    ns = s // sb
    grid = (bsz, ns)
    xspec = pl.BlockSpec((1, f, sb, c), lambda bi, si: (bi, 0, si, 0))
    # sc/sh carried as (B, 1, C) and ps/pq emitted as (B, nS, 1, C): blocks
    # whose last two dims equal the array's, per Mosaic's 8×128 block rule.
    h, ps, pq = pl.pallas_call(
        functools.partial(_kernel_a, f=f),
        grid=grid,
        in_specs=[
            xspec,
            pl.BlockSpec((3, c, co), lambda bi, si: (0, 0, 0)),
            pl.BlockSpec((1, co), lambda bi, si: (0, 0)),
            pl.BlockSpec((1, 1, c), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, f, co), lambda bi, si: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, f, sb, co), lambda bi, si: (bi, 0, si, 0)),
            pl.BlockSpec((1, 1, 1, co), lambda bi, si: (bi, si, 0, 0)),
            pl.BlockSpec((1, 1, 1, co), lambda bi, si: (bi, si, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, f, s, co), x.dtype),
            jax.ShapeDtypeStruct((bsz, ns, 1, co), jnp.float32),
            jax.ShapeDtypeStruct((bsz, ns, 1, co), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(x, k, b.reshape(1, co), sc.reshape(bsz, 1, c), sh.reshape(bsz, 1, c), t)
    return h, ps.reshape(bsz, ns, co), pq.reshape(bsz, ns, co)


def _call_b(x: Array, k: Array, b: Array, sc: Array, sh: Array, res: Array):
    bsz, f, s, c = x.shape
    co = k.shape[2]
    sb = _choose_sb(f, s, c)
    grid = (bsz, s // sb)
    xspec = pl.BlockSpec((1, f, sb, c), lambda bi, si: (bi, 0, si, 0))
    ospec = pl.BlockSpec((1, f, sb, co), lambda bi, si: (bi, 0, si, 0))
    return pl.pallas_call(
        functools.partial(_kernel_b, f=f),
        grid=grid,
        in_specs=[
            xspec,
            pl.BlockSpec((3, c, co), lambda bi, si: (0, 0, 0)),
            pl.BlockSpec((1, co), lambda bi, si: (0, 0)),
            pl.BlockSpec((1, 1, c), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda bi, si: (bi, 0, 0)),
            ospec,
        ],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((bsz, f, s, co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(x, k, b.reshape(1, co), sc.reshape(bsz, 1, c), sh.reshape(bsz, 1, c),
      res)


# ------------------------------------------------- SPMD partitioning ------
# Batch-parallel only, like every kernel here (ops/pallas/partition.py):
# GN stats and the frame conv never mix samples.

@functools.lru_cache(maxsize=None)
def _partitioned_a():
    from .partition import batch_partitioned
    return batch_partitioned(
        _call_a, [0, None, None, 0, 0, 0], [0, 0, 0],
        rule="b f s c, e c d, d, b c, b c, b f d -> b f s d, b n d, b n d",
        need_replication=("f", "s", "c", "e", "d", "n"))


@functools.lru_cache(maxsize=None)
def _partitioned_b():
    from .partition import batch_partitioned
    return batch_partitioned(
        _call_b, [0, None, None, 0, 0, 0], 0,
        rule="b f s c, e c d, d, b c, b c, b f s d -> b f s d",
        need_replication=("f", "s", "c", "e", "d"))


def _partitioned() -> bool:
    return os.environ.get("SVDX_PARTITIONED_KERNELS", "1") != "0"


# ------------------------------------------------------------ assembly ----

def _fold_from_channel_sums(ps: Array, pq: Array, count: int, scale: Array,
                            bias: Array, groups: int, eps: float):
    """GN fold params from per-channel (sum, sumsq) partials: (sc, sh) f32
    with GN(h)*scale + bias == h*sc + sh. ps/pq: (B, nS, C)."""
    sum_c = jnp.sum(ps, axis=1)                          # (B, C) f32
    sq_c = jnp.sum(pq, axis=1)
    bsz, c = sum_c.shape
    gs = c // groups
    denom = float(count * gs)
    mean_g = jnp.sum(sum_c.reshape(bsz, groups, gs), axis=2) / denom
    var_g = jnp.maximum(
        jnp.sum(sq_c.reshape(bsz, groups, gs), axis=2) / denom - mean_g ** 2,
        0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, gs, axis=1)
    inv_c = jnp.repeat(inv_g, gs, axis=1)
    sc = inv_c * scale.astype(jnp.float32)[None, :]
    sh = bias.astype(jnp.float32)[None, :] - mean_c * sc
    return sc, sh


def _tconv_ref(x: Array, k: Array, b: Array) -> Array:
    """The TemporalConv math (models/blocks.py): 3 frame-shifted matmuls."""
    prev = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    nxt = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    return prev @ k[0] + x @ k[1] + nxt @ k[2] + b


def temporal_resnet_reference(x: Array, t: Array, k1, b1, k2, b2,
                              scale1, bias1, scale2, bias2, w: Array,
                              groups: int, eps: float) -> Array:
    """Pure-XLA oracle: x + w·(conv2(gn2silu(conv1(gn1silu(x)) + b1 + t)))
    — exactly SpatioTemporalResBlock's temporal branch + AlphaBlender with
    identity shortcut and indicator-free blend. x: (B, F, S, C); t: (B, F, C)
    per-frame temb projection; k1/k2: (3, C, C); w: the temporal-branch
    blend weight 1-α."""
    from .groupnorm import group_norm_silu_reference
    h = group_norm_silu_reference(x, scale1, bias1, groups, eps)
    h = _tconv_ref(h, k1, b1) + t[:, :, None, :].astype(x.dtype)
    h2 = group_norm_silu_reference(h, scale2, bias2, groups, eps)
    h2 = _tconv_ref(h2, k2, b2)
    out = x.astype(jnp.float32) + w.astype(jnp.float32) * h2.astype(jnp.float32)
    return out.astype(x.dtype)


def _fwd(x, t, k1, b1, k2, b2, scale1, bias1, scale2, bias2, w,
         groups: int, eps: float) -> Array:
    from .groupnorm import group_norm_fold
    bsz, f, s, c = x.shape
    sc1, sh1 = group_norm_fold(x, scale1, bias1, groups=groups, eps=eps)
    call_a = _partitioned_a() if _partitioned() else _call_a
    call_b = _partitioned_b() if _partitioned() else _call_b
    h, ps, pq = call_a(x, k1, b1, sc1, sh1, t.astype(x.dtype))
    sc2, sh2 = _fold_from_channel_sums(ps, pq, f * s, scale2, bias2,
                                       groups, eps)
    # fold the blend weight into conv2 (linear in weights/bias)
    wf = w.astype(jnp.float32)
    k2w = (k2.astype(jnp.float32) * wf).astype(k2.dtype)
    b2w = (b2.astype(jnp.float32) * wf).astype(b2.dtype)
    return call_b(h, k2w, b2w, sc2, sh2, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _tresnet(x, t, k1, b1, k2, b2, scale1, bias1, scale2, bias2, w,
             groups, eps):
    return _fwd(x, t, k1, b1, k2, b2, scale1, bias1, scale2, bias2, w,
                groups, eps)


def _tresnet_fwd(x, t, k1, b1, k2, b2, scale1, bias1, scale2, bias2, w,
                 groups, eps):
    out = _tresnet(x, t, k1, b1, k2, b2, scale1, bias1, scale2, bias2, w,
                   groups, eps)
    return out, (x, t, k1, b1, k2, b2, scale1, bias1, scale2, bias2, w)


def _tresnet_bwd(groups, eps, res, g):
    x, t, k1, b1, k2, b2, scale1, bias1, scale2, bias2, w = res
    _, vjp = jax.vjp(
        lambda *a: temporal_resnet_reference(*a, groups, eps),
        x, t, k1, b1, k2, b2, scale1, bias1, scale2, bias2, w)
    return vjp(g)


_tresnet.defvjp(_tresnet_fwd, _tresnet_bwd)


def dispatchable(b: int, f: int, s: int, c: int) -> bool:
    """THE dispatch predicate — shared by the module-level route choice
    (models/blocks.py) and temporal_resnet_block's internal guard, so the
    two can never desynchronize."""
    return (enabled() and supports(b, f, s, c)
            and (jax.default_backend() == "tpu"
                 or os.environ.get("SVDX_PALLAS_TRESNET") == "force"))


def temporal_resnet_block(x: Array, t: Array, k1: Array, b1: Array,
                          k2: Array, b2: Array, scale1: Array, bias1: Array,
                          scale2: Array, bias2: Array, w: Array, *,
                          groups: int = 32, eps: float = 1e-5) -> Array:
    """Fused temporal resnet + blend: x + w·conv2(gn2silu(conv1(gn1silu(x))
    + b1 + t)) on (B, F, S, C). Dispatches to the Pallas pair when
    `dispatchable`, to `temporal_resnet_reference` otherwise (same math,
    so CPU tests and odd shapes share one semantics). Numerics contract:
    `temporal_resnet_reference`; backward always routes through it."""
    bsz, f, s, c = x.shape
    if dispatchable(bsz, f, s, c):
        return _tresnet(x, t, k1, b1, k2, b2, scale1, bias1, scale2, bias2,
                        w, groups, eps)
    return temporal_resnet_reference(x, t, k1, b1, k2, b2, scale1, bias1,
                                     scale2, bias2, w, groups, eps)
