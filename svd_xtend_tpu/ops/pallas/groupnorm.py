"""Fused GroupNorm + SiLU Pallas kernel.

The TPU-native analog of the cuDNN-fused norm path (SURVEY.md §2.4:
"Pallas/XLA fused GroupNorm+SiLU ... kernels"). XLA lowers GroupNorm to a
stats pass plus a normalize pass (2 reads + 1 write of x from HBM); this
kernel keeps the whole sample in VMEM: 1 read + 1 write, with the SiLU (and
affine) fused in.

Layout trick: with channels last, per-group statistics would need an
in-register re-layout of the lane (channel) axis. Instead the group
reduction is expressed as a matmul with a constant 0/1 (C, G) membership
matrix — sums-per-group and the broadcast back to channels both run on the
MXU, so the lane layout never changes.

Backward: custom_vjp that recomputes via the XLA reference (the forward is
the inference hot path; training reuses XLA's well-fused backward).
Dispatch: wrapper falls back to XLA when a sample doesn't fit VMEM or the
backend isn't TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_VMEM_BUDGET_BYTES = 80 * 1024 * 1024


def group_norm_silu_reference(x: Array, scale: Array, bias: Array,
                              groups: int, eps: float,
                              silu: bool = True) -> Array:
    """XLA reference: GN over all non-batch axes, then SiLU. x: (N, ..., C)."""
    n, c = x.shape[0], x.shape[-1]
    xf = x.astype(jnp.float32).reshape(n, -1, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    norm = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    out = norm * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, member_ref, o_ref,
                    *, groups: int, eps: float, group_size: int, seq: int,
                    silu: bool):
    # stats via MXU matmuls in the INPUT dtype with fp32 accumulation — no
    # full-size fp32 materialization (a bf16[28,640,1920] sample OOM'd the
    # 16M scoped-vmem default when upcast; see BENCH notes)
    x = x_ref[0]                                          # (S, C) input dtype
    member = member_ref[...].astype(x.dtype)              # (C, G) 0/1 exact
    denom = float(seq * group_size)
    sums = jax.lax.dot(x, member, preferred_element_type=jnp.float32)
    mean_g = jnp.sum(sums, axis=0, keepdims=True) / denom          # (1, G) f32
    sq = jax.lax.dot(x * x, member, preferred_element_type=jnp.float32)
    var_g = jnp.maximum(
        jnp.sum(sq, axis=0, keepdims=True) / denom - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)                             # (1, G)
    # broadcast group stats back to channels via member^T matmul (fp32)
    memberT = member_ref[...].T
    mean_c = jax.lax.dot(mean_g, memberT, preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot(inv_g, memberT, preferred_element_type=jnp.float32)
    out = (x.astype(jnp.float32) - mean_c) * inv_c * scale_ref[...] + bias_ref[...]
    if silu:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


def _stats_kernel(x_ref, member_ref, mean_ref, inv_ref, sum_scr, sq_scr,
                  *, eps: float, denom: float, tiles: int):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        sum_scr[...] = jnp.zeros_like(sum_scr)
        sq_scr[...] = jnp.zeros_like(sq_scr)

    x = x_ref[0]                                           # (tile, C)
    member = member_ref[...].astype(x.dtype)               # (C, G) 0/1 exact
    sum_scr[...] += jnp.sum(
        jax.lax.dot(x, member, preferred_element_type=jnp.float32),
        axis=0, keepdims=True)
    sq_scr[...] += jnp.sum(
        jax.lax.dot(x * x, member, preferred_element_type=jnp.float32),
        axis=0, keepdims=True)

    @pl.when(ti == tiles - 1)
    def _finalize():
        mean = sum_scr[...] / denom
        var = jnp.maximum(sq_scr[...] / denom - mean * mean, 0.0)
        mean_ref[0] = mean
        inv_ref[0] = jax.lax.rsqrt(var + eps)


def _norm_kernel(x_ref, scale_ref, bias_ref, member_ref, mean_ref, inv_ref,
                 o_ref, *, silu: bool):
    x = x_ref[0].astype(jnp.float32)                       # (tile, C)
    memberT = member_ref[...].T                            # (G, C)
    mean_c = jax.lax.dot(mean_ref[0], memberT,
                         preferred_element_type=jnp.float32)   # (1, C)
    inv_c = jax.lax.dot(inv_ref[0], memberT,
                        preferred_element_type=jnp.float32)
    out = (x - mean_c) * inv_c * scale_ref[...] + bias_ref[...]
    if silu:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


def _choose_tile(seq: int, c: int, dtype_bytes: int) -> int:
    """Largest divisor of seq (multiple of 8) whose tile fits ~1/8 of VMEM."""
    budget = _VMEM_BUDGET_BYTES // 8
    best = 0
    for t in range(8, seq + 1, 8):
        if seq % t == 0 and t * c * (dtype_bytes + 4) <= budget:
            best = t
    return best


def _pallas_tiled_forward(x: Array, scale: Array, bias: Array, groups: int,
                          eps: float, tile: int, silu: bool = True) -> Array:
    """Two-pass (stats, then normalize) kernel for samples too large for
    VMEM: same 2R+1W HBM traffic as XLA's lowering but no fp32
    materialization / re-layout copies, and the SiLU rides along free."""
    n, c = x.shape[0], x.shape[-1]
    seq = int(np.prod(x.shape[1:-1]))
    x3 = x.reshape(n, seq, c)
    tiles = seq // tile
    # built from iota (not a numpy constant): custom_partitioning traces
    # the surrounding impl and requires a const-free jaxpr
    member = (jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
              // (c // groups)
              == jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
              ).astype(jnp.float32)

    mean_g, inv_g = pl.pallas_call(
        functools.partial(_stats_kernel, eps=eps,
                          denom=float(seq * (c // groups)), tiles=tiles),
        grid=(n, tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, t: (i, t, 0)),
            pl.BlockSpec((c, groups), lambda i, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, groups), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, groups), lambda i, t: (i, 0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((n, 1, groups), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1, groups), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, groups), jnp.float32),
                        pltpu.VMEM((1, groups), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x3, member)

    out = pl.pallas_call(
        functools.partial(_norm_kernel, silu=silu),
        grid=(n, tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, c), lambda i, t: (0, 0)),
            pl.BlockSpec((1, c), lambda i, t: (0, 0)),
            pl.BlockSpec((c, groups), lambda i, t: (0, 0)),
            pl.BlockSpec((1, 1, groups), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, groups), lambda i, t: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((n, seq, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x3, scale.reshape(1, c).astype(jnp.float32),
      bias.reshape(1, c).astype(jnp.float32), member, mean_g, inv_g)
    return out.reshape(x.shape)


def _pallas_forward(x: Array, scale: Array, bias: Array, groups: int,
                    eps: float, silu: bool = True) -> Array:
    n, c = x.shape[0], x.shape[-1]
    seq = int(np.prod(x.shape[1:-1]))
    x3 = x.reshape(n, seq, c)
    # built from iota (not a numpy constant): custom_partitioning traces
    # the surrounding impl and requires a const-free jaxpr
    member = (jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
              // (c // groups)
              == jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
              ).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, groups=groups, eps=eps,
                          group_size=c // groups, seq=seq, silu=silu),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, seq, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, seq, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, seq, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x3, scale.reshape(1, c).astype(jnp.float32),
      bias.reshape(1, c).astype(jnp.float32), member)
    return out.reshape(x.shape)


def _dispatch_forward_local(x, scale, bias, groups, eps, silu):
    if fits_vmem(x.shape):
        return _pallas_forward(x, scale, bias, groups, eps, silu)
    tile = _choose_tile(int(np.prod(x.shape[1:-1])), x.shape[-1],
                        x.dtype.itemsize)
    if tile:
        return _pallas_tiled_forward(x, scale, bias, groups, eps, tile, silu)
    return group_norm_silu_reference(x, scale, bias, groups, eps, silu)


@functools.lru_cache(maxsize=None)
def _partitioned_forward(groups: int, eps: float, silu: bool):
    """Batch-dim-only SPMD wrapper (ops/pallas/partition.py): per-shard
    Pallas lowering, so VMEM-fit/tile choices see local shapes. Stats are
    per sample, so batch sharding is exact."""
    from .partition import batch_partitioned

    def impl(x3, scale, bias):
        return _dispatch_forward_local(x3, scale, bias, groups, eps, silu)

    return batch_partitioned(impl, [0, None, None], 0,
                             rule="n s c, c, c -> n s c",
                             need_replication=("s", "c"))


def _dispatch_forward(x, scale, bias, groups, eps, silu):
    import os
    if os.environ.get("SVDX_PARTITIONED_KERNELS", "1") == "0":
        return _dispatch_forward_local(x, scale, bias, groups, eps, silu)
    n, c = x.shape[0], x.shape[-1]
    x3 = x.reshape(n, -1, c)
    out = _partitioned_forward(groups, float(eps), bool(silu))(
        x3, scale.reshape(c), bias.reshape(c))
    return out.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_silu(x, scale, bias, groups, eps, silu):
    return _dispatch_forward(x, scale, bias, groups, eps, silu)


def _gn_silu_fwd(x, scale, bias, groups, eps, silu):
    return _dispatch_forward(x, scale, bias, groups, eps, silu), (x, scale, bias)


def _gn_silu_bwd(groups, eps, silu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: group_norm_silu_reference(x, s, b, groups, eps, silu),
        x, scale, bias)
    return vjp(g)


_gn_silu.defvjp(_gn_silu_fwd, _gn_silu_bwd)


def group_norm_fold(x: Array, scale: Array, bias: Array, *, groups: int = 32,
                    eps: float = 1e-5):
    """Fold GroupNorm stats + affine into a per-(sample, channel) f32 affine:
    returns (sc, sh) with GN(x)*scale + bias == x*sc + sh (before any SiLU).

    This is the stats half of GroupNorm decoupled from the normalize half so
    the normalize (+SiLU) can ride as an input epilogue of the consumer — the
    Pallas conv3x3 (ops/pallas/conv3x3.py) or the fused temporal resnet — and
    the normalized activation never exists in HBM.

    The moments are computed as per-CHANNEL (sum, sumsq) reduces over the
    spatial axis in x's native (..., C) layout, then grouped on the tiny
    (N, C) result. The earlier jnp.mean/jnp.var over a (n, -1, G, gs)
    reshaped view made XLA materialize TWO full f32 copies of x — one of
    them transposed into a T(2,128) gs-minor layout — costing ~0.8 ms per
    fold site at L0 (r2 HLO/trace: reshape+copy 'convert_element_type' pairs
    around every temporal_res_block and conv-fold). The sumsq form matches
    _gn_silu_kernel / _fold_from_channel_sums, so all three GN stats paths
    now share one formula."""
    n, c = x.shape[0], x.shape[-1]
    gs = c // groups
    x3 = x.reshape(n, -1, c)
    xf = x3.astype(jnp.float32)
    sum_c = jnp.sum(xf, axis=1)                            # (N, C) one pass
    sq_c = jnp.sum(xf * xf, axis=1)                        # (sibling fusion)
    denom = float(x3.shape[1] * gs)
    mean = jnp.sum(sum_c.reshape(n, groups, gs), axis=2) / denom   # (N, G)
    # one-pass E[x^2]-mean^2 can go slightly negative under f32 cancellation
    # (near-constant group with large mean); clamp before rsqrt
    var = jnp.maximum(jnp.sum(sq_c.reshape(n, groups, gs), axis=2) / denom
                      - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, gs, axis=1)                  # (N, C)
    inv_c = jnp.repeat(inv, gs, axis=1)
    sc = inv_c * scale.astype(jnp.float32)[None, :]
    sh = bias.astype(jnp.float32)[None, :] - mean_c * sc
    return sc, sh


def group_norm_fold_cat(parts, scale: Array, bias: Array, *,
                        groups: int = 32, eps: float = 1e-5):
    """`group_norm_fold` over the virtual concat of `parts` along the channel
    axis, WITHOUT materializing the concat. Used by the split-concat resnet
    path (models/blocks.py: ResnetBlock2D(skip_cat=...)): the up-block skip
    concat never exists in HBM — each part is read once for its per-channel
    (sum, sumsq), and the returned full-width (N, C_total) f32 (sc, sh) is
    sliced per part by the consumer. Identical math to group_norm_fold on
    jnp.concatenate(parts, -1) (group boundaries may straddle parts — e.g.
    L1's 640+320 with gs=30 — which the concatenated (N, C) sums handle
    naturally)."""
    n = parts[0].shape[0]
    c = sum(p.shape[-1] for p in parts)
    gs = c // groups
    sums, sqs, spatial = [], [], None
    for p in parts:
        p3 = p.reshape(n, -1, p.shape[-1])
        if spatial is None:
            spatial = p3.shape[1]
        elif p3.shape[1] != spatial:
            raise ValueError(
                "group_norm_fold_cat: parts must share the spatial extent "
                f"(got {p3.shape[1]} vs {spatial}) — the per-group denominator "
                "assumes one spatial size across the channel concat")
        pf = p3.astype(jnp.float32)
        sums.append(jnp.sum(pf, axis=1))
        sqs.append(jnp.sum(pf * pf, axis=1))
    sum_c = jnp.concatenate(sums, axis=-1)                 # (N, C) tiny
    sq_c = jnp.concatenate(sqs, axis=-1)
    denom = float(spatial * gs)
    mean = jnp.sum(sum_c.reshape(n, groups, gs), axis=2) / denom   # (N, G)
    var = jnp.maximum(jnp.sum(sq_c.reshape(n, groups, gs), axis=2) / denom
                      - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, gs, axis=1)                  # (N, C)
    inv_c = jnp.repeat(inv, gs, axis=1)
    sc = inv_c * scale.astype(jnp.float32)[None, :]
    sh = bias.astype(jnp.float32)[None, :] - mean_c * sc
    return sc, sh


def fits_vmem(x_shape, dtype_bytes: int = 4) -> bool:
    # the kernel holds ~4 sample-sized buffers (in, x*x, fp32 centered, out)
    per_sample = int(np.prod(x_shape[1:])) * dtype_bytes * 4
    return per_sample <= _VMEM_BUDGET_BYTES


def group_norm_silu(x: Array, scale: Array, bias: Array, *, groups: int = 32,
                    eps: float = 1e-5, impl: str = "auto",
                    silu: bool = True) -> Array:
    """GroupNorm (stats over all non-batch dims) + affine (+ fused SiLU)."""
    if impl == "auto":
        import os
        # SVDX_PALLAS_GN=0 forces the plain-XLA form at the standalone GN
        # sites (transformer spatial norm, VAE attention norm) — the same
        # relayout-tax question GN-fold answered for the resnet sites
        # (PERF.md session-12); A/B via scripts/ab_env.py.
        if os.environ.get("SVDX_PALLAS_GN", "1") == "0":
            impl = "xla"
        else:
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return _gn_silu(x, scale, bias, groups, eps, silu)
    return group_norm_silu_reference(x, scale, bias, groups, eps, silu)
