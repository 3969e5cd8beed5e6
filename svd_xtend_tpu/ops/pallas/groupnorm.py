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
                              groups: int, eps: float) -> Array:
    """XLA reference: GN over all non-batch axes, then SiLU. x: (N, ..., C)."""
    n, c = x.shape[0], x.shape[-1]
    xf = x.astype(jnp.float32).reshape(n, -1, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    norm = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    out = norm * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return (out * jax.nn.sigmoid(out)).astype(x.dtype)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, member_ref, o_ref,
                    *, groups: int, eps: float, group_size: int, seq: int):
    # stats via MXU matmuls in the INPUT dtype with fp32 accumulation — no
    # full-size fp32 materialization (a bf16[28,640,1920] sample OOM'd the
    # 16M scoped-vmem default when upcast; see BENCH notes)
    x = x_ref[0]                                          # (S, C) input dtype
    member = member_ref[...].astype(x.dtype)              # (C, G) 0/1 exact
    denom = float(seq * group_size)
    sums = jax.lax.dot(x, member, preferred_element_type=jnp.float32)
    mean_g = jnp.sum(sums, axis=0, keepdims=True) / denom          # (1, G) f32
    sq = jax.lax.dot(x * x, member, preferred_element_type=jnp.float32)
    var_g = jnp.sum(sq, axis=0, keepdims=True) / denom - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)                             # (1, G)
    # broadcast group stats back to channels via member^T matmul (fp32)
    memberT = member_ref[...].T
    mean_c = jax.lax.dot(mean_g, memberT, preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot(inv_g, memberT, preferred_element_type=jnp.float32)
    out = (x.astype(jnp.float32) - mean_c) * inv_c * scale_ref[...] + bias_ref[...]
    o_ref[0] = (out * jax.nn.sigmoid(out)).astype(o_ref.dtype)


def _pallas_forward(x: Array, scale: Array, bias: Array, groups: int,
                    eps: float) -> Array:
    n, c = x.shape[0], x.shape[-1]
    seq = int(np.prod(x.shape[1:-1]))
    x3 = x.reshape(n, seq, c)
    member = jnp.asarray(
        (np.arange(c) // (c // groups))[:, None] == np.arange(groups)[None, :],
        jnp.float32)
    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, groups=groups, eps=eps,
                          group_size=c // groups, seq=seq),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gn_silu(x, scale, bias, groups, eps):
    return _pallas_forward(x, scale, bias, groups, eps)


def _gn_silu_fwd(x, scale, bias, groups, eps):
    return _pallas_forward(x, scale, bias, groups, eps), (x, scale, bias)


def _gn_silu_bwd(groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: group_norm_silu_reference(x, s, b, groups, eps),
        x, scale, bias)
    return vjp(g)


_gn_silu.defvjp(_gn_silu_fwd, _gn_silu_bwd)


def fits_vmem(x_shape, dtype_bytes: int = 4) -> bool:
    # the kernel holds ~4 sample-sized buffers (in, x*x, fp32 centered, out)
    per_sample = int(np.prod(x_shape[1:])) * dtype_bytes * 4
    return per_sample <= _VMEM_BUDGET_BYTES


def group_norm_silu(x: Array, scale: Array, bias: Array, *, groups: int = 32,
                    eps: float = 1e-5, impl: str = "auto") -> Array:
    """GroupNorm (stats over all non-batch dims) + affine + SiLU, fused."""
    if impl == "auto":
        impl = "pallas" if (jax.default_backend() == "tpu"
                            and fits_vmem(x.shape)) else "xla"
    if impl == "pallas":
        return _gn_silu(x, scale, bias, groups, eps)
    return group_norm_silu_reference(x, scale, bias, groups, eps)
