"""Fused Pallas TPU frame-axis (temporal) self-attention.

Motivation (PERF.md session-6): the temporal attention's FLOPs are trivial
(f<=25 frames => ~1.3 GFLOP at the L0 SVD shape) but the XLA einsum lowering
surrounds it with layout copies — q/k/v reshape copies (~0.26 ms each), the
output transpose (~0.23 ms) and a lane-starved f32 softmax fusion (~0.92 ms)
— ~2.5 ms per L0 call against a ~0.3 ms HBM roofline. Reformulating the
einsums (head-major, transposed projections) does NOT remove the copies
(scripts/microbench_temporal_attn_full.py: all variants within 1.5%); only a
fused kernel that consumes the projections' NATIVE (B, F, S, N) layout does.

Kernel shape story:
  - q, k, v, o all stay (B, F, S, N) with N = heads*64 minor — exactly what
    the to_q/to_k/to_v Denses produce, so XLA inserts no operand copies.
  - grid (B, S/S_b): each step loads all F frames of an S_b-token slab.
    Blocks are (1, F, S_b, N); tiling applies to (S_b, N) — both aligned.
  - per head, the whole (F, G) score plane is one broadcast outer product
    (Fc, 1, S_b, 64) * (1, G, S_b, 64) reduced over the minor d axis —
    scores land as (Fc, G, S_b) f32 with the S_b lane axis fully utilized,
    and the softmax reduces over G, a SUBLANE axis — unlike the XLA form
    whose minor axis is the 14-wide frame dim (14/128 lane utilization,
    the measured 0.92 ms). The only Python loops are over heads (and a
    query-frame chunk when F is large), keeping the Mosaic unroll small —
    a first cut that also looped over G compiled for >9 min.

Backward: XLA einsum math via custom_vjp (the einsum backward never showed
in the step profile; training cost is dominated by convs/flash-bwd), so the
kernel needs no bwd twin and training numerics are the oracle's.

Reference behavior contract: TemporalBasicTransformerBlock self-attention
over frames (diffusers transformer_temporal; driven via
src/unet_spatio_temporal_condition.py:418-425 frame folding).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

HEAD_DIM = 64
LANE = 128
# v5e VMEM is 128M; leave headroom for Mosaic's own buffers. The measured
# scoped-stack footprint at (f=14, n=320, sb=128) is 31M (compiler report),
# dominated by the f32 copies/temps of the q/k/v blocks — the model below
# mirrors that accounting.
_VMEM_LIMIT = 100 * 1024 * 1024
_VMEM_BUDGET = 60 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def enabled() -> bool:
    return os.environ.get("SVDX_PALLAS_TATTN", "1") != "0"


def supports(f: int, s: int, n: int) -> bool:
    """Shape gate: token axis tile-aligned, 64-wide heads, frames in sublanes."""
    return s % LANE == 0 and n % HEAD_DIM == 0 and f <= 32


def _choose_tiling(f: int, n: int, dtype_bytes: int = 2) -> Tuple[int, int]:
    """Largest (S_b, query-frame chunk Fc) whose working set fits the budget."""
    for sb in (512, 256, 128):
        blocks = 4 * f * sb * n * dtype_bytes * 2      # q,k,v,o double-buffered
        slices = (2 * f + f) * sb * HEAD_DIM * 4       # kh, vh, qh f32 slices
        for fc in range(f, 0, -1):
            # prod + weighted-v broadcast temps dominate; sc/p/w are /16 of it
            temps = 2 * fc * f * sb * HEAD_DIM * 4
            scores = 3 * fc * f * sb * 4
            acc = fc * sb * HEAD_DIM * 4
            if blocks + slices + temps + scores + acc <= _VMEM_BUDGET:
                return sb, fc
    return 128, 1


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, f: int, h: int,
            fc: int):
    # One transpose to (F, N, S_b) puts d in SUBLANES and tokens in LANES:
    # every contraction below is a full-128-lane sublane reduce (a minor-axis
    # d-reduce both wastes half the lanes at d=64 and hits a Mosaic
    # lane-replication relayout bug, 2026-08).
    qt = jnp.swapaxes(q_ref[0], 1, 2)                  # (F, N, S_b)
    kt = jnp.swapaxes(k_ref[0], 1, 2)
    vt = jnp.swapaxes(v_ref[0], 1, 2)
    for hh in range(h):
        sl = slice(hh * HEAD_DIM, (hh + 1) * HEAD_DIM)
        kh = kt[:, sl, :].astype(jnp.float32)          # (G, 64, S_b)
        vh = vt[:, sl, :].astype(jnp.float32)
        for f0 in range(0, f, fc):
            qc = qt[f0:f0 + fc, sl, :].astype(jnp.float32)
            prod = qc[:, None] * kh[None]              # (Fc, G, 64, S_b)
            sc = jnp.sum(prod, axis=2) * scale         # (Fc, G, S_b)
            bc = lambda r: jnp.broadcast_to(r[:, None, :], sc.shape)
            p = jnp.exp(sc - bc(jnp.max(sc, axis=1)))
            w = p / bc(jnp.sum(p, axis=1))
            acc = jnp.sum(w[:, :, None, :] * vh[None], axis=1)  # (Fc, 64, S_b)
            o_ref[0, f0:f0 + fc, :, sl] = jnp.swapaxes(
                acc, 1, 2).astype(o_ref.dtype)


def _fwd(q: Array, k: Array, v: Array, scale: float) -> Array:
    b, f, s, n = q.shape
    h = n // HEAD_DIM
    sb, fc = _choose_tiling(f, n)
    while s % sb:
        sb //= 2
    grid = (b, s // sb)
    spec = pl.BlockSpec((1, f, sb, n), lambda bi, si: (bi, 0, si, 0))
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, f=f, h=h, fc=fc),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, f, s, n), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(q, k, v)


def _xla_reference(q: Array, k: Array, v: Array, scale: float) -> Array:
    """The einsum form the kernel replaces (FrameAxisAttention orientation)."""
    b, f, s, n = q.shape
    h = n // HEAD_DIM
    qh = q.reshape(b, f, s, h, HEAD_DIM)
    kh = k.reshape(b, f, s, h, HEAD_DIM)
    vh = v.reshape(b, f, s, h, HEAD_DIM)
    logits = jnp.einsum("bfshd,bgshd->bshfg", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    o = jnp.einsum("bshfg,bgshd->bfshd", w, vh)
    return o.reshape(b, f, s, n)


# ------------------------------------------------- SPMD partitioning ------
# Batch dim 0 is the only partitionable axis (samples never mix); the frame,
# token and channel axes must be gathered (replicated) — matching the
# dp/tp-safe treatment of the other kernels (ops/pallas/partition.py). Under
# frames-axis SP the dispatch falls back to the einsum path instead (GSPMD
# inserts the all-gathers there).

@functools.lru_cache(maxsize=None)
def _partitioned_fwd(scale: float):
    from .partition import batch_partitioned
    return batch_partitioned(
        lambda q, k, v: _fwd(q, k, v, scale),
        [0, 0, 0], 0,
        rule="b f s n, b f s n, b f s n -> b f s n",
        need_replication=("f", "s", "n"))


def _partitioned() -> bool:
    return os.environ.get("SVDX_PARTITIONED_KERNELS", "1") != "0"


# ------------------------------------------------------- custom_vjp glue ---

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _tattn(q: Array, k: Array, v: Array, scale: float) -> Array:
    if _partitioned():
        return _partitioned_fwd(float(scale))(q, k, v)
    return _fwd(q, k, v, scale)


def _tattn_fwd(q, k, v, scale):
    return _tattn(q, k, v, scale), (q, k, v)


def _tattn_bwd(scale, res, do):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_reference(q, k, v, scale), q, k, v)
    return vjp(do)


_tattn.defvjp(_tattn_fwd, _tattn_bwd)


def frame_attention(q: Array, k: Array, v: Array, *, num_heads: int,
                    scale: float) -> Array:
    """Per-(b, s) attention over the F axis of (B, F, S, N), N = heads*64.

    Inputs/outputs stay in the projections' native layout; softmax is fp32.
    Numerics contract: `_xla_reference` (== FrameAxisAttention's einsum path;
    tests/test_temporal_attention.py asserts fwd parity and uses the same
    reference math for the custom-vjp backward).
    """
    b, f, s, n = q.shape
    if n != num_heads * HEAD_DIM:
        raise ValueError(f"n={n} != heads*{HEAD_DIM}")
    if not supports(f, s, n):
        raise ValueError(f"unsupported shape f={f} s={s} n={n}")
    return _tattn(q, k, v, float(scale))
