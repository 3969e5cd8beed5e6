"""Pallas TPU flash attention (forward + backward), non-causal.

The TPU-native replacement for the reference's xformers/SDPA fast path
(train_svd.py:681-693; SURVEY.md §2.4). Tuned for the SVD spatial attention
shape family: sequences 640-4608 tokens (h*w at latent resolutions), head_dim
64, large fused batch (b*frames*heads). The (S, S) score matrix is never
materialized — online softmax over KV tiles (the memory lever that lets
576x1024xf25 training fit a v5e chip, SURVEY.md §7).

Layout notes (Mosaic tiling wants (8k, 128m) tiles):
  - kernels run on (BH, S, D): batch and heads pre-merged by the wrapper.
  - softmax stats (m, l) live in VMEM scratch as (BLOCK, 128) —
    lane-replicated columns, so `exp(s - m)` is a pure elementwise op against
    the (BLOCK, BLOCK) score tile.
  - LSE / delta cross-kernel tensors use an (BH, 8, S) "lanes" layout:
    the row vector the dkv kernel needs is a free slice; the column vector
    the dq kernel needs is one tiny (1, BLOCK) transpose per tile.

Backward is the standard FA-2 recipe: forward also emits LSE; the dq kernel
re-computes P tile-by-tile and accumulates ds @ K; the dkv kernel walks Q
tiles accumulating P^T @ dO and ds^T @ Q; delta = rowsum(dO * O) is a cheap
XLA prologue. On non-TPU backends kernels run interpreted (tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BLOCK = 128
LANES = 128
SUBS = 8          # sublane replication for the (BH, 8, S) stat tensors
NEG_INF = -1e30
LOG2E = 1.4426950408889634

# Forward block sizes measured on v5e (scripts/microbench_flash_variants.py
# + block sweep, PERF.md session-7): per-shape winners for the SVD spatial
# sequence lengths at the two operating points. vs the old fixed-512 blocks:
# s=2560 6.24->4.44 ms, s=2304 16.7->7.4 ms, s=9216 133->85 ms.
_FWD_BLOCKS = {2560: (1280, 1280), 2304: (1152, 2304), 9216: (1024, 1536)}
# Backward holds TWO (bq, bkm) fp32 temporaries (scores + dp), so its VMEM
# ceiling is lower — the fwd (1152, 2304) entry fails to compile there.
# Measured bwd winners (v5e): s=2560 8.2->5.4 ms, s=2304 22.4->9.2 ms,
# s=9216 167->108 ms vs the old fixed 512/256/128 blocks.
_BWD_BLOCKS = {2560: (1280, 1280), 2304: (1152, 1152), 9216: (1024, 1536)}


def _choose_block(s: int, candidates=(512, 256, 128)) -> int:
    """Largest candidate major-tile size dividing the sequence length."""
    for c in candidates:
        if s % c == 0:
            return c
    raise ValueError(f"sequence {s} not divisible by {BLOCK}")


def _largest_div(s: int, cap: int) -> int:
    """Largest multiple of 128 dividing s, at most cap."""
    best = 0
    c = BLOCK
    while c <= cap:
        if s % c == 0:
            best = c
        c += BLOCK
    if best == 0:
        raise ValueError(f"sequence {s} not divisible by {BLOCK}")
    return best


def _fwd_blocks(s_q: int, s_kv: int) -> Tuple[int, int]:
    """(bq, bkm) for the forward kernel: tuned table, else a heuristic that
    prefers wide KV tiles (fewer softmax-stat updates) under a ~6.5 MB
    fp32 score-tile VMEM budget (the measured sweet spot)."""
    if s_q == s_kv and s_q in _FWD_BLOCKS:
        return _FWD_BLOCKS[s_q]
    bkm = _largest_div(s_kv, cap=1536)
    bq = _largest_div(s_q, cap=min(1280, (1280 * 1280) // bkm))
    return bq, bkm


def _bwd_blocks(s_q: int, s_kv: int) -> Tuple[int, int]:
    """Like _fwd_blocks but with the tighter backward VMEM budget
    (bq * bkm capped at 1280^2 fp32 elements per temporary)."""
    if s_q == s_kv and s_q in _BWD_BLOCKS:
        return _BWD_BLOCKS[s_q]
    bkm = _largest_div(s_kv, cap=1536)
    bq = _largest_div(s_q, cap=min(1280, (1280 * 1280) // bkm))
    return bq, bkm


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ------------------------------------------------------------- forward -----

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, scale: float, kv_tiles: int, bq: int, bkm: int,
                major: bool):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                     # (bq, D)
    d = acc_scr.shape[-1]
    if major:
        # One (bq, bkm) score dot and ONE softmax-stat update per KV major
        # tile (vs one per 128-wide sub-tile below): ~bkm/128 x fewer
        # max/alpha/rescale passes, and exp2 with log2(e) folded into the
        # QK scale (the VPU's native exponential; measured 37.7 -> 46.4
        # TFLOP/s at s=2560 before block retuning, PERF.md session-7).
        # m/l scratch then hold base-2 stats; lse converts at finalize.
        k = k_ref[0]                                 # (bkm, D)
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ) * (scale * LOG2E)
        m_prev = m_scr[...]                          # (bq, 128) lane-replicated
        l_prev = l_scr[...]
        m_curr = jax.lax.broadcast_in_dim(jnp.max(s, axis=1), (bq, LANES), (0,))
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - jax.lax.broadcast_in_dim(m_next[:, 0], (bq, bkm), (0,)))
        l_curr = jax.lax.broadcast_in_dim(jnp.sum(p, axis=1), (bq, LANES), (0,))
        m_scr[...] = m_next
        l_scr[...] = alpha * l_prev + l_curr
        acc_scr[...] = acc_scr[...] * alpha[:, :d] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    else:
        # inner loop over BLOCK-sized KV sub-tiles of the (1, bkm, D) major
        # tile — kept for sequences whose largest 128-multiple divisor is
        # < 512, where the major-tile form measured slower
        for j in range(bkm // BLOCK):
            k = k_ref[0, pl.ds(j * BLOCK, BLOCK), :]     # (BLOCK, D)
            v = v_ref[0, pl.ds(j * BLOCK, BLOCK), :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            m_prev = m_scr[...]                      # (bq, 128) lane-replicated
            l_prev = l_scr[...]
            m_curr = jax.lax.broadcast_in_dim(jnp.max(s, axis=1), (bq, LANES),
                                              (0,))
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :BLOCK])       # (bq, BLOCK)
            l_curr = jax.lax.broadcast_in_dim(jnp.sum(p, axis=1), (bq, LANES),
                                              (0,))
            l_next = alpha * l_prev + l_curr
            m_scr[...] = m_next
            l_scr[...] = l_next
            acc_scr[...] = acc_scr[...] * alpha[:, :d] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(ki == kv_tiles - 1)
    def _finalize():
        l = l_scr[...]
        o_ref[0] = (acc_scr[...] / jnp.where(l[:, :d] == 0.0, 1.0, l[:, :d])
                    ).astype(o_ref.dtype)
        if major:                                    # base-2 -> natural lse
            lse = m_scr[...] / LOG2E + jnp.log(jnp.maximum(l, 1e-30))
        else:
            lse = m_scr[...] + jnp.log(jnp.maximum(l, 1e-30))   # (bq, 128)
        lse_ref[0] = lse[:, :SUBS].T                          # (8, bq)


def _fwd(q: Array, k: Array, v: Array, scale: float) -> Tuple[Array, Array]:
    bh, s_q, d = q.shape
    s_kv = k.shape[1]
    bq, bkm = _fwd_blocks(s_q, s_kv)
    major = bkm >= 512
    kv_tiles = s_kv // bkm
    grid = (bh, s_q // bq, kv_tiles)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_tiles=kv_tiles,
                          bq=bq, bkm=bkm, major=major),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bkm, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bkm, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, SUBS, bq), lambda b, qi, ki: (b, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
            jax.ShapeDtypeStruct((bh, SUBS, s_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q, k, v)
    return out, lse


# ------------------------------------------------- packed-layout forward ---
# The wrapper transposes around every call ((B,S,H,D) <-> (B*H,S,D)) cost
# ~0.22 ms per operand/result at the L0 SVD shape — ~20 anonymous copies,
# ~4-6 ms/UNet step in the r3 trace. This variant consumes the projections'
# NATIVE (B, S, H*D) layout: full-width (bq, H*D) tiles, heads sliced
# IN-KERNEL (VMEM-local lane slices ride the existing HBM reads; K/V/Q HBM
# traffic is unchanged because the kv grid axis no longer multiplies by H).
# Per-head softmax stats live at 128-aligned slices of (bq, H*128) scratch.
# Odd-head d=64 slices pay a Mosaic lane-rotate; measured net win at L0/L1
# (scripts/microbench_flash_headslice.py). Inference-path only: the
# custom_vjp backward re-enters the transposed kernels.

def _fwd_packed_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                       m_scr, l_scr, acc_scr, *, scale: float, kv_tiles: int,
                       bq: int, bkm: int, num_heads: int, d: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    qf = q_ref[0]                                    # (bq, H*D)
    kf = k_ref[0]                                    # (bkm, H*D)
    vf = v_ref[0]
    for h in range(num_heads):
        q = qf[:, h * d:(h + 1) * d]
        k = kf[:, h * d:(h + 1) * d]
        v = vf[:, h * d:(h + 1) * d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ) * (scale * LOG2E)
        hs = slice(h * LANES, (h + 1) * LANES)
        m_prev = m_scr[:, hs]                        # (bq, 128) lane-replicated
        l_prev = l_scr[:, hs]
        m_curr = jax.lax.broadcast_in_dim(jnp.max(s, axis=1), (bq, LANES), (0,))
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - jax.lax.broadcast_in_dim(m_next[:, 0], (bq, bkm), (0,)))
        l_curr = jax.lax.broadcast_in_dim(jnp.sum(p, axis=1), (bq, LANES), (0,))
        m_scr[:, hs] = m_next
        l_scr[:, hs] = alpha * l_prev + l_curr
        ha = slice(h * LANES, h * LANES + d)
        acc_scr[:, ha] = acc_scr[:, ha] * alpha[:, :d] + jax.lax.dot(
            p.astype(vf.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(ki == kv_tiles - 1)
    def _finalize():
        outs = []
        for h in range(num_heads):
            l = l_scr[:, h * LANES:h * LANES + d]
            acc = acc_scr[:, h * LANES:h * LANES + d]
            outs.append(acc / jnp.where(l == 0.0, 1.0, l))
        o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)
        lses = []
        for h in range(num_heads):
            hs = slice(h * LANES, (h + 1) * LANES)
            lse = m_scr[:, hs] / LOG2E + jnp.log(
                jnp.maximum(l_scr[:, hs], 1e-30))
            lses.append(lse[:, :SUBS].T)             # (8, bq)
        lse_ref[0] = jnp.concatenate(lses, axis=0)   # (H*8, bq)


# Packed-kernel block winners measured on v5e
# (scripts/microbench_flash_headslice.py); wide-KV configs like (640, 1280)
# crash the Mosaic compiler at the L0 shape — keep both tiles <= 640.
_PACKED_BLOCKS = {2560: (512, 512)}


def _packed_blocks(s_q: int, s_kv: int, num_heads: int, d: int,
                   itemsize: int) -> Tuple[int, int]:
    """(bq, bkm) under the packed kernel's VMEM budget: full-width q/k/v
    tiles + (bq, H*128) f32 stats + transient (bq, bkm) f32 scores."""
    budget = int(13.5 * 1024 * 1024)
    if s_q == s_kv and s_q in _PACKED_BLOCKS:
        return _PACKED_BLOCKS[s_q]
    bq = _largest_div(s_q, cap=640)
    bkm = _largest_div(s_kv, cap=640)
    hd = num_heads * d

    def vmem(bq, bkm):
        return (bq * hd * itemsize * 2            # q tile + out tile
                + 2 * bkm * hd * itemsize * 2     # k/v double-buffered
                + 3 * bq * num_heads * LANES * 4  # m/l/acc scratch
                + bq * bkm * 4)                   # score tile

    while bq > BLOCK and vmem(bq, bkm) > budget:
        bq = _largest_div(s_q, cap=bq - BLOCK)
    while bkm > BLOCK and vmem(bq, bkm) > budget:
        bkm = _largest_div(s_kv, cap=bkm - BLOCK)
    return bq, bkm


def _fwd_packed(q: Array, k: Array, v: Array, scale: float,
                num_heads: int) -> Tuple[Array, Array]:
    b, s_q, hd = q.shape
    d = hd // num_heads
    s_kv = k.shape[1]
    bq, bkm = _packed_blocks(s_q, s_kv, num_heads, d, q.dtype.itemsize)
    kv_tiles = s_kv // bkm
    grid = (b, s_q // bq, kv_tiles)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_packed_kernel, scale=scale, kv_tiles=kv_tiles,
                          bq=bq, bkm=bkm, num_heads=num_heads, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bkm, hd), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bkm, hd), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, num_heads * SUBS, bq),
                         lambda b, qi, ki: (b, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_q, hd), q.dtype),
            jax.ShapeDtypeStruct((b, num_heads * SUBS, s_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, num_heads * LANES), jnp.float32),
            pltpu.VMEM((bq, num_heads * LANES), jnp.float32),
            pltpu.VMEM((bq, num_heads * LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q, k, v)
    return out, lse


# ------------------------------------------------------------ backward -----

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr,
               *, scale: float, kv_tiles: int, bkm: int, major: bool):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    do = do_ref[0].astype(jnp.float32)
    if major:
        # No online stats in backward (LSE is precomputed), so the major-tile
        # form is pure blocking: one wide score dot + exp2 (log2(e) folded
        # into the scale AND the lse column) per KV major tile. Measured
        # 1.5-2.4x vs the sub-tile loop (PERF.md session-7).
        lse_col = lse_ref[0][0:1, :].T * LOG2E       # (bq, 1), base-2 units
        delta_col = delta_ref[0][0:1, :].T
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ) * (scale * LOG2E)
        p = jnp.exp2(s - lse_col)                    # (bq, bkm)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_col) * scale
        dq_scr[...] += jax.lax.dot(ds.astype(k.dtype), k,
                                   preferred_element_type=jnp.float32)
    else:
        lse_col = lse_ref[0][0:1, :].T               # (bq, 1)
        delta_col = delta_ref[0][0:1, :].T           # (bq, 1)
        for j in range(bkm // BLOCK):
            k = k_ref[0, pl.ds(j * BLOCK, BLOCK), :]
            v = v_ref[0, pl.ds(j * BLOCK, BLOCK), :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            p = jnp.exp(s - lse_col)                 # (bq, BLOCK)
            dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - delta_col) * scale
            dq_scr[...] += jax.lax.dot(ds.astype(k.dtype), k,
                                       preferred_element_type=jnp.float32)

    @pl.when(ki == kv_tiles - 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float, q_tiles: int,
                bqm: int, major: bool):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    k = k_ref[0]
    v = v_ref[0]

    if major:
        q = q_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse_row = lse_ref[0, 0:1, :] * LOG2E         # (1, bqm), base-2 units
        delta_row = delta_ref[0, 0:1, :]
        st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ) * (scale * LOG2E)
        pt = jnp.exp2(st - lse_row)                  # (bk, bqm)
        dv_scr[...] += jax.lax.dot(pt.astype(do.dtype), do,
                                   preferred_element_type=jnp.float32)
        dpt = jax.lax.dot_general(v.astype(jnp.float32), do,
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dst = pt * (dpt - delta_row) * scale
        dk_scr[...] += jax.lax.dot(dst.astype(q.dtype), q,
                                   preferred_element_type=jnp.float32)
    else:
        for j in range(bqm // BLOCK):
            q = q_ref[0, pl.ds(j * BLOCK, BLOCK), :]
            do = do_ref[0, pl.ds(j * BLOCK, BLOCK), :].astype(jnp.float32)
            lse_row = lse_ref[0, 0:1, pl.ds(j * BLOCK, BLOCK)]   # (1, BLOCK)
            delta_row = delta_ref[0, 0:1, pl.ds(j * BLOCK, BLOCK)]
            st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            pt = jnp.exp(st - lse_row)               # (bk, BLOCK)
            dv_scr[...] += jax.lax.dot(pt.astype(do.dtype), do,
                                       preferred_element_type=jnp.float32)
            dpt = jax.lax.dot_general(v.astype(jnp.float32), do,
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dst = pt * (dpt - delta_row) * scale
            dk_scr[...] += jax.lax.dot(dst.astype(q.dtype), q,
                                       preferred_element_type=jnp.float32)

    @pl.when(qi == q_tiles - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_impl(q, k, v, o, lse, do, scale):
    bh, s_q, d = q.shape
    s_kv = k.shape[1]
    bq, bkm = _bwd_blocks(s_q, s_kv)
    major = bkm >= 512 and bq >= 512
    q_tiles, kv_tiles = s_q // bq, s_kv // bkm
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[:, None, :], (bh, SUBS, s_q))

    lanes_spec = pl.BlockSpec((1, SUBS, bq), lambda b, i, j: (b, 0, i))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, kv_tiles=kv_tiles,
                          bkm=bkm, major=major),
        grid=(bh, q_tiles, kv_tiles),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bkm, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bkm, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            lanes_spec,
            lanes_spec,
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)

    lanes_spec_q = pl.BlockSpec((1, SUBS, bq), lambda b, ki, qi: (b, 0, qi))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, q_tiles=q_tiles,
                          bqm=bq, major=major),
        grid=(bh, kv_tiles, q_tiles),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, bkm, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, bkm, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, bq, d), lambda b, ki, qi: (b, qi, 0)),
            lanes_spec_q,
            lanes_spec_q,
        ],
        out_specs=[
            pl.BlockSpec((1, bkm, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, bkm, d), lambda b, ki, qi: (b, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bkm, d), jnp.float32),
                        pltpu.VMEM((bkm, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ------------------------------------------------- SPMD partitioning ------
# The folded (B*H, S, D) layout makes dim 0 carry both data-parallel batch
# and tensor-parallel head sharding; both are exact for attention (samples
# and heads never mix), so the kernels partition along dim 0 and everything
# else is forced replicated (ops/pallas/partition.py).

@functools.lru_cache(maxsize=None)
def _partitioned_fwd(scale: float):
    from .partition import batch_partitioned
    return batch_partitioned(
        lambda q, k, v: _fwd(q, k, v, scale),
        [0, 0, 0], [0, 0],
        rule="b s d, b t d, b t d -> b s d, b u s",
        need_replication=("s", "t", "d", "u"))


@functools.lru_cache(maxsize=None)
def _partitioned_fwd_packed(scale: float, num_heads: int):
    from .partition import batch_partitioned
    return batch_partitioned(
        lambda q, k, v: _fwd_packed(q, k, v, scale, num_heads),
        [0, 0, 0], [0, 0],
        rule="b s c, b t c, b t c -> b s c, b u s",
        need_replication=("s", "t", "c", "u"))


@functools.lru_cache(maxsize=None)
def _partitioned_bwd(scale: float):
    from .partition import batch_partitioned
    return batch_partitioned(
        lambda q, k, v, o, lse, do: _bwd_impl(q, k, v, o, lse, do, scale),
        [0] * 6, [0, 0, 0],
        rule=("b s d, b t d, b t d, b s d, b u s, b s d"
              " -> b s d, b t d, b t d"),
        need_replication=("s", "t", "d", "u"))


def _partitioned() -> bool:
    import os
    return os.environ.get("SVDX_PARTITIONED_KERNELS", "1") != "0"


# ------------------------------------------------------- custom_vjp glue ---

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q: Array, k: Array, v: Array, scale: float) -> Array:
    if _partitioned():
        return _partitioned_fwd(float(scale))(q, k, v)[0]
    return _fwd(q, k, v, scale)[0]


def _flash_fwd(q, k, v, scale):
    if _partitioned():
        o, lse = _partitioned_fwd(float(scale))(q, k, v)
    else:
        o, lse = _fwd(q, k, v, scale)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, res, do):
    q, k, v, o, lse = res
    if _partitioned():
        return _partitioned_bwd(float(scale))(q, k, v, o, lse, do)
    return _bwd_impl(q, k, v, o, lse, do, scale)


_flash.defvjp(_flash_fwd, _flash_bwd)


# --------------------------------------------- packed custom_vjp glue ------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_packed(q: Array, k: Array, v: Array, scale: float,
                  num_heads: int) -> Array:
    if _partitioned():
        return _partitioned_fwd_packed(float(scale), num_heads)(q, k, v)[0]
    return _fwd_packed(q, k, v, scale, num_heads)[0]


def _flash_packed_fwd(q, k, v, scale, num_heads):
    if _partitioned():
        o, lse = _partitioned_fwd_packed(float(scale), num_heads)(q, k, v)
    else:
        o, lse = _fwd_packed(q, k, v, scale, num_heads)
    return o, (q, k, v, o, lse)


def _flash_packed_bwd(scale, num_heads, res, do):
    # Re-enter the head-major backward kernels. The transpose count equals
    # the unpacked path's fwd+bwd total (4+4 there vs 0 fwd + 8 here), so
    # training is layout-cost-neutral while inference saves all four.
    q, k, v, o, lse = res
    b, s_q, hd = q.shape
    d = hd // num_heads
    to_bh = lambda x: x.reshape(b, x.shape[1], num_heads, d).transpose(
        0, 2, 1, 3).reshape(b * num_heads, x.shape[1], d)
    lse_bh = lse.reshape(b * num_heads, SUBS, s_q)
    if _partitioned():
        dq, dk, dv = _partitioned_bwd(float(scale))(
            to_bh(q), to_bh(k), to_bh(v), to_bh(o), lse_bh, to_bh(do))
    else:
        dq, dk, dv = _bwd_impl(to_bh(q), to_bh(k), to_bh(v), to_bh(o),
                               lse_bh, to_bh(do), scale)
    from_bh = lambda x, s: x.reshape(b, num_heads, s, d).transpose(
        0, 2, 1, 3).reshape(b, s, hd)
    s_kv = k.shape[1]
    return (from_bh(dq, s_q), from_bh(dk, s_kv), from_bh(dv, s_kv))


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


# ------------------------------------------------------------- public ------

def packed_default() -> bool:
    """Whether flash dispatch consumes the native (B, S, H*D) layout
    (in-kernel head slicing) instead of transposing to (B*H, S, D) around
    every call. Default ON: interleaved UNet-step A/B measured 1.031x
    (201.5 -> 195.3 ms, both rounds — PERF.md session-13/14). Kill switch:
    SVDX_PACKED_FLASH=0."""
    import os
    return os.environ.get("SVDX_PACKED_FLASH", "1") != "0"


def flash_attention_packed(q: Array, k: Array, v: Array, *, num_heads: int,
                           scale: float) -> Array:
    """(B, S, H*D) x (B, T, H*D) -> (B, S, H*D), softmax over T — the
    transpose-free layout (see _fwd_packed)."""
    b, s, hd = q.shape
    t = k.shape[1]
    d = hd // num_heads
    if not (s % BLOCK == 0 and t % BLOCK == 0 and d <= BLOCK
            and hd == num_heads * d):
        raise ValueError(f"flash_attention_packed needs S,T % {BLOCK} == 0 "
                         f"and D <= {BLOCK}; got S={s} T={t} D={d}")
    return _flash_packed(q, k, v, scale, num_heads)


def supports(q_shape: Tuple[int, ...], kv_len: int) -> bool:
    """Tile-alignment gate: sequences must divide the 128 block."""
    _, s, _, d = q_shape
    return s % BLOCK == 0 and kv_len % BLOCK == 0 and d <= BLOCK


def flash_attention(q: Array, k: Array, v: Array, *, scale: float) -> Array:
    """(B, S, H, D) x (B, T, H, D) -> (B, S, H, D), softmax over T."""
    b, s, h, d = q.shape
    t = k.shape[1]
    if not supports(q.shape, t):
        raise ValueError(f"flash_attention needs S,T % {BLOCK} == 0 and "
                         f"D <= {BLOCK}; got S={s} T={t} D={d}")
    to_bh = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)
    out = _flash(to_bh(q), to_bh(k), to_bh(v), scale)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
