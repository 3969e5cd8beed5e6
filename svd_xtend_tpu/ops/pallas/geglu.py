"""Fused Pallas TPU residual-GEGLU feed-forward: y = x + W2·geglu(LN(x)·W1).

Motivation (PERF.md session-12 trace): the temporal/spatial GEGLU
feed-forwards ("net_2 family") are ~22 ms of the 175.7 ms UNet step at
operating point A. The unfused chain LayerNorm → net_0_proj (C→8C) →
split/gelu/mul → net_2 (4C→C) → +residual makes XLA materialize the
8C-wide inner activation in HBM (367 MB at the L0 sites) and splits the
surrounding elementwise work across fusion boundaries. This kernel runs the
WHOLE residual block in one pallas_call:

  - the input tile is read ONCE and serves both the LayerNorm prologue and
    the residual add epilogue (the two neighbors that would otherwise be
    lost at a pallas_call boundary — the session-4/10/13/14 composition-tax
    lesson applied in reverse),
  - the (T, 8C) inner activation lives only as (bt, 2·bi) VMEM tiles,
  - grid is (token tiles × inner blocks) with the inner axis minor, so the
    f32 output accumulator is revisited consecutively (flash-attention
    pattern) and weights stream once per token tile.

Numerics: LN stats in f32; both GEMMs accumulate f32 on bf16 operands
(preferred_element_type) with the gate path rounded to the compute dtype
between the two GEMMs — same class of f32-reassociation delta as the
split-concat conv path (PERF.md session-11), fp32-exact in tests.

Backward: custom_vjp through `_reference` (pure XLA, same math) — training
cost is conv/flash-bwd dominated; the kernel needs no bwd twin.

Behavior contract: diffusers FeedForward(GEGLU) + pre-LN residual as used
by BasicTransformerBlock / TemporalBasicTransformerBlock
(src/unet_spatio_temporal_condition.py:328-355 drives the same FF through
enable_forward_chunking; models/transformer.py is the caller).
Kill switch: SVDX_PALLAS_GEGLU=0 ("force" engages off-TPU for tests).
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
_LN_EPS = 1e-5


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def enabled() -> bool:
    # Default ON (r5): v5e microbench 1.38x at the L0 family
    # (scripts/microbench_geglu.py — losing classes gated out in
    # `supports`), UNet-step interleaved A/B 194.8/196.0 vs 197.1/199.5 ms
    # = 1.011-1.017x with consistent ordering across ABAB rounds
    # (scripts/ab_env.py --env SVDX_PALLAS_GEGLU, 2026-08-21).
    # SVDX_PALLAS_GEGLU=0 is the kill switch; "force" additionally engages
    # it off-TPU (interpret mode, for tests).
    return os.environ.get("SVDX_PALLAS_GEGLU", "1") in ("1", "force")


def force() -> bool:
    return os.environ.get("SVDX_PALLAS_GEGLU") == "force"


def _choose_blocks(t: int, c: int, mult: int):
    """(bt, bi): token tile and inner-dim block. bi divides inner=mult*c and
    is lane-aligned; bt divides T, sublane-aligned, sized to the VMEM budget.

    Working set per grid cell (bytes, double-buffered inputs/outputs x2):
    x/out tiles 2*(bt*c*2*2), xn scratch bt*c*2, acc scratch bt*c*4,
    h/g/u temporaries ~ bt*bi*(4+4+2), weight blocks 2*(c*bi*2*2) + bi*c*2*2.
    """
    inner = mult * c
    bi = 0
    for cand in (1280, 1024, 768, 640, 512, 384, 256, 128):
        if inner % cand == 0:
            bi = cand
            break
    if bi == 0:
        if inner % 128:
            return 0, 0
        bi = inner
    weights = 2 * (c * bi * 2 * 2) + bi * c * 2 * 2
    for bt in range(min(t, 4096), 0, -8):
        if t % bt:
            continue
        per_tok = c * (4 + 4 + 2 + 4) + bi * 10
        if bt * per_tok + weights <= _VMEM_BUDGET:
            return bt, bi
    return 0, 0


def supports(t: int, c: int, mult: int = 4) -> bool:
    """Shape gate: structurally tileable AND in the measured-winning class.

    v5e microbench (scripts/microbench_geglu.py, 2026-08-21): the kernel
    wins only where the token count amortizes the weight streaming and the
    XLA GEMMs run below par — the L0 family (T 71680, C 320): 1.38x.
    C=640 T=17920 measures a wash (0.98x) and the deep-channel small-T
    sites LOSE (C=1280: 0.67-0.94x — weights re-stream per token tile).
    Off-TPU ("force", tests) the structural gate alone applies.
    """
    if t % 8 or c % 8:
        return False
    bt, bi = _choose_blocks(t, c, mult)
    if bt <= 0:
        return False
    if force():
        return True
    return c <= 320 and t >= 16384


def _kernel(x_ref, ls_ref, lb_ref, w1h_ref, w1g_ref, b1h_ref, b1g_ref,
            w2_ref, b2_ref, o_ref, xn_ref, acc_ref, *, n_inner: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _prologue():
        xf = x_ref[...].astype(jnp.float32)               # (bt, C)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xn = xc * jax.lax.rsqrt(var + _LN_EPS)
        xn = xn * ls_ref[...].astype(jnp.float32) + lb_ref[...].astype(jnp.float32)
        xn_ref[...] = xn.astype(xn_ref.dtype)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xn = xn_ref[...]
    dot = lambda a, w: jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    h = dot(xn, w1h_ref[...]) + b1h_ref[...].astype(jnp.float32)
    g = dot(xn, w1g_ref[...]) + b1g_ref[...].astype(jnp.float32)
    u = (h * jax.nn.gelu(g, approximate=True)).astype(xn.dtype)
    acc_ref[...] += dot(u, w2_ref[...])

    @pl.when(j == n_inner - 1)
    def _epilogue():
        y = acc_ref[...] + b2_ref[...].astype(jnp.float32)
        o_ref[...] = x_ref[...] + y.astype(o_ref.dtype)


def _reference(x: Array, ls: Array, lb: Array, w1: Array, b1: Array,
               w2: Array, b2: Array) -> Array:
    """Pure-XLA same-math fallback (and the custom_vjp backward)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = ((xc * jax.lax.rsqrt(var + _LN_EPS))
          * ls.astype(jnp.float32) + lb.astype(jnp.float32)).astype(dt)
    inner = w1.shape[1] // 2
    hg = jax.lax.dot_general(xn, w1, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    hg = hg + b1.astype(jnp.float32)
    h, g = hg[:, :inner], hg[:, inner:]
    u = (h * jax.nn.gelu(g, approximate=True)).astype(dt)
    y = jax.lax.dot_general(u, w2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return x + (y + b2.astype(jnp.float32)).astype(dt)


def _pallas(x: Array, ls: Array, lb: Array, w1: Array, b1: Array,
            w2: Array, b2: Array) -> Array:
    t, c = x.shape
    inner = w1.shape[1] // 2
    bt, bi = _choose_blocks(t, c, inner // c)
    n_inner = inner // bi
    w1h, w1g = w1[:, :inner], w1[:, inner:]
    b1h, b1g = b1[:inner].reshape(1, inner), b1[inner:].reshape(1, inner)

    grid = (t // bt, n_inner)
    return pl.pallas_call(
        functools.partial(_kernel, n_inner=n_inner),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, c), lambda i, j: (i, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, bi), lambda i, j: (0, j)),
            pl.BlockSpec((c, bi), lambda i, j: (0, j)),
            pl.BlockSpec((1, bi), lambda i, j: (0, j)),
            pl.BlockSpec((1, bi), lambda i, j: (0, j)),
            pl.BlockSpec((bi, c), lambda i, j: (j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, c), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, c), x.dtype),
            pltpu.VMEM((bt, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(x, ls.reshape(1, c), lb.reshape(1, c), w1h, w1g, b1h, b1g, w2,
      b2.reshape(1, c))


@jax.custom_vjp
def _ln_geglu_residual2d(x, ls, lb, w1, b1, w2, b2):
    return _pallas(x, ls, lb, w1, b1, w2, b2)


def _fwd(x, ls, lb, w1, b1, w2, b2):
    return _ln_geglu_residual2d(x, ls, lb, w1, b1, w2, b2), (
        x, ls, lb, w1, b1, w2, b2)


def _bwd(res, ct):
    _, vjp = jax.vjp(_reference, *res)
    return vjp(ct)


_ln_geglu_residual2d.defvjp(_fwd, _bwd)


def ln_geglu_residual(x: Array, ls: Array, lb: Array, w1: Array, b1: Array,
                      w2: Array, b2: Array) -> Array:
    """y = x + net_2(geglu(net_0_proj(LayerNorm(x)))) over (..., C) tokens.

    w1: (C, 2*inner) with the value half in columns [:inner] and the gate
    half in [inner:] (the diffusers GEGLU column order); b1: (2*inner,);
    w2: (inner, C); b2: (C,); ls/lb: the LayerNorm scale/bias (C,).
    """
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    out = _ln_geglu_residual2d(x2, ls, lb, w1, b1, w2, b2)
    return out.reshape(shape)
