"""ResNet / sampling blocks for the spatio-temporal UNet and VAE.

Behavior contracts (SURVEY.md §2.2):
  - SpatioTemporalResBlock: spatial ResNet2D on folded frames, then a temporal
    ResNet whose convs run over the frame axis with (3,1,1) kernels, blended by
    a learnable AlphaBlender (reference drives diffusers unet_3d_blocks.py;
    wiring visible at src/unet_spatio_temporal_condition.py:432-477).
  - image_only_indicator (zeros at src/unet_spatio_temporal_condition.py:430)
    selects the spatial-only path for image batches.

TPU-first design: channels-last everywhere. Spatial convs act on
(B*F, H, W, C); temporal convs act on (B, F, H*W, C) with a (3, 1) kernel —
the frame axis is a genuine convolution dimension and H*W collapses to one
spatial dim, which keeps the channel contraction on the MXU with no layout
churn (vs. the reference's NCDHW Conv3d).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class GroupNormSiLU(nn.Module):
    """GroupNorm immediately followed by SiLU — dispatched to the fused
    Pallas kernel on TPU (ops/pallas/groupnorm.py), XLA elsewhere. Param
    names (scale/bias) match nn.GroupNorm so checkpoints are unaffected."""

    groups: int = 32
    eps: float = 1e-5
    impl: str = "auto"
    silu: bool = True      # False -> plain fused GroupNorm (no activation)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, fold_only: bool = False,
                 params_only: bool = False, x2: Optional[Array] = None):
        from ..ops.pallas.groupnorm import (group_norm_fold,
                                            group_norm_fold_cat,
                                            group_norm_silu)
        c = x.shape[-1] + (x2.shape[-1] if x2 is not None else 0)
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        if params_only:
            # raw affine params, for consumers that fold the normalize
            # themselves (the fused temporal-resnet op)
            return scale, bias
        if fold_only:
            # stats-only form: per-(sample, channel) f32 (sc, sh) for a
            # consumer that fuses the normalize (+SiLU) into its input read.
            # x2: stats over the virtual concat([x, x2], -1) without
            # materializing it (the split-concat resnet path).
            if x2 is not None:
                return group_norm_fold_cat([x, x2], scale, bias,
                                           groups=self.groups, eps=self.eps)
            return group_norm_fold(x, scale, bias, groups=self.groups,
                                   eps=self.eps)
        if x2 is not None:
            x = jnp.concatenate([x, x2], axis=-1)
        return group_norm_silu(x, scale, bias, groups=self.groups,
                               eps=self.eps, impl=self.impl, silu=self.silu)


def pallas_conv_dispatch(x_shape, features: int, dtype,
                         with_res: bool = False, fused: bool = False,
                         epi: Optional[str] = None):
    """Decide whether Conv3x3 takes the Pallas implicit-GEMM path for this
    shape: returns {"band": b, "bco": c} (zeros = auto-pick) or None (XLA).

    Order: the FUSED-chain table first when `epi` names an epilogue combo
    (scripts/tune_conv_fused.py measures the whole replaced subgraph —
    GN-fold + conv + shift/residual — so its verdicts already price the
    pallas_call fusion boundary), then the plain autotune table (measured
    winner for the bare conv), then the measured heuristic
    (conv3x3_pallas_wins). Every query is recorded in the autotune shape
    registry so tracing a model yields its conv working set.
    SVDX_PALLAS_CONV: "0" disables, "force" enables off-TPU (interpret mode,
    for tests), "table" trusts only tuner-validated shapes (no heuristic —
    the safe mode for untuned operating points, since a novel shape could
    hit a Mosaic compile bug), default auto (TPU only)."""
    import os

    from ..ops.pallas import autotune
    dtype = jnp.dtype(dtype)
    if epi is None:
        epi = ("preS" + ("+res" if with_res else "")) if fused else ""
    with_res = with_res or "res" in epi
    autotune.record_shape(x_shape, features, dtype.name, epi)
    mode = os.environ.get("SVDX_PALLAS_CONV", "table")
    if mode == "0" or x_shape[2] % 8 != 0:
        return None
    if jax.default_backend() != "tpu" and mode != "force":
        return None
    from ..ops.pallas.conv3x3 import (_VMEM_BUDGET, _vmem_bytes,
                                      conv3x3_pallas_fits,
                                      conv3x3_pallas_wins)
    if epi:
        fent = autotune.lookup_fused(x_shape, features, dtype.name, epi)
        if fent is not None:
            if fent.get("impl") != "pallas":
                return None      # measured: XLA wins the whole fused chain
            # default above every current entry: the 2 winners that cleared
            # 1.2 (1.25-1.27x whole-subgraph) still LOST 1.9% end-to-end
            # (PERF.md session-10 A/B 5.028 -> 5.123 s/video) — the GN stats
            # reduce and the next op's producer fusion sit outside even the
            # subgraph measurement. Lower only after your own pipeline A/B.
            fmargin = float(os.environ.get("SVDX_PALLAS_CONV_FUSED_MARGIN",
                                           "1.35"))
            # "e2e" entries were validated by a whole-decode/pipeline
            # interleaved A/B (scripts/tune_decode.py) — the only evidence
            # that survives composition — and bypass the isolated margin
            if fent.get("speedup", 0.0) < fmargin and not fent.get("e2e"):
                return None
            if not conv3x3_pallas_fits(x_shape, features, dtype.itemsize,
                                       with_res):
                return None
            return {"band": fent.get("band", 0), "bco": fent.get("bco", 0)}
    ent = autotune.lookup(x_shape, features, dtype.name)
    if ent is not None:
        if ent.get("impl") != "pallas":
            return None
        if fused and not ent.get("fused", True):
            # tuner validated the plain kernel but the fused-epilogue
            # variant failed at this shape
            return None
        # composition margin: a pallas_call is an HBM fusion boundary, so an
        # isolated win below ~15% measured net-NEGATIVE end-to-end (bench
        # A/B: the 1.0x-tail of table winners cost ~4% pipeline time) —
        # only take the kernel where the isolated margin can survive the
        # lost producer/consumer fusion
        margin = float(os.environ.get("SVDX_PALLAS_CONV_MARGIN", "10"))
        # "e2e" entries carry whole-decode/pipeline A/B validation
        # (scripts/tune_decode.py) and bypass the isolated margin
        if ent.get("speedup", float("inf")) < margin and not ent.get("e2e"):
            return None
        if not conv3x3_pallas_fits(x_shape, features, dtype.itemsize,
                                   with_res):
            return None
        band, bco = ent.get("band", 0), ent.get("bco", 0)
        if with_res and band and bco:
            # the residual block adds VMEM; re-pick if the tuned tiling no
            # longer fits with it
            ci_p = -(-x_shape[3] // 128) * 128
            w_env = -(-(x_shape[2] + 2) // 8) * 8
            if _vmem_bytes(band, x_shape[2], w_env, ci_p, bco,
                           dtype.itemsize, with_res=True) > _VMEM_BUDGET:
                band = bco = 0
        return {"band": band, "bco": bco}
    if mode != "table" and conv3x3_pallas_wins(x_shape, features,
                                               dtype.itemsize, with_res):
        return {"band": 0, "bco": 0}
    return None


def split_cat_conv_enabled() -> bool:
    """Whether concat-input convs/shortcuts run in the split form (see
    Conv3x3.x2). Default ON — exact math up to f32 reassociation, measured
    1.22-1.48x at every up-block conv1 site (microbench_concat_conv.py)."""
    import os
    return os.environ.get("SVDX_SPLIT_CAT_CONV", "1") != "0"


def gn_fold_default() -> bool:
    """Whether ResnetBlock2D uses the GN-fold form (pure-XLA per-(N, C)
    stats + affine applied in the conv's input path) even when the conv
    itself stays on XLA — instead of the standalone Pallas GroupNorm+SiLU
    kernel pass. The kernel pins default layouts, so at sites whose
    producer conv emits XLA's permuted activation layout the pallas_call
    inserts a full-tensor relayout copy (measured: 2.9 ms reshape + 2.1 ms
    kernel for ONE norm at the VAE-decode top level, r3 trace); the fold
    form stays in whatever layout XLA prefers. Default ON since the r3
    interleaved whole-subsystem A/Bs (scripts/ab_env.py, v5e): VAE temporal
    decode 157.3 -> 128.2 ms/chunk (1.227x), UNet CFG step 201.3 -> 199.6 ms
    (1.008x). Kill switch: SVDX_GN_FOLD=0."""
    import os
    return os.environ.get("SVDX_GN_FOLD", "1") != "0"


def _apply_pre_affine(v: Array, sc: Array, sh: Array, do_silu: bool) -> Array:
    """Per-(N, C) f32 affine (+SiLU) — a folded GroupNorm normalize."""
    vv = (v.astype(jnp.float32) * sc[:, None, None, :].astype(jnp.float32)
          + sh[:, None, None, :].astype(jnp.float32))
    if do_silu:
        vv = vv * jax.nn.sigmoid(vv)
    return vv.astype(v.dtype)


def _conv3x3_base(x: Array, kernel: Array) -> Array:
    """Stride-1 SAME 3x3 conv, f32 output — direct XLA conv, or the Winograd
    F(2x2,3x3) form at measured-winner shapes (ops/winograd.py)."""
    from ..ops.winograd import _winograd_conv, winograd_wins
    if winograd_wins(x.shape, kernel.shape[-1], x.dtype):
        return _winograd_conv(x, kernel)
    from ..ops.convacc import conv_f32acc
    return conv_f32acc(x, kernel, (1, 1), ((1, 1), (1, 1)))


def _conv3x3_split_cat(x: Array, x2: Array, kernel: Array, bias: Array,
                       pre=None, post_shift: Optional[Array] = None,
                       residual: Optional[Array] = None) -> Array:
    """conv3x3(concat([x, x2]), kernel) as two channel-sliced convs summed in
    one f32 accumulator; bias/t-emb/residual ride the same accumulator."""
    ca = x.shape[-1]
    if pre is not None:
        sc, sh, do_silu = pre
        x = _apply_pre_affine(x, sc[:, :ca], sh[:, :ca], do_silu)
        x2 = _apply_pre_affine(x2, sc[:, ca:], sh[:, ca:], do_silu)
    y = (_conv3x3_base(x, kernel[:, :, :ca])
         + _conv3x3_base(x2, kernel[:, :, ca:])
         + bias.astype(jnp.float32))
    if post_shift is not None:
        y = y + post_shift[:, None, None, :].astype(jnp.float32)
    y = y.astype(x.dtype)
    if residual is not None:
        y = y + residual
    return y


class Conv3x3(nn.Module):
    """3x3 stride-1 SAME conv with implementation dispatch and optional
    fused epilogues. Param names (kernel/bias) match the nn.Conv it
    replaces; every path is numerically
    `conv3x3_fused_reference` (ops/pallas/conv3x3.py) — a plain SAME conv
    when no epilogue is given.

    On TPU the Pallas implicit-GEMM kernel (ops/pallas/conv3x3.py) engages
    only through the autotune table behind a composition margin
    (pallas_conv_dispatch) — end-to-end A/B showed isolated per-op wins
    routinely lose to the pallas_call fusion/layout boundary (PERF.md),
    so the default (SVDX_PALLAS_CONV=table, SVDX_PALLAS_CONV_MARGIN=10)
    keeps XLA's conv unless a deployment lowers the margin after its own
    whole-pipeline A/B. The halo-tiled XLA form (ops/conv_tiled.py) remains
    a separate opt-in.

    Epilogues (the resnet fusion surface — see ResnetBlock2D):
      pre=(sc, sh, silu): per-(N, Cin) input affine (+SiLU) — a folded
        GroupNorm-normalize — fused into the kernel's input read on the
        Pallas path, applied as plain XLA ops otherwise;
      post_shift: (N, Co) added to the output (time-embedding add);
      residual: (N, H, W, Co) added to the output (skip connection).

    `x2` (the split-concat form): the logical input is concat([x, x2], -1)
    — the param tree is the single (3, 3, C1+C2, Co) kernel of the concat
    conv — but on TPU the conv is computed as conv(x, k[:, :, :C1]) +
    conv(x2, k[:, :, C1:]) in one f32 accumulator, and the concat never
    materializes. Measured (scripts/microbench_concat_conv.py, v5e): the
    concat-input conv runs at ~97-111 TF/s vs 121-165 TF/s for the split
    pair — 1.22-1.48x at every up-block conv1 site at operating point A.
    `pre` spans the full C1+C2 width and is sliced per part. Exact in f32
    up to reassociation (the split reorders the K loop).
    Kill switch: SVDX_SPLIT_CAT_CONV=0 (falls back to materialized concat)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, pre=None, post_shift: Optional[Array] = None,
                 residual: Optional[Array] = None,
                 x2: Optional[Array] = None) -> Array:
        from ..ops.conv_tiled import _TILE_H, _TILE_W, conv3x3_tiled, should_tile
        in_ch = x.shape[-1] + (x2.shape[-1] if x2 is not None else 0)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, in_ch, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        if x2 is not None:
            x, x2, kernel, bias = nn.dtypes.promote_dtype(
                x, x2, kernel, bias, dtype=self.dtype)
            from ..ops import quant
            int8_site = (quant.get_mode() == "int8" and quant.int8_conv_wins(
                x.shape[:-1] + (in_ch,), self.features))
            if split_cat_conv_enabled() and not int8_site:
                return _conv3x3_split_cat(x, x2, kernel, bias, pre=pre,
                                          post_shift=post_shift,
                                          residual=residual)
            # int8 winners keep their measured concat form; kill-switch path
            x = jnp.concatenate([x, x2], axis=-1)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        h, w = x.shape[1], x.shape[2]
        from ..ops import quant
        if quant.get_mode() == "int8" and quant.int8_conv_wins(
                x.shape, self.features):
            # opt-in W8A8 path (PipelineConfig.unet_quant): the GN-fold
            # affine must run in bf16 BEFORE activation quantization, so the
            # Pallas fused-epilogue trick doesn't compose here — the int8
            # MXU win (measured >=1.15x per shape) pays for the extra pass
            if pre is not None:
                sc, sh, do_silu = pre
                xv = (x.astype(jnp.float32)
                      * sc[:, None, None, :].astype(jnp.float32)
                      + sh[:, None, None, :].astype(jnp.float32))
                if do_silu:
                    xv = xv * jax.nn.sigmoid(xv)
                x = xv.astype(x.dtype)
            return quant.int8_conv3x3(x, kernel, bias, post_shift=post_shift,
                                      residual=residual)
        epi = ""
        if pre is not None:
            epi = "preS" if pre[2] else "pre"
        if post_shift is not None:
            epi += "+post"
        if residual is not None:
            epi += "+res"
        disp = pallas_conv_dispatch(
            x.shape, self.features, x.dtype,
            with_res=residual is not None,
            fused=bool(epi), epi=epi)
        if disp is not None:
            from ..ops.pallas.conv3x3 import conv3x3_pallas
            kw = {}
            if pre is not None:
                kw = dict(pre_scale=pre[0], pre_shift=pre[1],
                          pre_silu=bool(pre[2]))
            return conv3x3_pallas(x, kernel, bias, band=disp["band"],
                                  bco=disp["bco"], post_shift=post_shift,
                                  residual=residual, **kw)
        if pre is not None:
            sc, sh, do_silu = pre
            xv = (x.astype(jnp.float32) * sc[:, None, None, :].astype(jnp.float32)
                  + sh[:, None, None, :].astype(jnp.float32))
            if do_silu:
                xv = xv * jax.nn.sigmoid(xv)
            x = xv.astype(x.dtype)
        from ..ops.winograd import winograd_conv3x3, winograd_wins
        if winograd_wins(x.shape, self.features, x.dtype):
            return winograd_conv3x3(x, kernel, bias, post_shift=post_shift,
                                    residual=residual)
        if (should_tile(h, w) and h % _TILE_H == 0 and w % _TILE_W == 0
                and post_shift is None and residual is None):
            return conv3x3_tiled(x, kernel, bias)
        else:
            from ..ops.convacc import conv_f32acc
            y = conv_f32acc(x, kernel, (1, 1),
                            ((1, 1), (1, 1))).astype(x.dtype)
            y = y + bias
        if post_shift is not None:
            y = y + post_shift[:, None, None, :].astype(y.dtype)
        if residual is not None:
            y = y + residual
        return y


class _Conv1x1Cat(nn.Module):
    """1x1 conv over the virtual concat([x, x2], -1) — two channel-sliced
    matmuls in one f32 accumulator. Param tree (kernel (1, 1, C1+C2, Co),
    bias) is identical to the nn.Conv it replaces (the up-block resnet
    conv_shortcut), so checkpoints are unaffected."""

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, x2: Array) -> Array:
        in_ch = x.shape[-1] + x2.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, in_ch, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        x, x2, kernel, bias = nn.dtypes.promote_dtype(x, x2, kernel, bias,
                                                      dtype=self.dtype)
        ca = x.shape[-1]
        k = kernel[0, 0]
        y = (jax.lax.dot_general(x, k[:ca], (((x.ndim - 1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(x2, k[ca:],
                                   (((x2.ndim - 1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
             + bias.astype(jnp.float32))
        return y.astype(x.dtype)


class AlphaBlender(nn.Module):
    """Learnable scalar blend: a*spatial + (1-a)*temporal, a = sigmoid(mix).

    With `switch_spatial_to_temporal_mix` the sigmoid weights the temporal
    branch instead (the convention of the transformer time mixer).
    `image_only_indicator` (B, F) bool/0-1 forces the spatial path per frame.
    """

    merge_factor: float = 0.5
    switch_spatial_to_temporal_mix: bool = False

    def setup(self):
        self.mix_factor = self.param(
            "mix_factor", lambda k: jnp.full((1,), self.merge_factor,
                                             jnp.float32))

    def alpha_scalar(self) -> Array:
        """The spatial-branch weight as an f32 scalar (indicator-free form,
        used by the fused temporal-resnet path)."""
        alpha = jax.nn.sigmoid(self.mix_factor.astype(jnp.float32))[0]
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha

    def __call__(self, x_spatial: Array, x_temporal: Array,
                 image_only_indicator: Optional[Array] = None) -> Array:
        alpha = self.alpha_scalar()
        if image_only_indicator is not None:
            # (B, F) -> broadcastable against x, whether x is (B*F, ...) or (B, F, ...)
            ind = image_only_indicator.astype(bool)
            if x_spatial.shape[0] == ind.shape[0] * ind.shape[1]:
                ind = ind.reshape((-1,) + (1,) * (x_spatial.ndim - 1))
            else:
                ind = ind.reshape(ind.shape + (1,) * (x_spatial.ndim - 2))
            alpha = jnp.where(ind, 1.0, alpha)
        alpha = jnp.asarray(alpha, x_spatial.dtype)
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class TemporalConv(nn.Module):
    """(3, 1) conv over the frame axis of (B, F, S, C), SAME zero padding —
    computed as THREE plain channel matmuls on frame-shifted views.

    Param tree (kernel (3, 1, C_in, C_out), bias) is identical to the
    ``nn.Conv`` it replaces, so checkpoints are unaffected. The matmul form
    keeps activations in the standard (..., C) tiling — XLA's conv lowering
    for a 14-tall image picks T(2,128) layouts and inserts ~1 ms relayout
    fusions around every temporal conv (measured, scripts/microbench_ops.py).
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, params_only: bool = False):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 1, in_ch, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        if params_only:
            # for the fused temporal-resnet kernel: (3, C, Co) taps + bias
            return kernel[:, 0], bias
        prev = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
        nxt = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
        # output[f] = x[f-1] @ k[0] + x[f] @ k[1] + x[f+1] @ k[2] + b
        return (prev @ kernel[0, 0] + x @ kernel[1, 0] + nxt @ kernel[2, 0]
                + bias)


class ResnetBlock2D(nn.Module):
    """GN -> SiLU -> conv3x3, add t-emb, GN -> SiLU -> conv3x3, skip.

    Operates on (N, H, W, C). On the Pallas-conv shapes the GN-normalize+SiLU
    is folded into the conv's input read, the t-emb add into conv1's
    accumulator, and the skip add into conv2's output (all epilogues of
    ops/pallas/conv3x3.py) — only the GN stats reduces touch the activations
    separately. Numerics contract: conv3x3_fused_reference; the unfused path
    is taken off-TPU, when dropout is active, or at non-winning shapes."""

    out_channels: int
    eps: float = 1e-5
    groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None,
                 deterministic: bool = True,
                 skip_cat: Optional[Array] = None) -> Array:
        # skip_cat: the up-block skip tensor; the block's logical input is
        # concat([x, skip_cat], -1) but on TPU the concat never materializes
        # — GN stats, conv1, and the 1x1 shortcut all consume the two parts
        # directly (split-concat form, see Conv3x3.x2 / _conv3x3_split_cat).
        if skip_cat is not None and not split_cat_conv_enabled():
            x = jnp.concatenate([x, skip_cat], axis=-1)
            skip_cat = None
        in_ch = x.shape[-1] + (skip_cat.shape[-1] if skip_cat is not None
                               else 0)
        conv = lambda name: Conv3x3(self.out_channels, dtype=self.dtype,
                                    param_dtype=self.param_dtype, name=name)
        gns = lambda name: GroupNormSiLU(groups=self.groups, eps=self.eps,
                                         dtype=self.dtype,
                                         param_dtype=self.param_dtype, name=name)
        t = None
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="time_emb_proj")(nn.silu(temb))
        if skip_cat is not None:
            sc, sh = gns("norm1")(x, x2=skip_cat, fold_only=True)
            h = conv("conv1")(x, x2=skip_cat, pre=(sc, sh, True),
                              post_shift=t.astype(jnp.float32)
                              if t is not None else None)
        elif gn_fold_default() or pallas_conv_dispatch(
                x.shape, self.out_channels, self.dtype, fused=True,
                epi="preS+post" if t is not None else "preS") is not None:
            # fold form regardless of the conv backend (gn_fold_default):
            # Conv3x3 applies the affine+SiLU as plain XLA ops when its
            # dispatch stays XLA, fused into the kernel's input read when
            # Pallas wins the site
            sc, sh = gns("norm1")(x, fold_only=True)
            h = conv("conv1")(x, pre=(sc, sh, True),
                              post_shift=t.astype(jnp.float32)
                              if t is not None else None)
        else:
            h = gns("norm1")(x)
            h = conv("conv1")(h)
            if t is not None:
                h = h + t[:, None, None, :]
        if in_ch != self.out_channels:
            if skip_cat is not None:
                skip = _Conv1x1Cat(self.out_channels, dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="conv_shortcut")(x, skip_cat)
            else:
                skip = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="conv_shortcut")(x)
        elif skip_cat is not None:   # unreachable in the SVD topology
            skip = jnp.concatenate([x, skip_cat], axis=-1)
        else:
            skip = x
        dropout_active = self.dropout > 0.0 and not deterministic
        if (not dropout_active
                and (gn_fold_default()
                     or pallas_conv_dispatch(h.shape, self.out_channels,
                                             self.dtype, with_res=True,
                                             fused=True,
                                             epi="preS+res") is not None)):
            sc2, sh2 = gns("norm2")(h, fold_only=True)
            return conv("conv2")(h, pre=(sc2, sh2, True), residual=skip)
        h = gns("norm2")(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv("conv2")(h)
        return skip + h


def _tresnet_kernel_dispatch(b: int, f: int, s: int, c: int) -> bool:
    """Whether the fused temporal-resnet Pallas kernel engages
    (temporal_resnet.dispatchable — the single shared predicate). When
    False the module's unfused path runs — Pallas GroupNorm + TemporalConv
    — with the collapsed blend applied at the end, so disabling the kernel
    never changes which other kernels run."""
    from ..ops.pallas import temporal_resnet as trk
    return trk.dispatchable(b, f, s, c)


class TemporalResnetBlock(nn.Module):
    """ResNet over the frame axis: convs with (3, 1) kernels on (B, F, S, C).

    Input/output: (B, F, H, W, C); internally H,W collapse to S = H*W since
    the kernel is 1x1 spatially — the conv is then a single well-tiled
    (3,1)-window channel contraction on the MXU.
    """

    out_channels: int
    eps: float = 1e-6
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None,
                 blend_weight: Optional[Array] = None) -> Array:
        b, f, hh, ww, c = x.shape
        xs = x.reshape(b, f, hh * ww, c)
        conv = lambda name: TemporalConv(self.out_channels, dtype=self.dtype,
                                         param_dtype=self.param_dtype, name=name)
        gns = lambda name: GroupNormSiLU(groups=self.groups, eps=self.eps,
                                         dtype=self.dtype,
                                         param_dtype=self.param_dtype, name=name)
        if blend_weight is not None and c != self.out_channels:
            raise ValueError("blend_weight requires an identity shortcut "
                             "(in_channels == out_channels)")
        if blend_weight is not None and _tresnet_kernel_dispatch(
                b, f, hh * ww, c):
            # fused whole-block path (ops/pallas/temporal_resnet.py): the
            # caller has collapsed AlphaBlender into out = x + w·h2 (valid
            # with identity shortcut and no image_only_indicator)
            from ..ops.pallas import temporal_resnet as trk
            if temb is not None:
                t = nn.Dense(self.out_channels, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="time_emb_proj")(nn.silu(temb))
            else:
                # temb-free (the VAE temporal decoder): a zero add — tiny
                # HBM read, avoids a second kernel variant per shape
                t = jnp.zeros((b, f, self.out_channels), self.dtype)
            s1, bi1 = gns("norm1")(xs, params_only=True)
            k1, b1 = conv("conv1")(xs, params_only=True)
            s2, bi2 = gns("norm2")(xs, params_only=True)
            k2, b2 = conv("conv2")(xs, params_only=True)
            out = trk.temporal_resnet_block(
                xs, t, k1, b1, k2, b2, s1, bi1, s2, bi2,
                jnp.asarray(blend_weight, jnp.float32),
                groups=self.groups, eps=self.eps)
            return out.reshape(b, f, hh, ww, self.out_channels)
        h = gns("norm1")(xs)
        h = conv("conv1")(h)
        if temb is not None:
            # temb: (B, F, C_t) per-frame embedding
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, :, None, :]
        h = gns("norm2")(h)
        h = conv("conv2")(h)
        if c != self.out_channels:
            xs = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                         param_dtype=self.param_dtype, name="conv_shortcut")(xs)
        if blend_weight is not None:
            # collapsed AlphaBlender (identity shortcut): x + w·h2
            h = jnp.asarray(blend_weight, jnp.float32).astype(h.dtype) * h
        return (xs + h).reshape(b, f, hh, ww, self.out_channels)


class SpatioTemporalResBlock(nn.Module):
    """Spatial ResNet on folded frames + temporal ResNet, alpha-blended.

    Input/output: (B*F, H, W, C) with `num_frames` static."""

    out_channels: int
    num_frames: int
    eps: float = 1e-5
    temporal_eps: Optional[float] = None
    merge_factor: float = 0.5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None,
                 image_only_indicator: Optional[Array] = None,
                 skip_cat: Optional[Array] = None) -> Array:
        f = self.num_frames
        h = ResnetBlock2D(self.out_channels, eps=self.eps, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name="spatial_res_block")(x, temb,
                                                    skip_cat=skip_cat)
        bf, hh, ww, c = h.shape
        b = bf // f
        h_spatial = h.reshape(b, f, hh, ww, c)
        temb_frames = temb.reshape(b, f, -1) if temb is not None else None
        tblock = TemporalResnetBlock(
            self.out_channels, eps=self.temporal_eps or self.eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="temporal_res_block")
        mixer = AlphaBlender(merge_factor=self.merge_factor, name="time_mixer")
        if image_only_indicator is None:
            # indicator-free blend collapses: α·x + (1-α)·(x + h2) =
            # x + (1-α)·h2 — hand the weight to the (fused) temporal block
            out = tblock(h_spatial, temb_frames,
                         blend_weight=1.0 - mixer.alpha_scalar())
        else:
            h_temporal = tblock(h_spatial, temb_frames)
            out = mixer(h_spatial, h_temporal, image_only_indicator)
        return out.reshape(bf, hh, ww, c)


class Downsample2D(nn.Module):
    """3x3 stride-2 conv (N, H, W, C) -> (N, H/2, W/2, C_out)."""

    out_channels: int
    asymmetric_padding: bool = False   # VAE encoder pads (0,1),(0,1)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = ((0, 1), (0, 1)) if self.asymmetric_padding else ((1, 1), (1, 1))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=pad,
                       dtype=self.dtype, param_dtype=self.param_dtype, name="conv")(x)


class _FusedUpConv(nn.Module):
    """Holds the (3,3,Ci,Co) kernel + bias under the same names nn.Conv would
    use, but applies them via the fused parity decomposition."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ..ops.upsample import fused_enabled, upsample2x_conv3x3
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, in_ch, self.out_channels), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,),
                          self.param_dtype)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        if fused_enabled():
            return upsample2x_conv3x3(x, kernel, bias)
        from ..ops.convacc import conv_f32acc
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        y = conv_f32acc(x, kernel, (1, 1), ((1, 1), (1, 1))).astype(x.dtype)
        return y + bias


class Upsample2D(nn.Module):
    """Nearest 2x upsample + 3x3 conv, computed as four parity 2x2 convs at
    the ORIGINAL resolution (ops/upsample.py): 2.25x fewer FLOPs and no 4x
    HBM intermediate, numerically identical. Param tree (conv/kernel 3x3,
    conv/bias) matches the naive form, so checkpoints are unaffected."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return _FusedUpConv(self.out_channels, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="conv")(x)
