"""ops/: attention vs naive reference, resize vs torch oracle, layout round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svd_xtend_tpu.ops import attention as attn_ops
from svd_xtend_tpu.ops import video as video_ops
from svd_xtend_tpu.ops.resize import resize_antialiased


def test_xla_attention_matches_naive():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 16, 4, 8))
    k = jax.random.normal(kk, (2, 24, 4, 8))
    v = jax.random.normal(kv, (2, 24, 4, 8))
    out = attn_ops.dot_product_attention(q, k, v, impl="xla")
    # naive per-head loop
    scale = 8 ** -0.5
    expected = np.zeros_like(out)
    qn, kn, vn = map(np.asarray, (q, k, v))
    for b in range(2):
        for h in range(4):
            logits = qn[b, :, h] @ kn[b, :, h].T * scale
            w = np.exp(logits - logits.max(-1, keepdims=True))
            w /= w.sum(-1, keepdims=True)
            expected[b, :, h] = w @ vn[b, :, h]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_attention_one_token_context():
    """SVD cross-attention: context is a single CLIP token -> output equals v
    projected (softmax over 1 key is identity)."""
    q = jax.random.normal(jax.random.PRNGKey(0), (3, 10, 2, 4))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 1, 2, 4))
    v = jax.random.normal(jax.random.PRNGKey(2), (3, 1, 2, 4))
    out = attn_ops.dot_product_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(out, np.broadcast_to(np.asarray(v), (3, 10, 2, 4)),
                               atol=1e-6)


def test_layout_roundtrips():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 5, 6))  # B F H W C
    folded = video_ops.fold_frames(x)
    assert folded.shape == (6, 4, 5, 6)
    np.testing.assert_array_equal(video_ops.unfold_frames(folded, 3), x)

    tokens = video_ops.spatial_tokens(folded)          # (6, 20, 6)
    temporal = video_ops.tokens_to_temporal(tokens, 3)  # (2*20, 3, 6)
    assert temporal.shape == (40, 3, 6)
    back = video_ops.temporal_to_tokens(temporal, 3, 20)
    np.testing.assert_array_equal(back, tokens)
    # check semantic: temporal token (b, s) frame axis really is the frame axis
    np.testing.assert_allclose(
        np.asarray(temporal).reshape(2, 20, 3, 6)[1, 7, 2],
        np.asarray(x).reshape(2, 3, 20, 6)[1, 2, 7])


def _torch_reference_resize(x_nchw, size):
    """The reference's _resize_with_antialiasing (train_svd.py:140-248)
    re-derived in torch as an oracle."""
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(x_nchw)
    h, w = x.shape[-2:]
    factors = (h / size[0], w / size[1])
    sigmas = (max((factors[0] - 1.0) / 2.0, 0.001), max((factors[1] - 1.0) / 2.0, 0.001))
    ks = [int(max(2.0 * 2 * sigmas[0], 3)), int(max(2.0 * 2 * sigmas[1], 3))]
    ks = [k + 1 if k % 2 == 0 else k for k in ks]

    def gauss(n, sigma):
        xs = torch.arange(n, dtype=torch.float64) - n // 2
        if n % 2 == 0:
            xs = xs + 0.5
        g = torch.exp(-xs.pow(2) / (2 * sigma**2))
        return (g / g.sum()).float()

    ky = gauss(ks[0], sigmas[0])[None, None, :, None]
    kx = gauss(ks[1], sigmas[1])[None, None, None, :]
    c = x.shape[1]
    pad_x = (ks[1] - 1) // 2
    pad_y = (ks[0] - 1) // 2
    out = F.pad(x, (pad_x, ks[1] - 1 - pad_x, 0, 0), mode="reflect")
    out = F.conv2d(out, kx.expand(c, 1, 1, ks[1]), groups=c)
    out = F.pad(out, (0, 0, pad_y, ks[0] - 1 - pad_y), mode="reflect")
    out = F.conv2d(out, ky.expand(c, 1, ks[0], 1), groups=c)
    out = F.interpolate(out, size=size, mode="bicubic", align_corners=True)
    return out.numpy()


@pytest.mark.parametrize("in_hw,out_hw", [((320, 512), (224, 224)),
                                          ((64, 48), (224, 224)),
                                          ((224, 224), (224, 224))])
def test_resize_antialiased_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, *in_hw).astype(np.float32)
    expected = _torch_reference_resize(x, out_hw)          # NCHW
    got = resize_antialiased(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-4)


def test_upsample2x_conv3x3_matches_naive():
    """ops/upsample.py parity decomposition == conv3x3(nearest_upsample(x))."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from svd_xtend_tpu.ops.upsample import upsample2x_conv3x3

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (2, 5, 7, 6), jnp.float32)
    kernel = jax.random.normal(k2, (3, 3, 6, 4)) * 0.2
    bias = jax.random.normal(k3, (4,)) * 0.1

    x_up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    dn = lax.conv_dimension_numbers(x_up.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    ref = lax.conv_general_dilated(x_up, kernel, (1, 1),
                                   ((1, 1), (1, 1)), dimension_numbers=dn) + bias
    out = upsample2x_conv3x3(x, kernel, bias)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # gradients flow and match
    f_ours = lambda k: jnp.sum(upsample2x_conv3x3(x, k, bias) ** 2)
    f_ref = lambda k: jnp.sum((lax.conv_general_dilated(
        x_up, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn) + bias) ** 2)
    g_ours = jax.grad(f_ours)(kernel)
    g_ref = jax.grad(f_ref)(kernel)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_conv3x3_tiled_matches_direct():
    """Halo-tiled conv (ops/conv_tiled.py) == direct SAME conv, any tile."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from svd_xtend_tpu.ops.conv_tiled import conv3x3_tiled

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (2, 8, 12, 5))
    k = jax.random.normal(k2, (3, 3, 5, 7)) * 0.3
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    ref = lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
                                   dimension_numbers=dn)
    for tile in [(4, 4), (2, 6), (8, 12), (4, 12)]:
        out = conv3x3_tiled(x, k, tile=tile)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
    # gradients match too (both kernel and input cotangents)
    g1 = jax.grad(lambda k: jnp.sum(conv3x3_tiled(x, k, tile=(4, 6)) ** 2))(k)
    g2 = jax.grad(lambda k: jnp.sum((lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)) ** 2))(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_conv3x3_module_matches_nn_conv():
    """models.blocks.Conv3x3 == nn.Conv(3x3, SAME) with the same params."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from svd_xtend_tpu.models.blocks import Conv3x3

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6, 4))
    m = Conv3x3(8)
    p = m.init(jax.random.PRNGKey(1), x)
    assert set(p["params"].keys()) == {"kernel", "bias"}
    assert p["params"]["kernel"].shape == (3, 3, 4, 8)
    ref = nn.Conv(8, (3, 3), padding=1)
    np.testing.assert_allclose(np.asarray(m.apply(p, x)),
                               np.asarray(ref.apply(p, x)),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_pallas_matches_lax_conv():
    """Pallas implicit-GEMM conv (interpret mode on CPU): forward and all
    three gradients must match lax.conv_general_dilated."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from svd_xtend_tpu.ops.pallas.conv3x3 import conv3x3_pallas

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)

    def ref(x, k, b):
        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn) + b

    for (n, h, w, ci, co, band, bco) in [
            (2, 8, 16, 12, 20, 4, 0), (1, 5, 8, 7, 9, 5, 0),
            (2, 12, 8, 4, 6, 0, 0), (1, 8, 8, 6, 12, 4, 4)]:
        x = jax.random.normal(k1, (n, h, w, ci), jnp.float32)
        k = jax.random.normal(k2, (3, 3, ci, co)) * 0.2
        b = jax.random.normal(k3, (co,)) * 0.1
        out = conv3x3_pallas(x, k, b, band=band, bco=bco)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x, k, b)),
                                   rtol=1e-4, atol=1e-4)
        dy = jax.random.normal(k4, out.shape)
        g1 = jax.grad(lambda *a: jnp.sum(conv3x3_pallas(*a, band=band,
                                                        bco=bco) * dy),
                      argnums=(0, 1, 2))(x, k, b)
        g2 = jax.grad(lambda *a: jnp.sum(ref(*a) * dy),
                      argnums=(0, 1, 2))(x, k, b)
        for a, bb in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=2e-4, atol=2e-4)


def test_conv3x3_pallas_tile_picker_legality():
    """_pick_tiles must only emit Mosaic-legal Co blocks (lane-aligned or
    full) — sub-128 non-spanning tiles compile-fail on TPU — and the
    dispatch rule must reject shapes measured slower than XLA."""
    from svd_xtend_tpu.ops.pallas.conv3x3 import (_pick_tiles,
                                                  conv3x3_pallas_wins)

    for (h, w, ci, co) in [(18, 32, 1920, 1280), (72, 128, 960, 320),
                           (72, 128, 320, 320), (36, 64, 640, 640),
                           (576, 1024, 256, 128), (9, 16, 1280, 1280)]:
        ci_p = -(-ci // 128) * 128
        tiles = _pick_tiles(h, w, ci_p, co, 2)
        if tiles is not None:
            _, bco = tiles
            assert bco % 128 == 0 or bco == co, (h, w, ci, co, bco)
    # measured winners stay on
    assert conv3x3_pallas_wins((28, 36, 64, 640), 640)
    assert conv3x3_pallas_wins((28, 72, 128, 8), 320)
    assert conv3x3_pallas_wins((7, 576, 1024, 256), 128)
    # measured losers (padded Cin / tiny Co) dispatch to XLA
    assert not conv3x3_pallas_wins((28, 72, 128, 320), 320)
    assert not conv3x3_pallas_wins((28, 72, 128, 320), 4)
    assert not conv3x3_pallas_wins((7, 576, 1024, 128), 3)


def test_conv3x3_pallas_fused_epilogues():
    """Fused input-affine+SiLU / post-shift / residual epilogues (interpret
    mode): forward and every gradient must match conv3x3_fused_reference."""
    import jax
    import jax.numpy as jnp
    from svd_xtend_tpu.ops.pallas.conv3x3 import (conv3x3_fused_reference,
                                                  conv3x3_pallas)

    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    n, h, w, ci, co = 2, 6, 8, 5, 12
    x = jax.random.normal(ks[0], (n, h, w, ci), jnp.float32)
    k = jax.random.normal(ks[1], (3, 3, ci, co)) * 0.2
    b = jax.random.normal(ks[2], (co,)) * 0.1
    sc = jax.random.normal(ks[3], (n, ci)) * 0.5 + 1.0
    sh = jax.random.normal(ks[4], (n, ci)) * 0.3
    post = jax.random.normal(ks[5], (n, co)) * 0.2
    res = jax.random.normal(ks[6], (n, h, w, co))
    dy = jax.random.normal(ks[7], (n, h, w, co))

    cases = [
        dict(pre_scale=sc, pre_shift=sh, pre_silu=True),
        dict(pre_scale=sc, pre_shift=sh, pre_silu=False),
        dict(post_shift=post),
        dict(residual=res),
        dict(pre_scale=sc, pre_shift=sh, pre_silu=True, post_shift=post,
             residual=res),
    ]
    for kw in cases:
        got = conv3x3_pallas(x, k, b, band=3, **kw)
        want = conv3x3_fused_reference(x, k, b,
                                       pre_silu=kw.get("pre_silu", False),
                                       **{a: kw[a] for a in
                                          ("pre_scale", "pre_shift",
                                           "post_shift", "residual")
                                          if a in kw})
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=str(kw.keys()))

        diff_args = [a for a in ("pre_scale", "pre_shift", "post_shift",
                                 "residual") if a in kw]

        def loss_pallas(x_, k_, b_, *extra):
            kw2 = dict(zip(diff_args, extra))
            kw2["pre_silu"] = kw.get("pre_silu", False)
            return jnp.sum(conv3x3_pallas(x_, k_, b_, band=3, **kw2) * dy)

        def loss_ref(x_, k_, b_, *extra):
            kw2 = dict(zip(diff_args, extra))
            return jnp.sum(conv3x3_fused_reference(
                x_, k_, b_, pre_silu=kw.get("pre_silu", False), **kw2) * dy)

        extras = [kw[a] for a in diff_args]
        nargs = 3 + len(extras)
        g1 = jax.grad(loss_pallas, argnums=tuple(range(nargs)))(x, k, b, *extras)
        g2 = jax.grad(loss_ref, argnums=tuple(range(nargs)))(x, k, b, *extras)
        for name, a, bb in zip(["x", "k", "b"] + diff_args, g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"{list(kw)} grad {name}")


def test_resnet_block_fused_path_matches_unfused(monkeypatch):
    """ResnetBlock2D with the Pallas fused-epilogue path forced on
    (SVDX_PALLAS_CONV=force, interpret mode) must match the unfused path
    bit-for-tolerance with the same params."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from svd_xtend_tpu.models.blocks import ResnetBlock2D

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(k1, (2, 8, 8, 128), jnp.float32)
    temb = jax.random.normal(k2, (2, 24), jnp.float32)
    blk = ResnetBlock2D(out_channels=128, groups=4)
    blk_wide = ResnetBlock2D(out_channels=128, groups=4)  # exercises shortcut

    monkeypatch.setenv("SVDX_PALLAS_CONV", "0")
    params = blk.init(k3, x, temb)
    want = blk.apply(params, x, temb)
    monkeypatch.setenv("SVDX_PALLAS_CONV", "force")
    got = blk.apply(params, x, temb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # channel-changing variant (conv_shortcut feeding the fused residual)
    xw = jax.random.normal(k1, (1, 8, 8, 64), jnp.float32)
    monkeypatch.setenv("SVDX_PALLAS_CONV", "0")
    pw = blk_wide.init(k3, xw, None)
    want_w = blk_wide.apply(pw, xw, None)
    monkeypatch.setenv("SVDX_PALLAS_CONV", "force")
    got_w = blk_wide.apply(pw, xw, None)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                               rtol=2e-5, atol=2e-5)


def test_conv3x3_autotune_table(tmp_path, monkeypatch):
    """Autotune table round-trip and dispatch precedence: a table entry for
    the exact shape overrides the heuristic in both directions."""
    import jax.numpy as jnp
    from svd_xtend_tpu.models.blocks import pallas_conv_dispatch
    from svd_xtend_tpu.ops.pallas import autotune

    path = str(tmp_path / "table.json")
    monkeypatch.setenv("SVDX_AUTOTUNE_TABLE", path)
    monkeypatch.setenv("SVDX_PALLAS_CONV_MARGIN", "1.0")
    monkeypatch.setenv("SVDX_PALLAS_CONV", "force")

    win_shape, win_co = (28, 36, 64, 640), 640     # heuristic: pallas
    lose_shape, lose_co = (28, 72, 128, 320), 320  # heuristic: xla
    assert pallas_conv_dispatch(win_shape, win_co, jnp.bfloat16) is not None
    assert pallas_conv_dispatch(lose_shape, lose_co, jnp.bfloat16) is None

    autotune.save_table({
        autotune._key(win_shape, win_co, "bfloat16"):
            autotune.make_entry("xla"),
        autotune._key(lose_shape, lose_co, "bfloat16"):
            autotune.make_entry("pallas", band=4, bco=320, speedup=1.3),
    }, path)
    assert pallas_conv_dispatch(win_shape, win_co, jnp.bfloat16) is None
    got = pallas_conv_dispatch(lose_shape, lose_co, jnp.bfloat16)
    assert got == {"band": 4, "bco": 320}

    # merge keeps prior entries; shape registry records queries
    autotune.save_table({"x": autotune.make_entry("xla")}, path)
    assert autotune.lookup(lose_shape, lose_co, "bfloat16") is not None
    autotune.reset_recorded()
    pallas_conv_dispatch((1, 8, 8, 32), 16, jnp.float32)
    assert ((1, 8, 8, 32), 16, "float32", "") in autotune.recorded_shapes()


def test_conv_f32acc_bf16_differentiable():
    """Regression: lax conv with preferred_element_type=f32 over bf16
    operands is untransposable in current JAX (f32 cotangent hits the
    same-dtype check in the transpose-rule convs) — it silently broke every
    bf16 training graph through the XLA conv fallbacks. conv_f32acc must
    (a) match the f32-accumulate forward, (b) differentiate in bf16, with
    grads equal to the plain-conv convention."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from svd_xtend_tpu.ops.convacc import conv_f32acc

    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    x = jax.random.normal(ks[0], (2, 8, 8, 16), jnp.bfloat16)
    k = jax.random.normal(ks[1], (3, 3, 16, 8), jnp.bfloat16) * 0.2
    dy = jax.random.normal(ks[2], (2, 8, 8, 8), jnp.float32)

    def ref_fwd(x, k):
        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=dn,
                                        preferred_element_type=jnp.float32)

    y = conv_f32acc(x, k, (1, 1), ((1, 1), (1, 1)))
    assert y.dtype == jnp.float32
    assert jnp.allclose(y, ref_fwd(x, k))

    # bf16 grads exist and follow the plain-conv (AMP) convention
    loss = lambda x, k: jnp.sum(conv_f32acc(x, k, (1, 1), ((1, 1), (1, 1)))
                                * dy)
    dx, dk = jax.grad(loss, argnums=(0, 1))(x, k)
    assert dx.dtype == jnp.bfloat16 and dk.dtype == jnp.bfloat16

    def plain(x, k):
        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=dn)
    _, vjp = jax.vjp(plain, x, k)
    rdx, rdk = vjp(dy.astype(jnp.bfloat16))
    assert jnp.array_equal(dx, rdx) and jnp.array_equal(dk, rdk)


def test_bf16_train_step_traces():
    """Regression: the full bf16 train step (models + mixed_precision bf16,
    remat on) must trace/lower — it could not before conv_f32acc (see
    test_conv_f32acc_bf16_differentiable)."""
    import jax
    import jax.numpy as jnp
    from svd_xtend_tpu.core.config import (TINY_CLIP, TINY_UNET, TINY_VAE,
                                           TrainConfig)
    from svd_xtend_tpu.diffusion.pipeline import (SVDModels,
                                                  init_pipeline_params)
    from svd_xtend_tpu.train.optim import make_optimizer
    from svd_xtend_tpu.train.state import create_train_state, make_train_step

    models = SVDModels(unet_config=TINY_UNET, vae_config=TINY_VAE,
                       clip_config=TINY_CLIP, dtype=jnp.bfloat16,
                       param_dtype=jnp.bfloat16)
    params = jax.eval_shape(lambda k: init_pipeline_params(models, k),
                            jax.random.PRNGKey(0))
    cfg = TrainConfig(train_mode="temporal", learning_rate=1e-4,
                      lr_scheduler="constant", num_frames=2, height=32,
                      width=32, remat_policy="block", mixed_precision="bf16")
    opt = make_optimizer(cfg)
    state = jax.eval_shape(
        lambda p: create_train_state(cfg, p, opt,
                                     lora_rng=jax.random.PRNGKey(1)),
        params["unet"])
    frozen = {"vae": params["vae"], "clip": params["clip"]}

    def wrapped(state, batch, rng, frozen):
        return make_train_step(models, cfg, opt, frozen)(state, batch, rng)

    batch = jax.ShapeDtypeStruct((1, 2, 32, 32, 3), jnp.float32)
    lowered = jax.jit(wrapped).lower(state, batch, jax.random.PRNGKey(3),
                                     frozen)
    assert lowered is not None


def test_conv3x3_fused_table_dispatch(tmp_path, monkeypatch):
    """Fused-chain table precedence (models/blocks.py): an epi-keyed entry
    overrides both the plain table and the heuristic — pallas only at or
    above the fused margin, xla verdicts veto outright."""
    import jax.numpy as jnp
    from svd_xtend_tpu.models import blocks
    from svd_xtend_tpu.ops.pallas import autotune

    fpath = str(tmp_path / "fused.json")
    monkeypatch.setenv("SVDX_FUSED_TABLE", fpath)
    monkeypatch.setenv("SVDX_AUTOTUNE_TABLE", "0")
    monkeypatch.setenv("SVDX_PALLAS_CONV", "force")

    shape, co = (28, 36, 64, 640), 640   # heuristic: pallas
    # no fused entry -> falls through to the heuristic
    assert blocks.pallas_conv_dispatch(shape, co, jnp.bfloat16,
                                       epi="preS+res") is not None
    autotune.save_fused_table({
        autotune._fused_key(shape, co, "bfloat16", "preS+res"):
            autotune.make_entry("xla"),
        autotune._fused_key(shape, co, "bfloat16", "preS+post"):
            autotune.make_entry("pallas", band=4, bco=128, speedup=1.5),
        autotune._fused_key(shape, co, "bfloat16", "preS"):
            autotune.make_entry("pallas", band=4, bco=128, speedup=1.05),
    }, fpath)
    # measured-xla fused chain refuses the kernel even though the heuristic
    # would take it
    assert blocks.pallas_conv_dispatch(shape, co, jnp.bfloat16,
                                       epi="preS+res") is None
    # measured-pallas above the margin engages with the tuned tiling
    assert blocks.pallas_conv_dispatch(shape, co, jnp.bfloat16,
                                       epi="preS+post") == \
        {"band": 4, "bco": 128}
    # below the fused margin (default 1.2): no
    assert blocks.pallas_conv_dispatch(shape, co, jnp.bfloat16,
                                       epi="preS") is None
    monkeypatch.setenv("SVDX_PALLAS_CONV_FUSED_MARGIN", "1.0")
    assert blocks.pallas_conv_dispatch(shape, co, jnp.bfloat16,
                                       epi="preS") is not None


def test_conv3x3_pallas_bwd_dx_dispatch(monkeypatch):
    """The backward dx conv routes through the Pallas kernel at winning
    shapes (force mode, interpret): gradients must still match XLA."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from svd_xtend_tpu.ops.pallas.conv3x3 import (_plain_dispatch,
                                                  conv3x3_pallas)

    monkeypatch.setenv("SVDX_PALLAS_CONV", "force")
    n, h, w, ci, co = 1, 4, 8, 128, 128
    assert _plain_dispatch((n, h, w, co), ci, jnp.float32) is not None
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    x = jax.random.normal(ks[0], (n, h, w, ci), jnp.float32)
    k = jax.random.normal(ks[1], (3, 3, ci, co)) * 0.1
    b = jax.random.normal(ks[2], (co,)) * 0.1
    dy = jax.random.normal(ks[3], (n, h, w, co))

    def ref(x, k, b):
        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn) + b

    g1 = jax.grad(lambda *a: jnp.sum(conv3x3_pallas(*a) * dy),
                  argnums=(0, 1, 2))(x, k, b)
    g2 = jax.grad(lambda *a: jnp.sum(ref(*a) * dy),
                  argnums=(0, 1, 2))(x, k, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=2e-4)


def test_conv3x3_dispatch_table_mode(tmp_path, monkeypatch):
    """SVDX_PALLAS_CONV=table: only tuner-validated shapes take pallas —
    the heuristic never fires for untuned shapes (guards Mosaic compile
    bugs at novel operating points)."""
    import jax
    import jax.numpy as jnp
    from svd_xtend_tpu.models import blocks
    from svd_xtend_tpu.ops.pallas import autotune

    path = str(tmp_path / "t.json")
    monkeypatch.setenv("SVDX_AUTOTUNE_TABLE", path)
    monkeypatch.setenv("SVDX_PALLAS_CONV_MARGIN", "1.0")
    win_shape, win_co = (28, 36, 64, 640), 640     # heuristic says pallas

    # pretend we are on TPU so the backend gate passes
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("SVDX_PALLAS_CONV", "1")
    assert blocks.pallas_conv_dispatch(win_shape, win_co,
                                       jnp.bfloat16) is not None
    monkeypatch.setenv("SVDX_PALLAS_CONV", "table")
    assert blocks.pallas_conv_dispatch(win_shape, win_co, jnp.bfloat16) is None
    autotune.save_table({autotune._key(win_shape, win_co, "bfloat16"):
                         autotune.make_entry("pallas", 4, 128, 1.2)}, path)
    assert blocks.pallas_conv_dispatch(win_shape, win_co,
                                       jnp.bfloat16) == {"band": 4,
                                                         "bco": 128}


def test_conv3x3_dispatch_fused_capability_flag(tmp_path, monkeypatch):
    """A table entry with fused=False keeps pallas for plain conv sites but
    rejects fused-epilogue call sites."""
    import jax
    import jax.numpy as jnp
    from svd_xtend_tpu.models import blocks
    from svd_xtend_tpu.ops.pallas import autotune

    path = str(tmp_path / "t.json")
    monkeypatch.setenv("SVDX_AUTOTUNE_TABLE", path)
    monkeypatch.setenv("SVDX_PALLAS_CONV_MARGIN", "1.0")
    monkeypatch.setenv("SVDX_PALLAS_CONV", "table")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    shape, co = (14, 320, 512, 8), 128
    ent = autotune.make_entry("pallas", 1, 128, 2.0)
    ent["fused"] = False
    autotune.save_table({autotune._key(shape, co, "bfloat16"): ent}, path)
    assert blocks.pallas_conv_dispatch(shape, co, jnp.bfloat16) is not None
    assert blocks.pallas_conv_dispatch(shape, co, jnp.bfloat16,
                                       fused=True) is None


def test_conv3x3_dispatch_composition_margin(tmp_path, monkeypatch):
    """Table winners below the composition margin (default 1.15x) dispatch
    to XLA — an isolated sub-margin win loses to the pallas_call fusion
    boundary end-to-end."""
    import jax
    import jax.numpy as jnp
    from svd_xtend_tpu.models import blocks
    from svd_xtend_tpu.ops.pallas import autotune

    path = str(tmp_path / "t.json")
    monkeypatch.setenv("SVDX_AUTOTUNE_TABLE", path)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    shape, co = (28, 20, 32, 640), 640
    autotune.save_table({autotune._key(shape, co, "bfloat16"):
                         autotune.make_entry("pallas", 20, 128, 1.05)}, path)
    assert blocks.pallas_conv_dispatch(shape, co, jnp.bfloat16) is None
    monkeypatch.setenv("SVDX_PALLAS_CONV_MARGIN", "1.0")
    assert blocks.pallas_conv_dispatch(shape, co, jnp.bfloat16) is not None
