"""Unit tests for embeddings, blocks, and transformer modules (tiny shapes)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from svd_xtend_tpu.models.blocks import (AlphaBlender, Downsample2D, ResnetBlock2D,
                                         SpatioTemporalResBlock, TemporalResnetBlock,
                                         Upsample2D)
from svd_xtend_tpu.models.embeddings import TimestepEmbedding, sinusoidal_embedding
from svd_xtend_tpu.models.transformer import (BasicTransformerBlock,
                                              TemporalBasicTransformerBlock,
                                              TransformerSpatioTemporalModel)


def test_sinusoidal_embedding_contract():
    """diffusers Timesteps(flip_sin_to_cos=True, downscale_freq_shift=0)."""
    t = jnp.array([0.0, 1.0, 500.0])
    dim = 16
    emb = sinusoidal_embedding(t, dim)
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half) / half
    freqs = np.exp(exponent)
    args = np.asarray(t)[:, None] * freqs[None, :]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(emb, expected, atol=1e-4)
    # t=0: cos=1, sin=0
    np.testing.assert_allclose(emb[0, :half], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, half:], 0.0, atol=1e-6)


def test_timestep_embedding_shapes():
    m = TimestepEmbedding(32)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))
    out = m.apply(params, jnp.ones((2, 8)))
    assert out.shape == (2, 32)


def test_alpha_blender():
    m = AlphaBlender(merge_factor=0.5)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)), jnp.zeros((2, 3)))
    a = jax.nn.sigmoid(0.5)
    s, t = jnp.ones((2, 3)), jnp.zeros((2, 3))
    np.testing.assert_allclose(m.apply(params, s, t), float(a) * np.ones((2, 3)),
                               rtol=1e-6)
    # switch flips the roles
    m2 = AlphaBlender(merge_factor=0.5, switch_spatial_to_temporal_mix=True)
    p2 = m2.init(jax.random.PRNGKey(0), s, t)
    np.testing.assert_allclose(m2.apply(p2, s, t), float(1 - a) * np.ones((2, 3)),
                               rtol=1e-6)


def test_alpha_blender_image_only_indicator():
    """indicator==1 forces the spatial branch for (B*F, ...) inputs."""
    m = AlphaBlender(merge_factor=0.5)
    b, f = 2, 3
    s = jnp.ones((b * f, 4, 5))
    t = jnp.zeros((b * f, 4, 5))
    ind = jnp.zeros((b, f)).at[0, 1].set(1.0)
    params = m.init(jax.random.PRNGKey(0), s, t, ind)
    out = np.asarray(m.apply(params, s, t, ind))
    np.testing.assert_allclose(out[1], 1.0, rtol=1e-6)      # (b=0, f=1) row
    a = float(jax.nn.sigmoid(0.5))
    np.testing.assert_allclose(out[0], a, rtol=1e-6)


def test_resnet_block_2d():
    m = ResnetBlock2D(out_channels=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    temb = jax.random.normal(jax.random.PRNGKey(1), (2, 128))
    params = m.init(jax.random.PRNGKey(2), x, temb)
    out = m.apply(params, x, temb)
    assert out.shape == (2, 8, 8, 64)
    assert "conv_shortcut" in params["params"]


def test_temporal_resnet_block():
    m = TemporalResnetBlock(out_channels=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 6, 32))
    temb = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 64))
    params = m.init(jax.random.PRNGKey(2), x, temb)
    out = m.apply(params, x, temb)
    assert out.shape == x.shape


def test_temporal_conv_is_temporal():
    """The (3,1)-kernel frame-axis conv (our layout for the reference's
    (3,1,1) Conv3d) must mix across frames but not across spatial positions.

    (The full TemporalResnetBlock additionally couples positions through
    GroupNorm statistics — as the torch original does — so locality is
    asserted on the conv itself.)"""
    conv = nn.Conv(8, (3, 1), padding=((1, 1), (0, 0)))
    x = jnp.zeros((1, 4, 36, 8))                    # (B, F, S=H*W, C)
    params = conv.init(jax.random.PRNGKey(0), x)
    x = x.at[0, 1, 15, :].set(1.0)                  # impulse frame 1, position 15
    delta = np.abs(np.asarray(conv.apply(params, x))
                   - np.asarray(conv.apply(params, jnp.zeros_like(x)))).sum(-1)[0]
    assert delta[1, 15] > 0
    assert delta[0, 15] > 0 and delta[2, 15] > 0    # time neighbors see it
    assert delta[1, 14] == 0 and delta[1, 16] == 0  # spatial neighbors don't
    assert delta[3, 15] == 0                         # 2 frames away (k=3) don't


def test_spatio_temporal_res_block():
    f = 3
    m = SpatioTemporalResBlock(out_channels=32, num_frames=f)
    x = jax.random.normal(jax.random.PRNGKey(0), (2 * f, 8, 8, 32))
    temb = jax.random.normal(jax.random.PRNGKey(1), (2 * f, 64))
    params = m.init(jax.random.PRNGKey(2), x, temb)
    out = m.apply(params, x, temb)
    assert out.shape == x.shape


def test_sampling_blocks():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    down = Downsample2D(16)
    p = down.init(jax.random.PRNGKey(1), x)
    assert down.apply(p, x).shape == (2, 4, 4, 16)
    up = Upsample2D(16)
    p = up.init(jax.random.PRNGKey(1), x)
    assert up.apply(p, x).shape == (2, 16, 16, 16)


def test_transformer_spatio_temporal():
    b, f, h, w, c = 2, 3, 4, 4, 32
    m = TransformerSpatioTemporalModel(num_heads=2, head_dim=16, num_frames=f)
    x = jax.random.normal(jax.random.PRNGKey(0), (b * f, h, w, c))
    ehs = jax.random.normal(jax.random.PRNGKey(1), (b * f, 1, 24))
    params = m.init(jax.random.PRNGKey(2), x, ehs)
    out = m.apply(params, x, ehs)
    assert out.shape == x.shape
    # trainable-scope hook: temporal params carry the reference's name substring
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = ["/".join(str(getattr(k, "key", k)) for k in path) for path, _ in flat]
    assert any("temporal_transformer_block" in n for n in names)


def test_basic_transformer_blocks_shapes():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 24))
    m = BasicTransformerBlock(num_heads=2, head_dim=16)
    p = m.init(jax.random.PRNGKey(2), x, ctx)
    assert m.apply(p, x, ctx).shape == x.shape
    xt = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 10, 32))  # (B,F,S,C)
    ctx_t = jax.random.normal(jax.random.PRNGKey(5), (2, 1, 24))
    mt = TemporalBasicTransformerBlock(num_heads=2, head_dim=16)
    pt = mt.init(jax.random.PRNGKey(3), xt, ctx_t)
    assert mt.apply(pt, xt, ctx_t).shape == xt.shape


def test_frame_axis_attention_equals_transposed_attention():
    """FrameAxisAttention on (B,F,S,C) must match Attention on the
    (B*S, F, C) temporal-token transpose bit-for-bit in fp32 — the layout
    change is a pure re-indexing (same params: child names are identical)."""
    from svd_xtend_tpu.models.transformer import Attention, FrameAxisAttention
    from svd_xtend_tpu.ops.video import temporal_to_tokens, tokens_to_temporal

    b, f, s, c = 2, 5, 12, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (b, f, s, c))
    fa = FrameAxisAttention(num_heads=2, head_dim=16)
    params = fa.init(jax.random.PRNGKey(1), x)
    ref = Attention(num_heads=2, head_dim=16, attn_impl="xla")

    # self-attention over frames
    ours = fa.apply(params, x)
    toks = tokens_to_temporal(x.reshape(b * f, s, c), f)       # (B*S, F, C)
    theirs = temporal_to_tokens(ref.apply(params, toks), f, s).reshape(b, f, s, c)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                               rtol=2e-5, atol=2e-5)

    # multi-token cross-attention
    n = 4
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, n, 24))
    pc = fa.init(jax.random.PRNGKey(3), x, ctx)
    ours = fa.apply(pc, x, ctx)
    ctx_rep = jnp.broadcast_to(ctx[:, None], (b, s, n, 24)).reshape(b * s, n, 24)
    theirs = temporal_to_tokens(
        ref.apply(pc, toks, ctx_rep), f, s).reshape(b, f, s, c)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                               rtol=2e-5, atol=2e-5)

    # 1-key cross-attention shortcut
    ctx1 = jax.random.normal(jax.random.PRNGKey(4), (b, 1, 24))
    p1 = fa.init(jax.random.PRNGKey(5), x, ctx1)
    ours = fa.apply(p1, x, ctx1)
    ctx1_rep = jnp.broadcast_to(ctx1[:, None], (b, s, 1, 24)).reshape(b * s, 1, 24)
    theirs = temporal_to_tokens(
        ref.apply(p1, toks, ctx1_rep), f, s).reshape(b, f, s, c)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                               rtol=2e-5, atol=2e-5)


def test_feedforward_chunking_matches_unchunked():
    """FF chunking (reference enable_forward_chunking) is exact and keeps the
    param tree; works on 3D spatial tokens and 4D (B,F,S,C) temporal maps."""
    from svd_xtend_tpu.models.transformer import FeedForward

    x4 = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 8))
    ffc = FeedForward(8, chunk_size=4)
    p = ffc.init(jax.random.PRNGKey(1), x4)
    assert set(p["params"].keys()) == {"net_0_proj", "net_2"}
    ff0 = FeedForward(8, chunk_size=0)
    np.testing.assert_allclose(np.asarray(ffc.apply(p, x4)),
                               np.asarray(ff0.apply(p, x4)), atol=1e-6)
    x3 = x4.reshape(6, 16, 8)
    np.testing.assert_allclose(np.asarray(ffc.apply(p, x3)),
                               np.asarray(ff0.apply(p, x3)), atol=1e-6)
    # gradients flow through the lifted scan
    g = jax.grad(lambda p: float(0) + jnp.sum(ffc.apply(p, x4) ** 2))(p)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_ff_chunk_raises_on_non_divisible():
    """The reference's enable_forward_chunking contract surfaces a config
    error on a non-divisible chunk; silent no-op is a bug (r2 VERDICT #8)."""
    import pytest

    from svd_xtend_tpu.models.transformer import FeedForward

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 8))
    ff = FeedForward(8, chunk_size=3)
    with pytest.raises(ValueError, match="chunk_size"):
        ff.init(jax.random.PRNGKey(1), x)


def test_resnet_split_cat_matches_concat(monkeypatch):
    """The split-concat machinery (_conv3x3_split_cat, _Conv1x1Cat,
    group_norm_fold_cat) vs the materialized-concat form: outputs AND
    gradients, f32, including a group boundary straddling the part split
    (parts 20+12, gs=8: group 2 spans channels 16..24)."""
    rng = jax.random.PRNGKey(0)
    b, h, w = 2, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 20)) * 1.5 + 0.3
    skip = jax.random.normal(jax.random.PRNGKey(2), (b, h, w, 12)) - 0.2
    temb = jax.random.normal(jax.random.PRNGKey(3), (b, 24))
    blk = ResnetBlock2D(out_channels=16, groups=4)

    def run(split_on):
        monkeypatch.setenv("SVDX_SPLIT_CAT_CONV", "1" if split_on else "0")
        p = blk.init(rng, x, temb, skip_cat=skip)
        out = blk.apply(p, x, temb, skip_cat=skip)
        loss = lambda p, x, skip: jnp.sum(
            blk.apply(p, x, temb, skip_cat=skip) ** 2)
        gp, gx, gs = jax.grad(loss, argnums=(0, 1, 2))(p, x, skip)
        return p, out, gp, gx, gs

    p1, out1, gp1, gx1, gs1 = run(True)
    p0, out0, gp0, gx0, gs0 = run(False)
    # identical param trees (single concat-width kernels) under both modes
    assert jax.tree.structure(p1) == jax.tree.structure(p0)
    for a, b_ in zip(jax.tree.leaves(p1), jax.tree.leaves(p0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs0),
                               rtol=2e-4, atol=2e-4)
    for a, b_ in zip(jax.tree.leaves(gp1), jax.tree.leaves(gp0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_group_norm_fold_cat_straddling_groups():
    """group_norm_fold_cat == group_norm_fold on the materialized concat,
    with group boundaries straddling the part split; mismatched spatial
    extents are rejected."""
    import pytest

    from svd_xtend_tpu.ops.pallas.groupnorm import (group_norm_fold,
                                                    group_norm_fold_cat)

    n, s = 2, 7
    p1 = jax.random.normal(jax.random.PRNGKey(0), (n, s, 20)) * 2 + 1
    p2 = jax.random.normal(jax.random.PRNGKey(1), (n, s, 12)) - 3
    scale = jax.random.normal(jax.random.PRNGKey(2), (32,))
    bias = jax.random.normal(jax.random.PRNGKey(3), (32,))
    sc_cat, sh_cat = group_norm_fold_cat([p1, p2], scale, bias, groups=4)
    sc_ref, sh_ref = group_norm_fold(jnp.concatenate([p1, p2], -1), scale,
                                     bias, groups=4)
    np.testing.assert_allclose(np.asarray(sc_cat), np.asarray(sc_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sh_cat), np.asarray(sh_ref),
                               rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="spatial"):
        group_norm_fold_cat([p1, p2[:, :-1]], scale, bias, groups=4)


def test_group_norm_fold_near_constant_group_no_nan():
    """One-pass E[x^2]-mean^2 under f32 cancellation: a near-constant group
    with a large mean must not produce NaN via a tiny negative variance
    (r2 ADVICE: clamp before rsqrt)."""
    from svd_xtend_tpu.ops.pallas.groupnorm import group_norm_fold

    n, s, c = 1, 64, 16
    x = jnp.full((n, s, c), 1000.0, dtype=jnp.float32)
    sc, sh = group_norm_fold(x, jnp.ones((c,)), jnp.zeros((c,)), groups=4,
                             eps=1e-6)
    assert np.isfinite(np.asarray(sc)).all()
    assert np.isfinite(np.asarray(sh)).all()


def test_resnet_gn_fold_matches_kernel_path(monkeypatch):
    """SVDX_GN_FOLD=1 (GN-fold form even on XLA convs — the decode
    relayout fix) vs the standalone-GN path: outputs and gradients, f32,
    with and without temb."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32)) * 2 + 0.5
    temb = jax.random.normal(jax.random.PRNGKey(2), (2, 24))
    for use_temb in (True, False):
        blk = ResnetBlock2D(out_channels=16, groups=4)
        t = temb if use_temb else None

        def run(fold):
            monkeypatch.setenv("SVDX_GN_FOLD", "1" if fold else "0")
            p = blk.init(rng, x, t)
            out = blk.apply(p, x, t)
            g = jax.grad(lambda xx: jnp.sum(blk.apply(p, xx, t) ** 2))(x)
            return out, g

        out1, g1 = run(True)
        out0, g0 = run(False)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=2e-4, atol=2e-4)
