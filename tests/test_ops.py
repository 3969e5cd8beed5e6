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
