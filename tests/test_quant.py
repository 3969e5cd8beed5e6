"""W8A8 int8 conv path (ops/quant.py): quantizer invariants, conv parity
within quantization-noise bounds, dispatch gating, and the opt-in
pipeline wiring (PipelineConfig.unet_quant)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svd_xtend_tpu.ops import quant
from svd_xtend_tpu.ops.pallas.conv3x3 import conv3x3_fused_reference


def test_quantize_dynamic_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 32))
    xq, s = quant.quantize_dynamic(x)
    assert xq.dtype == jnp.int8
    back = xq.astype(jnp.float32) * s
    # symmetric per-tensor: error bounded by half a quantization step
    assert float(jnp.max(jnp.abs(back - x))) <= float(s) * 0.5 + 1e-6
    assert int(jnp.max(jnp.abs(xq))) == 127   # scale saturates the range


def test_quantize_weight_per_channel():
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 16, 8))
    w = w * jnp.arange(1, 9)                   # very different per-Co ranges
    wq, s = quant.quantize_weight_per_co(w)
    assert wq.shape == w.shape and s.shape == (8,)
    back = wq.astype(jnp.float32) * s
    steps = jnp.max(jnp.abs(back - w), axis=(0, 1, 2)) / s
    assert float(jnp.max(steps)) <= 0.5 + 1e-5   # per-channel half-step bound


def test_int8_conv_parity():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (2, 8, 8, 64), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 64, 32), jnp.float32) * (9 * 64) ** -0.5
    b = jnp.linspace(-1, 1, 32, dtype=jnp.float32)
    y8 = int8 = quant.int8_conv3x3(x, w, b)
    yr = conv3x3_fused_reference(x, w, b)
    # error budget: two symmetric quantizers, ~5% of the output scale
    tol = 0.06 * float(jnp.std(yr))
    assert float(jnp.max(jnp.abs(y8 - yr))) < tol


def test_int8_conv_epilogues():
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(3), 4)
    x = jax.random.normal(k1, (2, 8, 8, 32), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 32, 32), jnp.float32) * (9 * 32) ** -0.5
    b = jnp.zeros((32,))
    shift = jax.random.normal(k3, (2, 32))
    res = jax.random.normal(k4, (2, 8, 8, 32))
    y8 = quant.int8_conv3x3(x, w, b, post_shift=shift, residual=res)
    yr = conv3x3_fused_reference(x, w, b, post_shift=shift, residual=res)
    assert float(jnp.max(jnp.abs(y8 - yr))) < 0.08 * float(jnp.std(yr))


def test_mode_gate_and_table():
    assert quant.get_mode() is None
    with quant.quantized("int8"):
        assert quant.get_mode() == "int8"
        with quant.quantized(None):
            assert quant.get_mode() is None
        assert quant.get_mode() == "int8"
    assert quant.get_mode() is None
    with pytest.raises(ValueError):
        quant.set_mode("int4")
    # unknown shape: not in table -> False; forced -> True
    assert not quant.int8_conv_wins((1, 2, 2, 8), 8)
    os.environ["SVDX_INT8_FORCE"] = "1"
    try:
        assert quant.int8_conv_wins((1, 2, 2, 8), 8)
    finally:
        del os.environ["SVDX_INT8_FORCE"]


def test_pipeline_int8_opt_in():
    """generate(..., unet_quant='int8') with the table forced: runs, stays
    finite, and stays within quantization distance of the exact output."""
    from svd_xtend_tpu.core.config import (TINY_CLIP, TINY_UNET, TINY_VAE,
                                           PipelineConfig)
    from svd_xtend_tpu.diffusion.pipeline import (SVDModels, generate,
                                                  init_pipeline_params)

    models = SVDModels(unet_config=TINY_UNET, vae_config=TINY_VAE,
                       clip_config=TINY_CLIP, dtype=jnp.float32)
    params = init_pipeline_params(models, jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 2 - 1
    base_cfg = dict(height=32, width=32, num_frames=2,
                    num_inference_steps=2, decode_chunk_size=2)
    exact = generate(models, params, img, jax.random.PRNGKey(2),
                     PipelineConfig(**base_cfg))
    os.environ["SVDX_INT8_FORCE"] = "1"
    try:
        q = generate(models, params, img, jax.random.PRNGKey(2),
                     PipelineConfig(**base_cfg, unet_quant="int8",
                                    vae_quant="int8"))
    finally:
        del os.environ["SVDX_INT8_FORCE"]
    assert q.shape == exact.shape
    assert bool(jnp.isfinite(q).all())
    # 2 sampler steps of quant noise through the UNet; loose sanity bound
    assert float(jnp.max(jnp.abs(q - exact))) < 0.5


def test_int8_dense_parity():
    """int8_dense vs the bf16 matmul within W8A8 quantization-noise bounds;
    per-output-column weight scales handle wildly different column ranges."""
    x = jax.random.normal(jax.random.PRNGKey(4), (6, 32, 64))
    k = jax.random.normal(jax.random.PRNGKey(5), (64, 48)) * 0.1
    k = k * (1.0 + jnp.arange(48) / 8.0)         # spread per-column ranges
    b = jax.random.normal(jax.random.PRNGKey(6), (48,)) * 0.05
    got = quant.int8_dense(x, k, b)
    want = x @ k + b
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(want))) + 1e-6
    assert err / scale < 0.03, err / scale


def test_qdense_exact_path_matches_nn_dense():
    """QDense (models/transformer.py) with quant mode off is numerically
    nn.Dense with the identical param tree — checkpoints/LoRA unaffected."""
    import flax.linen as nn

    from svd_xtend_tpu.models.transformer import QDense

    x = jax.random.normal(jax.random.PRNGKey(7), (3, 10, 24))
    for use_bias in (True, False):
        qd = QDense(16, use_bias=use_bias)
        nd = nn.Dense(16, use_bias=use_bias)
        pq = qd.init(jax.random.PRNGKey(8), x)
        pn = nd.init(jax.random.PRNGKey(8), x)
        assert jax.tree.structure(pq) == jax.tree.structure(pn)
        np.testing.assert_allclose(np.asarray(qd.apply(pn, x)),
                                   np.asarray(nd.apply(pn, x)),
                                   rtol=1e-6, atol=1e-6)


def test_qdense_int8_engages_under_force():
    """With quant mode int8 + SVDX_INT8_FORCE, QDense routes to int8_dense
    (output differs from exact by quantization noise but stays close)."""
    from svd_xtend_tpu.models.transformer import QDense

    x = jax.random.normal(jax.random.PRNGKey(9), (4, 12, 32))
    qd = QDense(24, dtype=jnp.float32)
    p = qd.init(jax.random.PRNGKey(10), x)
    exact = qd.apply(p, x)
    os.environ["SVDX_INT8_FORCE"] = "1"
    try:
        with quant.quantized("int8"):
            q8 = qd.apply(p, x)
    finally:
        del os.environ["SVDX_INT8_FORCE"]
    err = float(jnp.max(jnp.abs(q8 - exact)))
    scale = float(jnp.max(jnp.abs(exact))) + 1e-6
    assert 1e-8 < err / scale < 0.03, err / scale
