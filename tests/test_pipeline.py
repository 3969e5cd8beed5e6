"""Pipeline behavior tests (tiny configs): determinism, CFG, conventions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svd_xtend_tpu.core.config import (TINY_CLIP, TINY_UNET, TINY_VAE,
                                       PipelineConfig)
from svd_xtend_tpu.diffusion.pipeline import (SVDModels, generate,
                                              get_add_time_ids,
                                              init_pipeline_params)


@pytest.fixture(scope="module")
def setup():
    models = SVDModels(unet_config=TINY_UNET, vae_config=TINY_VAE,
                       clip_config=TINY_CLIP, dtype=jnp.float32)
    params = init_pipeline_params(models, jax.random.PRNGKey(0))
    image = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 2 - 1
    return models, params, image


CFG = PipelineConfig(height=32, width=32, num_frames=2, num_inference_steps=3,
                     decode_chunk_size=2)


def test_generate_deterministic(setup):
    models, params, image = setup
    v1 = generate(models, params, image, jax.random.PRNGKey(7), CFG)
    v2 = generate(models, params, image, jax.random.PRNGKey(7), CFG)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    v3 = generate(models, params, image, jax.random.PRNGKey(8), CFG)
    assert np.abs(np.asarray(v1) - np.asarray(v3)).max() > 1e-6


def test_generate_depends_on_conditioning_image(setup):
    models, params, image = setup
    v1 = generate(models, params, image, jax.random.PRNGKey(7), CFG)
    v2 = generate(models, params, -image, jax.random.PRNGKey(7), CFG)
    assert np.abs(np.asarray(v1) - np.asarray(v2)).max() > 1e-6


def test_add_time_ids_conventions():
    """fps trap (SURVEY.md §7): training feeds raw fps; the upstream pipeline
    embeds fps-1 — both must be expressible."""
    ids = get_add_time_ids(7.0, 127.0, jnp.float32(0.02), batch=2)
    assert ids.shape == (2, 3)
    np.testing.assert_allclose(ids[0], [7.0, 127.0, 0.02], atol=1e-6)
    train_cfg = PipelineConfig(fps=7, fps_offset=0)
    infer_cfg = PipelineConfig(fps=7, fps_offset=1)
    assert train_cfg.fps - train_cfg.fps_offset == 7
    assert infer_cfg.fps - infer_cfg.fps_offset == 6


def test_guidance_scale_frame_linspace(setup):
    """Different max_guidance_scale must change the output (CFG active)."""
    models, params, image = setup
    import dataclasses
    v1 = generate(models, params, image, jax.random.PRNGKey(7), CFG)
    cfg2 = dataclasses.replace(CFG, max_guidance_scale=10.0)
    v2 = generate(models, params, image, jax.random.PRNGKey(7), cfg2)
    assert np.abs(np.asarray(v1) - np.asarray(v2)).max() > 1e-6


def test_output_range_and_shape(setup):
    models, params, image = setup
    v = generate(models, params, image, jax.random.PRNGKey(0), CFG)
    assert v.shape == (1, 2, 32, 32, 3)
    assert float(v.min()) >= -1.0 and float(v.max()) <= 1.0


def test_uncond_reuse_interval_1_is_exact_and_k2_runs(setup):
    """CFG caching (PipelineConfig.uncond_reuse_interval): k=1 must be the
    exact default path; k=2 runs, stays finite, and differs only mildly."""
    import dataclasses

    models, params, img = setup
    cfg = PipelineConfig(height=32, width=32, num_frames=2,
                         num_inference_steps=4, decode_chunk_size=2)
    exact = generate(models, params, img, jax.random.PRNGKey(2), cfg)
    k2 = generate(models, params, img, jax.random.PRNGKey(2),
                  dataclasses.replace(cfg, uncond_reuse_interval=2))
    assert bool(jnp.isfinite(k2).all())
    assert k2.shape == exact.shape
    # step 0 refreshes, so outputs correlate but are not identical
    diff = float(jnp.mean(jnp.abs(k2 - exact)))
    assert 0.0 < diff < 0.5


def test_decode_ragged_chunks_match_reference_semantics():
    """decode_chunk_size chunks must contain only REAL frames (diffusers
    decodes latents[i:i+chunk] raggedly): each chunk's output equals its
    independent decode, and in particular no zero-pad latent ever bleeds
    into trailing frames through the temporal decoder's frame convs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svd_xtend_tpu.core.config import TINY_CLIP, TINY_UNET, TINY_VAE
    from svd_xtend_tpu.diffusion.pipeline import (SVDModels,
                                                  decode_latents_chunked,
                                                  init_pipeline_params)

    models = SVDModels(unet_config=TINY_UNET, vae_config=TINY_VAE,
                       clip_config=TINY_CLIP, dtype=jnp.float32)
    params = init_pipeline_params(models, jax.random.PRNGKey(0))
    f, chunk = 5, 2                       # ragged: chunks [2, 2, 1]
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, f, 4, 4, 4)) * 0.5
    out = decode_latents_chunked(models, params, lat, chunk)
    assert out.shape[1] == f

    vae = models.vae()
    z = lat / models.vae_config.scaling_factor
    for start in range(0, f, chunk):
        ref = vae.apply({"params": params["vae"]}, z[:, start:start + chunk],
                        method=vae.decode)
        np.testing.assert_allclose(
            np.asarray(out[:, start:start + chunk]),
            np.asarray(ref, np.float32), atol=1e-4, rtol=1e-4)


def test_deep_cache_runs_and_interval1_is_exact(setup):
    """DeepCache (PipelineConfig.deep_cache_interval): N=1 is the exact
    default path; N=2 runs the mixed full/shallow scan, stays finite, and
    drifts only mildly from exact (step 0 is always a full step). Also the
    composition with the CFG cache (k=2, N=2) — the 4-way lax.switch —
    must execute."""
    import dataclasses

    models, params, img = setup
    cfg = PipelineConfig(height=32, width=32, num_frames=2,
                         num_inference_steps=4, decode_chunk_size=2)
    exact = generate(models, params, img, jax.random.PRNGKey(3), cfg)
    n2 = generate(models, params, img, jax.random.PRNGKey(3),
                  dataclasses.replace(cfg, deep_cache_interval=2))
    assert n2.shape == exact.shape
    assert bool(jnp.isfinite(n2).all())
    diff = float(jnp.mean(jnp.abs(n2 - exact)))
    assert 0.0 < diff < 0.5
    both = generate(models, params, img, jax.random.PRNGKey(3),
                    dataclasses.replace(cfg, deep_cache_interval=2,
                                        uncond_reuse_interval=2))
    assert bool(jnp.isfinite(both).all())
    # N = num_steps degenerates to one full step + all-shallow: still finite
    nall = generate(models, params, img, jax.random.PRNGKey(3),
                    dataclasses.replace(cfg, deep_cache_interval=4))
    assert bool(jnp.isfinite(nall).all())
