"""Video metric sanity tests (tiny CLIP)."""

import jax
import jax.numpy as jnp
import numpy as np

from svd_xtend_tpu.core.config import TINY_CLIP
from svd_xtend_tpu.models.clip import CLIPVisionModelWithProjection
from svd_xtend_tpu.utils import metrics


def _clip_params():
    m = CLIPVisionModelWithProjection(TINY_CLIP, dtype=jnp.float32)
    return m.init(jax.random.PRNGKey(0),
                  jnp.zeros((1, TINY_CLIP.image_size, TINY_CLIP.image_size, 3))
                  )["params"]


def test_identical_video_maxes_similarity_and_consistency():
    params = _clip_params()
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 2 - 1
    video = jnp.broadcast_to(img[:, None], (1, 3, 32, 32, 3))
    sim = metrics.clip_frame_similarity(params, TINY_CLIP, img, video)
    np.testing.assert_allclose(np.asarray(sim), 1.0, atol=1e-4)
    tc = metrics.temporal_consistency(params, TINY_CLIP, video)
    np.testing.assert_allclose(np.asarray(tc), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(metrics.flicker(video)), 0.0, atol=1e-7)


def test_noise_video_scores_lower():
    params = _clip_params()
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 2 - 1
    noise = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 32, 32, 3)) * 2 - 1
    sim = metrics.clip_frame_similarity(params, TINY_CLIP, img, noise)
    assert float(jnp.mean(sim)) < 0.999
    assert float(metrics.flicker(noise)[0]) > 0.1


def test_psnr():
    a = jnp.zeros((2, 4, 4, 3))
    np.testing.assert_array_less(100.0, np.asarray(metrics.psnr(a, a)))
    b = a + 0.2
    np.testing.assert_allclose(np.asarray(metrics.psnr(a, b)),
                               10 * np.log10(4.0 / 0.04), rtol=1e-5)


def test_video_report_keys():
    params = _clip_params()
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 2 - 1
    video = jax.random.uniform(jax.random.PRNGKey(2), (1, 2, 32, 32, 3)) * 2 - 1
    rep = metrics.video_report(params, TINY_CLIP, img, video)
    assert set(rep) == {"clip_sim_mean", "clip_sim_last",
                        "temporal_consistency", "flicker"}
    assert all(np.isfinite(float(v)) for v in rep.values())
