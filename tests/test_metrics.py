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


def test_frechet_distance_identities():
    from svd_xtend_tpu.utils.metrics import frechet_distance, gaussian_stats
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(512, 8)), jnp.float32)
    mu, cov = gaussian_stats(x)
    # identical distributions -> ~0
    d0 = float(frechet_distance(mu, cov, mu, cov))
    assert abs(d0) < 1e-2
    # mean shift by delta -> distance ~= ||delta||^2
    delta = jnp.arange(8, dtype=jnp.float32) * 0.5
    d1 = float(frechet_distance(mu, cov, mu + delta, cov))
    assert abs(d1 - float(jnp.sum(delta ** 2))) < 1e-2
    # isotropic gaussians with different sigma: d = D*(s1-s2)^2
    I = jnp.eye(8)
    d2 = float(frechet_distance(jnp.zeros(8), I, jnp.zeros(8), 4.0 * I))
    assert abs(d2 - 8.0 * (2.0 - 1.0) ** 2) < 1e-3


def test_clip_fvd_separates_matched_vs_shifted():
    from svd_xtend_tpu.core.config import TINY_CLIP
    from svd_xtend_tpu.models.clip import CLIPVisionModelWithProjection
    from svd_xtend_tpu.utils.metrics import clip_fvd
    rng = jax.random.PRNGKey(0)
    model = CLIPVisionModelWithProjection(TINY_CLIP)
    params = model.init(rng, jnp.zeros((1, 28, 28, 3)))["params"]
    real = jax.random.uniform(jax.random.PRNGKey(1), (6, 2, 28, 28, 3)) * 2 - 1
    similar = real + 0.01 * jax.random.normal(jax.random.PRNGKey(2), real.shape)
    far = jnp.clip(real * -0.2 + 0.5, -1, 1)
    d_close = float(clip_fvd(params, TINY_CLIP, real, similar))
    d_far = float(clip_fvd(params, TINY_CLIP, real, far))
    assert d_close < d_far


def test_estimate_motion_bucket_orders_by_motion():
    from svd_xtend_tpu.utils.metrics import estimate_motion_bucket
    still = jnp.zeros((1, 4, 8, 8, 3))
    moving = jnp.stack([jnp.full((8, 8, 3), -1.0 + 0.5 * i) for i in range(4)])[None]
    b_still = int(estimate_motion_bucket(still)[0])
    b_move = int(estimate_motion_bucket(moving)[0])
    assert b_still == 0 and b_move > b_still


def test_video_eval_metrics():
    """utils/eval.py: CLIP frame score / temporal consistency / dynamics —
    sane ranges, and a static video scores perfect consistency with zero
    dynamics while pure-noise frames score lower consistency."""
    import jax
    import jax.numpy as jnp

    from svd_xtend_tpu.core.config import TINY_CLIP, TINY_UNET, TINY_VAE
    from svd_xtend_tpu.diffusion.pipeline import SVDModels, init_pipeline_params
    from svd_xtend_tpu.utils.eval import video_metrics

    models = SVDModels(unet_config=TINY_UNET, vae_config=TINY_VAE,
                       clip_config=TINY_CLIP, dtype=jnp.float32)
    params = init_pipeline_params(models, jax.random.PRNGKey(0))

    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 2 - 1
    static = jnp.broadcast_to(img[:, None], (1, 4, 32, 32, 3))
    m_static = video_metrics(models, params, static, img)
    assert abs(float(m_static["clip_temporal_consistency"]) - 1.0) < 1e-4
    assert float(m_static["pixel_dynamics"]) == 0.0
    # the conditioning image IS every frame -> frame score is maximal (1.0)
    assert abs(float(m_static["clip_frame_score"]) - 1.0) < 1e-4

    noise = jax.random.uniform(jax.random.PRNGKey(2), (1, 4, 32, 32, 3)) * 2 - 1
    m_noise = video_metrics(models, params, noise, img)
    assert float(m_noise["clip_temporal_consistency"]) < 0.9999
    assert float(m_noise["pixel_dynamics"]) > 0.1
    assert (float(m_noise["clip_frame_score"])
            < float(m_static["clip_frame_score"]))
