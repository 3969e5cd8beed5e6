"""Tracklet2Video conditioning branch (designed from Boximator/TrackDiffusion;
reference README.md:57-70 describes but does not ship it)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from svd_xtend_tpu.core.config import TINY_UNET
from svd_xtend_tpu.models.tracklet import (BoxTokenizer, GatedSelfAttention,
                                           InstanceEnhancer, TrackletConditioner,
                                           fourier_embed)
from svd_xtend_tpu.models.unet import UNetSpatioTemporalConditionModel

TRACKLET_UNET = dataclasses.replace(TINY_UNET, tracklet_dim=32, tracklet_heads=2)


def _boxes(b=1, f=2, n=3, key=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    xy = jax.random.uniform(k1, (b, f, n, 2)) * 0.5
    wh = jax.random.uniform(k2, (b, f, n, 2)) * 0.4
    boxes = jnp.concatenate([xy, xy + wh], axis=-1)
    mask = jnp.ones((b, f, n)).at[:, :, -1].set(0.0)   # last box absent
    return boxes, mask


def test_fourier_embed_shape():
    x = jnp.zeros((2, 3, 4))
    assert fourier_embed(x, num_freqs=8).shape == (2, 3, 4 * 16)


def test_box_tokenizer_null_token_for_masked():
    boxes, mask = _boxes()
    m = BoxTokenizer(dim=16)
    params = m.init(jax.random.PRNGKey(0), boxes, mask)
    out = m.apply(params, boxes, mask)
    assert out.shape == (1, 2, 3, 16)
    null = params["params"]["null_token"]
    np.testing.assert_allclose(np.asarray(out[0, 0, -1]), np.asarray(null),
                               atol=1e-6)


def test_instance_enhancer_shape():
    tokens = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3, 16))
    m = InstanceEnhancer(num_heads=2)
    params = m.init(jax.random.PRNGKey(1), tokens)
    assert m.apply(params, tokens).shape == tokens.shape


def test_gated_attention_noop_at_init():
    """Zero-init gates: injection must not change activations at init."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
    objs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16))
    m = GatedSelfAttention(num_heads=2, head_dim=16)
    params = m.init(jax.random.PRNGKey(2), x, objs)
    np.testing.assert_allclose(np.asarray(m.apply(params, x, objs)),
                               np.asarray(x), atol=1e-6)


def test_unet_with_tracklet_noop_at_init_and_trainable():
    model = UNetSpatioTemporalConditionModel(TRACKLET_UNET, dtype=jnp.float32)
    base = UNetSpatioTemporalConditionModel(TINY_UNET, dtype=jnp.float32)
    b, f = 1, 2
    sample = jax.random.normal(jax.random.PRNGKey(0),
                               (b, f, 8, 8, TRACKLET_UNET.in_channels))
    t = jnp.float32(1.0)
    ehs = jax.random.normal(jax.random.PRNGKey(1),
                            (b, 1, TRACKLET_UNET.cross_attention_dim))
    ids = jnp.zeros((b, 3))
    boxes, mask = _boxes(b, f)
    variables = model.init(jax.random.PRNGKey(2), sample, t, ehs, ids,
                           boxes, mask)
    params = variables["params"]
    assert "tracklet_conditioner" in params

    out_with = model.apply({"params": params}, sample, t, ehs, ids, boxes, mask)
    out_without = model.apply({"params": params}, sample, t, ehs, ids)
    # zero gates -> tracklet branch is a no-op at init
    np.testing.assert_allclose(np.asarray(out_with), np.asarray(out_without),
                               atol=1e-5)

    # after nudging a gate, boxes must influence the output
    import flax.traverse_util as tu
    flat = tu.flatten_dict(params)
    for k in flat:
        if k[-1] == "alpha_attn":
            flat[k] = jnp.ones_like(flat[k])
    params2 = tu.unflatten_dict(flat)
    out2 = model.apply({"params": params2}, sample, t, ehs, ids, boxes, mask)
    boxes2 = jnp.clip(boxes + 0.3, 0, 1)
    out3 = model.apply({"params": params2}, sample, t, ehs, ids, boxes2, mask)
    assert np.abs(np.asarray(out2 - out3)).max() > 1e-6


def test_tracklet_train_step():
    """'tracklet' scope: dict batches with boxes train ONLY the box branch
    (tokenizer + enhancer + gated injections); the base UNet stays frozen."""
    from svd_xtend_tpu.core.config import (TINY_CLIP, TINY_VAE, TrainConfig)
    from svd_xtend_tpu.diffusion.pipeline import (SVDModels,
                                                  init_pipeline_params)
    from svd_xtend_tpu.train.optim import make_optimizer
    from svd_xtend_tpu.train.state import (create_train_state,
                                           make_train_step, trainable_mask)

    models = SVDModels(unet_config=TRACKLET_UNET, vae_config=TINY_VAE,
                       clip_config=TINY_CLIP, dtype=jnp.float32)
    params = init_pipeline_params(models, jax.random.PRNGKey(0))
    assert "tracklet_conditioner" in params["unet"]

    mask = trainable_mask(params["unet"], "tracklet")
    import flax.traverse_util as tu
    flat_mask = tu.flatten_dict(jax.tree.map(bool, mask))
    trainables = [k for k, v in flat_mask.items() if v]
    assert trainables and all(
        "tracklet_conditioner" in "/".join(k) or "gated_attentions" in "/".join(k)
        for k in trainables)

    cfg = TrainConfig(train_mode="tracklet", learning_rate=1e-3,
                      lr_scheduler="constant", tracklet_dim=32)
    opt = make_optimizer(cfg)
    state = create_train_state(cfg, params["unet"], opt)
    step = jax.jit(make_train_step(
        models, cfg, opt, {"vae": params["vae"], "clip": params["clip"]}))

    b, f, n = 1, 2, 3
    batch = {
        "pixel_values": jax.random.uniform(
            jax.random.PRNGKey(1), (b, f, 32, 32, 3)) * 2 - 1,
        "boxes": jnp.clip(jax.random.uniform(
            jax.random.PRNGKey(2), (b, f, n, 4)), 0, 1),
        "box_mask": jnp.ones((b, f, n)),
    }
    before = state.params
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert jnp.isfinite(metrics["loss"])
    # some box-branch param must move (nonzero grads through the gates'
    # attention values even while tanh-gamma starts at 0)
    moved = jax.tree.reduce(
        lambda a, x: a or bool(x),
        jax.tree.map(lambda a, b: (a is not None and
                                   float(jnp.max(jnp.abs(a - b))) > 0),
                     before, state.params,
                     is_leaf=lambda x: x is None), False)
    assert moved


def test_dataset_boxes(tmp_path):
    """FrameFolderDataset with max_boxes: boxes.npz windows align with the
    sampled frame window; unannotated videos yield zero-mask slots."""
    import os
    from PIL import Image
    from svd_xtend_tpu.data.dataset import FrameFolderDataset

    for vid_name, with_boxes in [("vid_a", True), ("vid_b", False)]:
        d = tmp_path / vid_name
        os.makedirs(d)
        for i in range(6):
            Image.new("RGB", (8, 8), (i * 30, 0, 0)).save(d / f"{i:03d}.jpg")
        if with_boxes:
            t, n = 6, 2
            boxes = np.zeros((t, n, 4), np.float32)
            for i in range(t):
                boxes[i, 0] = [0.1, 0.1, 0.2 + 0.1 * i, 0.5]
            np.savez(d / "boxes.npz", boxes=boxes)

    ds = FrameFolderDataset(str(tmp_path), width=8, height=8,
                            sample_frames=4, max_boxes=5, use_native=False)
    sample = ds.get(seed=0, step=0, position=0)
    assert set(sample) == {"pixel_values", "boxes", "box_mask"}
    assert sample["boxes"].shape == (4, 5, 4)
    assert sample["box_mask"].shape == (4, 5)

    # boxes.npz is not mistaken for a frame
    assert all(len(frames) == 6 for _, frames in ds.videos)

    # check window alignment on the annotated video
    vid = [i for i, (f, _) in enumerate(ds.videos) if "vid_a" in f][0]
    boxes, mask = ds.load_boxes_window(vid, start=2)
    np.testing.assert_allclose(boxes[0, 0], [0.1, 0.1, 0.4, 0.5], atol=1e-6)
    assert mask[0, 0] == 1.0 and mask[0, 1] == 0.0    # area-derived mask
    vid_b = 1 - vid
    boxes_b, mask_b = ds.load_boxes_window(vid_b, start=0)
    assert mask_b.sum() == 0
