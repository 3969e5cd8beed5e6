"""Weight-format conversion tests.

The strongest check available offline: our CLIP vision tower must reproduce
transformers' torch CLIPVisionModelWithProjection bit-for-bit-ish when its
random weights are converted in (transformers IS installed; diffusers isn't,
so UNet/VAE conversion is validated by exact round-trip instead)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svd_xtend_tpu.core.config import TINY_CLIP, TINY_UNET, TINY_VAE
from svd_xtend_tpu.io import convert
from svd_xtend_tpu.models.clip import CLIPVisionModelWithProjection
from svd_xtend_tpu.models.unet import UNetSpatioTemporalConditionModel
from svd_xtend_tpu.models.vae import AutoencoderKLTemporalDecoder


def _init_unet_params():
    model = UNetSpatioTemporalConditionModel(TINY_UNET, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 2, 8, 8, TINY_UNET.in_channels)), jnp.zeros(()),
                   jnp.zeros((1, 1, TINY_UNET.cross_attention_dim)),
                   jnp.zeros((1, 3)))
    return model, v["params"]


def test_unet_roundtrip():
    _, params = _init_unet_params()
    sd = convert.flax_to_diffusers(params)
    # torch-convention shapes: Dense transposed, temporal conv rank 5
    assert any(k.endswith("to_out.0.weight") for k in sd)
    assert any(k.endswith("ff.net.0.proj.weight") for k in sd)
    tkeys = [k for k in sd if "temporal_res_block.conv1.weight" in k]
    assert tkeys and sd[tkeys[0]].ndim == 5
    back = convert.diffusers_to_flax(sd, params)
    for (ka, va), (kb, vb) in zip(sorted(convert.flatten(params).items()),
                                  sorted(convert.flatten(back).items())):
        assert ka == kb
        np.testing.assert_array_equal(va, vb)


def test_vae_roundtrip():
    model = AutoencoderKLTemporalDecoder(TINY_VAE, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                   jax.random.PRNGKey(1))
    params = v["params"]
    sd = convert.flax_to_diffusers(params)
    assert any(k.startswith("encoder.down_blocks.0.resnets.0") for k in sd)
    assert any(k.startswith("decoder.mid_block.") for k in sd)
    assert any("time_conv_out" in k and sd[k].ndim == 5 for k in sd)
    back = convert.diffusers_to_flax(sd, params)
    a, b = convert.flatten(params), convert.flatten(back)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_lora_roundtrip():
    from svd_xtend_tpu.models import lora as lora_lib
    _, params = _init_unet_params()
    tree = lora_lib.init(jax.random.PRNGKey(0), params, rank=2)
    sd = convert.lora_flax_to_diffusers(tree)
    assert all(k.startswith("unet.") and ("lora_A" in k or "lora_B" in k)
               for k in sd)
    back = convert.lora_diffusers_to_flax(sd, tree)
    for path in tree:
        np.testing.assert_array_equal(tree[path]["a"], back[path]["a"])
        np.testing.assert_array_equal(tree[path]["b"], back[path]["b"])


def test_safetensors_roundtrip(tmp_path):
    _, params = _init_unet_params()
    sd = convert.flax_to_diffusers(params)
    p = convert.save_safetensors(str(tmp_path / "unet.safetensors"), sd,
                                 metadata={"format": "pt"})
    loaded = convert.load_safetensors(p)
    assert set(loaded) == set(sd)
    np.testing.assert_array_equal(next(iter(loaded.values())),
                                  sd[next(iter(loaded))])


def test_load_diffusers_checkpoint(tmp_path):
    """One-call loader over a synthetic diffusers pipeline dir: plain VAE +
    CLIP safetensors, a SHARD-INDEXED UNet (the format >5 GB hub checkpoints
    use), and the fp32-host -> template-dtype policy."""
    import json

    from svd_xtend_tpu.diffusion.pipeline import SVDModels, init_pipeline_params

    models = SVDModels(unet_config=TINY_UNET, vae_config=TINY_VAE,
                       clip_config=TINY_CLIP, dtype=jnp.float32)
    src = init_pipeline_params(models, jax.random.PRNGKey(0))

    # unet: two shards + weight_map index
    unet_dir = tmp_path / "unet"
    unet_dir.mkdir()
    sd = convert.flax_to_diffusers(jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), src["unet"]))
    keys = sorted(sd)
    half = len(keys) // 2
    shards = {"diffusion_pytorch_model-00001-of-00002.safetensors": keys[:half],
              "diffusion_pytorch_model-00002-of-00002.safetensors": keys[half:]}
    weight_map = {}
    for fname, ks in shards.items():
        convert.save_safetensors(str(unet_dir / fname), {k: sd[k] for k in ks})
        weight_map.update({k: fname for k in ks})
    with open(unet_dir / "diffusion_pytorch_model.safetensors.index.json",
              "w") as f:
        json.dump({"weight_map": weight_map}, f)

    vae_dir = tmp_path / "vae"
    vae_dir.mkdir()
    convert.save_safetensors(
        str(vae_dir / "diffusion_pytorch_model.safetensors"),
        convert.flax_to_diffusers(jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float32), src["vae"])))

    clip_dir = tmp_path / "image_encoder"
    clip_dir.mkdir()
    convert.save_safetensors(
        str(clip_dir / "model.safetensors"),
        convert.clip_flax_to_transformers(
            jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32),
                                   src["clip"]),
            patch_size=TINY_CLIP.patch_size))

    template = init_pipeline_params(models, jax.random.PRNGKey(7))
    loaded = convert.load_diffusers_checkpoint(
        str(tmp_path), template, clip_patch_size=TINY_CLIP.patch_size)
    for name in ("unet", "vae", "clip"):
        a, b = convert.flatten(src[name]), convert.flatten(loaded[name])
        assert set(a) == set(b), name
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       atol=0, rtol=0, err_msg=f"{name}/{k}")

    # dtype policy: bf16 template leaves -> bf16 loaded leaves (host cast)
    bf16_template = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), template["unet"])
    loaded16 = convert.load_diffusers_checkpoint(
        str(tmp_path), {**template, "unet": bf16_template},
        clip_patch_size=TINY_CLIP.patch_size, components=("unet",))
    leaf = next(iter(convert.flatten(loaded16["unet"]).values()))
    assert leaf.dtype == jnp.bfloat16


def test_clip_parity_with_transformers():
    """Golden test: convert a REAL transformers torch CLIP vision model's
    random weights into our tree; outputs must match to fp32 tolerance."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection as HFModel

    cfg = TINY_CLIP
    hf_cfg = HFConfig(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        projection_dim=cfg.projection_dim, hidden_act="gelu",
        layer_norm_eps=cfg.layer_norm_eps)
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    state_dict = {k: v.numpy() for k, v in hf.state_dict().items()}

    ours = CLIPVisionModelWithProjection(cfg, dtype=jnp.float32)
    template = ours.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))["params"]
    params = convert.clip_transformers_to_flax(state_dict, template,
                                               patch_size=cfg.patch_size)

    x = np.random.RandomState(0).randn(2, cfg.image_size, cfg.image_size, 3)
    x = x.astype(np.float32)
    with torch.no_grad():
        expected = hf(pixel_values=torch.from_numpy(
            x.transpose(0, 3, 1, 2))).image_embeds.numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


def test_tracklet_extension_import_export(tmp_path):
    """A stock (non-tracklet) diffusers checkpoint loads into a
    tracklet-enabled UNet (branch keeps its zero-gated init, excluded from
    export); the trained branch round-trips via its own artifact."""
    import dataclasses

    import jax

    from svd_xtend_tpu.models.unet import UNetSpatioTemporalConditionModel

    cfg = dataclasses.replace(TINY_UNET, tracklet_dim=32, tracklet_heads=2)
    model = UNetSpatioTemporalConditionModel(cfg, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(3),
                   jnp.zeros((1, 2, 8, 8, cfg.in_channels)), jnp.zeros(()),
                   jnp.zeros((1, 1, cfg.cross_attention_dim)),
                   jnp.zeros((1, 3)),
                   jnp.zeros((1, 2, 1, 4)), jnp.zeros((1, 2, 1)))
    params = v["params"]
    assert "tracklet_conditioner" in params

    # export excludes the branch; a stock checkpoint imports cleanly
    sd = convert.flax_to_diffusers(params)
    assert not any("tracklet" in k or "gated_attentions" in k for k in sd)
    back = convert.diffusers_to_flax(sd, params)      # strict=True must pass
    probe = "tracklet_conditioner/enhancer/norm1/scale"
    np.testing.assert_array_equal(convert.flatten(back)[probe],
                                  convert.flatten(params)[probe])

    # branch artifact round-trip (cli --train_mode tracklet final export)
    flat = convert.tracklet_branch_to_flat(params)
    assert flat and all("tracklet_conditioner" in p or "gated_attentions" in p
                        for p in flat)
    path = str(tmp_path / "tracklet_weights.safetensors")
    convert.save_safetensors(path, flat)
    loaded = convert.load_safetensors(path)
    zeroed = jax.tree.map(jnp.zeros_like, params)
    merged = convert.tracklet_branch_into_tree(loaded, zeroed)
    mf = convert.flatten(merged)
    pf = convert.flatten(params)
    for p in flat:
        np.testing.assert_array_equal(mf[p], pf[p])
    # non-branch params untouched (still zero)
    assert float(np.abs(mf["conv_in/kernel"]).max()) == 0.0
