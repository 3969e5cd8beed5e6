"""Fused temporal-resnet kernel (ops/pallas/temporal_resnet.py) parity.

Runs the Pallas pair in interpret mode on CPU against the pure-XLA
reference, checks the custom-VJP backward, and asserts the module-level
SpatioTemporalResBlock fused route (blend_weight) matches the unfused
TemporalResnetBlock + AlphaBlender composition it replaces (reference
behavior: diffusers TemporalResnetBlock/AlphaBlender as wired at
src/unet_spatio_temporal_condition.py:432-477).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svd_xtend_tpu.ops.pallas import temporal_resnet as trk


def _args(b=2, f=5, s=16, c=64, dtype=jnp.float32, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 10)
    x = jax.random.normal(ks[0], (b, f, s, c), dtype)
    t = jax.random.normal(ks[1], (b, f, c), dtype)
    k1 = jax.random.normal(ks[2], (3, c, c), dtype) * 0.1
    b1 = jax.random.normal(ks[3], (c,), dtype) * 0.1
    k2 = jax.random.normal(ks[4], (3, c, c), dtype) * 0.1
    b2 = jax.random.normal(ks[5], (c,), dtype) * 0.1
    s1 = 1 + 0.1 * jax.random.normal(ks[6], (c,))
    bi1 = 0.1 * jax.random.normal(ks[7], (c,))
    s2 = 1 + 0.1 * jax.random.normal(ks[8], (c,))
    bi2 = 0.1 * jax.random.normal(ks[9], (c,))
    return (x, t, k1, b1, k2, b2, s1, bi1, s2, bi2, jnp.float32(0.37))


@pytest.fixture
def force_kernel(monkeypatch):
    monkeypatch.setenv("SVDX_PALLAS_TRESNET", "force")


def test_supports_gate():
    assert trk.supports(2, 14, 2560, 320)     # L0 SVD shape
    assert trk.supports(2, 14, 40, 1280)      # L3
    assert trk.supports(2, 25, 9216, 320)     # operating point B, 25 frames
    assert not trk.supports(2, 40, 640, 640)  # too many frames
    assert not trk.supports(2, 14, 20, 320)   # S not a multiple of 8


@pytest.mark.parametrize("b,f,s,c,groups", [
    (2, 5, 16, 64, 8),
    (1, 1, 8, 32, 4),       # single frame: both taps are padding
    (1, 14, 24, 128, 32),
])
def test_forward_parity(force_kernel, b, f, s, c, groups):
    args = _args(b, f, s, c)
    out = trk.temporal_resnet_block(*args, groups=groups, eps=1e-5)
    ref = trk.temporal_resnet_reference(*args, groups, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_forward_parity_bf16(force_kernel):
    args = _args(dtype=jnp.bfloat16)
    out = trk.temporal_resnet_block(*args, groups=8, eps=1e-5)
    ref = trk.temporal_resnet_reference(*args, 8, 1e-5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_backward_routes_through_reference(force_kernel):
    args = _args()
    loss_k = lambda *a: jnp.sum(
        trk.temporal_resnet_block(*a, groups=8, eps=1e-5) ** 2)
    loss_r = lambda *a: jnp.sum(
        trk.temporal_resnet_reference(*a, 8, 1e-5) ** 2)
    gk = jax.grad(loss_k, argnums=(0, 1, 2, 6, 10))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 6, 10))(*args)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_module_fused_matches_unfused(force_kernel):
    """SpatioTemporalResBlock's blend_weight route == TemporalResnetBlock +
    AlphaBlender with indicator=None (same params)."""
    from svd_xtend_tpu.models.blocks import AlphaBlender, TemporalResnetBlock
    b, f, hh, ww, c = 2, 5, 4, 4, 64
    x5 = jax.random.normal(jax.random.PRNGKey(0), (b, f, hh, ww, c))
    temb = jax.random.normal(jax.random.PRNGKey(1), (b, f, 32))
    tblock = TemporalResnetBlock(c, groups=8)
    params = tblock.init(jax.random.PRNGKey(2), x5, temb)
    mixer = AlphaBlender(merge_factor=0.5)
    mp = mixer.init(jax.random.PRNGKey(3),
                    jnp.zeros((1, 1)), jnp.zeros((1, 1)))
    alpha = mixer.apply(mp, method=AlphaBlender.alpha_scalar)

    h2 = tblock.apply(params, x5, temb)
    unfused = mixer.apply(mp, x5, h2)
    fused = tblock.apply(params, x5, temb, blend_weight=1.0 - alpha)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               atol=2e-4, rtol=2e-4)


def test_module_fused_matches_unfused_no_temb(force_kernel):
    """The VAE temporal decoder drives SpatioTemporalResBlock with temb=None
    (models/vae.py) — the fused route feeds a zero temb add."""
    from svd_xtend_tpu.models.blocks import AlphaBlender, TemporalResnetBlock
    b, f, hh, ww, c = 1, 4, 4, 4, 64
    x5 = jax.random.normal(jax.random.PRNGKey(0), (b, f, hh, ww, c))
    tblock = TemporalResnetBlock(c, groups=8, eps=1e-5)
    params = tblock.init(jax.random.PRNGKey(2), x5, None)
    mixer = AlphaBlender(merge_factor=0.0)
    mp = mixer.init(jax.random.PRNGKey(3),
                    jnp.zeros((1, 1)), jnp.zeros((1, 1)))
    alpha = mixer.apply(mp, method=AlphaBlender.alpha_scalar)
    h2 = tblock.apply(params, x5, None)
    unfused = mixer.apply(mp, x5, h2)
    fused = tblock.apply(params, x5, None, blend_weight=1.0 - alpha)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               atol=2e-4, rtol=2e-4)


def test_module_param_tree_unchanged(force_kernel):
    """The fused route must create the exact param tree of the unfused one
    (checkpoint compatibility)."""
    from svd_xtend_tpu.models.blocks import SpatioTemporalResBlock
    b, f, hh, ww, c = 1, 2, 4, 4, 32
    x = jnp.zeros((b * f, hh, ww, c))
    temb = jnp.zeros((b * f, 16))
    blk = SpatioTemporalResBlock(c, num_frames=f)
    fused_params = blk.init(jax.random.PRNGKey(0), x, temb)
    ind = jnp.zeros((b, f))       # forces the unfused route
    unfused_params = blk.init(jax.random.PRNGKey(0), x, temb, ind)
    fu = jax.tree_util.tree_structure(fused_params)
    un = jax.tree_util.tree_structure(unfused_params)
    assert fu == un
    out_f = blk.apply(fused_params, x, temb)
    out_u = blk.apply(fused_params, x, temb, ind)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               atol=2e-4, rtol=2e-4)


def test_multi_tile_grid_parity(force_kernel, monkeypatch):
    """Force sb < S so the kernel runs a multi-tile S grid: norm2's partial
    stats must sum correctly across tiles (the (B, nS, C) accumulation)."""
    monkeypatch.setattr(trk, "_VMEM_BUDGET", 16 * 1024)   # tiny -> sb=8
    args = _args(b=1, f=3, s=32, c=16)
    assert trk._choose_sb(3, 32, 16) < 32
    out = trk.temporal_resnet_block(*args, groups=4, eps=1e-5)
    ref = trk.temporal_resnet_reference(*args, 4, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sharded_batch_parity(force_kernel):
    """Batch-sharded execution over the 8-device CPU mesh == single-device
    (the custom_partitioning rules in ops/pallas/partition.py)."""
    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    args = _args(b=4)
    single = trk.temporal_resnet_block(*args, groups=8, eps=1e-5)
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    shard = NamedSharding(mesh, P("data"))
    fn = jax.jit(
        lambda *a: trk.temporal_resnet_block(*a, groups=8, eps=1e-5),
        in_shardings=(shard, shard) + (NamedSharding(mesh, P()),) * 9)
    with mesh:
        out = fn(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(single),
                               atol=2e-5, rtol=2e-5)
