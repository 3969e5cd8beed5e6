"""Attention-processor registry (models/attn_processor.py) — parity with the
reference's attn_processors/set_attn_processor/set_default_attn_processor
surface (src/unet_spatio_temporal_condition.py:247-321)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svd_xtend_tpu.core.config import TINY_UNET
from svd_xtend_tpu.models import attn_processor as AP
from svd_xtend_tpu.models.unet import UNetSpatioTemporalConditionModel
from svd_xtend_tpu.ops.attention import (dot_product_attention, merge_heads,
                                         split_heads)


@pytest.fixture(scope="module")
def unet_setup():
    unet = UNetSpatioTemporalConditionModel(TINY_UNET)
    rng = jax.random.PRNGKey(0)
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 8, 8, 8))
    t = jnp.full((2,), 10.0)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 1, TINY_UNET.cross_attention_dim))
    added = jnp.ones((2, 3))
    params = unet.init(rng, lat, t, ctx, added)["params"]
    apply = lambda: unet.apply({"params": params}, lat, t, ctx, added)
    return unet, params, apply, (lat, t, ctx, added)


def sdpa_proc(q, k, v, *, num_heads, scale, site):
    """A processor that recomputes the default math explicitly."""
    o = dot_product_attention(split_heads(q, num_heads),
                              split_heads(k, num_heads),
                              split_heads(v, num_heads), scale=scale,
                              impl="xla")
    return merge_heads(o)


def values_only_proc(q, k, v, *, num_heads, scale, site):
    """Degenerate processor (ignores q/k): output differs from SDPA."""
    return jnp.broadcast_to(jnp.mean(v, axis=-2, keepdims=True),
                            q.shape[:-1] + (v.shape[-1],))


def test_collect_sites_enumerates_every_attention(unet_setup):
    unet, params, apply, _ = unet_setup
    sites = AP.collect_attn_sites(apply)
    # TINY_UNET: every level has spatial attn1+attn2 and temporal attn1+attn2
    # per transformer; exact count is architecture-derived — assert structure
    assert len(sites) > 8
    assert all("attn" in s.rsplit("/", 1)[-1] for s in sites)
    spatial = [s for s in sites if "temporal" not in s]
    temporal = [s for s in sites if "temporal_transformer_blocks" in s]
    assert spatial and temporal
    # paths are stable and hierarchical (the reference keys by weight name)
    assert all(s.count("/") >= 1 for s in sites)


def test_explicit_sdpa_processor_matches_default(unet_setup):
    _, _, apply, _ = unet_setup
    base = apply()
    with AP.processors(sdpa_proc):
        swapped = apply()
    # the default path uses the exact 1-token cross-attn shortcut and fused
    # temporal attention; the explicit processor recomputes full SDPA — equal
    # up to f32 reassociation
    np.testing.assert_allclose(np.asarray(swapped), np.asarray(base),
                               atol=2e-5, rtol=2e-5)


def test_custom_processor_changes_output_and_reset_restores(unet_setup):
    _, _, apply, _ = unet_setup
    base = apply()
    AP.set_attn_processor(values_only_proc)
    try:
        changed = apply()
        assert not np.allclose(np.asarray(changed), np.asarray(base),
                               atol=1e-3)
    finally:
        AP.set_default_attn_processor()
    restored = apply()
    np.testing.assert_array_equal(np.asarray(restored), np.asarray(base))


def test_per_site_dict_overrides_only_that_site(unet_setup):
    _, _, apply, _ = unet_setup
    sites = AP.collect_attn_sites(apply)
    base = apply()
    one = {sites[0]: values_only_proc}
    with AP.processors(one):
        out = apply()
    assert not np.allclose(np.asarray(out), np.asarray(base), atol=1e-3)
    # overriding a site that the model never visits changes nothing
    with AP.processors({"nonexistent/attn9": values_only_proc}):
        out2 = apply()
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(base))


def test_dict_validation_against_sites(unet_setup):
    _, _, apply, _ = unet_setup
    sites = AP.collect_attn_sites(apply)
    with pytest.raises(ValueError):
        AP.set_attn_processor({"bogus": sdpa_proc}, sites=sites)
    AP.set_attn_processor({s: sdpa_proc for s in sites}, sites=sites)
    AP.set_default_attn_processor()


def test_attn_processors_reports_installed(unet_setup):
    _, _, apply, _ = unet_setup
    sites = AP.collect_attn_sites(apply)
    with AP.processors({sites[0]: values_only_proc}):
        table = AP.attn_processors(apply)
    assert table[sites[0]] is values_only_proc
    assert all(v is None for k, v in table.items() if k != sites[0])
