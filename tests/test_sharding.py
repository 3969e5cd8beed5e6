"""Multi-chip sharding on the virtual 8-device CPU mesh (SURVEY.md §2.5).

Validates: dp x tp mesh construction, TP rules on attention/GEGLU kernels,
the sharded train step end-to-end, and dp-vs-single-device numerical
equivalence of the loss/update."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from svd_xtend_tpu.core.config import TINY_CLIP, TINY_UNET, TINY_VAE, TrainConfig
from svd_xtend_tpu.core.mesh import MODEL_AXIS, param_pspec
from svd_xtend_tpu.diffusion.pipeline import SVDModels, init_pipeline_params
from svd_xtend_tpu.parallel import make_sharded_train_step
from svd_xtend_tpu.train.optim import make_optimizer
from svd_xtend_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def setup():
    models = SVDModels(unet_config=TINY_UNET, vae_config=TINY_VAE,
                       clip_config=TINY_CLIP, dtype=jnp.float32)
    params = init_pipeline_params(models, jax.random.PRNGKey(0))
    return models, params


def test_eight_devices_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"


def test_param_pspec_rules():
    w = jnp.zeros((64, 128))
    assert param_pspec("down_blocks_0/attentions_0/transformer_blocks_0/attn1/to_q/kernel",
                       w) == P(None, MODEL_AXIS)
    assert param_pspec("mid_block/attentions_0/transformer_blocks_0/attn1/to_out/kernel",
                       w) == P(MODEL_AXIS, None)
    assert param_pspec("ff/net_0_proj/kernel", w) == P(None, MODEL_AXIS)
    assert param_pspec("ff/net_2/kernel", w) == P(MODEL_AXIS, None)
    assert param_pspec("conv_in/kernel", jnp.zeros((3, 3, 8, 32))) == P()
    assert param_pspec("norm1/scale", jnp.zeros((32,))) == P()
    # optimizer moments mirror the param paths (mu/nu prefixes)
    assert param_pspec("0/mu/attn1/to_q/kernel", w) == P(None, MODEL_AXIS)


def _run_step(models, params, mesh_shape):
    devices = np.asarray(jax.devices()[:mesh_shape[0] * mesh_shape[1]])
    mesh = Mesh(devices.reshape(mesh_shape), ("data", "model"))
    cfg = TrainConfig(train_mode="temporal", learning_rate=1e-3,
                      lr_scheduler="constant")
    opt = make_optimizer(cfg)
    # copy: the jitted step donates state buffers; don't donate the fixture's
    unet0 = jax.tree.map(lambda x: x.copy(), params["unet"])
    state = create_train_state(cfg, unet0, opt)
    step, place_state, place_batch = make_sharded_train_step(
        models, cfg, opt, {"vae": params["vae"], "clip": params["clip"]}, mesh)
    batch = jax.random.uniform(jax.random.PRNGKey(7), (4, 2, 32, 32, 3)) * 2 - 1
    with mesh:
        state = place_state(state)
        batch_s = place_batch(batch)
        state, metrics = step(state, batch_s, jax.random.PRNGKey(3))
    return state, metrics


def test_sharded_train_step_dp_tp(setup):
    models, params = setup
    state, metrics = _run_step(models, params, (4, 2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    # TP rule actually applied: a to_q kernel is sharded over 'model'
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if name.endswith("to_q/kernel"):
            spec = leaf.sharding.spec
            assert MODEL_AXIS in jax.tree.leaves(tuple(spec)), (name, spec)
            break
    else:
        pytest.fail("no to_q kernel found")


def test_dp_matches_single_device(setup):
    """The same global batch must give the same loss under (4,2) dp x tp as
    under a (1,1) mesh — GSPMD collectives must not change the math."""
    models, params = setup
    _, m_multi = _run_step(models, params, (4, 2))
    _, m_single = _run_step(models, params, (1, 1))
    np.testing.assert_allclose(float(m_multi["loss"]), float(m_single["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m_multi["grad_norm"]),
                               float(m_single["grad_norm"]), rtol=2e-3)


def test_graft_entry_dryrun():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sp_frames_matches_single_device(setup):
    """Frames-axis sequence parallelism (SURVEY.md §2.5 SP row): a (2, 1, 2)
    dp x tp x sp mesh must reproduce the single-device loss — GSPMD inserts
    the temporal-attention/conv gathers over the 'frames' axis."""
    from svd_xtend_tpu.core.config import MeshConfig
    from svd_xtend_tpu.core.mesh import FRAMES_AXIS, create_mesh

    models, params = setup
    cfg = TrainConfig(train_mode="temporal", learning_rate=1e-3,
                      lr_scheduler="constant")
    opt = make_optimizer(cfg)
    batch = jax.random.uniform(jax.random.PRNGKey(7), (4, 2, 32, 32, 3)) * 2 - 1

    def run(mesh):
        unet0 = jax.tree.map(lambda x: x.copy(), params["unet"])
        state = create_train_state(cfg, unet0, opt)
        step, place_state, place_batch = make_sharded_train_step(
            models, cfg, opt,
            {"vae": params["vae"], "clip": params["clip"]}, mesh)
        with mesh:
            state = place_state(state)
            b = place_batch(batch)
            _, metrics = step(state, b, jax.random.PRNGKey(3))
        return metrics

    mesh_sp = create_mesh(MeshConfig(data=2, model=1, frames=2),
                          jax.devices()[:4])
    assert mesh_sp.shape[FRAMES_AXIS] == 2
    m_sp = run(mesh_sp)
    m_single = run(create_mesh(MeshConfig(data=1, model=1),
                               jax.devices()[:1]))
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_single["loss"]),
                               rtol=2e-4)


def test_sharded_generate_matches_single_device(setup):
    """Data-parallel inference: batch-2 generate over a (2,1) mesh must equal
    the single-device result (same keys, same math)."""
    from svd_xtend_tpu.core.config import MeshConfig, PipelineConfig
    from svd_xtend_tpu.core.mesh import create_mesh
    from svd_xtend_tpu.diffusion.pipeline import generate
    from svd_xtend_tpu.parallel.sharding import make_sharded_generate

    models, params = setup
    cfg = PipelineConfig(height=32, width=32, num_frames=2,
                         num_inference_steps=2, decode_chunk_size=2)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 2 - 1
    rng = jax.random.PRNGKey(2)

    single = generate(models, params, images, rng, cfg)

    mesh = create_mesh(MeshConfig(data=2, model=1), jax.devices()[:2])
    gen, place_params, place_images = make_sharded_generate(models, mesh)
    multi = gen(place_params(params), place_images(images), rng, cfg)
    # GSPMD repartitions matmuls -> different accumulation order; pixel
    # outputs agree to float noise
    np.testing.assert_allclose(np.asarray(multi), np.asarray(single),
                               atol=2e-3, rtol=2e-3)


def test_sharded_generate_dp_frames_matches_single_device(setup):
    """Inference over a (data=2, model=1, frames=2) mesh — the single-video
    latency lever (frames-axis sequence parallelism) composed with data
    parallelism — must equal the single-device result."""
    from svd_xtend_tpu.core.config import MeshConfig, PipelineConfig
    from svd_xtend_tpu.core.mesh import create_mesh
    from svd_xtend_tpu.diffusion.pipeline import generate
    from svd_xtend_tpu.parallel.sharding import make_sharded_generate

    models, params = setup
    cfg = PipelineConfig(height=32, width=32, num_frames=4,
                         num_inference_steps=2, decode_chunk_size=2)
    images = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 3)) * 2 - 1
    rng = jax.random.PRNGKey(4)

    single = generate(models, params, images, rng, cfg)

    mesh = create_mesh(MeshConfig(data=2, model=1, frames=2),
                       jax.devices()[:4])
    gen, place_params, place_images = make_sharded_generate(models, mesh)
    multi = gen(place_params(params), place_images(images), rng, cfg)
    np.testing.assert_allclose(np.asarray(multi), np.asarray(single),
                               atol=2e-3, rtol=2e-3)


def test_pallas_kernels_partition_over_batch(monkeypatch):
    """The Pallas kernels (conv3x3 plain+fused, GroupNorm, flash attention)
    carry SPMD rules (ops/pallas/partition.py): batch-dim sharded inputs
    must run per-shard (no gather) and match the unsharded result. Force
    mode exercises the real pallas path in interpret mode on the CPU mesh."""
    from jax.sharding import NamedSharding
    from svd_xtend_tpu.ops.pallas.conv3x3 import conv3x3_pallas
    from svd_xtend_tpu.ops.pallas.flash_attention import flash_attention
    from svd_xtend_tpu.ops.pallas.groupnorm import group_norm_silu

    monkeypatch.setenv("SVDX_PALLAS_CONV", "force")
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    ks = jax.random.split(jax.random.PRNGKey(0), 8)

    # conv3x3 with fused epilogues, batch 16 sharded 8-way
    n, h, w, ci, co = 16, 8, 8, 128, 128
    x = jax.random.normal(ks[0], (n, h, w, ci), jnp.float32)
    k = jax.random.normal(ks[1], (3, 3, ci, co)) * 0.1
    b = jax.random.normal(ks[2], (co,)) * 0.1
    sc = jax.random.normal(ks[3], (n, ci)) * 0.3 + 1.0
    sh = jax.random.normal(ks[4], (n, ci)) * 0.2
    res = jax.random.normal(ks[5], (n, h, w, co))

    f = lambda x, k, b, sc, sh, res: conv3x3_pallas(
        x, k, b, pre_scale=sc, pre_shift=sh, pre_silu=True, residual=res)
    want = jax.jit(f)(x, k, b, sc, sh, res)
    got = jax.jit(f)(jax.device_put(x, dp), jax.device_put(k, rep),
                     jax.device_put(b, rep), jax.device_put(sc, dp),
                     jax.device_put(sh, dp), jax.device_put(res, dp))
    assert got.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # plain conv gradient under sharding
    loss = lambda x, k, b: jnp.sum(conv3x3_pallas(x, k, b) ** 2)
    gw = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, k, b)
    gs = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        jax.device_put(x, dp), jax.device_put(k, rep), jax.device_put(b, rep))
    for a, bb in zip(gs, gw):
        # dk contracts over the sharded batch dim -> psum; reduction
        # reassociation moves small elements by ~1e-3 relative
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=3e-3, atol=3e-3)

    # GroupNorm+SiLU (pallas impl) sharded over batch
    xg = jax.random.normal(ks[6], (16, 12, 64), jnp.float32)
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    g = lambda x: group_norm_silu(x, scale, bias, groups=8, impl="pallas")
    want_g = jax.jit(g)(xg)
    got_g = jax.jit(g)(jax.device_put(xg, dp))
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=2e-5, atol=2e-5)

    # flash attention: dim 0 of the folded (B*H) layout carries dp and tp
    q = jax.random.normal(ks[7], (8, 256, 2, 64), jnp.float32)
    fa = lambda q: flash_attention(q, q, q, scale=0.125)
    want_a = jax.jit(fa)(q)
    got_a = jax.jit(fa)(jax.device_put(q, dp))
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a),
                               rtol=2e-5, atol=2e-5)


def test_zero1_matches_and_shards_moments(setup):
    """ZeRO-1 (--zero1): Adam moments shard over 'data'; the update math is
    unchanged (elementwise) so the loss equals the unsharded run's, and the
    updated state keeps the dp-sharded moment layout across the step."""
    models, params = setup
    devices = np.asarray(jax.devices()[:4])
    mesh = Mesh(devices.reshape(4, 1), ("data", "model"))
    from svd_xtend_tpu.core.config import TrainConfig
    batch = jax.random.uniform(jax.random.PRNGKey(7), (4, 2, 32, 32, 3)) * 2 - 1

    losses = {}
    moment_sharded = {}
    for zero1 in (False, True):
        cfg = TrainConfig(train_mode="full", learning_rate=1e-3,
                          lr_scheduler="constant", zero1=zero1, use_ema=True)
        opt = make_optimizer(cfg)
        unet0 = jax.tree.map(lambda x: x.copy(), params["unet"])
        state = create_train_state(cfg, unet0, opt)
        step, place_state, place_batch = make_sharded_train_step(
            models, cfg, opt,
            {"vae": params["vae"], "clip": params["clip"]}, mesh)
        with mesh:
            state = place_state(state)
            state, metrics = step(state, place_batch(batch),
                                  jax.random.PRNGKey(3))
        losses[zero1] = float(metrics["loss"])
        flat = jax.tree_util.tree_flatten_with_path(state.opt_state)[0]
        found = False
        for path, leaf in flat:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if "mu/" in name and getattr(leaf, "ndim", 0) >= 2:
                spec = getattr(leaf.sharding, "spec", None)
                found = found or (spec is not None and
                                  "data" in jax.tree.leaves(tuple(spec)))
        moment_sharded[zero1] = found

    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-4)
    assert moment_sharded[True], "zero1 moments not sharded over 'data'"
    assert not moment_sharded[False]


def test_zero1_with_8bit_adam(setup):
    """ZeRO-1 composes with the blockwise-int8 Adam states (train/quant.py):
    the dp-sharding rule only touches dims divisible by dp, so int8 moment
    blocks and their scale vectors place without error and the step runs."""
    models, params = setup
    devices = np.asarray(jax.devices()[:4])
    mesh = Mesh(devices.reshape(4, 1), ("data", "model"))
    from svd_xtend_tpu.core.config import TrainConfig
    cfg = TrainConfig(train_mode="full", learning_rate=1e-3,
                      lr_scheduler="constant", zero1=True, use_8bit_adam=True)
    opt = make_optimizer(cfg)
    unet0 = jax.tree.map(lambda x: x.copy(), params["unet"])
    state = create_train_state(cfg, unet0, opt)
    step, place_state, place_batch = make_sharded_train_step(
        models, cfg, opt, {"vae": params["vae"], "clip": params["clip"]}, mesh)
    batch = jax.random.uniform(jax.random.PRNGKey(7), (4, 2, 32, 32, 3)) * 2 - 1
    with mesh:
        state = place_state(state)
        state, metrics = step(state, place_batch(batch), jax.random.PRNGKey(3))
        state, metrics = step(state, place_batch(batch), jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2


def test_sharded_generate_dp8_no_hot_loop_collectives(setup):
    """The PERF.md v5e-8 dp8 serving projection as a checked property:
    over an (8,1,1) mesh, batch-8 generate must (a) match single-device and
    (b) compile with ZERO collectives anywhere in the program — params
    replicated, batch sharded, nothing crosses chips inside generate."""
    from svd_xtend_tpu.core.config import MeshConfig, PipelineConfig
    from svd_xtend_tpu.core.mesh import create_mesh
    from svd_xtend_tpu.diffusion.pipeline import _generate, generate
    from svd_xtend_tpu.parallel.sharding import make_sharded_generate

    models, params = setup
    cfg = PipelineConfig(height=32, width=32, num_frames=2,
                         num_inference_steps=2, decode_chunk_size=2)
    images = jax.random.uniform(jax.random.PRNGKey(5), (8, 32, 32, 3)) * 2 - 1
    rng = jax.random.PRNGKey(6)

    single = generate(models, params, images, rng, cfg)

    mesh = create_mesh(MeshConfig(data=8, model=1), jax.devices()[:8])
    gen, place_params, place_images = make_sharded_generate(models, mesh)
    p_s, im_s = place_params(params), place_images(images)
    multi = gen(p_s, im_s, rng, cfg)
    np.testing.assert_allclose(np.asarray(multi), np.asarray(single),
                               atol=2e-3, rtol=2e-3)

    hlo = _generate.lower(models, p_s, im_s, rng, cfg).compile().as_text()
    for coll in ("all-reduce", "all-gather", "reduce-scatter",
                 "collective-permute", "all-to-all"):
        assert coll not in hlo, (
            f"dp8 generate must have zero collectives, found {coll}")


def test_sharded_generate_frames7_matches_single_device(setup):
    """The PERF.md frames-7 latency mesh (1,1,7) with F=14 — one video, the
    frame axis sharded 2 frames/device — must reproduce the single-device
    video (GSPMD inserts the temporal-attention/conv gathers)."""
    from svd_xtend_tpu.core.config import MeshConfig, PipelineConfig
    from svd_xtend_tpu.core.mesh import FRAMES_AXIS, create_mesh
    from svd_xtend_tpu.diffusion.pipeline import generate
    from svd_xtend_tpu.parallel.sharding import make_sharded_generate

    models, params = setup
    cfg = PipelineConfig(height=32, width=32, num_frames=14,
                         num_inference_steps=2, decode_chunk_size=7)
    images = jax.random.uniform(jax.random.PRNGKey(8), (1, 32, 32, 3)) * 2 - 1
    rng = jax.random.PRNGKey(9)

    single = generate(models, params, images, rng, cfg)

    mesh = create_mesh(MeshConfig(data=1, model=1, frames=7),
                       jax.devices()[:7])
    assert mesh.shape[FRAMES_AXIS] == 7
    gen, place_params, place_images = make_sharded_generate(models, mesh)
    multi = gen(place_params(params), place_images(images), rng, cfg)
    np.testing.assert_allclose(np.asarray(multi), np.asarray(single),
                               atol=2e-3, rtol=2e-3)


def test_host_offload_shardings(setup):
    """--host_offload (cli) / TrainConfig.host_offload: the fp32 masters
    (state.params) — and with 'masters+moments' the Adam moment tree — get
    pinned_host memory-kind shardings; EMA, the frozen trees, and the step
    counter stay in device memory. CPU can't EXECUTE host-placed programs
    (no annotate_device_placement lowering), so this asserts the sharding
    tree; the execution path is the TPU measurement in PERF.md."""
    from svd_xtend_tpu.parallel.sharding import state_shardings

    models, params = setup
    devices = np.asarray(jax.devices()[:1])
    mesh = Mesh(devices.reshape(1, 1), ("data", "model"))
    cfg = TrainConfig(train_mode="full", use_ema=True, use_8bit_adam=True)
    opt = make_optimizer(cfg)
    unet0 = jax.tree.map(lambda x: x.copy(), params["unet"])
    state = create_train_state(cfg, unet0, opt)

    def kinds(tree):
        return {s.memory_kind or "device"
                for s in jax.tree.leaves(tree)}

    for mode, want_params, want_moments in (
            ("none", {"device"}, {"device"}),
            ("masters", {"pinned_host"}, {"device"}),
            ("masters+moments", {"pinned_host"}, {"pinned_host"})):
        sh = state_shardings(state, mesh, host_offload=mode)
        # memory_kind=None means the default space (device)
        got_params = {s.memory_kind or "device"
                      for s in jax.tree.leaves(sh.params)}
        got_moments = {s.memory_kind or "device"
                       for s in jax.tree.leaves(sh.opt_state)}
        assert got_params == want_params, (mode, got_params)
        assert got_moments == want_moments, (mode, got_moments)
        assert kinds(sh.ema_params) == {"device"}, mode
        assert (sh.step.memory_kind or "device") == "device", mode

    with pytest.raises(ValueError):
        state_shardings(state, mesh, host_offload="bogus")
