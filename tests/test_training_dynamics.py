"""Training-dynamics smoke tests (SURVEY.md §4): loss decreases when
overfitting one batch; restore-and-replay reproduces training bit-exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svd_xtend_tpu.core.config import TINY_CLIP, TINY_UNET, TINY_VAE, TrainConfig
from svd_xtend_tpu.diffusion.pipeline import SVDModels, init_pipeline_params
from svd_xtend_tpu.train.optim import make_optimizer
from svd_xtend_tpu.train.state import create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    models = SVDModels(unet_config=TINY_UNET, vae_config=TINY_VAE,
                       clip_config=TINY_CLIP, dtype=jnp.float32)
    params = init_pipeline_params(models, jax.random.PRNGKey(0))
    batch = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 32, 32, 3)) * 2 - 1
    return models, params, batch


def test_loss_decreases_overfitting_one_batch(setup):
    models, params, batch = setup
    cfg = TrainConfig(train_mode="temporal", learning_rate=3e-3,
                      lr_scheduler="constant", conditioning_dropout_prob=0.0,
                      remat_policy="none")
    opt = make_optimizer(cfg)
    state = create_train_state(
        cfg, jax.tree.map(lambda x: x.copy(), params["unet"]), opt)
    step = jax.jit(make_train_step(models, cfg, opt,
                                   {"vae": params["vae"], "clip": params["clip"]}))
    losses = []
    for _ in range(40):
        state, m = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(m["loss"]))
    first, last = np.mean(losses[:10]), np.mean(losses[-10:])
    assert np.isfinite(losses).all()
    assert last < first, f"loss did not decrease: {first:.4f} -> {last:.4f}"


def test_restore_and_replay_is_bit_exact(setup):
    """Split a 4-step run at step 2: replaying steps 3-4 from the saved state
    must produce identical params (exact resume — better than the reference's
    statistical step-skip, SURVEY §3.5)."""
    models, params, batch = setup
    cfg = TrainConfig(train_mode="temporal", learning_rate=1e-3,
                      lr_scheduler="constant", remat_policy="none")
    opt = make_optimizer(cfg)
    frozen = {"vae": params["vae"], "clip": params["clip"]}
    step = jax.jit(make_train_step(models, cfg, opt, frozen))
    rng = jax.random.PRNGKey(3)

    state = create_train_state(
        cfg, jax.tree.map(lambda x: x.copy(), params["unet"]), opt)
    mid = None
    for i in range(4):
        if i == 2:
            mid = jax.device_get(state)          # "checkpoint"
        state, _ = step(state, batch, rng)
    final_a = jax.device_get(state)

    state_b = jax.tree.map(jnp.asarray, mid)     # "restore"
    for i in range(2):
        state_b, _ = step(state_b, batch, rng)
    final_b = jax.device_get(state_b)

    for a, b in zip(jax.tree.leaves(final_a.params), jax.tree.leaves(final_b.params)):
        if a is None:
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(final_a.step) == int(final_b.step) == 4


def test_bf16_grad_dtype_trains_with_fp32_masters(setup):
    """grad_dtype='bf16' (core/config.py): the materialized cotangent tree is
    bf16 (half the transient HBM — what fits full-FT on one chip), masters
    stay fp32, and the first-step loss matches fp32-grad training (the loss
    is computed before any grad is applied; grads only change the UPDATE)."""
    models, params, batch = setup
    losses = {}
    for gd in ("fp32", "bf16"):
        cfg = TrainConfig(train_mode="temporal", learning_rate=3e-3,
                          lr_scheduler="constant", conditioning_dropout_prob=0.0,
                          remat_policy="none", grad_dtype=gd)
        opt = make_optimizer(cfg)
        state = create_train_state(
            cfg, jax.tree.map(lambda x: x.copy(), params["unet"]), opt)
        step = jax.jit(make_train_step(
            models, cfg, opt,
            {"vae": params["vae"], "clip": params["clip"]}))
        for _ in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(7))
            assert np.isfinite(float(m["loss"]))
        losses[gd] = float(m["loss"])
        # masters keep full precision regardless of grad storage dtype
        leaf = jax.tree.leaves(state.params)[0]
        assert leaf.dtype == jnp.float32
    # same trajectory up to bf16 update rounding (loose: 3 steps of drift)
    assert abs(losses["bf16"] - losses["fp32"]) < 0.05, losses


def test_bf16_grad_dtype_accum(setup):
    """grad accumulation composes with bf16 grads (the accumulator is the
    grad dtype by design — documented memory/precision trade)."""
    models, params, batch = setup
    cfg = TrainConfig(train_mode="temporal", learning_rate=1e-3,
                      lr_scheduler="constant", gradient_accumulation_steps=2,
                      remat_policy="none", grad_dtype="bf16")
    opt = make_optimizer(cfg)
    state = create_train_state(
        cfg, jax.tree.map(lambda x: x.copy(), params["unet"]), opt)
    step = jax.jit(make_train_step(
        models, cfg, opt, {"vae": params["vae"], "clip": params["clip"]}))
    abatch = jnp.stack([batch[0], batch[0] * 0.5])[:, None]
    state, m = step(state, abatch, jax.random.PRNGKey(9))
    assert np.isfinite(float(m["loss"]))


def test_host_offload_state_modes():
    """host_offload_state (train/state.py): 'none' is identity; the sharding
    tree mirrors the state structure; unknown modes raise. The pinned_host
    placement itself is TPU-runtime-only (probed on-chip,
    scripts/probe_host_offload.py) — on CPU we exercise mode handling and
    the out-shardings tree construction against the real memory-kind API
    where the platform exposes it."""
    import jax
    import jax.numpy as jnp

    from svd_xtend_tpu.train.state import TrainState, host_offload_state

    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params={"w": jnp.ones((4,))},
                       opt_state={"m": jnp.zeros((4,))})
    same, shard = host_offload_state(state, "none")
    assert same is state and shard is None

    try:
        off, shard = host_offload_state(state, "masters",
                                        device=jax.devices()[0])
    except Exception:
        pass  # platform without pinned_host support — acceptable on CPU
    else:
        assert shard.params["w"].memory_kind == "pinned_host"
        assert shard.opt_state["m"].memory_kind == "device"

    import pytest
    with pytest.raises(ValueError, match="offload"):
        host_offload_state(state, "hbm2")
