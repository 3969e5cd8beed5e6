"""LR schedules: the six named schedules of the reference
(train_svd.py:396-399 via diffusers get_scheduler) + warmup semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from svd_xtend_tpu.core.config import TrainConfig
from svd_xtend_tpu.train.optim import get_schedule, make_optimizer

NAMES = ["linear", "cosine", "cosine_with_restarts", "polynomial", "constant",
         "constant_with_warmup"]


@pytest.mark.parametrize("name", NAMES)
def test_schedule_basic_shape(name):
    s = get_schedule(name, 1e-3, warmup_steps=5, total_steps=20)
    vals = np.array([float(s(i)) for i in range(21)])
    assert np.all(vals >= 0.0) and np.all(vals <= 1e-3 + 1e-9)
    if name != "constant":
        # warmup: 0 at step 0, full LR at warmup end
        assert vals[0] < 1e-6
        np.testing.assert_allclose(vals[5], 1e-3, rtol=1e-5)


@pytest.mark.parametrize("name", NAMES)
def test_no_warmup_starts_at_full_lr(name):
    """Regression: warmup_steps=0 must NOT zero the first step (a zero-LR
    bug here once made EMA and the optimizer silently no-ops)."""
    s = get_schedule(name, 1e-3, warmup_steps=0, total_steps=10)
    assert float(s(0)) > 5e-4


def test_linear_decays_to_zero():
    s = get_schedule("linear", 1.0, 0, 10)
    np.testing.assert_allclose(float(s(10)), 0.0, atol=1e-6)


def test_cosine_half_cycle():
    s = get_schedule("cosine", 1.0, 0, 100)
    np.testing.assert_allclose(float(s(50)), 0.5, atol=1e-2)
    assert float(s(100)) < 1e-2


def test_make_optimizer_scale_lr():
    cfg = TrainConfig(learning_rate=1e-4, scale_lr=True,
                      per_device_batch_size=2, gradient_accumulation_steps=4,
                      lr_scheduler="constant", max_train_steps=10)
    opt = make_optimizer(cfg, num_processes=2)
    # scaled lr = 1e-4 * 4 * 2 * 2 = 1.6e-3 (reference train_svd.py:803-805)
    params = {"w": jnp.ones((4, 4))}
    state = opt.init(params)
    grads = {"w": jnp.ones((4, 4))}
    updates, _ = opt.update(grads, state, params)
    # adam first step: update ~= -lr * sign-ish; just check magnitude scaled
    assert 1e-4 < float(jnp.abs(updates["w"]).max()) < 1e-2
