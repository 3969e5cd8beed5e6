"""Tracing / profiling (SURVEY.md §5: the reference has none; we add
xprof-compatible traces + per-step timers as first-class subsystems)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context — view with xprof/tensorboard profile."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_on(x) -> float:
    """Force execution and return a scalar. On the axon relay
    block_until_ready() is a no-op; fetching a scalar reduction is the
    reliable sync (measured in BENCH notes)."""
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))
                                if hasattr(x, "astype") else x))


class StepTimer:
    """Wall-clock per-step timing with true device sync every `sync_every`
    steps (syncing each step would serialize dispatch)."""

    def __init__(self, sync_every: int = 10):
        self.sync_every = sync_every
        self._t0: Optional[float] = None
        self._steps = 0
        self.last_steps_per_sec = 0.0

    def update(self, sync_value=None) -> Dict[str, float]:
        self._steps += 1
        if self._steps % self.sync_every:
            return {}
        if sync_value is not None:
            block_on(sync_value)
        now = time.perf_counter()
        if self._t0 is not None:
            self.last_steps_per_sec = self.sync_every / (now - self._t0)
        self._t0 = now
        return {"steps_per_sec": self.last_steps_per_sec}
