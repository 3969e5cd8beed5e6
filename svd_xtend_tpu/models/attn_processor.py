"""Attention-processor registry — the reference's pluggable-attention API.

The reference UNet exposes `attn_processors` / `set_attn_processor` /
`set_default_attn_processor` (src/unet_spatio_temporal_condition.py:247-321)
so callers can swap the attention computation per site (custom processors,
adapter injection, instrumentation). Torch mutates module attributes; the
TPU-native analog is a TRACE-TIME registry: `Attention` and
`FrameAxisAttention` consult it inside `__call__`, keyed by their flax
module path, so a processor swap simply re-traces — no pytree surgery, no
param-tree change, jit/scan-safe by construction.

A processor is a callable with the packed-projection signature

    proc(q, k, v, *, num_heads, scale, site) -> out

where q/k/v are the (rows, tokens, H*D) projections *after* to_q/to_k/to_v
and `site` is the module path string (e.g.
"down_blocks_0/attentions_0/transformer_blocks_0/attn1"). The default
computation (None) is ops/attention.py's dispatched SDPA — including the
exact 1-token cross-attention shortcut, which is disabled at sites with a
custom processor (the processor may implement different math there).

Usage:
    from svd_xtend_tpu.models import attn_processor as AP
    AP.set_attn_processor(my_proc)              # every site
    AP.set_attn_processor({site: my_proc})      # per-site (others default)
    AP.set_default_attn_processor()             # reset
    with AP.processors(my_proc): ...            # scoped
    sites = AP.collect_attn_sites(f, *args)     # enumerate (≙ attn_processors)
"""

from __future__ import annotations

import contextlib
import threading
from typing import Callable, Dict, Optional, Sequence, Union

import jax

Array = jax.Array
Processor = Callable[..., Array]
_state = threading.local()


def _current() -> Optional[Union[Processor, Dict[str, Processor]]]:
    return getattr(_state, "proc", None)


def set_attn_processor(proc: Union[Processor, Dict[str, Processor]],
                       sites: Optional[Sequence[str]] = None) -> None:
    """Install `proc` at every attention site (callable) or per-site (dict
    keyed by module path; unlisted sites keep the default computation).

    With `sites` given (from `collect_attn_sites`) a dict is validated the
    way the reference validates (unet_spatio_temporal_condition.py:289-294):
    every key must name a real site, and every site must be covered."""
    if isinstance(proc, dict) and sites is not None:
        missing = set(sites) - set(proc)
        unknown = set(proc) - set(sites)
        if missing or unknown:
            raise ValueError(
                f"processor dict does not match the model's attention sites"
                f" (missing {sorted(missing)[:3]}..., unknown"
                f" {sorted(unknown)[:3]}...)" if len(missing) + len(unknown) > 6
                else f"processor dict mismatch: missing {sorted(missing)},"
                     f" unknown {sorted(unknown)}")
    _state.proc = proc


def set_default_attn_processor() -> None:
    """Reset every site to the built-in dispatched SDPA."""
    _state.proc = None


@contextlib.contextmanager
def processors(proc: Union[Processor, Dict[str, Processor]]):
    """Scoped set_attn_processor (restores the previous registry on exit)."""
    prev = _current()
    _state.proc = proc
    try:
        yield
    finally:
        _state.proc = prev


def get_processor(site: str) -> Optional[Processor]:
    """The processor installed at `site`, or None for the default path.
    Called by Attention/FrameAxisAttention at trace time; in collection mode
    it records the site instead."""
    sink = getattr(_state, "collect", None)
    if sink is not None:
        sink.append(site)
        return None
    proc = _current()
    if proc is None:
        return None
    if isinstance(proc, dict):
        return proc.get(site)
    return proc


def collect_attn_sites(fn: Callable, *args, **kwargs) -> list[str]:
    """Enumerate the attention sites `fn(*args, **kwargs)` traces through —
    the functional analog of the reference's `attn_processors` property.
    Runs under jax.eval_shape (no FLOPs, no device); returns module paths in
    first-visit order."""
    sink: list[str] = []
    _state.collect = sink
    try:
        # a fresh closure per call: jax caches traces by callable identity,
        # and a cache hit would skip Python execution (and thus recording)
        jax.eval_shape(lambda *a, **k: fn(*a, **k), *args, **kwargs)
    finally:
        _state.collect = None
    seen, out = set(), []
    for s in sink:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def attn_processors(fn: Callable, *args, **kwargs) -> Dict[str, Optional[Processor]]:
    """{site: installed processor or None} for every attention site of
    `fn(*args, **kwargs)` — the reference's property, as a function."""
    proc = _current()
    sites = collect_attn_sites(fn, *args, **kwargs)
    if isinstance(proc, dict):
        return {s: proc.get(s) for s in sites}
    return {s: proc for s in sites}
