"""LoRA as a pure parameter-tree transform (no module surgery).

Behavior contract (reference train_svd_lora.py:659-671): adapters on every
attention projection named to_q/to_k/to_v/to_out, W' = W + (alpha/r) * A@B,
A gaussian-init, B zero-init, rank = alpha = 4 by default; only LoRA params
train, saved/loaded in safetensors (io/convert.py handles format mapping).

TPU-first design: instead of wrapping modules (torch/peft style), LoRA is a
function over the param pytree — ``merge(base, lora)`` returns an ordinary
param tree, so the unmodified UNet apply-fn, sharding rules, EMA and
checkpointing all work untouched. Differentiating the loss wrt the lora tree
through the merge gives exactly the LoRA gradients; XLA fuses the rank-r
update into the weight load. This is also how LoRA weights "fuse" for
inference: merge once, run the base model.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

DEFAULT_TARGETS = ("to_q", "to_k", "to_v", "to_out")


from ..core.mesh import path_str as _path_str


def target_paths(params: Any, targets: Tuple[str, ...] = DEFAULT_TARGETS):
    """Paths of kernel leaves whose parent module name matches a target."""
    pattern = re.compile(r"(^|/)(" + "|".join(targets) + r")/kernel$")
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [(_path_str(p), v.shape) for p, v in flat
            if pattern.search(_path_str(p)) and v.ndim == 2]


def init(rng: Array, params: Any, rank: int = 4, alpha: float = 4.0,
         targets: Tuple[str, ...] = DEFAULT_TARGETS) -> Dict[str, Dict[str, Array]]:
    """LoRA tree: {path: {"a": (in, r) gaussian, "b": (r, out) zeros}}."""
    tree: Dict[str, Dict[str, Array]] = {}
    for i, (path, shape) in enumerate(target_paths(params, targets)):
        d_in, d_out = shape
        k = jax.random.fold_in(rng, i)
        tree[path] = {
            "a": jax.random.normal(k, (d_in, rank), jnp.float32) / rank,
            "b": jnp.zeros((rank, d_out), jnp.float32),
        }
    if not tree:
        raise ValueError(f"no LoRA targets {targets} found in params")
    return tree


def merge(params: Any, lora: Dict[str, Dict[str, Array]],
          rank: int = 4, alpha: float = 4.0) -> Any:
    """base + (alpha/r) * A@B on every targeted kernel; other leaves shared."""
    scale = alpha / rank

    def update(path, leaf):
        entry = lora.get(_path_str(path))
        if entry is None:
            return leaf
        delta = (entry["a"] @ entry["b"]) * scale
        return (leaf.astype(jnp.float32) + delta).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(update, params)


def num_params(lora: Dict[str, Dict[str, Array]]) -> int:
    return sum(int(v.size) for leaf in lora.values() for v in leaf.values())
