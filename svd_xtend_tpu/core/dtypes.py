"""Mixed-precision policy: fp32 master params, bf16 compute (the TPU norm).

The reference uses fp16 + grad scaler via accelerate (train_svd.py:597-603);
on TPU bf16 needs no loss scaling, so the policy is simply
(param_dtype=fp32, compute_dtype=bf16) with fp32 loss/normalization math.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    def cast_to_compute(self, tree):
        import jax
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )


def get_policy(mixed_precision: str = "bf16") -> Policy:
    if mixed_precision in ("bf16", "bfloat16"):
        return Policy(jnp.float32, jnp.bfloat16)
    if mixed_precision in ("no", "fp32", "float32"):
        return Policy(jnp.float32, jnp.float32)
    raise ValueError(f"unsupported mixed_precision={mixed_precision!r} (use 'bf16' or 'no')")
