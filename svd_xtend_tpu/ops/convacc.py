"""Differentiable conv with f32 accumulation for low-precision operands.

``lax.conv_general_dilated(..., preferred_element_type=f32)`` over bf16
operands is NOT transposable in current JAX: the f32 cotangent reaches the
transpose-rule convs unconverted and trips the same-dtype check
("lax.conv_general_dilated requires arguments to have the same dtypes, got
float32, bfloat16"). That made every bf16 training graph through the XLA
conv fallbacks untraceable (found r2 session-1 — masked before because CPU
tests run f32 models and the TPU train bench failed on transport first).

``conv_f32acc`` keeps the forward's f32 accumulate/output (the numerics
contract of conv3x3_fused_reference) and defines the backward explicitly:
cast the cotangent to the operand dtype and take the VJP of the PLAIN
(no preferred_element_type) conv — bf16 gradient convs with the MXU's
native f32 internal accumulation, the standard mixed-precision convention
(torch AMP backward convs run in bf16 likewise; reference trains fp16
under a grad-scaler, train_svd.py:597-603).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_f32acc(x: Array, kernel: Array, strides, padding) -> Array:
    """NHWC x HWIO -> NHWC conv, f32 output. strides/padding: static tuples
    (padding as ((lo, hi), (lo, hi)))."""
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, kernel, strides, padding,
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)


def _fwd(x, kernel, strides, padding):
    return conv_f32acc(x, kernel, strides, padding), (x, kernel)


def _bwd(strides, padding, res, g):
    x, kernel = res

    def plain(x, k):
        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(x, k, strides, padding,
                                        dimension_numbers=dn)

    _, vjp = jax.vjp(plain, x, kernel)
    return vjp(g.astype(x.dtype))


conv_f32acc.defvjp(_fwd, _bwd)
