"""Winograd F(2x2, 3x3) convolution as pure XLA ops — no pallas boundary.

The conv frontier through pallas_call is closed by measurement at four
levels (PERF.md sessions 4/10/13): the fusion/layout boundary eats every
isolated win. This path attacks conv time the other way — 2.25x fewer MXU
MACs (16 transform-domain multiplies per 2x2 output tile vs 36 direct) with
every surrounding op a plain XLA elementwise/slice/add that fuses normally.

  y = A^T [ (G g G^T) ⊙ (B^T d B) ] A        per 4x4 input tile d (stride 2)

with the standard F(2x2,3x3) matrices (Lavin & Gray, arXiv:1509.09308):

  B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
  G   = [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]]
  A^T = [[1,1,1,0],[0,1,-1,-1]]

Numerics: the input/output transforms run in f32 (B/A entries are ±1, so
this is adds); the 16 per-position GEMMs contract in the model dtype on the
MXU with f32 accumulation — the same rounding regime as the direct bf16
conv, plus Winograd's slightly larger constants (~2x activation magnitudes
in the transform domain). Exact vs the direct conv at f32 (tests).

Backward: custom_vjp -> plain transposed-conv VJPs (the conv_f32acc
convention, ops/convacc.py) — gradients are the direct conv's, which equals
the Winograd conv's up to rounding.

Dispatch (winograd_wins): measured per-shape table only
(scripts/tune_winograd.py writes it; SVDX_WINOGRAD=0 kills, =force engages
everywhere for tests). Reference behavior target: the resnet conv3x3 sites
of diffusers' ResnetBlock2D (driven at /root/reference/train_svd.py:1020).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array

_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


def _transform_kernel(kernel: Array) -> Array:
    """(3, 3, Ci, Co) -> (16, Ci, Co): U = G g G^T per channel pair, f32."""
    g = kernel.astype(jnp.float32)
    u = jnp.einsum("xu,uvio,yv->xyio", jnp.asarray(_G), g, jnp.asarray(_G))
    return u.reshape(16, *u.shape[2:])


def _winograd_fwd(x: Array, kernel: Array) -> Array:
    """SAME stride-1 3x3 conv of (N, H, W, Ci) with (3, 3, Ci, Co) -> f32
    (N, H, W, Co)."""
    n, h, w, ci = x.shape
    co = kernel.shape[-1]
    ht, wt = -(-h // 2), -(-w // 2)

    xp = jnp.pad(x, ((0, 0), (1, 1 + 2 * ht - h), (1, 1 + 2 * wt - w),
                     (0, 0)))
    # 16 strided views d[u][v][n, ti, tj, c] = xp[n, 2ti+u, 2tj+v, c]
    d = [[xp[:, u:u + 2 * ht:2, v:v + 2 * wt:2, :].astype(jnp.float32)
          for v in range(4)] for u in range(4)]

    # V = B^T d B as two linear passes (B entries are 0/±1 -> pure adds)
    t = [[None] * 4 for _ in range(4)]
    for xi in range(4):
        for v in range(4):
            acc = None
            for u in range(4):
                c = _BT[xi, u]
                if c == 0:
                    continue
                term = d[u][v] if c > 0 else -d[u][v]
                acc = term if acc is None else acc + term
            t[xi][v] = acc
    vtab = [[None] * 4 for _ in range(4)]
    for xi in range(4):
        for nu in range(4):
            acc = None
            for v in range(4):
                c = _BT[nu, v]
                if c == 0:
                    continue
                term = t[xi][v] if c > 0 else -t[xi][v]
                acc = term if acc is None else acc + term
            vtab[xi][nu] = acc

    vmat = jnp.stack([vtab[xi][nu] for xi in range(4) for nu in range(4)])
    vmat = vmat.reshape(16, n * ht * wt, ci).astype(x.dtype)
    u16 = _transform_kernel(kernel).astype(x.dtype)     # (16, Ci, Co)
    m = lax.dot_general(vmat, u16, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
    m = m.reshape(16, n, ht, wt, co)

    # Y = A^T M A: 4 parity outputs, each a ±sum of 9 M positions
    ys = [[None, None], [None, None]]
    for a in range(2):
        for b in range(2):
            acc = None
            for xi in range(4):
                ca = _AT[a, xi]
                if ca == 0:
                    continue
                for nu in range(4):
                    cb = _AT[b, nu]
                    if cb == 0:
                        continue
                    term = m[xi * 4 + nu]
                    if ca * cb < 0:
                        term = -term
                    acc = term if acc is None else acc + term
            ys[a][b] = acc
    y = jnp.stack([jnp.stack(row, axis=3) for row in ys], axis=2)
    y = y.reshape(n, 2 * ht, 2 * wt, co)
    return y[:, :h, :w, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _winograd_conv(x: Array, kernel: Array) -> Array:
    return _winograd_fwd(x, kernel)


def _wg_fwd(x, kernel):
    return _winograd_fwd(x, kernel), (x, kernel)


def _wg_bwd(res, g):
    # plain transposed-conv VJPs (the conv_f32acc convention): the direct
    # conv's gradient, equal to Winograd's up to rounding
    x, kernel = res

    def plain(x, k):
        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=dn)

    _, vjp = jax.vjp(plain, x, kernel)
    dx, dk = vjp(g.astype(x.dtype))
    return dx, dk.astype(kernel.dtype)


_winograd_conv.defvjp(_wg_fwd, _wg_bwd)


def winograd_conv3x3(x: Array, kernel: Array, bias: Optional[Array] = None,
                     post_shift: Optional[Array] = None,
                     residual: Optional[Array] = None) -> Array:
    """Drop-in for the Conv3x3 XLA fallback (same epilogue contract)."""
    y = _winograd_conv(x, kernel)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if post_shift is not None:
        y = y + post_shift[:, None, None, :].astype(jnp.float32)
    y = y.astype(x.dtype)
    if residual is not None:
        y = y + residual
    return y


# ------------------------------------------------------------ dispatch -----

_TABLE_ENV = "SVDX_WINOGRAD_TABLE"
_table = None


def _table_path() -> str:
    return os.environ.get(
        _TABLE_ENV,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "ops", "winograd_table.json"))


def _load_table() -> dict:
    global _table
    if _table is None:
        try:
            with open(_table_path()) as f:
                _table = json.load(f).get("entries", {})
        except OSError:
            _table = {}
    return _table


def save_table(entries: dict, device_kind: str, path: Optional[str] = None):
    global _table
    path = path or _table_path()
    merged = dict(_load_table())
    merged.update(entries)
    with open(path, "w") as f:
        json.dump({"device_kind": device_kind, "entries": merged}, f,
                  indent=1, sort_keys=True)
    _table = merged
    return path


def _key(x_shape, co: int, dtype_name: str) -> str:
    n, h, w, ci = x_shape
    return f"{n},{h},{w},{ci},{co},{dtype_name}"


def winograd_wins(x_shape, features: int, dtype) -> bool:
    """Measured-table dispatch (the conv-table discipline): engage only at
    shapes a tuner validated AND an e2e A/B confirmed ('e2e' stamp)."""
    mode = os.environ.get("SVDX_WINOGRAD", "table")
    if mode == "0":
        return False
    if mode == "force":
        return True
    ent = _load_table().get(_key(x_shape, features, jnp.dtype(dtype).name))
    return bool(ent and ent.get("impl") == "winograd" and ent.get("e2e"))
