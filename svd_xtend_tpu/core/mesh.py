"""Device mesh construction and parameter/batch sharding rules.

The reference's parallelism is accelerate DDP over NCCL (SURVEY.md §2.5).
TPU-natively, parallelism is declarative: build a ``jax.sharding.Mesh`` with
axes ``('data', 'model')``, annotate params/batch with ``NamedSharding``, and
let XLA GSPMD insert the collectives over ICI.

- ``data``  — batch sharding (DP); optimizer state is likewise sharded
  batch-wise by construction (grads are psum'd by XLA from the shardings).
- ``model`` — tensor parallelism: attention qkv/out projections and MLP
  matrices are sharded column-/row-parallel by name-based rules below.

Pipeline/expert parallelism are not applicable to this model family
(UNet skip connections / no MoE — SURVEY.md §2.5); sequence parallelism over
frames is a designed-in extension (shard the F axis of temporal attention).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"
FRAMES_AXIS = "frames"    # sequence parallelism over the frame axis (SP)


def create_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = cfg.model if cfg.model > 0 else 1
    frames = getattr(cfg, "frames", 1) or 1
    frames = frames if frames > 0 else 1
    data = cfg.data if cfg.data > 0 else n // (model * frames)
    if data * model * frames != n:
        raise ValueError(f"mesh {data}x{model}x{frames} != {n} devices")
    if frames > 1:
        arr = np.asarray(devices).reshape(data, model, frames)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS, FRAMES_AXIS))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# --- name-based tensor-parallel rules over the flax param pytree ----------
#
# Dense kernels are (in_features, out_features). Column-parallel (shard out)
# for projections whose outputs are head/channel-local; row-parallel (shard
# in) for the projections that immediately follow them, so that a single
# all-reduce per attention/MLP pair suffices (inserted by GSPMD).

_COLUMN_PARALLEL = re.compile(r"(to_q|to_k|to_v|net_0_proj|fc1|proj_in)$")
_ROW_PARALLEL = re.compile(r"(to_out|net_2|fc2|proj_out)$")


def path_str(path) -> str:
    """Join a jax tree_util keypath into 'a/b/c' — THE canonical helper
    (sharding rules, trainable masks, and LoRA targeting all match against
    these strings; a second implementation drifting would silently
    desynchronize them). Dict keys and sequence indices render bare;
    dataclass attrs render as jax's '.name'."""
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path)


_path_str = path_str


def param_pspec(path, value, tp: bool = True) -> P:
    """PartitionSpec for one parameter leaf given its tree path."""
    name = _path_str(path) if not isinstance(path, str) else path
    ndim = getattr(value, "ndim", len(getattr(value, "shape", ())))
    if not tp or ndim < 2:
        return P()
    if name.endswith("/kernel") or name.endswith("kernel"):
        if _COLUMN_PARALLEL.search(name.rsplit("/kernel", 1)[0]):
            return P(*([None] * (ndim - 1)), MODEL_AXIS)
        if _ROW_PARALLEL.search(name.rsplit("/kernel", 1)[0]):
            return P(*([None] * (ndim - 2)), MODEL_AXIS, None)
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a param pytree (TP rules if mesh has a model
    axis of size > 1, otherwise fully replicated)."""
    tp = mesh.shape.get(MODEL_AXIS, 1) > 1
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, param_pspec(path, v, tp=tp)), params
    )


def batch_pspec(ndim: int) -> P:
    return P(DATA_AXIS, *([None] * (ndim - 1)))


def batch_shardings(batch, mesh: Mesh):
    return jax.tree.map(lambda v: NamedSharding(mesh, batch_pspec(v.ndim)), batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
