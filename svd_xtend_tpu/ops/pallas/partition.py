"""SPMD partitioning rules for the Pallas kernels.

A `pallas_call` lowers to an opaque custom call; without rules the
partitioner must all-gather its operands onto every device, which silently
destroys dp/sp scaling the moment a Pallas kernel is enabled on a sharded
mesh (the reference never faces this — NCCL data parallelism replicates
whole models). Every Pallas op here is batch-parallel in its leading dim
(the kernel grids iterate `n` in parallel and never mix samples), so the
correct rule is: shard the batch dim however the operand is sharded, force
everything else replicated, and lower the same kernel on the local shard.

`batch_partitioned` wraps an array-only impl with
`jax.experimental.custom_partitioning`, providing both the Shardy
`sharding_rule` (the default partitioner) and the GSPMD callbacks, with a
per-shard lower_fn that re-traces the impl on local shapes — so VMEM-fit
and tile decisions are made for the shard actually executed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _spec_of(sharding) -> P:
    if sharding is None:
        return P()
    spec = getattr(sharding, "spec", None)
    return spec if spec is not None else P()


def _batch_axes(arg_shapes, batch_dims):
    """The mesh axes the reference operand's batch dim is sharded over."""
    for info, bdim in zip(arg_shapes, batch_dims):
        if bdim is None:
            continue
        spec = _spec_of(getattr(info, "sharding", None))
        if len(spec) > bdim and spec[bdim] is not None:
            return spec[bdim]
    return None


def batch_partitioned(impl, batch_dims: Sequence[Optional[int]],
                      out_batch_dims, rule: str,
                      need_replication: Sequence[str]):
    """Wrap `impl(*arrays) -> array | tuple` so only batch dims may shard.

    batch_dims[i]: which dim of arg i is the batch dim (None = the arg has
    no batch dim and is always replicated). out_batch_dims: the output's
    batch dim, or a list of them for tuple outputs. `rule` is the Shardy
    einsum-like sharding rule; `need_replication` lists every factor except
    the batch one. Under partitioning the impl runs unchanged on the local
    shard (so VMEM-fit / tiling decisions see local shapes)."""
    cp = custom_partitioning(impl)
    multi = isinstance(out_batch_dims, (list, tuple))
    obds = list(out_batch_dims) if multi else [out_batch_dims]

    def _shard_for(mesh, rank, bdim, baxes):
        spec = [None] * rank
        if bdim is not None and baxes is not None:
            spec[bdim] = baxes
        return NamedSharding(mesh, P(*spec))

    def _out_shardings(mesh, result_shape, baxes):
        results = (list(result_shape) if isinstance(result_shape,
                                                    (list, tuple))
                   else [result_shape])
        outs = [_shard_for(mesh, len(r.shape), bd, baxes)
                for r, bd in zip(results, obds)]
        return tuple(outs) if multi else outs[0]

    def _partition(mesh, arg_shapes, result_shape):
        baxes = _batch_axes(arg_shapes, batch_dims)
        arg_shardings = tuple(
            _shard_for(mesh, len(info.shape), bdim, baxes)
            for info, bdim in zip(arg_shapes, batch_dims))
        return (mesh, impl, _out_shardings(mesh, result_shape, baxes),
                arg_shardings)

    def _infer(mesh, arg_shapes, result_shape):
        baxes = _batch_axes(arg_shapes, batch_dims)
        return _out_shardings(mesh, result_shape, baxes)

    # Shardy requires special-factor lists sorted by first appearance in
    # the rule string
    order = []
    for tok in rule.replace("->", " ").replace(",", " ").split():
        if tok not in order:
            order.append(tok)
    need = tuple(sorted(set(need_replication), key=order.index))

    cp.def_partition(
        partition=_partition,
        infer_sharding_from_operands=_infer,
        propagate_user_sharding=lambda mesh, user_shape: jax.tree.map(
            lambda x: x.sharding, user_shape),
        sharding_rule=rule,
        need_replication_factors=need,
    )
    return cp
