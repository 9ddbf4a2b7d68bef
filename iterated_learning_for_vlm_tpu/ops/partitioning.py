"""SPMD partitioning rules for the Pallas kernels.

XLA's SPMD partitioner cannot see inside a Mosaic custom call: without a
rule, a ``pallas_call`` under a sharded jit is *replicated* — every chip
all-gathers the global batch and runs the whole kernel, silently erasing the
kernel's win (or OOMing) on a multi-chip mesh.  The reference never hits
this (its DDP ranks are separate processes, SURVEY §2.6); under SPMD it is
our job to tell the partitioner the kernels' natural data-parallel rule.

:func:`batch_partitioned` wraps a shard-local kernel invocation in
``jax.experimental.custom_partitioning`` with the rule shared by both
kernels in this package:

- designated operands carry the batch on dim 0 and are sharded there;
  every other operand (codebook, additive mask, scalar temperature) is
  replicated;
- outputs either carry the batch on dim 0 (sharded like the inputs) or are
  cross-batch *reductions* (the codebook gradient ``dsd``), which each
  shard computes locally and the rule ``psum``s over the batch mesh axes;
- when no batch operand is actually sharded (single chip, or a
  fully-replicated jit), the rule degenerates to the plain call.

Both partitioner flavours are served: an :class:`SdyShardingRule` (Shardy,
the JAX 0.9 default — batch dims share factor ``b``, every other dim is a
``need_replication`` factor) and the ``infer/partition`` callbacks (GSPMD
fallback; also the thing that emits the shard-local ``lower_fn`` with the
``psum`` for reduced outputs).

The wrapped function must take arrays only (close over statics) and be
traceable at both global and per-shard shapes — both kernels pick their
grid/block sizes from the runtime shape, so shard-local batches just get
proportionally smaller grids.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
from jax.experimental.custom_partitioning import (
    SdyShardingRule,
    custom_partitioning,
)
from jax.sharding import NamedSharding, PartitionSpec as P


def _dim0_axes(sharding):
    """Mesh-axis names dim 0 is sharded over, () if unsharded/unknown."""
    if isinstance(sharding, NamedSharding) and len(sharding.spec) > 0:
        s = sharding.spec[0]
        if s is None:
            return ()
        return tuple(s) if isinstance(s, (tuple, list)) else (s,)
    return ()


def _batch_axes(arg_shapes, batch_args):
    for i in batch_args:
        axes = _dim0_axes(arg_shapes[i].sharding)
        if axes:
            return axes
    return ()


def _build_rule(in_ndims, out_ndims, batch_args, reduced_outs):
    """Shardy factor mapping: batch dims share ``b``; everything else is a
    fresh need-replication factor (sharding neither propagates along those
    dims nor survives into them — the kernel needs them whole)."""
    repl = []
    ops = []
    for i, nd in enumerate(in_ndims):
        dims = []
        for d in range(nd):
            if d == 0 and i in batch_args:
                dims.append("b")
            else:
                f = f"f{i}_{d}"
                dims.append(f)
                repl.append(f)
        ops.append(tuple(dims))
    outs = []
    for j, nd in enumerate(out_ndims):
        dims = []
        for d in range(nd):
            if d == 0 and j not in reduced_outs:
                dims.append("b")
            else:
                f = f"r{j}_{d}"
                dims.append(f)
                repl.append(f)
        outs.append(tuple(dims))
    return SdyShardingRule(
        operand_mappings=tuple(ops),
        result_mappings=tuple(outs),
        need_replication_factors=tuple(repl),
    )


def batch_partitioned(
    fn: Callable,
    batch_args: Sequence[int],
    reduced_outs: Sequence[int] = (),
):
    """Wrap ``fn(*arrays)`` with a batch-data-parallel partitioning rule.

    batch_args: operand indices whose dim 0 is the batch (sharded); all other
    operands are replicated.  reduced_outs: indices of outputs (in flattened
    tuple order; ``fn`` may also return a single array) that are summed over
    the batch rather than carrying it — those are ``psum``-ed across the
    batch mesh axes and replicated.  Every other output is sharded on dim 0.
    """
    batch_args = frozenset(batch_args)
    reduced_outs = frozenset(reduced_outs)

    def _spec(axes, nd, has_batch):
        if axes and has_batch:
            return P(axes if len(axes) > 1 else axes[0], *([None] * (nd - 1)))
        return P(*([None] * nd))

    def _out_shardings(mesh, axes, result_shape):
        single = not isinstance(result_shape, (tuple, list))
        shapes = [result_shape] if single else list(result_shape)
        outs = [
            NamedSharding(mesh, _spec(axes, len(s.shape), i not in reduced_outs))
            for i, s in enumerate(shapes)
        ]
        return outs[0] if single else tuple(outs)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        return _out_shardings(mesh, _batch_axes(arg_shapes, batch_args), result_shape)

    def partition(mesh, arg_shapes, result_shape):
        axes = _batch_axes(arg_shapes, batch_args)
        arg_shardings = tuple(
            NamedSharding(mesh, _spec(axes, len(a.shape), i in batch_args))
            for i, a in enumerate(arg_shapes)
        )
        out_shardings = _out_shardings(mesh, axes, result_shape)

        def lower_fn(*args):
            res = fn(*args)
            if axes and reduced_outs:
                single = not isinstance(res, (tuple, list))
                parts = [res] if single else list(res)
                for i in reduced_outs:
                    parts[i] = jax.lax.psum(parts[i], axes)
                res = parts[0] if single else tuple(parts)
            return res

        return mesh, lower_fn, out_shardings, arg_shardings

    def call(*args):
        out = jax.eval_shape(fn, *args)
        single = not isinstance(out, (tuple, list))
        out_ndims = [len(out.shape)] if single else [len(o.shape) for o in out]
        cp = custom_partitioning(fn)
        cp.def_partition(
            partition=partition,
            infer_sharding_from_operands=infer_sharding_from_operands,
            sharding_rule=_build_rule(
                [len(a.shape) for a in args], out_ndims, batch_args, reduced_outs
            ),
        )
        return cp(*args)

    return call
