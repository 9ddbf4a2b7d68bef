"""Device mesh + sharding helpers (the framework's entire "comm layer").

The reference hand-rolls NCCL process groups, state-dict broadcasts, barriers
and an AllGather autograd Function (``prototype/utils/torch_ddp_dist.py``,
``prototype/linklink/__init__.py``, ``clip.py:22-42``).  Under SPMD all of
that collapses to: build a ``jax.sharding.Mesh``, shard the batch over the
``data`` axis, replicate params, and let pjit insert collectives over ICI.

The mesh is 1-D (``data``) for parity with the reference's pure-DP design
(SURVEY §2.6); a trailing ``model`` axis is accepted for TP headroom and is
threaded through the sharding helpers.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Move a host batch onto the mesh, sharded along the batch dim."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def put_global(x: Any, sharding: NamedSharding) -> Any:
    """``device_put`` that also works on multi-process meshes.

    On a pod, ``jax.device_put`` onto a sharding that spans non-addressable
    devices fails; each process must materialize only its addressable
    shards.  Every process holds the full host value (identically-seeded
    init — the SPMD replacement for the reference's rank-0 broadcast,
    ``torch_ddp_dist.py:52-67``), so the callback slices it per shard.
    Single-process: plain ``device_put`` (zero-copy paths preserved)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: put_global(x, sh), tree)


def host_local_to_global(batch: Any, mesh: Mesh) -> Any:
    """Per-process local batch chunks -> one globally batch-sharded array.

    The multi-host ingestion contract (README runbook): every host's loader
    reads a disjoint shard split (``split_shards(rank=process_index)``) and
    contributes its rows of the global batch; this assembles them without
    any cross-host copy (``jax.make_array_from_process_local_data``).
    Works single-process too (equivalent to :func:`shard_batch`)."""
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


