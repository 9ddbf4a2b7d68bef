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


def _identity(a):
    return a


def warm_collectives(mesh: Mesh) -> None:
    """Establish every cross-process communicator context up front.

    Backend communicator contexts initialize lazily on FIRST collective
    use; on CPU clusters the Gloo rendezvous has a hard 30 s timeout.  When
    the first collective sits AFTER the solver's heavy jit compiles,
    processes on small boxes reach it minutes apart and the rendezvous
    dies (observed in the 4-process dp2 x tp2 drill: cold compiles
    serialize on one core).  Running one tiny psum over each mesh axis and
    over the full mesh right after mesh creation — while every process is
    still in lockstep — pins all the contexts the compiled steps will
    later reuse.  No-op single-process."""
    if jax.process_count() == 1:
        return
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map

    names = tuple(mesh.axis_names)

    def body(a):
        for ax in list(names) + [names]:
            a = jax.lax.psum(a, ax)
        return a

    n = int(np.prod([mesh.shape[k] for k in names]))
    arr = jnp.arange(n, dtype=jnp.float32)
    f = jax.jit(shard_map(body, mesh=mesh, in_specs=P(names), out_specs=P()))
    np.asarray(f(arr))  # fence: contexts exist once this returns


def put_global(x: Any, sharding: NamedSharding) -> Any:
    """``device_put`` that also works on multi-process meshes.

    On a pod, ``jax.device_put`` onto a sharding that spans non-addressable
    devices fails; each process must materialize only its addressable
    shards.  Every process holds the full host value (identically-seeded
    init — the SPMD replacement for the reference's rank-0 broadcast,
    ``torch_ddp_dist.py:52-67``), so the callback slices it per shard.
    A value that is ALREADY a global device array spanning non-addressable
    devices (e.g. a jitted fresh-init draw under tensor parallelism — found
    by the 4-process dp2 x tp2 drill at the IL reset) cannot be fetched to
    host at all; it is resharded with a compiled identity instead (SPMD-
    native, same dispatch on every process).  Single-process: plain
    ``device_put`` (zero-copy paths preserved)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return jax.jit(_identity, out_shardings=sharding)(x)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: put_global(x, sh), tree)


def data_rank_world(mesh: Mesh) -> tuple:
    """(rank, world) for the DATA-LOADING split on a possibly tp-spanning
    multi-process mesh.

    When ``model_parallel`` exceeds the per-process device count, a dp row
    spans several processes: those processes' devices all hold the SAME
    batch shard (``P('data')`` replicates over the model axis), so they
    must load IDENTICAL data — the loader split keys on the dp row, not
    the process id.  Conversely one process may own several dp rows (the
    single-process virtual-mesh case), in which case its loader covers all
    of them.  Returns the process's rank within the ``world`` distinct
    loader streams; same-row processes get the same rank (their seeded
    loaders then reproduce the same batches bit-for-bit).

    Reference contrast: torch DDP ties loader rank to process rank
    (``split_by_node``, clip_dataset_wsd.py:158-240) because it has no
    tensor parallelism; this is the SPMD generalization."""
    if jax.process_count() == 1:
        return 0, 1
    grid = mesh.devices  # (data, model)
    pid = jax.process_index()
    rows = sorted({r for r in range(grid.shape[0])
                   if any(d.process_index == pid for d in grid[r].flat)})
    assert rows == list(range(rows[0], rows[0] + len(rows))), (
        "non-contiguous data-axis rows per process", rows)
    world = grid.shape[0] // len(rows)
    return rows[0] // len(rows), world


def host_local_to_global(batch: Any, mesh: Mesh) -> Any:
    """Per-process local batch chunks -> one globally batch-sharded array.

    The multi-host ingestion contract (README runbook): every loader stream
    reads a disjoint shard split (``split_shards(rank=data_rank)``) and
    contributes its rows of the global batch.  Assembly places each
    addressable device's exact global slice (``addressable_devices_
    indices_map``) from the process-local rows — this covers plain dp
    (process-disjoint rows, no copy) AND tp-spanning-process meshes, where
    devices in the same dp row need the FULL local batch replicated (the
    same-row processes loaded identical data, so every device's slice is
    locally available by construction).  Works single-process too
    (equivalent to :func:`shard_batch`)."""
    sh = batch_sharding(mesh)
    rank, world = data_rank_world(mesh)

    def conv(x):
        x = np.asarray(x)
        g0 = x.shape[0] * world
        gshape = (g0,) + x.shape[1:]
        off = rank * x.shape[0]
        devs, arrs = [], []
        for d, idx in sh.addressable_devices_indices_map(gshape).items():
            s0 = idx[0]
            start = 0 if s0.start is None else int(s0.start)
            stop = g0 if s0.stop is None else int(s0.stop)
            assert 0 <= start - off and stop - off <= x.shape[0], (
                "device slice outside the process-local rows: loader split "
                "and mesh layout disagree", start, stop, off, x.shape[0])
            devs.append(d)
            arrs.append(jax.device_put(x[start - off:stop - off], d))
        return jax.make_array_from_single_device_arrays(gshape, sh, arrs)

    return jax.tree.map(conv, batch)


