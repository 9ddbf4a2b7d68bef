"""Fused FDT codebook attention (Pallas TPU kernels).

The FDT query head computes ``inner = q @ codebook.T`` with shape
``[B, T, 4096]`` (reference ``clip_fdt.py:118``) and immediately max-pools it
over the T axis.  Under XLA the dot's output is materialized to HBM before
the reduce (dots don't fuse into consumers on TPU) — at B=256/T=77 that is a
~320 MB round-trip per step for the text side alone.  This kernel computes
``pooled[b, n] = max_t (q[b,t]·sd[n] / sqrt(D) * keep[b,t] / temp)`` tile by
tile entirely in VMEM, so only the ``[B, 4096]`` pooled logits (and the
argmax indices needed for the backward pass) ever reach HBM.

The backward pass exploits max-pool sparsity: each (b, n) routes its
gradient to exactly one token ``t = argmax``; per batch row that is a
one-hot ``[T, N]`` matrix M with ``dq_b = M @ sd`` and ``dsd += M.T @ q_b``
— two MXU matmuls per row, with ``dsd`` accumulated across the grid.

The sparsemax + ``att @ sd`` tail stays in XLA (cheap: [B,4096] elementwise +
one matmul) and differentiates through the custom sparsemax VJP.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import cdiv as _cdiv, interpret_mode as _interpret
from ..models.sparsemax import sparsemax_bisect


# -- forward: pooled logits ---------------------------------------------------
def _pooled_fwd_kernel(temp_ref, q_ref, sd_ref, keep_ref, pooled_ref, amax_ref, *, scale):
    bb, t, d = q_ref.shape
    nn = sd_ref.shape[0]
    # operands stay in their input dtype (bf16 under mixed precision -> 2x MXU
    # rate); accumulation is fp32 via preferred_element_type.
    q = q_ref[...].reshape(bb * t, d)
    sd = sd_ref[...]
    inner = jax.lax.dot_general(
        q, sd, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).reshape(bb, t, nn)
    inner = inner * scale
    if keep_ref is not None:
        inner = inner * keep_ref[...].astype(jnp.float32)[..., None]
    inner = inner / temp_ref[0]
    pooled_ref[...] = jnp.max(inner, axis=1)
    amax_ref[...] = jnp.argmax(inner, axis=1).astype(jnp.int32)


def _pooled_fwd(q, sd, keep, temperature, *, bb=8, nn=512):
    b, t, d = q.shape
    n = sd.shape[0]
    bb = min(bb, b)
    nn = min(nn, n)
    grid = (_cdiv(b, bb), _cdiv(n, nn))
    temp = jnp.asarray(temperature, jnp.float32).reshape(1)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((bb, t, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
    ]
    args = [temp, q, sd]
    kernel = _pooled_fwd_kernel
    if keep is not None:
        in_specs.append(pl.BlockSpec((bb, t), lambda i, j: (i, 0), memory_space=pltpu.VMEM))
        args.append(keep.astype(jnp.float32))
    else:
        kernel = _no_keep(kernel)

    scale = d ** -0.5
    pooled, amax = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        out_shape=[
            jax.ShapeDtypeStruct((b, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n), jnp.int32),
        ],
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bb, nn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, nn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        interpret=_interpret(),
    )(*args)
    return pooled, amax


def _no_keep(kernel):
    def wrapped(temp_ref, q_ref, sd_ref, pooled_ref, amax_ref, **kw):
        return kernel(temp_ref, q_ref, sd_ref, None, pooled_ref, amax_ref, **kw)

    return wrapped


# -- backward -----------------------------------------------------------------
# Two tiled kernels (a single kernel would need the full [N, D] codebook +
# a full [N, D] accumulator in VMEM — 16 MB at N=4096/D=512, over the limit):
#   dq kernel: grid (B, N_tiles), accumulates dq[b] over codebook tiles
#              (innermost axis -> the output block stays resident in VMEM);
#   dsd kernel: grid (N_tiles, B), accumulates dsd[n_tile] over batch rows.
def _routing_matrix(dp, am, keep_rows, coeff, t):
    """[BB, T, NN] one-hot routing: dp[b, n] at row argmax[b, n], scaled."""
    bb, nn = dp.shape
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (bb, t, nn), 1)
    m = jnp.where(t_ids == am[:, None, :], dp[:, None, :], 0.0) * coeff
    if keep_rows is not None:
        m = m * keep_rows[:, :, None]
    return m


def _bwd_dq_kernel(temp_ref, dp_ref, amax_ref, sd_ref, keep_ref, dq_ref, *,
                   scale, n_rem=0):
    t = dq_ref.shape[1]
    dp = dp_ref[:, 0, :].astype(jnp.float32)  # [BB, NN]
    sd = sd_ref[...].astype(jnp.float32)
    if n_rem:
        # nn does not divide the codebook size: the final tile's dp/sd tail
        # is UNDEFINED VMEM, and here the codebook axis is the *accumulated*
        # axis — garbage (incl. NaN) would flow into every retained dq row.
        # Zero both sides of the dot on the final tile (0*0, NaN-proof);
        # dividing tiles skip this branch entirely at trace time.
        nn = dp.shape[1]
        not_last = pl.program_id(1) != pl.num_programs(1) - 1
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, nn), 1)
        dp = jnp.where(jnp.logical_or(not_last, lane < n_rem), dp, 0.0)
        # separate iota for the sd-row mask: Mosaic cannot reshape a
        # [1, nn] i1 vector onto the sublane axis
        row = jax.lax.broadcasted_iota(jnp.int32, (nn, 1), 0)
        sd = jnp.where(jnp.logical_or(not_last, row < n_rem), sd, 0.0)
    am = amax_ref[:, 0, :]
    keep_rows = None if keep_ref is None else keep_ref[:, 0, :].astype(jnp.float32)
    m = _routing_matrix(dp, am, keep_rows, scale / temp_ref[0], t)  # [BB, T, NN]
    bb, _, nn = m.shape
    contrib = jnp.dot(
        m.reshape(bb * t, nn), sd,
        preferred_element_type=jnp.float32,
    ).reshape(bb, t, -1)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    dq_ref[...] += contrib.astype(dq_ref.dtype)


def _bwd_dsd_kernel(temp_ref, dp_ref, amax_ref, q_ref, keep_ref, dsd_ref, *, scale):
    t = q_ref.shape[1]
    dp = dp_ref[:, 0, :].astype(jnp.float32)  # [BB, NN]
    am = amax_ref[:, 0, :]
    keep_rows = None if keep_ref is None else keep_ref[:, 0, :].astype(jnp.float32)
    m = _routing_matrix(dp, am, keep_rows, scale / temp_ref[0], t)  # [BB, T, NN]
    q = q_ref[...].astype(jnp.float32)  # [BB, T, D]
    bb, _, nn = m.shape
    d = q.shape[-1]
    contrib = jax.lax.dot_general(
        m.reshape(bb * t, nn), q.reshape(bb * t, d),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [NN, D]

    @pl.when(pl.program_id(1) == 0)
    def _():
        dsd_ref[...] = jnp.zeros_like(dsd_ref)

    dsd_ref[...] += contrib.astype(dsd_ref.dtype)


def _pooled_bwd(q, sd, keep, temperature, amax, dpooled, *, bb=8, nn=512):
    b, t, d = q.shape
    n = sd.shape[0]
    nn = min(nn, n)
    bb = min(bb, b)
    if b % bb:
        bb = 1
    n_tiles = _cdiv(n, nn)
    b_tiles = _cdiv(b, bb)
    temp = jnp.asarray(temperature, jnp.float32).reshape(1)
    dp3 = dpooled.reshape(b, 1, n)
    am3 = amax.reshape(b, 1, n)
    keep3 = None if keep is None else keep.astype(jnp.float32).reshape(b, 1, t)
    scale = d ** -0.5

    # dq: grid (B_tiles, N_tiles); output block fixed per i, accumulated over j.
    dq_in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((bb, 1, nn), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, 1, nn), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((nn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
    ]
    dq_args = [temp, dp3, am3, sd]
    dq_kernel = _bwd_dq_kernel
    if keep3 is not None:
        dq_in_specs.append(
            pl.BlockSpec((bb, 1, t), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        dq_args.append(keep3)
    else:
        dq_kernel = _drop_arg(dq_kernel, pos=4)
    dq = pl.pallas_call(
        functools.partial(dq_kernel, scale=scale, n_rem=n % nn),
        # accumulate dq across codebook tiles in fp32, cast at the end
        out_shape=jax.ShapeDtypeStruct(q.shape, jnp.float32),
        grid=(b_tiles, n_tiles),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((bb, t, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(*dq_args).astype(q.dtype)

    # dsd: grid (N_tiles, B_tiles); output tile fixed per i, accumulated over j.
    dsd_in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((bb, 1, nn), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, 1, nn), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, t, d), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
    ]
    dsd_args = [temp, dp3, am3, q]
    dsd_kernel = _bwd_dsd_kernel
    if keep3 is not None:
        dsd_in_specs.append(
            pl.BlockSpec((bb, 1, t), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM)
        )
        dsd_args.append(keep3)
    else:
        dsd_kernel = _drop_arg(dsd_kernel, pos=4)
    dsd = pl.pallas_call(
        functools.partial(dsd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(sd.shape, jnp.float32),
        grid=(n_tiles, b_tiles),
        in_specs=dsd_in_specs,
        out_specs=pl.BlockSpec((nn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(*dsd_args)
    return dq, dsd.astype(sd.dtype)


def _drop_arg(kernel, pos):
    """Adapt a kernel that takes an optional keep_ref at input position
    ``pos`` (after temp/dp/amax/other) to the no-mask call signature."""

    def wrapped(*refs, **kw):
        refs = list(refs)
        refs.insert(pos, None)
        return kernel(*refs, **kw)

    return wrapped


def _auto_tiles(t: int):
    """(fwd, bwd) ``(bb, nn)`` tile points by token count, from the on-chip
    sweep at bs256 / sd 4096x512 (tools/codebook_tile_sweep.py, v5e):
    vision T=50 — fwd best at the round-1 point (8, 512) but bwd 14% faster
    at (32, 512); text T=77 — fwd best at (16, 1024) (2.04 -> 1.80 ms), bwd
    at (8, 1024) (3.14 -> 3.12).  The text bwd's sweep winner (16, 1024),
    2.83 ms, sits ON the 16 MB scoped-VMEM edge: it compiles in some
    enclosing programs (bench's full step) and OOMs in others (a bare grads
    jit, 17.35 M stack) — context-dependent compile failures, so it is NOT
    auto-picked; opt in via ``bwd_tiles`` where the program is known to fit.
    Larger tiles VMEM-OOM outright.  T > 128 (B/16's 197 patch tokens) stays
    at the conservative round-1 point: the bwd routing matrix [bb, T, nn]
    scales with bb*T*nn.

    T=32 (the ctx-32 shipping text bucket) swept separately
    (``tools/codebook_tile_sweep.py text32``): fwd (16, 512) 1.024 ms /
    bwd (16, 1024) 1.316 ms vs the t<=64 vision point's 1.096/1.380.
    (8/16, 4096) measured marginally faster still but puts the whole 8 MB
    codebook tile in VMEM — the same context-dependent-OOM class as the
    T=77 bwd edge point, so not auto-picked.  XLA's fwd einsum at T=32
    (0.986 ms) ties the kernel fwd within noise; the kernel bwd's sparse
    routing still wins (1.316 vs 1.645), so the fused pair stays on."""
    if t <= 40:
        return (16, 512), (16, 1024)
    if t <= 64:
        return (8, 512), (32, 512)
    if t <= 128:
        return (16, 1024), (8, 1024)
    return (8, 512), (8, 512)


# -- SPMD rules (ops/partitioning.py): under a dp-sharded jit each device
# runs the kernels on its batch shard (codebook + temperature replicated);
# the codebook gradient is a cross-batch reduction, psum-ed by the rule.
# Without these the partitioner would replicate the opaque Mosaic calls,
# all-gathering the global batch onto every chip.
def _fwd_sharded(q, sd, keep, temperature, tiles=None):
    from .partitioning import batch_partitioned

    bb, nn = tiles if tiles is not None else _auto_tiles(q.shape[1])[0]
    temp = jnp.asarray(temperature, jnp.float32)
    if keep is None:
        return batch_partitioned(
            lambda q_, sd_, t_: _pooled_fwd(q_, sd_, None, t_, bb=bb, nn=nn),
            batch_args=(0,),
        )(q, sd, temp)
    return batch_partitioned(
        lambda q_, sd_, k_, t_: _pooled_fwd(q_, sd_, k_, t_, bb=bb, nn=nn),
        batch_args=(0, 2),
    )(q, sd, keep, temp)


def _bwd_sharded(q, sd, keep, temperature, amax, dpooled, tiles=None):
    from .partitioning import batch_partitioned

    bb, nn = tiles if tiles is not None else _auto_tiles(q.shape[1])[1]
    temp = jnp.asarray(temperature, jnp.float32)
    if keep is None:
        return batch_partitioned(
            lambda q_, sd_, t_, a_, g_: _pooled_bwd(q_, sd_, None, t_, a_, g_, bb=bb, nn=nn),
            batch_args=(0, 3, 4), reduced_outs=(1,),
        )(q, sd, temp, amax, dpooled)
    return batch_partitioned(
        lambda q_, sd_, k_, t_, a_, g_: _pooled_bwd(q_, sd_, k_, t_, a_, g_, bb=bb, nn=nn),
        batch_args=(0, 2, 4, 5), reduced_outs=(1,),
    )(q, sd, keep, temp, amax, dpooled)


# -- custom-vjp pooled op ----------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def pooled_codebook_logits(q, sd, keep, temperature,
                           fwd_tiles=None, bwd_tiles=None):
    """max_t of masked scaled codebook inner products; [B, N] fp32.

    ``fwd_tiles``/``bwd_tiles`` are optional static ``(bb, nn)`` kernel tile
    overrides; ``None`` picks the swept optimum for the token count
    (``_auto_tiles``)."""
    pooled, _ = _fwd_sharded(q, sd, keep, temperature, fwd_tiles)
    return pooled


# fwd rule keeps the primal signature (nondiff args stay in position);
# only the bwd rule receives them as leading args.
def _pcl_fwd(q, sd, keep, temperature, fwd_tiles, bwd_tiles):
    pooled, amax = _fwd_sharded(q, sd, keep, temperature, fwd_tiles)
    return pooled, (q, sd, keep, temperature, amax)


def _pcl_bwd(fwd_tiles, bwd_tiles, res, g):
    q, sd, keep, temperature, amax = res
    dq, dsd = _bwd_sharded(q, sd, keep, temperature, amax,
                           g.astype(jnp.float32), bwd_tiles)
    return dq, dsd, None, None


pooled_codebook_logits.defvjp(_pcl_fwd, _pcl_bwd)


def fused_codebook_attention(
    q: jnp.ndarray,
    sd: jnp.ndarray,
    keep_mask: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    pool_type: str = "max",
    fwd_tiles: Optional[tuple] = None,
    bwd_tiles: Optional[tuple] = None,
):
    """Fused equivalent of the sparsemax/max-pool QueryModel attention chain.

    q: [B, T, D] query-projected tokens; sd: [N, D] codebook;
    keep_mask: optional [B, T] bool/0-1 (True = real token);
    fwd_tiles/bwd_tiles: optional static (bb, nn) kernel tile overrides
    (default: the swept per-token-count optimum, ``_auto_tiles``).
    Returns (att_weight [B, N], att_ft [B, D]) matching the XLA path.
    """
    assert pool_type == "max", "fused kernel implements the shipped max-pool config"
    keep = None if keep_mask is None else keep_mask.astype(jnp.float32)
    # keep q/sd in the compute dtype (bf16 under mixed precision); the kernel
    # accumulates fp32 and the pooled logits/sparsemax stay fp32.
    pooled = pooled_codebook_logits(q, sd.astype(q.dtype), keep, temperature,
                                    fwd_tiles, bwd_tiles)
    att = sparsemax_bisect(pooled)
    att_ft = jnp.einsum("bn,nd->bd", att, sd.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    return att, att_ft
