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

from ..models.sparsemax import sparsemax_bisect


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


# -- forward: pooled logits ---------------------------------------------------
def _pooled_fwd_kernel(temp_ref, q_ref, sd_ref, keep_ref, pooled_ref, amax_ref, *, scale):
    bb, t, d = q_ref.shape
    nn = sd_ref.shape[0]
    q = q_ref[...].astype(jnp.float32).reshape(bb * t, d)
    sd = sd_ref[...].astype(jnp.float32)
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
def _pooled_bwd_kernel(temp_ref, dp_ref, amax_ref, q_ref, sd_ref, keep_ref,
                       dq_ref, dsd_ref, *, scale):
    t = q_ref.shape[1]
    n = sd_ref.shape[0]
    dp = dp_ref[0].astype(jnp.float32)  # [N]
    am = amax_ref[0]  # [N] int32
    coeff = scale / temp_ref[0]

    t_ids = jax.lax.broadcasted_iota(jnp.int32, (t, n), 0)
    m = jnp.where(t_ids == am[None, :], dp[None, :], 0.0) * coeff  # [T, N]
    if keep_ref is not None:
        m = m * keep_ref[0].astype(jnp.float32)[:, None]

    sd = sd_ref[...].astype(jnp.float32)
    q = q_ref[0].astype(jnp.float32)  # [T, D]
    dq_ref[0] = jnp.dot(m, sd, preferred_element_type=jnp.float32).astype(dq_ref.dtype)

    dsd_contrib = jax.lax.dot_general(
        m, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [N, D]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dsd_ref[...] = jnp.zeros_like(dsd_ref)

    dsd_ref[...] += dsd_contrib.astype(dsd_ref.dtype)


def _pooled_bwd(q, sd, keep, temperature, amax, dpooled):
    b, t, d = q.shape
    n = sd.shape[0]
    temp = jnp.asarray(temperature, jnp.float32).reshape(1)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [temp, dpooled, amax, q, sd]
    kernel = _pooled_bwd_kernel
    if keep is not None:
        in_specs.append(pl.BlockSpec((1, t), lambda i: (i, 0), memory_space=pltpu.VMEM))
        args.append(keep.astype(jnp.float32))
    else:
        kernel = _no_keep_bwd(kernel)

    scale = d ** -0.5
    dq, dsd = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(sd.shape, jnp.float32),
        ],
        grid=(b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        interpret=_interpret(),
    )(*args)
    return dq, dsd.astype(sd.dtype)


def _no_keep_bwd(kernel):
    def wrapped(temp_ref, dp_ref, amax_ref, q_ref, sd_ref, dq_ref, dsd_ref, **kw):
        return kernel(temp_ref, dp_ref, amax_ref, q_ref, sd_ref, None, dq_ref, dsd_ref, **kw)

    return wrapped


# -- custom-vjp pooled op ----------------------------------------------------
@jax.custom_vjp
def pooled_codebook_logits(q, sd, keep, temperature):
    """max_t of masked scaled codebook inner products; [B, N] fp32."""
    pooled, _ = _pooled_fwd(q, sd, keep, temperature)
    return pooled


def _pcl_fwd(q, sd, keep, temperature):
    pooled, amax = _pooled_fwd(q, sd, keep, temperature)
    return pooled, (q, sd, keep, temperature, amax)


def _pcl_bwd(res, g):
    q, sd, keep, temperature, amax = res
    dq, dsd = _pooled_bwd(q, sd, keep, temperature, amax, g.astype(jnp.float32))
    return dq, dsd, None, None


pooled_codebook_logits.defvjp(_pcl_fwd, _pcl_bwd)


def fused_codebook_attention(
    q: jnp.ndarray,
    sd: jnp.ndarray,
    keep_mask: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    pool_type: str = "max",
):
    """Fused equivalent of the sparsemax/max-pool QueryModel attention chain.

    q: [B, T, D] query-projected tokens; sd: [N, D] codebook;
    keep_mask: optional [B, T] bool/0-1 (True = real token).
    Returns (att_weight [B, N], att_ft [B, D]) matching the XLA path.
    """
    assert pool_type == "max", "fused kernel implements the shipped max-pool config"
    keep = None if keep_mask is None else keep_mask.astype(jnp.float32)
    pooled = pooled_codebook_logits(q.astype(jnp.float32), sd.astype(jnp.float32),
                                    keep, temperature)
    att = sparsemax_bisect(pooled)
    att_ft = jnp.einsum("bn,nd->bd", att, sd.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    return att, att_ft
