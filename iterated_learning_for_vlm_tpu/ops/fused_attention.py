"""Fused multi-head self-attention for TINY sequences (Pallas TPU kernel).

Why this exists (round-2 profiling of the bench step, TPU v5e):
the CLIP towers run attention at S=50 (image) / S=77 (text) with head_dim 64.
Under XLA the batched score/value dots execute at 5-12 TF/s (bandwidth-bound
tiny matmuls) and every dot is bracketed by [B,S,H,hd] <-> [B,H,S,hd] layout
transposes ("data formatting", ~18 ms/step) — together ~38 ms of the 134 ms
step, for only ~0.5 TFLOP of useful work.  The classic flash-attention
formulation does not help here (sequences fit whole in VMEM; the online
softmax only adds overhead — measured 1066 vs 1914 pairs/s, see
``ops/flash_attention.py``).

This kernel instead exploits that at tiny S the WHOLE attention for a batch
tile fits in VMEM, and restructures the per-head dots into dense
block-diagonal matmuls so the MXU sees real shapes:

- operands stay in the native ``[B, S, 3*D]`` packed-QKV layout the in_proj
  matmul produces (torch ``nn.MultiheadAttention`` packing, reference
  ``base_transformer.py:33``).  Per sample, the g heads of a group are g
  CONTIGUOUS column slices, so ``[S, g*hd] -> [S*g, hd]`` is a free row-major
  reshape — no transpose in HBM or VMEM, forward or backward.
- scores for a head-group are ONE dense ``[S*g, hd] @ [hd, S*g]`` matmul.
  Rows are (s, h)-interleaved, so the block-diagonal structure becomes a
  precomputed additive mask (rows attend only to columns of the same head;
  the text tower's causal bias folds into the same mask).  The g-fold FLOP
  waste is deliberate: it converts 5 TF/s bandwidth-bound dots into MXU-rate
  dots, and attention FLOPs are ~2% of the step.
- softmax runs in fp32 in VMEM; only ``[B, S, D]`` outputs touch HBM.
- backward recomputes scores/softmax in-kernel (cheap at tiny S) and writes
  ``d(qkv)`` back in the packed layout — the projection's grad consumes it
  with no formatting either.

Numerics match the XLA path (fp32 logits/softmax, bf16 value dot) — pinned
by ``tests/test_fused_attention.py``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def build_group_mask(seq: int, group: int, bias: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Additive fp32 mask [S*g, S*g] for (s, h)-interleaved grouped attention.

    Row i = (s_i, h_i) with s_i = i // g, h_i = i % g.  Entry (i, j) is 0
    where h_i == h_j (same head), plus ``bias[s_i, s_j]`` when given (the
    causal mask of the text tower); cross-head entries get a large negative
    so they vanish under softmax.  The mask is identical for every head
    group and every sample — built once under jit and constant-folded.
    """
    idx = jnp.arange(seq * group)
    s, h = idx // group, idx % group
    same_head = h[:, None] == h[None, :]
    m = jnp.where(same_head, 0.0, _NEG).astype(jnp.float32)
    if bias is not None:
        m = m + bias.astype(jnp.float32)[s[:, None], s[None, :]]
    # keep the mask finite (the causal bias arrives as -inf): exp(_NEG - max)
    # underflows to exactly 0 either way, and finite values keep Mosaic's
    # arithmetic NaN-free.
    return jnp.maximum(m, _NEG)


def _fwd_kernel(qkv_ref, mask_ref, out_ref, *, heads, group, scale):
    bb, s, three_d = qkv_ref.shape
    d = three_d // 3
    hd = d // heads
    cols = group * hd
    for b in range(bb):
        row = qkv_ref[b]  # [S, 3D]
        for gi in range(heads // group):
            lo = gi * cols
            q = row[:, lo:lo + cols].reshape(s * group, hd)
            k = row[:, d + lo:d + lo + cols].reshape(s * group, hd)
            v = row[:, 2 * d + lo:2 * d + lo + cols].reshape(s * group, hd)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + mask_ref[...]
            p = jax.nn.softmax(logits, axis=-1)
            o = jnp.dot(p.astype(row.dtype), v, preferred_element_type=jnp.float32)
            out_ref[b, :, lo:lo + cols] = o.reshape(s, cols).astype(out_ref.dtype)


def _bwd_kernel(qkv_ref, mask_ref, dout_ref, dqkv_ref, *, heads, group, scale):
    bb, s, three_d = qkv_ref.shape
    d = three_d // 3
    hd = d // heads
    cols = group * hd
    for b in range(bb):
        row = qkv_ref[b]
        for gi in range(heads // group):
            lo = gi * cols
            q = row[:, lo:lo + cols].reshape(s * group, hd)
            k = row[:, d + lo:d + lo + cols].reshape(s * group, hd)
            v = row[:, 2 * d + lo:2 * d + lo + cols].reshape(s * group, hd)
            do = dout_ref[b, :, lo:lo + cols].reshape(s * group, hd)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + mask_ref[...]
            p = jax.nn.softmax(logits, axis=-1)
            pc = p.astype(row.dtype)
            # dv = p^T @ do   (masked rows of p are 0 -> no leakage)
            dv = jax.lax.dot_general(
                pc, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dp = do @ v^T ; softmax vjp ; dq/dk
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dsc = ds.astype(row.dtype)
            dq = jnp.dot(dsc, k, preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                dsc, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dt = dqkv_ref.dtype
            dqkv_ref[b, :, lo:lo + cols] = dq.reshape(s, cols).astype(dt)
            dqkv_ref[b, :, d + lo:d + lo + cols] = dk.reshape(s, cols).astype(dt)
            dqkv_ref[b, :, 2 * d + lo:2 * d + lo + cols] = dv.reshape(s, cols).astype(dt)


def _pick_bb(b: int, bb: int) -> int:
    while bb > 1 and b % bb:
        bb //= 2
    return max(bb, 1)


def _fwd(qkv, mask, *, heads, group, bb):
    b, s, three_d = qkv.shape
    bb = _pick_bb(b, bb)
    d = three_d // 3
    scale = (d // heads) ** -0.5
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, group=group, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, s, three_d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mask.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(qkv, mask)


def _bwd(qkv, mask, dout, *, heads, group, bb):
    b, s, three_d = qkv.shape
    bb = _pick_bb(b, bb)
    d = three_d // 3
    scale = (d // heads) ** -0.5
    return pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, group=group, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, s, three_d), qkv.dtype),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, s, three_d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mask.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, s, three_d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(qkv, mask, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _attend(qkv, mask, heads, group, bb):
    return _fwd(qkv, mask, heads=heads, group=group, bb=bb)


def _attend_fwd(qkv, mask, heads, group, bb):
    return _fwd(qkv, mask, heads=heads, group=group, bb=bb), (qkv, mask)


def _attend_bwd(heads, group, bb, res, g):
    qkv, mask = res
    dqkv = _bwd(qkv, mask, g.astype(qkv.dtype), heads=heads, group=group, bb=bb)
    return dqkv, None


_attend.defvjp(_attend_fwd, _attend_bwd)


def fused_tiny_attention(
    qkv: jnp.ndarray,
    heads: int,
    bias: Optional[jnp.ndarray] = None,
    head_group: int = 4,
    batch_block: int = 8,
) -> jnp.ndarray:
    """Multi-head self-attention on packed QKV for tiny sequence lengths.

    qkv: [B, S, 3*D] packed projections (q | k | v along the last axis,
    torch in_proj column order); bias: optional [S, S] additive logits bias
    (the causal mask); head_group: heads fused per block-diagonal matmul
    (must divide ``heads``); batch_block: samples per kernel program.
    Returns [B, S, D] in the same layout/dtype the out_proj expects.
    """
    assert heads % head_group == 0, (heads, head_group)
    _, s, three_d = qkv.shape
    assert three_d % (3 * heads) == 0
    mask = build_group_mask(s, head_group, bias)
    return _attend(qkv, mask, heads, head_group, batch_block)
