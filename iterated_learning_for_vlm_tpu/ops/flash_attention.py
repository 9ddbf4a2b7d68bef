"""Fused multi-head attention (Pallas TPU kernel).

The CLIP towers run 12 layers of MHA over tiny sequences (50 image tokens /
77 text tokens — reference ``visual_transformer.py:97-113``,
``text_transformer.py:344``).  At these lengths the classic KV-streaming
flash-attention pipeline is unnecessary: a whole ``[S, S]`` logit tile fits
comfortably in VMEM (77x77 fp32 = 23 KB).  The win on TPU is *fusion* — one
kernel per (batch, head) computes logits -> bias -> softmax -> weighted sum
entirely on-chip, so the ``[B, H, S, S]`` attention matrix never touches HBM
(the XLA path materializes it: dots don't fuse into their consumers).

Forward and backward are both Pallas kernels (custom VJP, softmax
recomputed in backward — the standard flash recipe).  On non-TPU backends the
kernels run in interpret mode, so tests cover them on the CPU mesh.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import interpret_mode as _interpret


def _attn_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)  # [S, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [S, S]
    if bias_ref is not None:
        logits = logits + bias_ref[:]
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    p = unnorm / denom
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if bias_ref is not None:
        logits = logits + bias_ref[:]
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits)
    p = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)  # [S, S]

    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [S, D]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [S, S]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(b, h, s, d, with_bias):
    qkv_spec = pl.BlockSpec((1, s, d), lambda i, j: (i * h + j, 0, 0),
                            memory_space=pltpu.VMEM)
    specs = [qkv_spec, qkv_spec, qkv_spec]
    if with_bias:
        specs.append(pl.BlockSpec((s, s), lambda i, j: (0, 0), memory_space=pltpu.VMEM))
    return specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention(q, k, v, bias, scale):
    return _fwd_impl(q, k, v, bias, scale)


def _fwd_impl(q, k, v, bias, scale):
    from .partitioning import batch_partitioned

    # shard-local lowering: under a dp-sharded jit each shard re-derives the
    # grid from ITS batch (without the rule the opaque Mosaic call would be
    # replicated — every chip all-gathering the global batch)
    def inner(q, k, v, *rest):
        bias_ = rest[0] if rest else None
        b, s, h, d = q.shape
        # [B, S, H, D] -> [B*H, S, D]
        def to_bh(t):
            return t.transpose(0, 2, 1, 3).reshape(b * h, s, d)

        qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
        with_bias = bias_ is not None
        args = [qb, kb, vb] + ([bias_] if with_bias else [])

        out = pl.pallas_call(
            functools.partial(
                _attn_fwd_kernel if with_bias else _no_bias(_attn_fwd_kernel),
                scale=scale,
            ),
            out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
            grid=(b, h),
            in_specs=_specs(b, h, s, d, with_bias),
            out_specs=pl.BlockSpec((1, s, d), lambda i, j: (i * h + j, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(*args)
        return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)

    args = (q, k, v) if bias is None else (q, k, v, bias)
    return batch_partitioned(inner, batch_args=(0, 1, 2))(*args)


def _no_bias(kernel):
    def wrapped(q_ref, k_ref, v_ref, o_ref, **kw):
        return kernel(q_ref, k_ref, v_ref, None, o_ref, **kw)

    return wrapped


def _no_bias_bwd(kernel):
    def wrapped(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, **kw):
        return kernel(q_ref, k_ref, v_ref, None, do_ref, dq_ref, dk_ref, dv_ref, **kw)

    return wrapped


def _fwd_rule(q, k, v, bias, scale):
    out = _fwd_impl(q, k, v, bias, scale)
    return out, (q, k, v, bias)


def _bwd_rule(scale, res, g):
    from .partitioning import batch_partitioned

    q, k, v, bias = res

    def inner(q, k, v, g, *rest):
        bias_ = rest[0] if rest else None
        b, s, h, d = q.shape

        def to_bh(t):
            return t.transpose(0, 2, 1, 3).reshape(b * h, s, d)

        qb, kb, vb, gb = to_bh(q), to_bh(k), to_bh(v), to_bh(g)
        with_bias = bias_ is not None
        args = [qb, kb, vb] + ([bias_] if with_bias else []) + [gb]

        in_specs = _specs(b, h, s, d, with_bias)
        in_specs.append(pl.BlockSpec((1, s, d), lambda i, j: (i * h + j, 0, 0),
                                     memory_space=pltpu.VMEM))
        out_spec = pl.BlockSpec((1, s, d), lambda i, j: (i * h + j, 0, 0),
                                memory_space=pltpu.VMEM)
        kernel = _attn_bwd_kernel if with_bias else _no_bias_bwd(_attn_bwd_kernel)
        dq, dk, dv = pl.pallas_call(
            functools.partial(kernel, scale=scale),
            out_shape=[jax.ShapeDtypeStruct((b * h, s, d), q.dtype)] * 3,
            grid=(b, h),
            in_specs=in_specs,
            out_specs=[out_spec] * 3,
            interpret=_interpret(),
        )(*args)

        def from_bh(t):
            return t.reshape(b, h, s, d).transpose(0, 2, 1, 3)

        return from_bh(dq), from_bh(dk), from_bh(dv)

    args = (q, k, v, g) if bias is None else (q, k, v, g, bias)
    dq, dk, dv = batch_partitioned(inner, batch_args=(0, 1, 2, 3))(*args)
    return dq, dk, dv, None


_flash_attention.defvjp(_fwd_rule, _bwd_rule)


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, bias: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """q/k/v: [B, S, H, D]; bias: optional [S, S] additive mask (causal).

    Returns [B, S, H, D].  Softmax in fp32; logits never leave VMEM.
    """
    d = q.shape[-1]
    scale = d ** -0.5
    if bias is not None:
        bias = bias.astype(jnp.float32)
        if bias.ndim == 4:  # [1|B, 1|H, S, S] -> [S, S] (shared masks only)
            bias = bias.reshape(bias.shape[-2], bias.shape[-1])
    return _flash_attention(q, k, v, bias, scale)
