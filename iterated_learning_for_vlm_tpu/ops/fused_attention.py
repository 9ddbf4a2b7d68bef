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
  ``base_transformer.py:33``) at the TRUE sequence length — no XLA-edge
  pad/unpad pass.  The g heads of a group are stacked into a ``[g*Sp, hd]``
  matrix as contiguous ROW BLOCKS via VMEM scratch stores at a
  sublane-aligned stride Sp (Mosaic rejects both the lane-splitting
  ``[S, g*hd] -> [S*g, hd]`` shape cast and sublane concatenation, but
  accepts S-row stores at aligned offsets — probed bitwise on v5e; the
  scratch tails are zeroed once per program).  The packed in_proj bias can
  be absorbed into these stores (``qkv_bias``), deleting the separate
  [B, S, 3D] bias-add pass from the step.
- scores for a head-group are ONE dense ``[g*S, hd] @ [hd, g*S]`` matmul.
  The block-diagonal structure (a row attends only to columns of its own
  head) becomes a precomputed additive mask, which also carries the text
  tower's causal bias and the S-padding column mask.  The g-fold FLOP waste
  is deliberate: it converts 5 TF/s bandwidth-bound dots into MXU-rate dots,
  and attention FLOPs are ~2% of the step.
- softmax runs in fp32 in VMEM; only ``[B, S, D]`` outputs touch HBM.
- backward recomputes scores/softmax in-kernel (cheap at tiny S) and writes
  ``d(qkv)`` back in the packed layout — the projection's grad consumes it
  with no formatting either.  Zero-padded ``dout`` rows make every padded
  contribution vanish exactly (dv: zero rows; dq/dk: ds rows are 0 because
  dp rows are 0).
- the backward body is issue-overhead-bound (its dots' FLOP time is ~1% of
  their issue cost at these shapes), so round 5 adds fused backward bodies
  (``bwd_fuse3``): the 5 per-group dots collapse to 3 by block-concatenating
  operands — ``[q|do] @ blockdiag(k,v)^T`` yields logits and dp in one dot,
  ``[ds|p]^T @ [q|do]`` yields dk and dv in another (off-diagonal blocks
  are discarded block-diagonal waste) — or to 4 without the ``[ds|p]``
  VMEM concat (``bwd_fuse3=2``).  Swept on-chip per tower shape.

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

from ._common import interpret_mode as _interpret

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)
_SUBLANE = 8


def _pad_seq(s: int) -> int:
    return -(-s // _SUBLANE) * _SUBLANE


def build_group_mask(seq: int, group: int, bias: Optional[jnp.ndarray],
                     valid: Optional[int] = None) -> jnp.ndarray:
    """Additive fp32 mask [g*S, g*S] for head-major grouped attention rows.

    Row i = (h_i, s_i) with h_i = i // S, s_i = i % S (the kernel stacks the
    g heads of a group as contiguous row blocks).  Entry (i, j) is 0 where
    h_i == h_j (same head), plus ``bias[s_i, s_j]`` when given (the causal
    mask of the text tower); cross-head entries and padded key columns
    (``s_j >= valid``) get a large negative so they vanish under softmax.
    The mask is identical for every head group and every sample — built once
    under jit and constant-folded.
    """
    idx = jnp.arange(seq * group)
    s, h = idx % seq, idx // seq
    same_head = h[:, None] == h[None, :]
    if bias is not None:
        b = bias.astype(jnp.float32)
        if b.shape[0] != seq:
            b = jnp.pad(b, ((0, seq - b.shape[0]), (0, seq - b.shape[1])))
        # b[s_i, s_j] as a tile, NOT a gather: XLA:CPU miscompiles the fused
        # iota-derived double gather + where + maximum at some shapes (seen at
        # seq=16: jit and eager disagree; returning intermediates hides it).
        tiled = jnp.tile(b, (group, group))
        m = jnp.where(same_head, tiled, _NEG)
    else:
        m = jnp.where(same_head, 0.0, _NEG).astype(jnp.float32)
    if valid is not None and valid < seq:
        m = jnp.where((s < valid)[None, :], m, _NEG)
    # keep the mask finite (the causal bias arrives as -inf): exp(_NEG - max)
    # underflows to exactly 0 either way, and finite values keep Mosaic's
    # arithmetic NaN-free.
    return jnp.maximum(m, _NEG)


def _stack(ref, scr, b, base, group, sp, hd, sample_group=1, rows=None,
           bias_ref=None):
    """Stack ``sample_group`` consecutive samples x ``group`` per-head column
    slices into ``scr`` as [sg*g*Sp, hd] (sample, head)-major row blocks
    (tile-aligned VMEM stores), return the stacked matrix.  ``b`` is a traced
    loop index (dynamic majormost index); head/sample offsets stay static
    within the fori body (``b`` advances in steps of ``sample_group``).

    ``rows < sp`` stores UNPADDED source rows at the padded block stride
    (Mosaic accepts non-sublane-multiple store lengths at aligned offsets —
    probed on v5e; the caller must have zeroed the scratch tails).
    ``bias_ref`` ([1, 3D] fp32) folds the packed in_proj bias into the stack
    stores — the absorbed-bias mode that removes the XLA-edge add/pad."""
    rows = sp if rows is None else rows
    for si in range(sample_group):
        for h in range(group):
            blk = si * group + h
            sl = ref[b + si, :, pl.ds(base + h * hd, hd)]
            if bias_ref is not None:
                sl = sl + bias_ref[0, pl.ds(base + h * hd, hd)].astype(sl.dtype)[None, :]
            scr[blk * sp:blk * sp + rows, :] = sl
    return scr[...]


def _zero_tails(scrs, rows, sp):
    if rows < sp:
        for s in scrs:
            s[...] = jnp.zeros_like(s)


def _fwd_kernel(qkv_ref, *refs, heads, group, scale, sample_group,
                has_bias=False):
    bias3_ref = refs[0] if has_bias else None
    mask_ref, out_ref, q_scr, k_scr, v_scr = refs[1 if has_bias else 0:]
    bb, rows, three_d = qkv_ref.shape
    d = three_d // 3
    hd = d // heads
    cols = group * hd
    sg = sample_group
    sp = q_scr.shape[0] // (group * sg)
    _zero_tails((q_scr, k_scr, v_scr), rows, sp)

    # the batch loop is a fori_loop (compiled once) — a fully unrolled
    # bb x G body explodes Mosaic compile time at bb=8.
    def body(i, _):
        b = i * sg
        for gi in range(heads // group):
            lo = gi * cols
            q = _stack(qkv_ref, q_scr, b, lo, group, sp, hd, sg, rows, bias3_ref)
            k = _stack(qkv_ref, k_scr, b, d + lo, group, sp, hd, sg, rows, bias3_ref)
            v = _stack(qkv_ref, v_scr, b, 2 * d + lo, group, sp, hd, sg, rows, bias3_ref)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + mask_ref[...]
            p = jax.nn.softmax(logits, axis=-1)
            o = jnp.dot(p.astype(q.dtype), v,
                        preferred_element_type=jnp.float32).astype(out_ref.dtype)
            for si in range(sg):
                for h in range(group):
                    blk = si * group + h
                    out_ref[b + si, :, pl.ds(lo + h * hd, hd)] = (
                        o[blk * sp:blk * sp + rows, :])
        return 0

    jax.lax.fori_loop(0, bb // sg, body, 0)


def _bwd_kernel(qkv_ref, *refs, heads, group, scale, sample_group,
                has_bias=False):
    bias3_ref = refs[0] if has_bias else None
    mask_ref, dout_ref, dqkv_ref, q_scr, k_scr, v_scr, do_scr = (
        refs[1 if has_bias else 0:])
    bb, rows, three_d = qkv_ref.shape
    d = three_d // 3
    hd = d // heads
    cols = group * hd
    sg = sample_group
    sp = q_scr.shape[0] // (group * sg)
    _zero_tails((q_scr, k_scr, v_scr, do_scr), rows, sp)

    def body(i, _):
        b = i * sg
        for gi in range(heads // group):
            lo = gi * cols
            q = _stack(qkv_ref, q_scr, b, lo, group, sp, hd, sg, rows, bias3_ref)
            k = _stack(qkv_ref, k_scr, b, d + lo, group, sp, hd, sg, rows, bias3_ref)
            v = _stack(qkv_ref, v_scr, b, 2 * d + lo, group, sp, hd, sg, rows, bias3_ref)
            do = _stack(dout_ref, do_scr, b, lo, group, sp, hd, sg, rows)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + mask_ref[...]
            p = jax.nn.softmax(logits, axis=-1)
            pc = p.astype(q.dtype)
            # dv = p^T @ do   (padded dout rows are exactly 0 -> no leakage)
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
            dsc = ds.astype(q.dtype)
            dt = dqkv_ref.dtype
            dq = (jnp.dot(dsc, k, preferred_element_type=jnp.float32)
                  * scale).astype(dt)
            dk = (jax.lax.dot_general(
                dsc, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale).astype(dt)
            dvc = dv.astype(dt)
            for si in range(sg):
                for h in range(group):
                    rs = slice((si * group + h) * sp,
                               (si * group + h) * sp + rows)
                    dqkv_ref[b + si, :, pl.ds(lo + h * hd, hd)] = dq[rs, :]
                    dqkv_ref[b + si, :, pl.ds(d + lo + h * hd, hd)] = dk[rs, :]
                    dqkv_ref[b + si, :, pl.ds(2 * d + lo + h * hd, hd)] = dvc[rs, :]
        return 0

    jax.lax.fori_loop(0, bb // sg, body, 0)


def _bwd_kernel_fused3(qkv_ref, *refs, heads, group, scale, sample_group,
                       has_bias=False, concat_dsp=True):
    """Backward with the dot count cut 5 -> 3 (the kernel body is
    issue-overhead-bound at tiny S, so fewer/bigger MXU dots win even at
    2x block-diagonal FLOP waste):

      dot1  [q | do] @ [[k,0],[0,v]]^T          -> [logits | dp]  (rows x 2rows)
      dot2  [ds | p]^T @ [q | do]               -> [[dk*, ds^T do], [p^T q, dv]]
      dot3  ds @ k                               -> dq

    dot2 contracts over the QUERY index via dot_general dim-0 contraction
    (no explicit transpose); its off-diagonal blocks are discarded waste.
    Operand concatenations are built directly in the VMEM stack scratches:
    ``lhs`` holds q|do column blocks, ``kv`` holds the block-diagonal k/v
    (its zero blocks are zeroed once per program and never overwritten), and
    ``dsp`` holds ds|p column blocks.  ``concat_dsp=False`` is the 4-dot
    variant (``bwd_fuse3=2``): dot2 splits into ds^T @ [q|do] and
    p^T @ [q|do] — one more dot issue, but no [R, 2R] VMEM concat stores."""
    bias3_ref = refs[0] if has_bias else None
    if concat_dsp:
        mask_ref, dout_ref, dqkv_ref, lhs_scr, kv_scr, dsp_scr = (
            refs[1 if has_bias else 0:])
    else:
        mask_ref, dout_ref, dqkv_ref, lhs_scr, kv_scr = (
            refs[1 if has_bias else 0:])
        dsp_scr = None
    bb, rows, three_d = qkv_ref.shape
    d = three_d // 3
    hd = d // heads
    cols = group * hd
    sg = sample_group
    nblk = group * sg
    sp = lhs_scr.shape[0] // nblk
    R = nblk * sp
    # zero the scratches once: padded-row tails AND kv's off-diagonal zero
    # blocks must be exactly 0 (they are never stored to afterwards)
    lhs_scr[...] = jnp.zeros_like(lhs_scr)
    kv_scr[...] = jnp.zeros_like(kv_scr)

    def _fill(dst, dst_col, src_ref, b, base, row0=0, bias=None):
        for si in range(sg):
            for h in range(group):
                blk = si * group + h
                sl = src_ref[b + si, :, pl.ds(base + h * hd, hd)]
                if bias is not None:
                    sl = sl + bias[0, pl.ds(base + h * hd, hd)].astype(
                        sl.dtype)[None, :]
                dst[row0 + blk * sp:row0 + blk * sp + rows,
                    dst_col:dst_col + hd] = sl

    def body(i, _):
        b = i * sg
        for gi in range(heads // group):
            lo = gi * cols
            _fill(lhs_scr, 0, qkv_ref, b, lo, bias=bias3_ref)        # q
            _fill(lhs_scr, hd, dout_ref, b, lo)                      # do
            _fill(kv_scr, 0, qkv_ref, b, d + lo, bias=bias3_ref)     # k
            _fill(kv_scr, hd, qkv_ref, b, 2 * d + lo, row0=R,
                  bias=bias3_ref)                                    # v
            lhs = lhs_scr[...]
            # dot1: [R, 2hd] x [2R, 2hd]^T -> [R, 2R] = [q k^T | do v^T]
            sc2 = jax.lax.dot_general(
                lhs, kv_scr[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = sc2[:, :R] * scale + mask_ref[...]
            dp = sc2[:, R:]
            p = jax.nn.softmax(logits, axis=-1)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dsc = ds.astype(qkv_ref.dtype)
            if concat_dsp:
                dsp_scr[:, 0:R] = dsc
                dsp_scr[:, R:2 * R] = p.astype(qkv_ref.dtype)
                # dot2: contract query index -> [2R, 2hd]; [0:R, 0:hd] =
                # ds^T q (-> dk after scale), [R:2R, hd:2hd] = p^T do (= dv)
                both = jax.lax.dot_general(
                    dsp_scr[...], lhs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dk_blk = both[0:R, 0:hd]
                dv_blk = both[R:2 * R, hd:2 * hd]
            else:
                dkq = jax.lax.dot_general(
                    dsc, lhs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [R,2hd]: [dk*|..]
                dvq = jax.lax.dot_general(
                    p.astype(qkv_ref.dtype), lhs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [R,2hd]: [..|dv]
                dk_blk = dkq[:, 0:hd]
                dv_blk = dvq[:, hd:2 * hd]
            # dot3: dq = ds @ k
            dq = jax.lax.dot_general(
                dsc, kv_scr[0:R, 0:hd], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dt = dqkv_ref.dtype
            dqv = dq.astype(dt)
            dkv = (dk_blk * scale).astype(dt)
            dvv = dv_blk.astype(dt)
            for si in range(sg):
                for h in range(group):
                    rs = slice((si * group + h) * sp,
                               (si * group + h) * sp + rows)
                    dqkv_ref[b + si, :, pl.ds(lo + h * hd, hd)] = dqv[rs, :]
                    dqkv_ref[b + si, :, pl.ds(d + lo + h * hd, hd)] = dkv[rs, :]
                    dqkv_ref[b + si, :, pl.ds(2 * d + lo + h * hd, hd)] = dvv[rs, :]
        return 0

    jax.lax.fori_loop(0, bb // sg, body, 0)


def _pick_bb(b: int, bb: int) -> int:
    while bb > 1 and b % bb:
        bb //= 2
    return max(bb, 1)


def _scratch(n, sp, group, hd, dtype):
    return [pltpu.VMEM((group * sp, hd), dtype) for _ in range(n)]


def _local_tiling(b, batch_block, sample_group):
    """(bb, sg) for a POSSIBLY SHARD-LOCAL batch: bb halves until it divides
    b, then sg drops to its largest divisor <= requested.  Under the SPMD rule
    each device re-derives this from its own shard, so the mask (whose size is
    g*sg*Sp) must be built from the SAME shard-local sg — which is why the
    locals below take the [Sp, Sp]-level bias and build the group mask
    themselves instead of receiving a globally-sized mask operand."""
    bb = _pick_bb(b, batch_block)
    sg = max(1, min(sample_group, bb))
    while bb % sg:
        sg -= 1
    return bb, sg


def _fwd_local(qkv, bias, bias3, *, heads, group, bb, sg):
    b, s, three_d = qkv.shape
    sp = _pad_seq(s)
    bb, sg = _local_tiling(b, bb, sg)
    mask = build_group_mask(sp, group * sg, bias, valid=s)
    d = three_d // 3
    hd = d // heads
    scale = hd ** -0.5
    has_bias = bias3 is not None
    in_specs = [pl.BlockSpec((bb, s, three_d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    operands = [qkv]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, three_d), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bias3)
    in_specs.append(pl.BlockSpec(mask.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(mask)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, group=group, scale=scale,
                          sample_group=sg, has_bias=has_bias),
        out_shape=jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=_scratch(3, sp, group * sg, hd, qkv.dtype),
        interpret=_interpret(),
    )(*operands)


def _bwd_local(qkv, bias, bias3, dout, *, heads, group, bb, sg, fuse3=False):
    b, s, three_d = qkv.shape
    sp = _pad_seq(s)
    bb, sg = _local_tiling(b, bb, sg)
    mask = build_group_mask(sp, group * sg, bias, valid=s)
    d = three_d // 3
    hd = d // heads
    scale = hd ** -0.5
    has_bias = bias3 is not None
    in_specs = [pl.BlockSpec((bb, s, three_d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    operands = [qkv]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, three_d), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bias3)
    in_specs.append(pl.BlockSpec(mask.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(mask)
    in_specs.append(pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(dout)
    if fuse3:
        R = group * sg * sp
        concat = int(fuse3) != 2
        kernel = functools.partial(_bwd_kernel_fused3, concat_dsp=concat)
        scratch = [pltpu.VMEM((R, 2 * hd), qkv.dtype),      # lhs = [q | do]
                   pltpu.VMEM((2 * R, 2 * hd), qkv.dtype)]  # kv block-diag
        if concat:
            scratch.append(pltpu.VMEM((R, 2 * R), qkv.dtype))  # [ds | p]
    else:
        kernel = _bwd_kernel
        scratch = _scratch(4, sp, group * sg, hd, qkv.dtype)
    return pl.pallas_call(
        functools.partial(kernel, heads=heads, group=group, scale=scale,
                          sample_group=sg, has_bias=has_bias),
        out_shape=jax.ShapeDtypeStruct((b, s, three_d), qkv.dtype),
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, s, three_d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(*operands)


def _fwd(qkv, bias, bias3, *, heads, group, bb, sg):
    """Shard-local forward with the batch-data-parallel SPMD rule: under a
    dp-sharded jit each device runs the kernel on its own batch shard (the
    [Sp, Sp] bias and the packed [1, 3D] in_proj bias are replicated)
    instead of the partitioner replicating the opaque Mosaic call — see
    ``ops/partitioning.py``.  The group mask is built INSIDE the shard-local
    call: each shard re-derives (bb, sg) from its own batch
    (``_local_tiling``), so the mask size must follow the shard-local sg,
    not the global one."""
    from .partitioning import batch_partitioned

    # plain positional wrappers: custom_partitioning resolves the callee
    # signature and rejects functools.partial keyword binding
    if bias3 is None:
        inner = lambda q_, b_: _fwd_local(q_, b_, None, heads=heads, group=group, bb=bb, sg=sg)  # noqa: E731
        return batch_partitioned(inner, batch_args=(0,))(qkv, bias)
    inner = lambda q_, b_, b3_: _fwd_local(q_, b_, b3_, heads=heads, group=group, bb=bb, sg=sg)  # noqa: E731
    return batch_partitioned(inner, batch_args=(0,))(qkv, bias, bias3)


def _bwd(qkv, bias, bias3, dout, *, heads, group, bb, sg, fuse3=False):
    from .partitioning import batch_partitioned

    if bias3 is None:
        inner = lambda q_, b_, d_: _bwd_local(q_, b_, None, d_, heads=heads, group=group, bb=bb, sg=sg, fuse3=fuse3)  # noqa: E731
        return batch_partitioned(inner, batch_args=(0, 2))(qkv, bias, dout)
    inner = lambda q_, b_, b3_, d_: _bwd_local(q_, b_, b3_, d_, heads=heads, group=group, bb=bb, sg=sg, fuse3=fuse3)  # noqa: E731
    return batch_partitioned(inner, batch_args=(0, 3))(qkv, bias, bias3, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _attend(qkv, bias, bias3, heads, group, bb, sg, group_bwd, sg_bwd, fuse3):
    return _fwd(qkv, bias, bias3, heads=heads, group=group, bb=bb, sg=sg)


def _attend_fwd(qkv, bias, bias3, heads, group, bb, sg, group_bwd, sg_bwd,
                fuse3):
    return (_fwd(qkv, bias, bias3, heads=heads, group=group, bb=bb, sg=sg),
            (qkv, bias, bias3))


def _attend_bwd(heads, group, bb, sg, group_bwd, sg_bwd, fuse3, res, g):
    qkv, bias, bias3 = res
    if int(fuse3) == 3:
        # best-of-both split (round-5 microbench): the Pallas kernel wins
        # the FORWARD at every tower shape, but XLA's backward beats every
        # swept backward-kernel tiling at S=77 — so take the XLA vjp of the
        # numerics-identical einsum formulation for the backward half.
        s = qkv.shape[1]
        bias_s = jax.lax.stop_gradient(bias[:s, :s])

        def ref(x):
            if bias3 is not None:
                x = x + bias3[0][None, None, :].astype(x.dtype)
            return xla_attention_reference(x, heads, bias_s)

        _, vjp = jax.vjp(ref, qkv)
        (dqkv,) = vjp(g.astype(qkv.dtype))
    else:
        dqkv = _bwd(qkv, bias, bias3, g.astype(qkv.dtype), heads=heads,
                    group=group_bwd, bb=bb, sg=sg_bwd, fuse3=fuse3)
    if bias3 is None:
        return dqkv, None, None
    # the absorbed in_proj bias sees every (sample, position) once, so its
    # grad is the same reduce the XLA-edge add's transpose would emit
    dbias3 = jnp.sum(dqkv, axis=(0, 1), dtype=bias3.dtype).reshape(1, -1)
    return dqkv, None, dbias3


_attend.defvjp(_attend_fwd, _attend_bwd)


def fused_tiny_attention(
    qkv: jnp.ndarray,
    heads: int,
    bias: Optional[jnp.ndarray] = None,
    head_group: int = 4,
    batch_block: int = 8,
    sample_group: int = 1,
    head_group_bwd: Optional[int] = None,
    sample_group_bwd: Optional[int] = None,
    qkv_bias: Optional[jnp.ndarray] = None,
    bwd_fuse3: int = 0,
) -> jnp.ndarray:
    """Multi-head self-attention on packed QKV for tiny sequence lengths.

    qkv: [B, S, 3*D] packed projections (q | k | v along the last axis,
    torch in_proj column order); bias: optional [S, S] additive logits bias —
    it must be a CONSTANT (the causal mask): the custom VJP does not
    propagate a bias gradient (``stop_gradient`` below makes that explicit),
    so a *learned* bias must use the XLA attention path instead.
    qkv_bias: optional [3*D] packed in_proj bias ABSORBED into the kernel:
    pass the PRE-bias product ``x @ W`` as ``qkv`` and the bias here — the
    kernel folds the add into its VMEM stack stores (with gradient), which
    deletes the separate XLA [B, S, 3D] bias-add pass from the step.
    head_group: heads fused per block-diagonal matmul (must divide
    ``heads``); batch_block: samples per kernel program; sample_group:
    samples additionally fused into the SAME block-diagonal matmul (the
    kernel body is overhead-bound at tiny S — ~6 us per [g*Sp] group dot,
    ~100x the dots' FLOP time — so fusing (sample, head) blocks into
    [sg*g*Sp, hd] operands amortizes the per-iteration cost at sg-fold
    extra block-diagonal FLOP waste; the group mask blocks cross-sample
    attention exactly the way it blocks cross-head attention).
    Returns [B, S, D] in the same layout/dtype the out_proj expects.

    The kernel reads/writes HBM at the TRUE S (Mosaic handles the
    non-sublane-multiple edge); only the VMEM scratch blocks are padded to
    the sublane multiple Sp, with zeroed tails + masked key columns keeping
    the padding inert.  Tiny-S only: the whole [bb, S, 3D] block plus the
    [sg*g*Sp, sg*g*Sp] mask must fit VMEM; callers should fall back to XLA
    attention for S > ~128 (``models/layers.py`` enforces this for the
    towers).
    """
    assert heads % head_group == 0, (heads, head_group)
    # the backward kernel body runs 6 dots vs the forward's 2, so its best
    # (head_group, sample_group) point can differ — swept separately
    assert heads % (head_group_bwd or head_group) == 0
    b, s, three_d = qkv.shape
    # the [g*sg*Sp]^2 fp32 group mask must fit scoped VMEM (~16 MB on v5e)
    # ALONGSIDE the kernel's stack intermediates — the bwd body holds ~3 more
    # rows^2 fp32 values live (logits, p, ds), so the budget per rows^2 block
    # is ~16/4 MB.  Observed failure this models: g=4 sg=4 at S=77 ->
    # rows=1280, 6.25 MB mask, Mosaic scoped-vmem OOM at 19.6 MB total.
    # Guard at 4 MB (rows <= 1024) with an actionable error instead of the
    # opaque Mosaic stack OOM.
    rows = max(head_group, head_group_bwd or head_group) * max(
        1, max(sample_group, sample_group_bwd or sample_group)) * _pad_seq(s)
    if rows * rows * 4 > 4 * 1024 * 1024:
        raise ValueError(
            f"fused_tiny_attention tiling too large: group mask would be "
            f"[{rows}, {rows}] fp32 ({rows * rows * 4 / 2**20:.1f} MB) and the "
            f"kernel stack holds ~3x that in logits/softmax intermediates — "
            f"reduce head_group x sample_group (S={s}, Sp={_pad_seq(s)})")
    assert three_d % (3 * heads) == 0
    sp = _pad_seq(s)
    # the bias crosses the SPMD boundary as a replicated [Sp, Sp] operand
    # (zeros when absent); each shard builds its own group mask from it at
    # the shard-local (bb, sg) tiling — see _fwd.
    if bias is None:
        bias_sp = jnp.zeros((sp, sp), jnp.float32)
    else:
        bias_sp = jax.lax.stop_gradient(bias).astype(jnp.float32)
        if bias_sp.shape[0] != sp:
            bias_sp = jnp.pad(bias_sp, ((0, sp - bias_sp.shape[0]),
                                        (0, sp - bias_sp.shape[1])))
    bias3 = None if qkv_bias is None else qkv_bias.reshape(1, three_d)
    return _attend(qkv, bias_sp, bias3, heads, head_group, batch_block,
                   max(1, sample_group),
                   head_group_bwd if head_group_bwd is not None else head_group,
                   max(1, sample_group_bwd if sample_group_bwd is not None
                       else sample_group),
                   bwd_fuse3)


def xla_attention_reference(qkv: jnp.ndarray, heads: int,
                            bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Plain-XLA packed-QKV attention with the kernel's exact numerics
    (fp32 logits/softmax, operand-dtype value dot) — the parity baseline
    shared by the kernel tests and tools/attn_microbench.py."""
    b, s, three_d = qkv.shape
    d = three_d // 3
    hd = d // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (t.reshape(b, s, heads, hd) for t in (q, k, v))
    logits = jnp.einsum("bqhc,bkhc->bhqk", q, k,
                        preferred_element_type=jnp.float32) * hd ** -0.5
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhc->bqhc", w.astype(qkv.dtype), v)
    return out.reshape(b, s, d)
