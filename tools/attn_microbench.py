"""Same-process microbench of fused_tiny_attention (g, sg) tilings on TPU.

Times fwd and fwd+bwd of a single attention call at the CLIP tower shapes
against the XLA einsum path, in ONE process (TPU timing baselines drift
between processes; only same-process comparisons are meaningful).

Measured (v5e, bs256, round 2.1) — ms per call:
  vision (S=50, H=12):  xla 2.21/3.09   g4sg1 1.67/2.42   g2sg2 1.52/2.07 <- ships
  text (S=77, H=8, causal): xla 1.74/2.16  best fused g2sg4 1.60/2.24 -> XLA ships
  bwd-only sweep (fwd pinned g2sg2): bwd g2sg2 1.91 <- best; g4sg1 1.94,
  g4sg2 2.00, g2sg4 2.09, g6sg2 2.33, g12sg1 2.34, g4sg4 2.47, g6sg4 VMEM-OOM
  — the forward tiling point is also the backward optimum.

Round 2.2 recheck (kernel now reads/writes at TRUE S, no 77->80 pad pass):
  text still ties/loses — xla 1.68/2.12 vs best fused fwd+bwd 2.15
  (g2sg2, g1sg4); the text tower stays on the XLA path.

Round 5 (`fuse3` mode) closes the S=77 question with numbers: vs XLA's
1.771 ms/layer fwd+bwd, the 5-dot Pallas backward loses at every (g, sg,
bb) tiling (best 1.93); the 3-dot block-concatenated backward body and the
4-dot no-concat variant both lose (2.02+ — the extra block-diagonal FLOPs
and wider operand stores outweigh the saved dot-issue overhead); the
hybrid Pallas-forward/XLA-backward split (bwd_fuse3=3) reaches 1.760 —
parity within run-to-run noise (the kernel wins the forward alone, 1.247
vs 1.329, but the custom_vjp boundary eats the margin).  Full-context text
stays on XLA; vision keeps the all-Pallas kernel (1.85 vs 2.82).  The
README "ctx-77 roofline" section carries the full accounting.

Usage: python tools/attn_microbench.py [vision|text|bwd|fuse3|xla77|text77]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from iterated_learning_for_vlm_tpu.ops.fused_attention import (
    fused_tiny_attention, xla_attention_reference,
)




def timeit(fn, *args, steps=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])  # host fence
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def sweep(name, b, s, heads, hd, causal, configs):
    d = heads * hd
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * d)), jnp.bfloat16)
    bias = (jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)
            if causal else None)

    def grad_of(f):
        return jax.jit(jax.grad(lambda x: jnp.sum(f(x).astype(jnp.float32))))

    xf = jax.jit(lambda x: xla_attention_reference(x, heads, bias))
    print(f"-- {name}: B={b} S={s} H={heads} hd={hd} causal={causal}")
    print(f"   xla      : fwd {timeit(xf, qkv):7.3f} ms   "
          f"fwd+bwd {timeit(grad_of(lambda x: xla_attention_reference(x, heads, bias)), qkv):7.3f} ms")
    for cfg in configs:
        g, sg = cfg[:2]
        bb = cfg[2] if len(cfg) > 2 else 8
        f = jax.jit(lambda x, g=g, sg=sg, bb=bb: fused_tiny_attention(
            x, heads, bias=bias, head_group=g, sample_group=sg, batch_block=bb))
        fb = grad_of(lambda x, g=g, sg=sg, bb=bb: fused_tiny_attention(
            x, heads, bias=bias, head_group=g, sample_group=sg, batch_block=bb))
        print(f"   g={g:<2} sg={sg:<2} bb={bb:<3}: fwd {timeit(f, qkv):7.3f} ms   "
              f"fwd+bwd {timeit(fb, qkv):7.3f} ms", flush=True)


def sweep_bwd(name, b, s, heads, hd, causal, fwd_cfg, bwd_configs):
    """Fix the fwd tiling at the shipping point, sweep the BACKWARD kernel's
    (head_group_bwd, sample_group_bwd) — its body runs 6 dots vs fwd's 2, so
    the optimum can differ."""
    d = heads * hd
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * d)), jnp.bfloat16)
    bias = (jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)
            if causal else None)
    gf, sf = fwd_cfg
    print(f"-- {name} bwd sweep: fwd tiling g={gf} sg={sf}")
    for g, sg in bwd_configs:
        fb = jax.jit(jax.grad(lambda x, g=g, sg=sg: jnp.sum(fused_tiny_attention(
            x, heads, bias=bias, head_group=gf, sample_group=sf,
            head_group_bwd=g, sample_group_bwd=sg).astype(jnp.float32))))
        print(f"   bwd g={g:<2} sg={sg:<2}: fwd+bwd {timeit(fb, qkv):7.3f} ms",
              flush=True)


def xla_variant(qkv, heads, bias, how):
    """Alternative XLA einsum formulations of the same attention — probes
    whether the score-tensor layout choice (the [B,H,S,S] canonical form
    forces [B,S,H,hd]<->[B,H,S,hd] transposes, ~18 ms/step of "data
    formatting" in the round-2 profile) can be avoided without Pallas."""
    b, s, three_d = qkv.shape
    d = three_d // 3
    hd = d // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (t.reshape(b, s, heads, hd) for t in (q, k, v))
    scale = hd ** -0.5
    if how == "bhqk":  # canonical (== xla_attention_reference)
        logits = jnp.einsum("bqhc,bkhc->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhc->bqhc", w.astype(qkv.dtype), v)
    elif how == "bqhk":  # head-minor scores: no [B,H,S,hd] operand layout
        logits = jnp.einsum("bqhc,bkhc->bqhk", q, k,
                            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)[:, None, :]
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bqhk,bkhc->bqhc", w.astype(qkv.dtype), v)
    elif how == "bqkh":  # head-last scores: softmax over a strided axis
        logits = jnp.einsum("bqhc,bkhc->bqkh", q, k,
                            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)[:, :, None]
        w = jax.nn.softmax(logits, axis=2)
        out = jnp.einsum("bqkh,bkhc->bqhc", w.astype(qkv.dtype), v)
    else:
        raise ValueError(how)
    return out.reshape(b, s, d)


def sweep_xla_variants(name, b, s, heads, hd, causal):
    d = heads * hd
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * d)), jnp.bfloat16)
    bias = (jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)
            if causal else None)

    def grad_of(f):
        return jax.jit(jax.grad(lambda x: jnp.sum(f(x).astype(jnp.float32))))

    print(f"-- {name} XLA layout variants: B={b} S={s} H={heads} hd={hd}")
    for how in ("bhqk", "bqhk", "bqkh"):
        f = jax.jit(lambda x, how=how: xla_variant(x, heads, bias, how))
        fb = grad_of(lambda x, how=how: xla_variant(x, heads, bias, how))
        print(f"   {how}: fwd {timeit(f, qkv):7.3f} ms   "
              f"fwd+bwd {timeit(fb, qkv):7.3f} ms", flush=True)


def sweep_fuse3(name, b, s, heads, hd, causal, configs):
    """A/B the 5-dot vs 3-dot backward kernel bodies (round 5): same fwd,
    bwd_fuse3 flips the backward to the block-concatenated 3-dot form."""
    d = heads * hd
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * d)), jnp.bfloat16)
    bias = (jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)
            if causal else None)

    def grad_of(f):
        return jax.jit(jax.grad(lambda x: jnp.sum(f(x).astype(jnp.float32))))

    print(f"-- {name} fuse3 A/B: B={b} S={s} H={heads} hd={hd} causal={causal}")
    fbx = grad_of(lambda x: xla_attention_reference(x, heads, bias))
    print(f"   xla          : fwd+bwd {timeit(fbx, qkv):7.3f} ms")
    for cfg in configs:
        g, sg = cfg[:2]
        bb = cfg[2] if len(cfg) > 2 else 8
        for fuse3 in (0, 3):
            fb = grad_of(lambda x, g=g, sg=sg, bb=bb, f3=fuse3:
                         fused_tiny_attention(
                             x, heads, bias=bias, head_group=g,
                             sample_group=sg, batch_block=bb,
                             bwd_fuse3=f3))
            try:
                ms = timeit(fb, qkv)
            except Exception as e:  # VMEM guard / Mosaic OOM
                print(f"   g={g:<2} sg={sg:<2} bb={bb:<3} fuse3={int(fuse3)}: "
                      f"FAIL {type(e).__name__}", flush=True)
                continue
            print(f"   g={g:<2} sg={sg:<2} bb={bb:<3} fuse3={int(fuse3)}: "
                  f"fwd+bwd {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "vision"
    if which == "vision":
        sweep("vision", 256, 50, 12, 64, False,
              [(4, 1), (4, 2), (2, 2), (2, 4), (4, 4), (6, 2), (12, 1)])
    elif which == "bwd":
        sweep_bwd("vision", 256, 50, 12, 64, False, (2, 2),
                  [(2, 2), (4, 2), (2, 4), (4, 4), (6, 2), (4, 1), (12, 1), (6, 4)])
    elif which == "xla77":
        sweep_xla_variants("text77", 256, 77, 8, 64, True)
        sweep_xla_variants("vision50", 256, 50, 12, 64, False)
    elif which == "fuse3":
        sweep_fuse3("text77", 256, 77, 8, 64, True,
                    [(2, 2), (2, 4), (4, 2), (2, 2, 16), (2, 4, 16),
                     (8, 1), (4, 1), (2, 1)])
        sweep_fuse3("vision50", 256, 50, 12, 64, False,
                    [(2, 2), (4, 2), (2, 4), (4, 1)])
    elif which == "text77":
        # round-4 recheck at S=77 incl. large fused groups + batch_block
        sweep("text", 256, 77, 8, 64, True,
              [(2, 2), (2, 4), (4, 2), (4, 4), (8, 1), (8, 2), (2, 8), (1, 8),
               (2, 4, 16), (2, 4, 32), (4, 4, 16), (2, 8, 16), (2, 2, 32)])
    else:
        sweep("text", 256, 77, 8, 64, True,
              [(2, 1), (2, 2), (4, 2), (1, 4), (2, 4), (8, 1)])
