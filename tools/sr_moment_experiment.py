#!/usr/bin/env python
"""A/B/C experiment: AdamW moment storage dtype vs plateau-break learning.

Trains a tiny CLIP on correlated synthetic data (the learnable regime from
the verify skill: loss must fall below ln(batch_size)) under three optimizer
configurations sharing seed, init, and data order:

  fp32      — reference numerics (moments fp32)
  bf16-rn   — moments bf16, round-to-nearest store   (the naive compression)
  bf16-sr   — moments bf16, stochastic-rounding store (the shipped default)

Motivation: on-chip, bf16-rn stalled the real-shard bs32 CLIP run at the
ln(32) contrastive plateau for all 600 steps while the fp32 twin broke out
at ~step 130 (identical seed/data; see README "optimizer state compression").
This script reproduces the phenomenon CPU-only in ~2 min and shows SR
restoring the fp32 trajectory.

Run: JAX_PLATFORMS=cpu python tools/sr_moment_experiment.py [--steps 600]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

# the axon TPU plugin can override JAX_PLATFORMS at import time; the config
# API wins (same workaround as tests/conftest.py)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from iterated_learning_for_vlm_tpu.data.synthetic import SyntheticClipData
from iterated_learning_for_vlm_tpu.models import CLIP, TextConfig, VisionConfig
from iterated_learning_for_vlm_tpu.train.loss import clip_info_nce
from iterated_learning_for_vlm_tpu.train.optim import (
    adamw_init, adamw_update, build_wd_tree, trainable_mask_tree,
)


def run_arm(name, moment_dtype, moment_rounding, params0, batches, steps, lr=5e-4):
    model = _MODEL
    wd = build_wd_tree(params0, 0.1, {"ln_w": {"weight_decay": 0},
                                      "ln_b": {"weight_decay": 0},
                                      "bias": {"weight_decay": 0},
                                      "logit_scale": {"weight_decay": 0}})
    mask = trainable_mask_tree(params0, frozenset())
    opt = adamw_init(params0, moment_dtype)

    def loss_fn(p, batch):
        out = model.apply({"params": p}, batch["image"], batch["tokens"],
                          batch.get("pad_mask"), train=True)
        loss, m = clip_info_nce(out["image_embed"], out["text_embed"],
                                out["logit_scale"])
        return loss, m

    @jax.jit
    def step(p, opt, batch):
        (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, batch)
        new_p, new_opt = adamw_update(grads, opt, p, lr=jnp.asarray(lr),
                                      wd_tree=wd, trainable=mask,
                                      moment_rounding=moment_rounding)
        return new_p, new_opt, loss, m["acc1"]

    p = params0
    trace = []
    for i in range(steps):
        batch = batches[i % len(batches)]
        p, opt, loss, acc1 = step(p, opt, batch)
        if (i + 1) % 50 == 0:
            trace.append({"step": i + 1, "loss": float(loss), "acc1": float(acc1)})
            print(f"[{name}] step {i+1}: loss {float(loss):.4f} acc1 {float(acc1):.1f}")
    return trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    global _MODEL
    v = VisionConfig(input_resolution=64, patch_size=16, width=128, layers=3,
                     heads=4, embed_dim=128)
    t = TextConfig(context_length=32, width=128, heads=4, layers=3, embed_dim=128)
    _MODEL = CLIP(vision_cfg=v, text_cfg=t)

    data = SyntheticClipData(args.batch_size, image_size=64, context_length=32,
                             seed=3, num_batches=40, correlated=True,
                             num_classes=16, noise_scale=0.2)
    batches = []
    for i, b in zip(range(40), iter(data)):
        batches.append({k: jnp.asarray(v) for k, v in b.items()
                        if k in ("image", "tokens", "pad_mask")})

    params0 = _MODEL.init(jax.random.PRNGKey(0), batches[0]["image"][:2],
                          batches[0]["tokens"][:2],
                          batches[0]["pad_mask"][:2])["params"]

    results = {}
    results["fp32"] = run_arm("fp32", None, "nearest", params0, batches, args.steps)
    results["bf16-rn"] = run_arm("bf16-rn", jnp.bfloat16, "nearest", params0,
                                 batches, args.steps)
    results["bf16-sr"] = run_arm("bf16-sr", jnp.bfloat16, "stochastic", params0,
                                 batches, args.steps)

    plateau = math.log(args.batch_size)
    print(f"\ncontrastive plateau ln({args.batch_size}) = {plateau:.4f}")
    for name, tr in results.items():
        print(f"{name:8s} final loss {tr[-1]['loss']:.4f} acc1 {tr[-1]['acc1']:.1f}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
