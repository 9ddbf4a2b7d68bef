#!/usr/bin/env python
"""Serving-throughput benchmark: jitted encode paths on the real chip.

The reference has no serving story at all (its ``prototype/tools/
inference.py`` loops un-batched torch forward passes); this tool measures
the deployment-relevant numbers for the TPU stack — zero-shot/retrieval
serving is a pure encode workload:

- ``image``: CLIP-FDT ViT-B/32 image embeddings (the `extract_img_sd_ft`
  codebook path — what eval/serving actually calls)
- ``text``:  CLIP-FDT text embeddings (`extract_txt_sd_ft`)
- ``clip_image`` / ``clip_text``: the baseline CLIP towers

Each row: batch size, embeddings/sec/chip, amortized ms per batch.  bf16
activations, fused kernels on (the shipping config).  Run on the chip:

    python tools/bench_serve.py [--batch-sizes 32,128,256,512]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from iterated_learning_for_vlm_tpu import enable_compilation_cache  # noqa: E402
from iterated_learning_for_vlm_tpu.models import model_entry  # noqa: E402

enable_compilation_cache()


def fdt_model():
    from bench import model_cfg

    return model_entry(model_cfg(remat=False, fused=True, flash=False,
                                 unroll=True, fused_attn=True))


def clip_model():
    return model_entry({
        "type": "clip_vitb32",
        "kwargs": {
            "dtype": "bfloat16", "unroll": True,
            "image_encode": {"embed_dim": 512, "fused_attn": True},
            "text_encode": {"embed_dim": 512},
        },
    })


def time_fn(fn, args, steps=30, warmup=3):
    """Amortized seconds/call.  A device->host transfer of the last output is
    the fence (``block_until_ready`` does not fence over the RPC transport,
    see bench.py:120); the device executes dispatches in order, so draining
    the final result waits for the whole window."""
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0][:1, :1])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0][:1, :1])
    return (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-sizes", default="32,128,256,512")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--text-ctxs", default="16,32",
                   help="extra bucketed text-context rows (JitEncoder "
                        "text_buckets); empty string disables")
    p.add_argument("--out", default="serve_bench.json",
                   help="results filename under results/")
    p.add_argument("--cast-weights", action="store_true",
                   help="add image/text rows with matmul weights pre-cast to "
                        "bf16 (JitEncoder weight_dtype; bitwise-exact "
                        "outputs, halved weight HBM reads)")
    args = p.parse_args()
    sizes = [int(s) for s in args.batch_sizes.split(",")]
    args.text_ctxs = [int(c) for c in args.text_ctxs.split(",") if c]

    rng = np.random.default_rng(0)
    results = []

    for name, build in (("fdt", fdt_model), ("clip", clip_model)):
        model = build()
        img2 = jnp.asarray(rng.standard_normal((2, 224, 224, 3), dtype=np.float32))
        tok2 = jnp.asarray(rng.integers(1, 49407, (2, 77)), jnp.int32)
        pad2 = jnp.zeros((2, 77), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), img2, tok2, pad2)["params"]
        cast_params = None
        if args.cast_weights:
            from iterated_learning_for_vlm_tpu.eval.encode import (
                serving_cast_params,
            )

            cast_params = serving_cast_params(params)

        if name == "fdt":
            img_fn = jax.jit(lambda p, x: model.apply(
                {"params": p}, x, temperature=125.0,
                method=type(model).extract_img_sd_ft))
            txt_fn = jax.jit(lambda p, t, m: model.apply(
                {"params": p}, t, m, temperature=125.0,
                method=type(model).extract_txt_sd_ft))
        else:
            img_fn = jax.jit(lambda p, x: model.apply(
                {"params": p}, x, method=type(model).encode_image))
            txt_fn = jax.jit(lambda p, t, m: model.apply(
                {"params": p}, t, m, method=type(model).encode_text))

        for bs in sizes:
            img = jnp.asarray(rng.standard_normal((bs, 224, 224, 3), dtype=np.float32))
            tok = jnp.asarray(rng.integers(1, 49407, (bs, 77)), jnp.int32)
            pad = jnp.zeros((bs, 77), jnp.float32)

            s = time_fn(lambda pr, x: img_fn(pr, x), (params, img), steps=args.steps)
            results.append({"model": name, "path": "image", "batch": bs,
                            "embeds_per_sec": round(bs / s, 1),
                            "batch_ms": round(s * 1e3, 2)})
            print(json.dumps(results[-1]), flush=True)

            if cast_params is not None:
                s = time_fn(lambda pr, x: img_fn(pr, x), (cast_params, img),
                            steps=args.steps)
                results.append({"model": name, "path": "image_bf16w",
                                "batch": bs, "embeds_per_sec": round(bs / s, 1),
                                "batch_ms": round(s * 1e3, 2)})
                print(json.dumps(results[-1]), flush=True)
                s = time_fn(lambda pr, t, m: txt_fn(pr, t, m),
                            (cast_params, tok, pad), steps=args.steps)
                results.append({"model": name, "path": "text_bf16w",
                                "batch": bs, "embeds_per_sec": round(bs / s, 1),
                                "batch_ms": round(s * 1e3, 2)})
                print(json.dumps(results[-1]), flush=True)

            s = time_fn(lambda pr, t, m: txt_fn(pr, t, m), (params, tok, pad),
                        steps=args.steps)
            results.append({"model": name, "path": "text", "batch": bs,
                            "embeds_per_sec": round(bs / s, 1),
                            "batch_ms": round(s * 1e3, 2)})
            print(json.dumps(results[-1]), flush=True)

            # bucketed text contexts (JitEncoder text_buckets: real serving
            # prompts are mostly <16 BPE tokens; exact, see
            # tests/test_context_bucketing.py)
            for ctx in args.text_ctxs:
                tok_c = tok[:, :ctx]
                pad_c = pad[:, :ctx]
                s = time_fn(lambda pr, t, m: txt_fn(pr, t, m),
                            (params, tok_c, pad_c), steps=args.steps)
                results.append({"model": name, "path": f"text_ctx{ctx}",
                                "batch": bs,
                                "embeds_per_sec": round(bs / s, 1),
                                "batch_ms": round(s * 1e3, 2)})
                print(json.dumps(results[-1]), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                       "results", args.out)
    with open(os.path.abspath(out), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
