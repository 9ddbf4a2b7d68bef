"""Serving export: serialize the encode graphs to portable StableHLO.

The reference's deployment path is its Caffe/NNIE converter pair
(``prototype/tools/caffe_converter.py`` / NNIE tooling, SenseTime inference
silicon) — meaningless on TPU and dropped in PARITY §2.9.  This is the
TPU-native equivalent: ``jax.export`` lowers the jitted image/text encoders
to a versioned StableHLO artifact that a serving runtime (TF-Serving w/ XLA,
PyTorch/XLA, IREE, or plain ``jax.export.deserialize``) can execute without
any Python model code — params are baked as call-time arguments, shapes can
carry a symbolic batch dimension.

Artifacts (one file per graph, ``<out>/<name>.stablehlo``):

- ``encode_image``: images [B, R, R, 3] fp32 -> L2-normalized embeds [B, D]
- ``encode_text``:  tokens [B, ctx] int32 + pad_mask [B, ctx] fp32 -> [B, D]
  (for FDT models these are the codebook ``extract_*_sd_ft`` paths — what
  zeroshot/retrieval serving actually calls)

Usage::

    python -m iterated_learning_for_vlm_tpu.tools.export_serving \
        --model_config configs/clip_fdt_cc3m.yaml \
        [--pretrained <ckpt dir or .pth.tar>] --out /tmp/export \
        [--batch symbolic|N]

Round-trip: ``load_serialized(path)`` returns a callable running the
artifact on whatever backend JAX has — used by the tests to pin
export == eager numerics.
"""
from __future__ import annotations

import argparse
import os
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport


def build_encode_fns(model, params, sd_temperature: float | None = None):
    """(image_fn, text_fn) over traced (params, inputs) — FDT models encode
    through the codebook attention; plain CLIP through the towers.  Outputs
    are L2-normalized (the serving/eval convention, ``eval/encode.py``).
    ``sd_temperature=None`` keeps the model's configured codebook T (use the
    final decayed value for trained checkpoints, as eval does)."""
    is_fdt = hasattr(type(model), "extract_img_sd_ft")

    def _norm(emb):
        return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-10)

    if is_fdt:
        def image_fn(p, images):
            _, emb = model.apply({"params": p}, images,
                                 temperature=sd_temperature,
                                 method=type(model).extract_img_sd_ft)
            return _norm(emb)

        def text_fn(p, tokens, pad_mask):
            _, emb = model.apply({"params": p}, tokens, pad_mask,
                                 temperature=sd_temperature,
                                 method=type(model).extract_txt_sd_ft)
            return _norm(emb)
    else:
        def image_fn(p, images):
            return _norm(model.apply({"params": p}, images,
                                     method=type(model).encode_image))

        def text_fn(p, tokens, pad_mask):
            return _norm(model.apply({"params": p}, tokens, pad_mask,
                                     method=type(model).encode_text))
    return image_fn, text_fn


def export_encoders(model, params, *, image_size: int, context_length: int,
                    batch: Any = "symbolic", sd_temperature: float | None = None,
                    platforms: Tuple[str, ...] | None = None) -> Dict[str, bytes]:
    """Serialize both encode graphs; returns {name: stablehlo bytes}.

    ``batch="symbolic"`` exports with a symbolic leading dimension (any batch
    at serve time); an int pins a static batch (marginally faster serving,
    what you want behind a fixed-size batcher).
    """
    image_fn, text_fn = build_encode_fns(model, params, sd_temperature)

    if batch == "symbolic":
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)

    p_spec = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    img_spec = jax.ShapeDtypeStruct((b, image_size, image_size, 3), jnp.float32)
    tok_spec = jax.ShapeDtypeStruct((b, context_length), jnp.int32)
    pad_spec = jax.ShapeDtypeStruct((b, context_length), jnp.float32)

    kw = {}
    if platforms is not None:
        kw["platforms"] = list(platforms)

    out = {}
    out["encode_image"] = jexport.export(jax.jit(image_fn), **kw)(
        p_spec, img_spec).serialize()
    out["encode_text"] = jexport.export(jax.jit(text_fn), **kw)(
        p_spec, tok_spec, pad_spec).serialize()
    return out


def write_artifacts(blobs: Dict[str, bytes], out_dir: str) -> Dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, blob in blobs.items():
        path = os.path.join(out_dir, f"{name}.stablehlo")
        with open(path, "wb") as f:
            f.write(blob)
        paths[name] = path
    return paths


def load_serialized(path: str) -> Callable:
    """Deserialize an artifact into a callable (params_pytree, *inputs)."""
    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_config", required=True)
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", default="symbolic",
                    help='"symbolic" (any serve-time batch) or a static int')
    ap.add_argument("--platforms", default=None,
                    help='comma list, e.g. "tpu,cpu" (default: current backend)')
    args = ap.parse_args()

    from ..eval.model_loader import load_eval_encoder

    enc = load_eval_encoder(args.model_config, args.pretrained)
    model, params = enc.model, enc.params
    image_size, ctx = enc.image_size, enc.context_length
    batch = args.batch if args.batch == "symbolic" else int(args.batch)
    platforms = tuple(args.platforms.split(",")) if args.platforms else None

    blobs = export_encoders(model, params, image_size=image_size,
                            context_length=ctx, batch=batch,
                            platforms=platforms)
    paths = write_artifacts(blobs, args.out)
    for name, path in paths.items():
        print(f"{name}: {path} ({os.path.getsize(path)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
