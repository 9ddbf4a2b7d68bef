"""Feature extraction / dump tool.

Parity target: reference ``prototype/tools/inference.py`` (feature dump +
visualization on the legacy solver): run a checkpointed model over a dataset
and write embeddings (and optionally FDT attention weights) to an ``.npz``.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def dump_features(encoder, images=None, texts=None, out_path="features.npz"):
    arrays = {}
    if images is not None:
        arrays["image_embeds"] = encoder.encode_images(images)
    if texts is not None:
        arrays["text_embeds"] = encoder.encode_texts(list(texts))
    np.savez(out_path, **arrays)
    return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_config", required=True)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--image_dir", default=None)
    p.add_argument("--captions_file", default=None, help="one caption per line")
    p.add_argument("--out", default="features.npz")
    p.add_argument("--batch_size", type=int, default=64)
    args = p.parse_args()

    from iterated_learning_for_vlm_tpu.eval.model_loader import load_eval_encoder

    encoder = load_eval_encoder(args.model_config, args.pretrained,
                                batch_size=args.batch_size)
    images = None
    if args.image_dir:
        from PIL import Image

        images = [
            Image.open(os.path.join(args.image_dir, f)).convert("RGB")
            for f in sorted(os.listdir(args.image_dir))
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".webp"))
        ]
    texts = None
    if args.captions_file:
        with open(args.captions_file, encoding="utf-8") as f:
            texts = [l.strip() for l in f if l.strip()]
    path = dump_features(encoder, images, texts, args.out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
