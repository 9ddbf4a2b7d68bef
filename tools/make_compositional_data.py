#!/usr/bin/env python
"""Export the compositional colored-shapes task: train shards + eval probes.

Train: wds tar shards (CC3M layout, jpg+txt) of SEEN (color, shape) pairs
only (``data/compositional.py:is_held_out`` split).

Eval: SugarCREPE-format probes (``eval/sugar_crepe.py`` JSON contract) over
freshly drawn images:

- ``replace_att_unseen`` / ``replace_obj_unseen``: UNSEEN-pair images;
  positive caption names the true unseen composition, negative swaps
  color/shape to a SEEN composition — above-chance accuracy requires
  compositional binding, not pair memorization (the paper's claim).
- ``replace_att_seen`` / ``replace_obj_seen``: seen-pair control at matched
  difficulty.

Usage:
  python tools/make_compositional_data.py /tmp/ilvlm_comp \
      --shards 8 --per-shard 500 --eval-per-split 256
"""
import argparse
import io
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from iterated_learning_for_vlm_tpu.data.compositional import (  # noqa: E402
    COLOR_NAMES, SHAPES, caption_for, draw, negative_pair, seen_pairs,
    to_uint8, unseen_pairs,
)
from iterated_learning_for_vlm_tpu.data.shards import write_tar_shard  # noqa: E402


def _jpeg(img_u8: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(img_u8).save(buf, format="JPEG", quality=92)
    return buf.getvalue()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--per-shard", type=int, default=500)
    p.add_argument("--image-size", type=int, default=160)
    p.add_argument("--eval-per-split", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fold", type=int, default=4)
    args = p.parse_args()

    train_dir = os.path.join(args.out_dir, "train")
    eval_dir = os.path.join(args.out_dir, "eval")
    img_dir = os.path.join(eval_dir, "images")
    for d in (train_dir, eval_dir, img_dir):
        os.makedirs(d, exist_ok=True)

    seen = seen_pairs(args.fold)
    unseen = unseen_pairs(args.fold)
    print(f"compositions: {len(seen)} seen / {len(unseen)} unseen "
          f"({len(COLOR_NAMES)} colors x {len(SHAPES)} shapes)")

    # ---- train shards (seen pairs only) -----------------------------------
    rng = np.random.default_rng(args.seed)
    k = 0
    for s in range(args.shards):
        samples = []
        for _ in range(args.per_shard):
            c, sh = seen[int(rng.integers(0, len(seen)))]
            img = draw(c, sh, args.image_size, rng)
            samples.append({
                "__key__": f"{k:08d}",
                "jpg": _jpeg(to_uint8(img)),
                "txt": caption_for(COLOR_NAMES[c], SHAPES[sh]).encode(),
            })
            k += 1
        path = os.path.join(train_dir, f"{s:05d}.tar")
        write_tar_shard(path, iter(samples))
        print(f"wrote {path}")

    # ---- eval probes (fresh noise stream) ---------------------------------
    ev_rng = np.random.default_rng((args.seed, 0xC0117))
    specs = [
        ("replace_att_unseen", unseen, "color"),
        ("replace_obj_unseen", unseen, "shape"),
        ("replace_att_seen", seen, "color"),
        ("replace_obj_seen", seen, "shape"),
    ]
    for split, pool, swap in specs:
        data = {}
        for i in range(args.eval_per_split):
            c, sh = pool[i % len(pool)]
            img = draw(c, sh, args.image_size, ev_rng)
            fname = f"{split}_{i:05d}.jpg"
            Image.fromarray(to_uint8(img)).save(
                os.path.join(img_dir, fname), format="JPEG", quality=92)
            nc, nsh = negative_pair(c, sh, swap, ev_rng, args.fold)
            data[str(i)] = {
                "filename": fname,
                "caption": caption_for(COLOR_NAMES[c], SHAPES[sh]),
                "negative_caption": caption_for(COLOR_NAMES[nc], SHAPES[nsh]),
            }
        with open(os.path.join(eval_dir, f"{split}.json"), "w") as f:
            json.dump(data, f)
        print(f"wrote {split}.json ({len(data)} items)")
    meta = {"seed": args.seed, "fold": args.fold, "image_size": args.image_size,
            "shards": args.shards, "per_shard": args.per_shard,
            "num_samples": args.shards * args.per_shard,
            "seen": len(seen), "unseen": len(unseen)}
    with open(os.path.join(args.out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
