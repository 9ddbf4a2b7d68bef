#!/usr/bin/env python
"""Codebook visualization sweep driver.

Parity target: reference ``example/clip_fdt/visualization.py:405-443`` —
build the solver's model, load a checkpoint, sweep the dataset with the
UNSHUFFLED wds loader keeping per-code top-k images/texts by attention
weight, and render per-code PNG grids / caption JSON.

Usage::

  python tools/run_codebook_viz.py --config configs/clip_fdt_shards_tpu.yaml \
      --ckpt <ckpt_dir> --out /tmp/code_viz [--batches 8] [--topk 8]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--topk", type=int, default=8)
    p.add_argument("--max_codes", type=int, default=32,
                   help="render at most this many (most-active) codes")
    args = p.parse_args()

    from iterated_learning_for_vlm_tpu import enable_compilation_cache
    from iterated_learning_for_vlm_tpu.data.pipeline import get_unshuffled_wds_dataset
    from iterated_learning_for_vlm_tpu.data.tokenizer import get_tokenizer
    from iterated_learning_for_vlm_tpu.eval.model_loader import load_eval_encoder
    from iterated_learning_for_vlm_tpu.tools.visualization import (
        dump_text_codes, render_code_grid, sweep_image_codes, sweep_text_codes,
    )
    from iterated_learning_for_vlm_tpu.utils.config import load_config

    enable_compilation_cache()
    config = load_config(args.config)
    encoder = load_eval_encoder(args.config, args.ckpt)
    model = encoder.model
    sd_num = model.fdt_cfg.sd_num

    tok = get_tokenizer()
    dcfg = dict(config.data["train"])
    dcfg["workers"] = 0
    data = get_unshuffled_wds_dataset(dcfg, tokenizer=tok)

    # params passed as a traced ARG (closing over them would inline 150M
    # weights as HLO constants — exceeds the remote-compile request limit)
    img_maps = jax.jit(lambda pr, im: model.apply(
        {"params": pr}, im, method="extract_img_sd_ft", return_token_att=True))
    img_weight = jax.jit(lambda pr, im: model.apply(
        {"params": pr}, im, method="extract_img_sd_ft"))
    txt_weight = jax.jit(lambda pr, tk, pm: model.apply(
        {"params": pr}, tk, pm, method="extract_txt_sd_ft"))

    batches, texts = [], []
    for i, batch in enumerate(data.dataloader):
        if i >= args.batches:
            break
        batches.append(batch)
        texts.append([tok.decode([int(t) for t in row if int(t)])
                      for row in np.asarray(batch["tokens"])])

    def img_fn(images):
        token_att, _ = img_maps(encoder.params, images)
        att_weight, _ = img_weight(encoder.params, images)
        return np.asarray(token_att), np.asarray(att_weight)

    def txt_fn(tokens, pad_mask):
        att_weight, _ = txt_weight(encoder.params, tokens, pad_mask)
        return None, np.asarray(att_weight)

    tracker = sweep_image_codes(img_fn, batches, num_codes=sd_num, k=args.topk)
    active = tracker.active_codes(min_items=2)
    # most-active first
    active = sorted(active, key=lambda c: -len(tracker.top(c)))[: args.max_codes]
    os.makedirs(args.out, exist_ok=True)
    n = 0
    for code in active:
        if render_code_grid(tracker, code, args.out):
            n += 1
    print(f"rendered {n} image-code grids to {args.out}")

    ttracker = sweep_text_codes(txt_fn, batches, texts, num_codes=sd_num,
                                k=args.topk)
    out_json = os.path.join(args.out, "text_codes.json")
    dump_text_codes(ttracker, out_json, min_items=2)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
