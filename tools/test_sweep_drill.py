#!/usr/bin/env python
"""Dress rehearsal of the reference's FULL test.sh workflow (VERDICT r4 #3).

The reference's actual usage loop trains with periodic checkpoints, then
sweeps EVERY checkpoint through all four eval task families and aggregates
one table (``/root/reference/test.sh:19-97`` ITER sweep + ``outtable.py``).
This drill executes that loop end-to-end on chip with generated data:

1. data: real wds train shards (224px JPEG, class-correlated captions),
   a held-out classification eval set, a retrieval eval set, SugarCREPE-
   format probe JSONs (7 reference split names over held-out images),
   a COLA-format 2x2 group JSON, and a CREPE-productivity-format CSV with
   5 hard negatives per row — every family's on-disk contract is the
   reference one, populated from the synthetic class generator.
2. train: flagship CLIP-FDT ViT-B/32 (4096-code codebook) for --steps
   (default 5000) with save_freq ckpts and an in-window IL reset schedule.
3. sweep: ``scripts/test.py`` for compositionality / retrieval /
   recognition / probing over the full ckpt_* sweep (newest first, like
   test.sh's ITER loop).
4. aggregate: ``eval/outtable.py`` over the per-ckpt JSONs; everything is
   copied into results/test_sweep_r5/ with a summary.json.

Usage: python tools/test_sweep_drill.py [--root /tmp/ilvlm_dress]
           [--steps 5000] [--save-freq 1000] [--skip-train]
"""
import argparse
import csv
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIG = """\
model:
    type: clip_fdt_vitb32
    kwargs:
        dtype: bfloat16
        unroll: true
        image_encode: {{embed_dim: 512, fused_attn: true}}
        text_encode: {{embed_dim: 512}}
        fdt:
            sd_temperature: 1000
            att_func_type: 'sparsemax'
            pool_type: 'max'
            sd_num: 4096
            sd_dim: 512
            raw_img_ft_dim: 768
            raw_txt_ft_dim: 512
            sparsemax_method: 'bisect'
            use_fused_kernel: true

grad_clip: {{type: logit_scale_param_value, value: 3, max_value: 6}}

# decay_iter sized so T floors (~1.0) around 0.6*steps; lr 0.0002 is the
# PROVEN healthy setting at this synthetic scale — the A/B study's 0.0005
# no-IL arms degenerate to exact ln(bs) loss (dead sparsemax gradients)
# past ~700 steps, and a first dress attempt at 0.0005 collapsed the same
# way by step 900 (loss pinned at 4.1589 = ln 64, acc 0, for 800+ steps).
t_decay: {{org_t: 1000, sd_T_decay_iter: 300, sd_T_decay_w: 0.5, sd_T_min: 1.0}}

optimizer:
    type: AdamW
    kwargs: {{lr: 0.0002, weight_decay: 0.1, betas: [0.9, 0.98], eps: 0.00000001}}
    pconfig:
        ln_w: {{weight_decay: 0}}
        ln_b: {{weight_decay: 0}}
        bias: {{weight_decay: 0}}
        logit_scale: {{weight_decay: 0}}

lr_scheduler:
    type: Cosine
    kwargs: {{base_lr: 0.0002, warmup_lr: 0.0002, min_lr: 0.0,
             warmup_steps: 100, max_iter: {steps}}}

data:
    train:
        epoch: 100
        data_path: {shards}/{{00000..00007}}.tar
        transforms: ONECROP      # MOCOV2 crops destroy the synthetic pattern
        num_samples: 12000
        num_shards: 8
        workers: 4
        batch_size: 64
        context_buckets: [32, 77]

saver: {{print_freq: 100, val_freq: 0, save_freq: {save_freq}, save_many: True}}

reset:
    enable: True
    reset_steps: {reset_steps}
    reset_nums: 4
    smooth_steps: {smooth_steps}
    distil_steps: 0
    semantics: reference
    reset_optimizer_state: true
    freeze_vision_during_smooth: true
"""

WORDS_PROBE = ("crimson", "hollow", "gentle", "orbital")


def _save_jpg(arr01, path):
    arr = np.clip((arr01 * 0.25 + 0.5) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path, format="JPEG", quality=90)


def make_probe_data(root, num_classes=64, per_split=128, seed=0,
                    noise_seed=991, image_size=224):
    """SugarCREPE/COLA/CREPE-format probe sets from the synthetic classes.

    Positives are the exact training captions; negatives are
    split-dependent perturbations (other-class captions for replace_*,
    in-caption word swaps for swap_*, appended distractor words for
    add_*).  Images are fresh noise draws of the class pattern (held out
    from training via the noise stream)."""
    from iterated_learning_for_vlm_tpu.data.synthetic import SyntheticClipData

    gen = SyntheticClipData(batch_size=1, image_size=image_size, seed=seed,
                            correlated=True, num_classes=num_classes)
    rng = np.random.default_rng(noise_seed)
    img_root = os.path.join(root, "probe_images")
    os.makedirs(img_root, exist_ok=True)
    sc_root = os.path.join(root, "sugar_crepe")
    os.makedirs(sc_root, exist_ok=True)

    caps = [gen._class_caption(k) for k in range(num_classes)]
    fn = {}
    for k in range(num_classes):
        name = f"cls{k:03d}.jpg"
        _save_jpg(gen._class_image(k, rng), os.path.join(img_root, name))
        fn[k] = name

    def neg_for(split, k):
        words = caps[k].split()  # a photo of W1 W2 number k
        if split.startswith("replace"):
            other = (k + 1 + int(rng.integers(0, num_classes - 1))) % num_classes
            if split == "replace_obj":
                return caps[other]
            w2 = caps[other].split()[4]  # foreign attribute word
            return " ".join(words[:4] + [w2] + words[5:])
        if split.startswith("swap"):
            return " ".join(words[:3] + [words[4], words[3]] + words[5:])
        extra = WORDS_PROBE[int(rng.integers(0, len(WORDS_PROBE)))]
        return " ".join(words + [extra])

    for split in ("add_obj", "add_att", "replace_obj", "replace_att",
                  "replace_rel", "swap_obj", "swap_att"):
        items = {}
        for i in range(per_split):
            k = int(rng.integers(0, num_classes))
            items[str(i)] = {"filename": fn[k], "caption": caps[k],
                             "negative_caption": neg_for(split, k)}
        with open(os.path.join(sc_root, f"{split}.json"), "w") as f:
            json.dump(items, f)

    # COLA: [img0, cap0, img1, cap1] quadruples from class pairs
    cola = []
    for i in range(64):
        a = int(rng.integers(0, num_classes))
        b = (a + 1 + int(rng.integers(0, num_classes - 1))) % num_classes
        cola.append([fn[a], caps[a], fn[b], caps[b]])
    with open(os.path.join(root, "cola.json"), "w") as f:
        json.dump(cola, f)

    # CREPE productivity CSV: positive + 5 other-class hard negatives
    crepe_root = os.path.join(root, "crepe")
    os.makedirs(os.path.join(crepe_root, "prod_hard_negatives", "swap"),
                exist_ok=True)
    path = os.path.join(crepe_root, "prod_hard_negatives", "swap",
                        "prod_vg_hard_negs_swap_complexity_5.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image_id", "caption", "hard_negs"])
        for i in range(128):
            k = int(rng.integers(0, num_classes))
            negs = []
            while len(negs) < 5:
                o = int(rng.integers(0, num_classes))
                if o != k and caps[o] not in negs:
                    negs.append(caps[o])
            w.writerow([f"cls{k:03d}", caps[k], repr(negs)])
    return sc_root, img_root


def sh(cmd, log_path, timeout=7200):
    print("+", " ".join(cmd), flush=True)
    with open(log_path, "w") as log:
        rc = subprocess.run(cmd, cwd=REPO, stdout=log, stderr=log,
                            timeout=timeout).returncode
    if rc != 0:
        print(open(log_path).read()[-4000:])
        raise SystemExit(f"command failed rc={rc}: {cmd}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/ilvlm_dress")
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--save-freq", type=int, default=1000)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "results",
                                                  "test_sweep_r5"))
    args = ap.parse_args()
    t0 = time.time()
    os.makedirs(args.root, exist_ok=True)

    # ---- 1. data -----------------------------------------------------------
    shards = os.path.join(args.root, "shards")
    if not os.path.exists(os.path.join(shards, "00007.tar")):
        sh([sys.executable, "tools/make_train_shards.py", shards,
            "--shards", "8", "--per-shard", "1500"],
           os.path.join(args.root, "mkshards.log"))
    cls_root = os.path.join(args.root, "eval_cls")
    if not os.path.exists(os.path.join(cls_root, "test", "nshards.txt")):
        sh([sys.executable, "tools/make_eval_set.py", cls_root,
            "--per-class", "4"], os.path.join(args.root, "mkcls.log"))
    if not os.path.exists(os.path.join(cls_root, "train", "nshards.txt")):
        # linear probing fits its head on the dataset's train split
        # (reference cli.py --train_split); held out via a distinct noise
        # stream, same class prototypes
        sh([sys.executable, "tools/make_eval_set.py", cls_root,
            "--split", "train", "--per-class", "8", "--noise-seed", "778"],
           os.path.join(args.root, "mkcls_train.log"))
    retr_root = os.path.join(args.root, "eval_retr")
    if not os.path.exists(os.path.join(retr_root, "test", "nshards.txt")):
        from iterated_learning_for_vlm_tpu.data.synthetic import SyntheticClipData
        from iterated_learning_for_vlm_tpu.data.wds_export import (
            export_retrieval_dataset,
        )
        gen = SyntheticClipData(batch_size=1, image_size=224, seed=0,
                                correlated=True, num_classes=64)
        rng = np.random.default_rng(775)

        def rsamples():
            for k in range(64):
                arr = gen._class_image(k, rng)
                arr = np.clip((arr * 0.25 + 0.5) * 255.0, 0, 255).astype(np.uint8)
                yield Image.fromarray(arr), [gen._class_caption(k)]

        export_retrieval_dataset(retr_root, "test", rsamples())
    sc_root = os.path.join(args.root, "sugar_crepe")
    if not os.path.exists(os.path.join(sc_root, "swap_att.json")):
        make_probe_data(args.root)
    img_root = os.path.join(args.root, "probe_images")

    # ---- 2. train ----------------------------------------------------------
    cfg_path = os.path.join(args.root, "dress.yaml")
    with open(cfg_path, "w") as f:
        f.write(CONFIG.format(shards=shards, steps=args.steps,
                              save_freq=args.save_freq,
                              reset_steps=args.steps // 5,
                              smooth_steps=max(50, args.steps // 25)))
    out_dir = os.path.join(args.root, "run")
    exp = None
    if os.path.isdir(out_dir):
        for name in sorted(os.listdir(out_dir)):
            if name.startswith("dress"):
                exp = os.path.join(out_dir, name)
    final_ck = exp and os.path.isdir(
        os.path.join(exp, "checkpoints", f"ckpt_{args.steps}"))
    if not args.skip_train and not final_ck:
        sh([sys.executable, "scripts/train.py", "--config", cfg_path,
            "--output_path", out_dir, "--exp_name", "dress", "--debug"],
           os.path.join(args.root, "train.log"))
        for name in sorted(os.listdir(out_dir)):
            if name.startswith("dress"):
                exp = os.path.join(out_dir, name)
    assert exp, f"no dress exp dir under {out_dir}"
    ckpt_dir = os.path.join(exp, "checkpoints")
    ckpts = sorted(int(n.split("_")[1]) for n in os.listdir(ckpt_dir)
                   if n.startswith("ckpt_") and n.split("_")[1].isdigit())
    print(f"checkpoints: {ckpts}", flush=True)

    # ---- 3. the four-family sweep (reference test.sh loop) -----------------
    out_root = os.path.join(exp, "results", "quantitative")
    if not args.skip_eval:
        common = ["--model_config", cfg_path, "--ckpt_dir", ckpt_dir,
                  "--output_folder", out_root, "--batch_size", "64"]
        sh([sys.executable, "scripts/test.py", *common,
            "--task", "compositionality",
            "--sc_data_root", sc_root, "--sc_image_root", img_root,
            "--cola_json", os.path.join(args.root, "cola.json"),
            "--cola_images", img_root,
            "--crepe_root", os.path.join(args.root, "crepe"),
            "--crepe_image_dirs", img_root],
           os.path.join(args.root, "sweep_compositionality.log"))
        sh([sys.executable, "scripts/test.py", *common, "--task", "retrieval",
            "--datasets", "wds/ilvlm_retr_set", "--dataset_root", retr_root],
           os.path.join(args.root, "sweep_retrieval.log"))
        sh([sys.executable, "scripts/test.py", *common, "--task", "recognition",
            "--datasets", "wds/ilvlm_eval_set", "--dataset_root", cls_root],
           os.path.join(args.root, "sweep_recognition.log"))
        sh([sys.executable, "scripts/test.py", *common, "--task", "probing",
            "--datasets", "wds/ilvlm_eval_set", "--dataset_root", cls_root],
           os.path.join(args.root, "sweep_probing.log"))

    # ---- 4. aggregate + archive -------------------------------------------
    from iterated_learning_for_vlm_tpu.eval.outtable import render

    table = render(out_root)
    print(table)
    os.makedirs(args.out, exist_ok=True)
    for name in sorted(os.listdir(out_root)):
        if name.endswith(".json"):
            shutil.copy2(os.path.join(out_root, name),
                         os.path.join(args.out, name))
    with open(os.path.join(args.out, "table.txt"), "w") as f:
        f.write(table + "\n")
    summary = {"steps": args.steps, "save_freq": args.save_freq,
               "checkpoints": ckpts,
               "families": ["compositionality", "retrieval", "recognition",
                            "probing"],
               "n_result_files": len([n for n in os.listdir(args.out)
                                      if n.endswith(".json")
                                      and n != "summary.json"]),
               "wall_s": round(time.time() - t0, 1)}
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
