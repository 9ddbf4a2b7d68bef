#!/usr/bin/env python
"""IL-effectiveness A/B on the compositional task (VERDICT r2 #5).

Round 2 proved the iterated-learning schedule *fires* on-chip; this tool
measures whether it *helps* — the paper's actual claim (arXiv:2404.02145):
compositional generalization to UNSEEN attribute-object pairs.

Arms (same data, same schedule, same seed unless noted):
  il      — full IL schedule (resets at 400/600, smooth 80)
  noil    — reset.enable: false (the reference's no-IL control)
  noil_s1 — no-IL at a second seed (run-to-run noise floor)

Per arm, each saved checkpoint (300/600/900) is scored with the REAL
SugarCREPE evaluator (eval/sugar_crepe.py) on the 4 compositional probes
(replace_{att,obj}_{unseen,seen}; tools/make_compositional_data.py), with
the FDT codebook temperature set to its decayed value at that step.

Artifact: results/il_effectiveness_ab.json + a printed table.

Usage (data first):
  python tools/make_compositional_data.py /tmp/ilvlm_comp
  python tools/il_effectiveness_ab.py --arms il,noil,noil_s1
"""
import argparse
import copy
import json
import os
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARMS = {
    "il": {"reset": True, "seed": 0},
    "noil": {"reset": False, "seed": 0},
    "noil_s1": {"reset": False, "seed": 1},
    "il_s1": {"reset": True, "seed": 1},
}
SPLITS = ("replace_att_unseen", "replace_obj_unseen",
          "replace_att_seen", "replace_obj_seen")


def run_arm(name, spec, base_cfg, data_dir, out_root, timeout):
    cfg = copy.deepcopy(base_cfg)
    cfg["reset"]["enable"] = bool(spec["reset"])
    cfg["data"]["train"]["data_path"] = os.path.join(
        data_dir, "train", "{00000..00007}.tar")
    arm_dir = os.path.join(out_root, name)
    os.makedirs(arm_dir, exist_ok=True)
    cfg_path = os.path.join(arm_dir, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/train.py"),
         "--config", cfg_path, "--output_path", arm_dir,
         "--exp_name", name, "--debug", "--seed", str(spec["seed"])],
        cwd=REPO, timeout=timeout, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"arm {name} failed rc={proc.returncode}:\n"
                           f"{proc.stderr[-4000:]}")
    print(f"arm {name}: trained in {time.time() - t0:.0f}s")
    for sub in sorted(os.listdir(arm_dir)):
        ck = os.path.join(arm_dir, sub, "checkpoints")
        if os.path.isdir(ck):
            return ck
    raise FileNotFoundError(f"no checkpoints under {arm_dir}")


def eval_ckpt(cfg_path, ckpt, step, data_dir, t_decay):
    from iterated_learning_for_vlm_tpu.eval.model_loader import load_eval_encoder
    from iterated_learning_for_vlm_tpu.eval.sugar_crepe import evaluate_sugar_crepe
    from iterated_learning_for_vlm_tpu.train.solver import fdt_temperature
    from iterated_learning_for_vlm_tpu.utils.config import Config

    temp = fdt_temperature(step, Config(t_decay), 1000.0)
    enc = load_eval_encoder(cfg_path, ckpt, batch_size=64,
                            sd_temperature=temp)
    ev = os.path.join(data_dir, "eval")
    return evaluate_sugar_crepe(enc, ev, os.path.join(ev, "images"),
                                splits=SPLITS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/ilvlm_comp")
    ap.add_argument("--out", default="/tmp/ilvlm_comp_runs")
    ap.add_argument("--arms", default="il,noil,noil_s1")
    ap.add_argument("--config", default=os.path.join(
        REPO, "configs/clip_fdt_comp_il_tpu.yaml"))
    ap.add_argument("--timeout", type=int, default=4200, help="per arm")
    ap.add_argument("--eval_only", action="store_true",
                    help="re-score existing checkpoints")
    args = ap.parse_args()

    with open(args.config) as f:
        base_cfg = yaml.safe_load(f)
    t_decay = base_cfg["t_decay"]
    os.makedirs(args.out, exist_ok=True)
    dest = os.path.join(REPO, "results", "il_effectiveness_ab.json")
    # merge with prior invocations: arms can be run/re-run one at a time
    result = {"config": args.config, "data": args.data, "arms": {}}
    if os.path.isfile(dest):
        try:
            prior = json.load(open(dest))
            result["arms"].update(prior.get("arms", {}))
        except Exception:
            pass

    for name in args.arms.split(","):
        spec = ARMS[name]
        arm_dir = os.path.join(args.out, name)
        ck_root = None
        if args.eval_only or os.path.isdir(arm_dir):
            for sub in sorted(os.listdir(arm_dir)) if os.path.isdir(arm_dir) else []:
                ck = os.path.join(arm_dir, sub, "checkpoints")
                if os.path.isdir(ck):
                    ck_root = ck
        if ck_root is None:
            ck_root = run_arm(name, spec, base_cfg, args.data, args.out,
                              args.timeout)
        arm_res = {"reset": spec["reset"], "seed": spec["seed"], "steps": {}}
        for sub in sorted(os.listdir(ck_root)):
            if not sub.startswith("ckpt_") or sub.endswith("_k_times") \
                    or "tmp" in sub:
                continue
            step = int(sub.split("_")[1])
            metrics = eval_ckpt(args.config, os.path.join(ck_root, sub),
                                step, args.data, t_decay)
            arm_res["steps"][step] = metrics
            print(f"  {name} @ {step}: "
                  + " ".join(f"{k.split('sugar-crepe-')[1]}={v:.3f}"
                             for k, v in sorted(metrics.items())
                             if k != "sugar-crepe-mean"))
        result["arms"][name] = arm_res
        with open(dest, "w") as f:  # checkpoint the artifact after each arm
            json.dump(result, f, indent=1)

    # summary table: unseen-mean per step per arm
    print("\nunseen-composition accuracy (mean of replace_att/obj_unseen):")
    steps = sorted({s for a in result["arms"].values() for s in a["steps"]})
    hdr = "step  " + "  ".join(f"{n:>8}" for n in result["arms"])
    print(hdr)
    for s in steps:
        row = [f"{s:<5}"]
        for n, a in result["arms"].items():
            m = a["steps"].get(s)
            if m:
                u = (m["sugar-crepe-replace_att_unseen"]
                     + m["sugar-crepe-replace_obj_unseen"]) / 2
                row.append(f"{u:8.3f}")
            else:
                row.append("       -")
        print("  ".join(row))
    print(f"\nartifact: {dest}")


if __name__ == "__main__":
    main()
