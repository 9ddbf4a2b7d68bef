#!/usr/bin/env python
"""IL-effectiveness study on the compositional task (VERDICT r3 #2).

v2 (round 4): makes the claim statistically real —

- >=5 MATCHED-SEED PAIRS (il_s{k} vs noil_s{k}, k=0..4): same data, same
  schedule, same init seed; only ``reset.enable`` differs.
- schedule with >=4 resets (configs/clip_fdt_comp_il_tpu.yaml: resets at
  400/600/800/1000, window ends 1200, train 1400).
- probe extended to the full SugarCREPE contract-type structure (reference
  ``eval/sugar_crepe.py:13-63``): replace_{att,obj}_{unseen,seen} plus
  add_obj/add_att/swap_att/swap_obj/replace_rel
  (tools/make_compositional_data.py).
- summary: per-split mean±std across seeds per arm type at the final step,
  plus the matched-pair WIN-RATE (il > noil per seed) on the unseen-mean and
  on every split — the statistic the n=2 round-3 study couldn't support.

All arms run IN-PROCESS (one Solver per arm, sequential): every arm shares
the jitted step/eval executables, so only the first arm pays the remote
compile.  Checkpoints are reused only under ``--eval_only`` or when the arm
dir's saved config matches the requested config and the final-step
checkpoint exists (ADVICE r3: a stale partial run must not be silently
scored).

Usage (data first):
  python tools/make_compositional_data.py /tmp/ilvlm_comp
  python tools/il_effectiveness_ab.py --pairs 5
"""
import argparse
import copy
import json
import os
import sys
import time

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPLITS = ("replace_att_unseen", "replace_obj_unseen",
          "replace_att_seen", "replace_obj_seen",
          "add_obj", "add_att", "swap_att", "swap_obj", "replace_rel")
UNSEEN_KEY = ("sugar-crepe-replace_att_unseen", "sugar-crepe-replace_obj_unseen")


def arm_specs(pairs):
    out = {}
    for k in range(pairs):
        out[f"il_s{k}"] = {"reset": True, "seed": k}
        out[f"noil_s{k}"] = {"reset": False, "seed": k}
    return out


def final_step_of(cfg):
    return int(cfg["lr_scheduler"]["kwargs"]["max_iter"])


def ckpt_root(arm_dir):
    if not os.path.isdir(arm_dir):
        return None
    for sub in sorted(os.listdir(arm_dir)):
        ck = os.path.join(arm_dir, sub, "checkpoints")
        if os.path.isdir(ck):
            return ck
    return None


def reusable(arm_dir, cfg, final_step):
    """Gate checkpoint reuse: saved config must match and the final-step
    checkpoint must exist (ADVICE r3 #2)."""
    ck = ckpt_root(arm_dir)
    if ck is None or not os.path.isdir(os.path.join(ck, f"ckpt_{final_step}")):
        return None
    saved_cfg = os.path.join(arm_dir, "config.yaml")
    if not os.path.isfile(saved_cfg):
        return None
    with open(saved_cfg) as f:
        if yaml.safe_load(f) != cfg:
            return None
    return ck


_SOLVER = None   # one Solver reused across arms (compiled step shared)
_ENCODER = None  # one JitEncoder reused across checkpoints


def run_arm(name, spec, cfg, arm_dir):
    """Train one arm IN-PROCESS on the shared Solver: ``reinitialize`` swaps
    seed/params/data/IL-flavor without rebuilding the jitted step, so only
    the first arm (and the first arm of the other IL flavor) compiles."""
    global _SOLVER
    from iterated_learning_for_vlm_tpu.train.solver import Solver
    from iterated_learning_for_vlm_tpu.utils.config import Config

    os.makedirs(arm_dir, exist_ok=True)
    with open(os.path.join(arm_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)
    t0 = time.time()
    if _SOLVER is None:
        _SOLVER = Solver(Config(copy.deepcopy(cfg)), output_path=arm_dir,
                         exp_name=name, debug=True, seed=spec["seed"])
    else:
        _SOLVER.reinitialize(spec["seed"], output_path=arm_dir, exp_name=name,
                             reset_enable=bool(spec["reset"]))
    _SOLVER.train()
    print(f"arm {name}: trained in {time.time() - t0:.0f}s", flush=True)
    ck = ckpt_root(arm_dir)
    if ck is None:
        raise FileNotFoundError(f"no checkpoints under {arm_dir}")
    return ck


def eval_ckpt(cfg_path, ckpt, step, data_dir, t_decay):
    global _ENCODER
    from iterated_learning_for_vlm_tpu.eval.model_loader import load_eval_encoder
    from iterated_learning_for_vlm_tpu.eval.sugar_crepe import evaluate_sugar_crepe
    from iterated_learning_for_vlm_tpu.train.solver import fdt_temperature
    from iterated_learning_for_vlm_tpu.utils.config import Config

    temp = fdt_temperature(step, Config(t_decay), 1000.0)
    _ENCODER = load_eval_encoder(cfg_path, ckpt, batch_size=64,
                                 sd_temperature=temp, encoder=_ENCODER)
    ev = os.path.join(data_dir, "eval")
    avail = tuple(s for s in SPLITS
                  if os.path.isfile(os.path.join(ev, f"{s}.json")))
    return evaluate_sugar_crepe(_ENCODER, ev, os.path.join(ev, "images"),
                                splits=avail)


def summarize(result, pairs):
    """Per-split mean±std per arm type at the final step + pair win-rates."""
    arms = result["arms"]
    final_steps = [max(int(s) for s in a["steps"]) for a in arms.values()
                   if a["steps"]]
    if not final_steps:
        return {}
    fs = max(final_steps)

    def metrics_at_final(name):
        a = arms.get(name)
        if not a:
            return None
        return a["steps"].get(str(fs)) or a["steps"].get(fs)

    split_keys = sorted({k for a in arms.values()
                         for m in a["steps"].values() for k in m
                         if k != "sugar-crepe-mean"})
    summary = {"final_step": fs, "pairs": pairs, "per_split": {},
               "win_rate": {}, "unseen_mean": {}}
    for kind in ("il", "noil"):
        vals = {k: [] for k in split_keys}
        unseen = []
        for s in range(pairs):
            m = metrics_at_final(f"{kind}_s{s}")
            if not m:
                continue
            for k in split_keys:
                if k in m:
                    vals[k].append(m[k])
            if all(u in m for u in UNSEEN_KEY):
                unseen.append(float(np.mean([m[u] for u in UNSEEN_KEY])))
        summary["per_split"][kind] = {
            k: {"mean": float(np.mean(v)), "std": float(np.std(v)),
                "n": len(v)} for k, v in vals.items() if v}
        summary["unseen_mean"][kind] = {
            "mean": float(np.mean(unseen)) if unseen else None,
            "std": float(np.std(unseen)) if unseen else None, "n": len(unseen)}

    # matched-pair win rates
    for key in split_keys + ["unseen_mean"]:
        wins = ties = total = 0
        for s in range(pairs):
            mi, mn = metrics_at_final(f"il_s{s}"), metrics_at_final(f"noil_s{s}")
            if not mi or not mn:
                continue
            if key == "unseen_mean":
                vi = float(np.mean([mi[u] for u in UNSEEN_KEY]))
                vn = float(np.mean([mn[u] for u in UNSEEN_KEY]))
            elif key in mi and key in mn:
                vi, vn = mi[key], mn[key]
            else:
                continue
            total += 1
            wins += vi > vn
            ties += vi == vn
        if total:
            summary["win_rate"][key] = {"il_wins": wins, "ties": ties,
                                        "n": total}
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/ilvlm_comp")
    ap.add_argument("--out", default="/tmp/ilvlm_comp_runs_v2")
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--arms", default=None,
                    help="comma list; default: all il_s{k}/noil_s{k}")
    ap.add_argument("--config", default=os.path.join(
        REPO, "configs/clip_fdt_comp_il_tpu.yaml"))
    ap.add_argument("--eval_only", action="store_true",
                    help="re-score existing checkpoints")
    args = ap.parse_args()

    with open(args.config) as f:
        base_cfg = yaml.safe_load(f)
    t_decay = base_cfg["t_decay"]
    base_cfg["data"]["train"]["data_path"] = os.path.join(
        args.data, "train", "{00000..00007}.tar")
    os.makedirs(args.out, exist_ok=True)
    dest = os.path.join(REPO, "results", "il_effectiveness_ab.json")
    result = {"config": args.config, "data": args.data, "version": 2,
              "arms": {}}
    if os.path.isfile(dest):
        try:
            prior = json.load(open(dest))
            if prior.get("version") == 2:  # round-3 v1 arms are not mergeable
                result["arms"].update(prior.get("arms", {}))
        except Exception:
            pass

    specs = arm_specs(args.pairs)
    names = args.arms.split(",") if args.arms else list(specs)
    for name in names:
        spec = specs[name]
        cfg = copy.deepcopy(base_cfg)
        cfg["reset"]["enable"] = bool(spec["reset"])
        arm_dir = os.path.join(args.out, name)
        fs = final_step_of(cfg)
        ck = reusable(arm_dir, cfg, fs) if (
            args.eval_only or os.path.isdir(arm_dir)) else None
        if ck is None:
            if args.eval_only:
                print(f"arm {name}: no reusable checkpoints, skipping",
                      flush=True)
                continue
            ck = run_arm(name, spec, cfg, arm_dir)
        arm_res = {"reset": spec["reset"], "seed": spec["seed"], "steps": {}}
        cfg_path = os.path.join(arm_dir, "config.yaml")
        for sub in sorted(os.listdir(ck)):
            if not sub.startswith("ckpt_") or sub.endswith("_k_times") \
                    or "tmp" in sub:
                continue
            step = int(sub.split("_")[1])
            metrics = eval_ckpt(cfg_path, os.path.join(ck, sub), step,
                                args.data, t_decay)
            arm_res["steps"][step] = metrics
            print(f"  {name} @ {step}: "
                  + " ".join(f"{k.split('sugar-crepe-')[1]}={v:.3f}"
                             for k, v in sorted(metrics.items())
                             if k != "sugar-crepe-mean"), flush=True)
        result["arms"][name] = arm_res
        result["summary"] = summarize(result, args.pairs)
        with open(dest, "w") as f:  # checkpoint the artifact after each arm
            json.dump(result, f, indent=1)

    s = result.get("summary", {})
    if s:
        print(f"\n=== final-step ({s['final_step']}) summary over "
              f"{s['pairs']} matched-seed pairs ===")
        for k in sorted(s.get("win_rate", {})):
            w = s["win_rate"][k]
            label = k.replace("sugar-crepe-", "")
            mi = s["per_split"].get("il", {}).get(k) or s["unseen_mean"].get("il")
            mn = (s["per_split"].get("noil", {}).get(k)
                  or s["unseen_mean"].get("noil"))
            if mi and mn and mi.get("mean") is not None:
                print(f"{label:>22}: il {mi['mean']:.3f}±{mi['std']:.3f} "
                      f"vs noil {mn['mean']:.3f}±{mn['std']:.3f}  "
                      f"wins {w['il_wins']}/{w['n']}")
    print(f"\nartifact: {dest}")


if __name__ == "__main__":
    main()
