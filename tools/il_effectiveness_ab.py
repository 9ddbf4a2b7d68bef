#!/usr/bin/env python
"""IL-effectiveness study on the compositional task (VERDICT r3 #2, r4 #2/#8).

v3 (round 5): de-confounds the claim —

- >=5 MATCHED-SEED PAIRS (il_s{k} vs noil_s{k}, k=0..4): same data, same
  schedule, same init seed; only ``reset.enable`` differs.
- schedule with >=4 resets (configs/clip_fdt_comp_il_tpu.yaml: 1400 steps,
  resets fire at 300/450/600/750, reset window ends at 900, smooth 40).
- probe extended to the full SugarCREPE contract-type structure (reference
  ``eval/sugar_crepe.py:13-63``): replace_{att,obj}_{unseen,seen} plus
  add_obj/add_att/swap_att/swap_obj/replace_rel
  (tools/make_compositional_data.py).
- a NON-COLLAPSING control arm kind ``noil_lowlr_s{k}`` (VERDICT r4 #2c):
  the plain no-IL control at lr 0.0005 degenerates below chance late in
  training at this scale (a systematic negative-caption preference), which
  confounds the final-step comparison; the low-LR control (lr 0.0002, same
  seeds/data/schedule length) stays healthy, so "IL wins" must also beat it.
- summary v3 (VERDICT r4 #2a/b/#8): ``pairs`` counts COMPLETED pairs (both
  arms scored at the final step — asserted), per-split mean±std per arm kind
  at the final step AND at each arm's BEST step (max unseen-mean over its
  checkpoints), matched-pair win-rates at final step, best step, and at
  EVERY checkpoint step — robust to plateau-break timing variance.

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


LOWLR = 0.0002  # healthy-control LR (the 0.0005 no-IL arm degenerates late)

KINDS = ("il", "noil", "noil_lowlr")


def arm_specs(pairs):
    out = {}
    for k in range(pairs):
        out[f"il_s{k}"] = {"reset": True, "seed": k}
        out[f"noil_s{k}"] = {"reset": False, "seed": k}
        out[f"noil_lowlr_s{k}"] = {"reset": False, "seed": k, "lr": LOWLR}
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
                             reset_enable=bool(spec["reset"]),
                             lr=spec.get("lr"))
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


def _unseen(m):
    if not m or not all(u in m for u in UNSEEN_KEY):
        return None
    return float(np.mean([m[u] for u in UNSEEN_KEY]))


def summarize(result, pairs_requested):
    """v3 summary (VERDICT r4 #2a/b, #8): completed-pair accounting,
    per-split mean±std per arm kind at the FINAL step and at each arm's BEST
    step (max unseen-mean over its checkpoints), matched-pair win-rates at
    final/best, and a per-checkpoint-step win-rate table."""
    arms = result["arms"]
    steps_of = {n: sorted(int(s) for s in a["steps"]) for n, a in arms.items()
                if a["steps"]}
    if not steps_of:
        return {}
    fs = max(s[-1] for s in steps_of.values())

    def m_at(name, step):
        a = arms.get(name)
        if not a:
            return None
        return a["steps"].get(str(step)) or a["steps"].get(step)

    def best_of(name):
        """(step, metrics) with max unseen-mean over the arm's checkpoints."""
        cands = [(st, m_at(name, st)) for st in steps_of.get(name, ())]
        cands = [(st, m) for st, m in cands if _unseen(m) is not None]
        if not cands:
            return None, None
        return max(cands, key=lambda c: _unseen(c[1]))

    split_keys = sorted({k for a in arms.values()
                         for m in a["steps"].values() for k in m
                         if k != "sugar-crepe-mean"})
    completed = [k for k in range(pairs_requested)
                 if m_at(f"il_s{k}", fs) and m_at(f"noil_s{k}", fs)]
    summary = {"version": 3, "final_step": fs,
               "pairs_requested": pairs_requested, "pairs": len(completed),
               "completed_pair_seeds": completed,
               "per_split": {}, "per_split_best": {}, "best_step": {},
               "win_rate": {}, "win_rate_best": {}, "per_step_win_rate": {},
               "unseen_mean": {}, "unseen_mean_best": {}}
    assert summary["pairs"] == len(completed)  # VERDICT r4 #8 contract

    for kind in KINDS:
        finals, bests, bsteps = [], [], []
        for s in range(pairs_requested):
            mf = m_at(f"{kind}_s{s}", fs)
            if mf:
                finals.append(mf)
            bs, mb = best_of(f"{kind}_s{s}")
            if mb:
                bests.append(mb)
                bsteps.append(bs)
        for label, pool, dest, udest in (
                ("final", finals, "per_split", "unseen_mean"),
                ("best", bests, "per_split_best", "unseen_mean_best")):
            stats = {}
            for k in split_keys:
                v = [m[k] for m in pool if k in m]
                if v:
                    stats[k] = {"mean": float(np.mean(v)),
                                "std": float(np.std(v)), "n": len(v)}
            summary[dest][kind] = stats
            u = [x for x in (_unseen(m) for m in pool) if x is not None]
            summary[udest][kind] = {
                "mean": float(np.mean(u)) if u else None,
                "std": float(np.std(u)) if u else None, "n": len(u)}
        if bsteps:
            summary["best_step"][kind] = {
                "steps": bsteps, "mean": float(np.mean(bsteps))}

    def win_table(get_il, get_ctl):
        """Matched-pair win rates of IL over a control arm getter."""
        table = {}
        for key in split_keys + ["unseen_mean"]:
            wins = ties = total = 0
            for s in range(pairs_requested):
                mi, mn = get_il(s), get_ctl(s)
                if not mi or not mn:
                    continue
                if key == "unseen_mean":
                    vi, vn = _unseen(mi), _unseen(mn)
                    if vi is None or vn is None:
                        continue
                elif key in mi and key in mn:
                    vi, vn = mi[key], mn[key]
                else:
                    continue
                total += 1
                wins += vi > vn
                ties += vi == vn
            if total:
                table[key] = {"il_wins": wins, "ties": ties, "n": total}
        return table

    for ctl in ("noil", "noil_lowlr"):
        summary["win_rate"][ctl] = win_table(
            lambda s: m_at(f"il_s{s}", fs), lambda s, c=ctl: m_at(f"{c}_s{s}", fs))
        summary["win_rate_best"][ctl] = win_table(
            lambda s: best_of(f"il_s{s}")[1],
            lambda s, c=ctl: best_of(f"{c}_s{s}")[1])

    # per-checkpoint-step win rate (il vs noil) on the unseen-mean: robust to
    # plateau-break timing variance (VERDICT r4 weak #5)
    all_steps = sorted({st for s in steps_of.values() for st in s})
    for st in all_steps:
        wins = total = 0
        vals = {"il": [], "noil": [], "noil_lowlr": []}
        for s in range(pairs_requested):
            vi = _unseen(m_at(f"il_s{s}", st))
            vn = _unseen(m_at(f"noil_s{s}", st))
            vl = _unseen(m_at(f"noil_lowlr_s{s}", st))
            if vi is not None:
                vals["il"].append(vi)
            if vn is not None:
                vals["noil"].append(vn)
            if vl is not None:
                vals["noil_lowlr"].append(vl)
            if vi is not None and vn is not None:
                total += 1
                wins += vi > vn
        entry = {k: {"mean": float(np.mean(v)), "n": len(v)}
                 for k, v in vals.items() if v}
        if total:
            entry["il_wins"] = wins
            entry["n_pairs"] = total
        summary["per_step_win_rate"][st] = entry
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
    result = {"config": args.config, "data": args.data, "version": 3,
              "arms": {}}
    if os.path.isfile(dest):
        try:
            prior = json.load(open(dest))
            # v2 arms merge cleanly into v3 (arm format unchanged; v3 only
            # adds the lowlr kind + a richer summary); v1 arms do not.
            if prior.get("version") in (2, 3):
                result["arms"].update(prior.get("arms", {}))
        except Exception:
            pass

    base_lr = float(base_cfg["lr_scheduler"]["kwargs"]["base_lr"])
    specs = arm_specs(args.pairs)
    names = args.arms.split(",") if args.arms else list(specs)
    for name in names:
        spec = specs[name]
        # every spec carries an explicit lr: reinitialize() must RESTORE the
        # base lr after a lowlr arm, not inherit the mutated config
        spec.setdefault("lr", base_lr)
        cfg = copy.deepcopy(base_cfg)
        cfg["reset"]["enable"] = bool(spec["reset"])
        cfg["lr_scheduler"]["kwargs"]["base_lr"] = spec["lr"]
        cfg["lr_scheduler"]["kwargs"]["warmup_lr"] = spec["lr"]
        arm_dir = os.path.join(args.out, name)
        fs = final_step_of(cfg)
        prior_arm = result["arms"].get(name)
        if (not args.eval_only and prior_arm
                and any(int(s) == fs for s in prior_arm["steps"])):
            print(f"arm {name}: already scored through step {fs}, keeping "
                  "prior metrics", flush=True)
            result["summary"] = summarize(result, args.pairs)
            continue
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
        import gc
        gc.collect()  # arms run in-process; drop the last arm's host copies

    s = result.get("summary", {})
    if s:
        print(f"\n=== summary: {s['pairs']}/{s['pairs_requested']} completed "
              f"matched-seed pairs (final step {s['final_step']}) ===")
        for ctl in ("noil", "noil_lowlr"):
            for when, wr_key, ps_key, um_key in (
                    ("final", "win_rate", "per_split", "unseen_mean"),
                    ("best", "win_rate_best", "per_split_best",
                     "unseen_mean_best")):
                table = s.get(wr_key, {}).get(ctl, {})
                if not table:
                    continue
                print(f"-- il vs {ctl} @ {when} step --")
                for k in sorted(table):
                    w = table[k]
                    label = k.replace("sugar-crepe-", "")
                    mi = (s[ps_key].get("il", {}).get(k)
                          or s[um_key].get("il"))
                    mn = (s[ps_key].get(ctl, {}).get(k)
                          or s[um_key].get(ctl))
                    if mi and mn and mi.get("mean") is not None:
                        print(f"{label:>22}: il {mi['mean']:.3f}±{mi['std']:.3f}"
                              f" vs {ctl} {mn['mean']:.3f}±{mn['std']:.3f}  "
                              f"wins {w['il_wins']}/{w['n']}")
        psw = s.get("per_step_win_rate", {})
        if psw:
            print("-- unseen-mean by step --")
            for st in sorted(psw, key=int):
                e = psw[st]
                parts = [f"{k} {e[k]['mean']:.3f}(n={e[k]['n']})"
                         for k in KINDS if k in e]
                if "il_wins" in e:
                    parts.append(f"il wins {e['il_wins']}/{e['n_pairs']}")
                print(f"  step {st:>5}: " + "  ".join(parts))
    print(f"\nartifact: {dest}")


if __name__ == "__main__":
    main()
