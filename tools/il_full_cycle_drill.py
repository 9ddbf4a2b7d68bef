#!/usr/bin/env python
"""Full iterated-learning cycle drill with per-reset programmatic assertions.

The reference's flagship config runs a 12-reset IL schedule
(/root/reference/example/clip_fdt/config_cc3m.yaml:88-94, loop at
example/clip_fdt/train_solver.py:545-557) but the repo had only ever executed
1-2 resets as a sequence (VERDICT r3 "what's missing" #2).  This drill runs a
SCALED schedule — 12 reset/smooth/re-warmup cycles on real generated wds
shards — and after every phase boundary asserts, on device, the invariants
that define the algorithm:

per reset boundary r (r % reset_steps == 0 inside the IL window):
  1. text_redrawn     — every re-drawn leaf lives under TEXT_ROOTS and the
                        reset touched a substantial set of leaves
  2. kept_identical   — embeddings/in_proj within the text tower (reference
                        ``weight_reset`` keeps bare Parameters) and ALL
                        vision/codebook/logit-scale leaves are bit-identical
  3. moments_zeroed   — AdamW mu/nu/count are exactly zero for re-drawn
                        leaves (fresh-encoder semantics, train/optim.py:210)
  4. codebook_snapshot— stored_codebook == pre-reset space_dict bitwise and
                        the hold flag is raised
  5. vision_frozen    — trainable mask is 0 over VISION_ROOTS during smooth
within the smooth window:
  6. held             — space_dict stays bit-identical to the snapshot at
                        sampled steps (the jitted step re-imposes the hold)
at/after the smooth boundary r+smooth:
  7. released         — hold flag drops, vision trainable again, and the
                        codebook starts moving (differs a few steps later)
per cycle:
  8. lr_rewarm        — LR dips at r+1 and re-warms to the outer cosine
                        scale by r+warmup (scheduler re-warmup,
                        reference prototype/lr_scheduler/scheduler.py:87-92)
  9. loss_recovery    — mean loss over the last `tail` steps of the cycle
                        returns to within --recovery-margin of the pre-reset
                        mean (the transmission phase actually re-learns)

Artifact: results/il_full_cycle.json with every cycle's checks + the full
(step, loss, lr) trace.

Usage:
  python tools/make_compositional_data.py /tmp/ilvlm_comp   # once
  python tools/il_full_cycle_drill.py                       # chip, ~5 min
  JAX_PLATFORMS=cpu python tools/il_full_cycle_drill.py --tiny   # debug
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import yaml  # noqa: E402
from flax import traverse_util  # noqa: E402

from iterated_learning_for_vlm_tpu.train.optim import (  # noqa: E402
    TEXT_ROOTS, VISION_ROOTS,
)
from iterated_learning_for_vlm_tpu.train.solver import (  # noqa: E402
    Solver, fdt_temperature,
)
from iterated_learning_for_vlm_tpu.utils.config import Config  # noqa: E402

# text-tower leaves torch's module.apply(weight_reset) does NOT touch
# (bare Parameters of the tower / nn.MultiheadAttention; train/il.py:42-44)
_KEPT_IN_TEXT = ("token_embedding", "positional_embedding", "in_proj")


def build_config(args):
    with open(os.path.join(REPO, "configs/clip_fdt_comp_il_tpu.yaml")) as f:
        cfg = yaml.safe_load(f)
    if args.tiny:
        with open(os.path.join(REPO, "configs/clip_fdt_tiny_cpu_cluster.yaml")) as f:
            cfg["model"] = yaml.safe_load(f)["model"]
        cfg["data"]["train"] = {"synthetic": True, "num_batches": args.max_iter,
                                "epoch": 1, "batch_size": 8, "workers": 0}
    else:
        cfg["data"]["train"]["data_path"] = os.path.join(
            args.data, "train", "{00000..00007}.tar")
        cfg["data"]["train"]["epoch"] = 64  # step budget governs the stop
    cfg["reset"].update(
        enable=True, reset_steps=args.reset_steps, reset_nums=args.reset_nums,
        smooth_steps=args.smooth, distil_steps=0,
    )
    # mirror the reference's warmup shape (config_cc3m.yaml: base_lr 5e-5,
    # warmup_lr 5e-4 — a 10x rise): the re-warm visibly dips to
    # cos_lr * base/warmup and re-rises each cycle.  The comp config's
    # base_lr == warmup_lr would make the re-warm line flat (no observable
    # dip), hiding the scheduler behavior this drill asserts.
    wlr = float(cfg["lr_scheduler"]["kwargs"]["warmup_lr"])
    cfg["lr_scheduler"]["kwargs"].update(
        max_iter=args.max_iter, warmup_steps=args.warmup, base_lr=wlr / 10.0)
    cfg["t_decay"]["sd_T_decay_iter"] = max(1, args.max_iter // 10)
    cfg["saver"] = {"print_freq": 1000000, "val_freq": 0, "save_freq": 0}
    return cfg


def _flat(tree):
    return traverse_util.flatten_dict(tree)


def _text_paths(flat_params):
    return [p for p in flat_params if str(p[0]) in TEXT_ROOTS]


def make_comparators():
    """Jitted on-device tree comparisons — only scalars cross the tunnel."""

    @jax.jit
    def diff_leaves(a, b):
        return jax.tree.map(lambda x, y: jnp.any(x != y), a, b)

    @jax.jit
    def all_zero(tree):
        return jax.tree.map(lambda x: jnp.all(x == 0), tree)

    @jax.jit
    def arrays_equal(a, b):
        return jnp.all(a == b)

    return diff_leaves, all_zero, arrays_equal


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/ilvlm_comp")
    ap.add_argument("--out", default=os.path.join(REPO, "results/il_full_cycle.json"))
    ap.add_argument("--reset_steps", type=int, default=150)
    ap.add_argument("--reset_nums", type=int, default=14,
                    help="window end multiple; resets fire at k*reset_steps "
                         "for k in 2..reset_nums-1 (12 resets at default)")
    ap.add_argument("--smooth", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--max_iter", type=int, default=2200)
    ap.add_argument("--recovery-margin", type=float, default=0.25,
                    help="post-cycle mean loss must be <= pre * (1+margin)")
    ap.add_argument("--tail", type=int, default=30)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model + synthetic data (CPU debug): "
                         "reset_steps 16, smooth 5, 3 resets")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (the axon plugin overrides "
                         "the JAX_PLATFORMS env var; the config API wins)")
    args = ap.parse_args()
    if args.tiny:
        args.reset_steps, args.smooth, args.warmup = 16, 5, 4
        args.reset_nums, args.max_iter, args.tail = 5, 96, 8
        args.platform = args.platform or "cpu"
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg = build_config(args)
    solver = Solver(Config(cfg), output_path="/tmp/il_full_cycle_out",
                    exp_name="drill", debug=True, seed=0)
    diff_leaves, all_zero, arrays_equal = make_comparators()

    R, S, W = args.reset_steps, args.smooth, args.warmup
    boundaries = [k * R for k in range(2, args.reset_nums)]
    window_end = R * args.reset_nums
    print(f"drill: {len(boundaries)} resets at {boundaries[0]}..{boundaries[-1]}, "
          f"smooth {S}, window end {window_end}, max_iter {args.max_iter}",
          flush=True)
    t_decay = cfg.get("t_decay")
    default_T = float(solver.model.fdt_cfg.sd_temperature)

    state = solver.state
    trace = []            # (step, loss, lr) device scalars, drained in chunks
    host_trace = []       # drained floats
    cycles = {b: {"boundary": b} for b in boundaries}
    hold_checks = {b: [] for b in boundaries}
    release_probe = {}    # boundary -> step at which to re-check codebook moved
    failures = []

    def drain():
        for s, l, lr in trace:
            host_trace.append((s, float(l), float(lr)))
        trace.clear()

    def check(cond, step, label, detail=""):
        ok = bool(cond)
        if not ok:
            failures.append({"step": step, "check": label, "detail": detail})
            print(f"  FAIL @ {step}: {label} {detail}", flush=True)
        return ok

    step = 0
    t0 = time.time()
    done = False
    for epoch in range(int(cfg["data"]["train"]["epoch"])):
        if done:
            break
        for batch in solver._batches(epoch):
            step += 1
            T = fdt_temperature(step, Config(t_decay), default_T)
            state, metrics = solver.train_step(
                state, batch, jnp.asarray(T, jnp.float32))
            trace.append((step, metrics["loss"], metrics["lr"]))

            is_boundary = step in cycles
            pre = state  # post-train-step, pre-IL-transition
            state = solver.il.on_step(state, step)

            if is_boundary:
                c = cycles[step]
                flat_pre = _flat(pre.params)
                flat_post = _flat(state.params)
                d = jax.device_get(diff_leaves(pre.params, state.params))
                flat_d = _flat(d)
                changed = sorted(p for p, v in flat_d.items() if bool(v))
                text_leaves = set(_text_paths(flat_pre))
                # 1. every changed leaf under TEXT_ROOTS, and enough of them
                c["text_redrawn"] = check(
                    changed and all(p in text_leaves for p in changed)
                    and len(changed) >= 10, step, "text_redrawn",
                    f"changed={len(changed)}")
                # 2. kept leaves: embeddings/in_proj inside text + everything else
                kept_text = [p for p in text_leaves
                             if any(k in str(x) for x in p for k in _KEPT_IN_TEXT)]
                c["kept_identical"] = check(
                    kept_text and all(not bool(flat_d[p]) for p in kept_text),
                    step, "kept_identical",
                    f"kept_text={len(kept_text)}")
                # 3. moments zeroed exactly on the re-drawn leaves
                sub_mu = {p: _flat(state.opt_state["mu"])[p] for p in changed}
                sub_nu = {p: _flat(state.opt_state["nu"])[p] for p in changed}
                sub_ct = {p: _flat(state.opt_state["count"])[p] for p in changed}
                zz = jax.device_get(all_zero((sub_mu, sub_nu, sub_ct)))
                c["moments_zeroed"] = check(
                    all(bool(v) for v in jax.tree.leaves(zz)),
                    step, "moments_zeroed")
                # 4. codebook snapshot + hold flag
                snap_ok = jax.device_get(arrays_equal(
                    state.stored_codebook, flat_pre[("space_dict",)]))
                c["codebook_snapshot"] = check(
                    bool(snap_ok) and float(state.hold_codebook) == 1.0,
                    step, "codebook_snapshot")
                # 5. vision frozen during smooth
                tr = _flat(state.trainable)
                vis = [float(v) for p, v in tr.items() if str(p[0]) in VISION_ROOTS]
                c["vision_frozen"] = check(
                    vis and max(vis) == 0.0, step, "vision_frozen")
                release_probe[step + S + 5] = step

            # 6. sampled codebook-hold checks inside the smooth window
            for b in boundaries:
                if b < step <= b + S and (step - b) in (1, S // 2, S):
                    eq = bool(jax.device_get(arrays_equal(
                        state.params["space_dict"], state.stored_codebook)))
                    hold_checks[b].append({"step": step, "held": eq})
                    check(eq, step, "held_during_smooth", f"boundary {b}")

            # 7a. at the smooth boundary: released + vision unfrozen
            for b in boundaries:
                if step == b + S:
                    tr = _flat(state.trainable)
                    vis = [float(v) for p, v in tr.items()
                           if str(p[0]) in VISION_ROOTS and "conv1" not in
                           tuple(str(x) for x in p)]
                    cycles[b]["released"] = check(
                        float(state.hold_codebook) == 0.0 and min(vis) == 1.0,
                        step, "released", f"boundary {b}")
            # 7b. a few steps later the codebook must have moved
            if step in release_probe:
                b = release_probe.pop(step)
                moved = not bool(jax.device_get(arrays_equal(
                    state.params["space_dict"], state.stored_codebook)))
                cycles[b]["codebook_moves_after_release"] = check(
                    moved, step, "codebook_moves_after_release", f"boundary {b}")

            if step % 100 == 0:
                drain()
                print(f"step {step}/{args.max_iter} "
                      f"loss {host_trace[-1][1]:.4f} lr {host_trace[-1][2]:.2e} "
                      f"({time.time() - t0:.0f}s)", flush=True)
            if step >= args.max_iter:
                done = True
                break
    drain()

    # 8/9. LR re-warmup + loss recovery from the trace
    by_step = {s: (l, lr) for s, l, lr in host_trace}
    for b in boundaries:
        c = cycles[b]
        # pre at b-1: step b itself is already in the re-warm regime (the
        # reference line even evaluates below zero there — clamped to 0)
        lr_pre = by_step[b - 1][1]
        lr_dip = by_step[b + 1][1]
        lr_top = by_step[min(b + W, args.max_iter)][1]
        c["lr"] = {"pre": lr_pre, "dip": lr_dip, "rewarmed": lr_top}
        c["lr_rewarm"] = check(
            lr_dip < 0.5 * lr_pre and lr_top > 5 * lr_dip
            and lr_top > 0.5 * lr_pre, b, "lr_rewarm",
            f"pre={lr_pre:.2e} dip={lr_dip:.2e} top={lr_top:.2e}")
        pre_loss = float(np.mean([by_step[s][0]
                                  for s in range(b - args.tail, b)]))
        tail_end = min(b + R, args.max_iter)
        post_loss = float(np.mean([by_step[s][0]
                                   for s in range(tail_end - args.tail, tail_end)]))
        peak_loss = float(max(by_step[s][0]
                              for s in range(b + 1, min(b + S + 1, args.max_iter))))
        c["loss"] = {"pre": pre_loss, "post_cycle": post_loss,
                     "peak_after_reset": peak_loss}
        c["loss_recovery"] = check(
            post_loss <= pre_loss * (1.0 + args.recovery_margin), b,
            "loss_recovery", f"pre={pre_loss:.4f} post={post_loss:.4f}")
        c["held_samples"] = hold_checks[b]

    n_ok = sum(all(v for k, v in c.items()
                   if isinstance(v, bool)) for c in cycles.values())
    result = {
        "config": {"reset_steps": R, "smooth_steps": S, "warmup": W,
                   "reset_nums": args.reset_nums, "max_iter": args.max_iter,
                   "boundaries": boundaries, "tiny": args.tiny,
                   "platform": jax.devices()[0].platform,
                   "device": str(jax.devices()[0])},
        "cycles": [cycles[b] for b in boundaries],
        "cycles_all_checks_true": n_ok,
        "cycles_total": len(boundaries),
        "failures": failures,
        "wall_s": round(time.time() - t0, 1),
        "trace": [(s, round(l, 5), float(f"{lr:.6e}")) for s, l, lr in host_trace],
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(f"\n{n_ok}/{len(boundaries)} cycles passed every check; "
          f"{len(failures)} failures; artifact: {args.out}", flush=True)
    sys.exit(0 if n_ok == len(boundaries) and not failures else 1)


if __name__ == "__main__":
    main()
