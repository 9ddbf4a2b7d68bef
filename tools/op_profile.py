#!/usr/bin/env python
"""Per-op self-time profile of the full CLIP-FDT train step on the chip.

Traces a few steps with ``jax.profiler`` and converts the xplane via xprof's
``framework_op_stats`` tool, printing the top ops by self time — the picture
that targets perf work (which fusions dominate, what is bandwidth- vs
MXU-bound).

Caveats (see verify notes): op self-times attribute FUSED computations to a
single root op — confirm any hypothesis with a same-process A/B of the full
step (tools/perf_breakdown.py) before coding against it.

Round 2.2 snapshot (bs256, 125 ms step, per-step self-times): the top ops
are all real work near their rooflines — vision MLP bwd 9.2+8.6 ms (~80%
MFU), vision bwd attention kernel 9.2 ms (at the block-diagonal scheme's
g*sg=4x-waste roofline; the waste-free per-head batched dot was swept and
loses — tiny matmuls underfill the MXU), in_proj bwd 7.4 ms, masked-AdamW
select_n 5.8 ms (bandwidth-bound, rewrite refuted).  Remaining non-matmul
cost sits in the TEXT tower's XLA attention (reshape/sub/split/transpose
~7 ms/step fwd+bwd) — but the fused kernel ties XLA there at every swept
tiling (tools/attn_microbench.py), so it stays.

Round 2.5 snapshot at the ctx-32 shipping bucket (bs256, ~88.6 ms step,
results/op_profile_ctx32_r25.txt): vision tower now ~60% of device time
(bwd attention kernel 9.1 ms, MLP bwd 8.3+8.1, in_proj bwd 7.9 — all at
their audited rooflines), masked-AdamW select_n 5.9 ms (bandwidth-bound,
rewrite refuted; bf16 moments is the opt-in lever), text tower shrunk to
~13% (bwd kernel 3.5 ms).  No non-roofline op above 1%.

Usage: python tools/op_profile.py [batch_size] [top_k] [ctx]
"""
import json
import os
import sys
import tempfile

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from iterated_learning_for_vlm_tpu import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from iterated_learning_for_vlm_tpu.models import model_entry  # noqa: E402
from iterated_learning_for_vlm_tpu.train.optim import (  # noqa: E402
    adamw_init, build_wd_tree, trainable_mask_tree,
)
from iterated_learning_for_vlm_tpu.train.schedule import cosine  # noqa: E402
from iterated_learning_for_vlm_tpu.train.step import make_train_step  # noqa: E402
from iterated_learning_for_vlm_tpu.train.train_state import TrainState  # noqa: E402
from iterated_learning_for_vlm_tpu.utils.profiling import trace  # noqa: E402

from bench import model_cfg  # noqa: E402


def main(batch_size=256, top_k=25, ctx=32):
    # mirror the bench default: ctx-32 shipping bucket with the fused text
    # attention kernel (wins at S<=64, ties/loses at full 77)
    model = model_entry(model_cfg(remat=False, fused=True, flash=False,
                                  unroll=True, fused_attn=True,
                                  fused_attn_text=ctx <= 64,
                                  fused_attn_text_sample_group=4 if ctx <= 64 else 2))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((batch_size, 224, 224, 3),
                                                 dtype=np.float32)),
        "tokens": jnp.asarray(rng.integers(1, 49407, (batch_size, ctx)), jnp.int32),
        "pad_mask": jnp.zeros((batch_size, ctx), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["image"][:2],
                        batch["tokens"][:2], batch["pad_mask"][:2])["params"]
    wd_tree = build_wd_tree(params, 0.1, {
        "ln_w": {"weight_decay": 0}, "ln_b": {"weight_decay": 0},
        "bias": {"weight_decay": 0}, "logit_scale": {"weight_decay": 0}})
    schedule = cosine(5e-5, 5e-4, 0.0, 500, 80000, reset_steps=6000)
    state = TrainState.create(params, adamw_init(params),
                              trainable_mask_tree(params, frozenset()),
                              params["space_dict"])
    step_fn = make_train_step(model, schedule, wd_tree, is_fdt=True,
                              grad_clip_type="logit_scale_param_value",
                              grad_clip_value=3.0, grad_clip_max_value=6.0,
                              donate=False)
    temp = jnp.float32(125.0)

    # compile + warm
    for _ in range(3):
        state, metrics = step_fn(state, batch, temp)
    _ = float(metrics["loss"])

    logdir = tempfile.mkdtemp(prefix="ilvlm_opprof_")
    with trace(logdir):
        for _ in range(5):
            state, metrics = step_fn(state, batch, temp)
        _ = float(metrics["loss"])  # host fence inside the trace window

    xplanes = []
    for root, _, files in os.walk(logdir):
        xplanes += [os.path.join(root, f) for f in files
                    if f.endswith(".xplane.pb")]
    assert xplanes, f"no xplane under {logdir}"

    from xprof.convert import raw_to_tool_data

    data, mime = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    # a JSON DataTable: [{"cols": [{id, label, ...}], "rows": [{"c": [{"v"}]}]}]
    table = json.loads(data)[0]
    ids = [c["id"] for c in table["cols"]]

    def cell(row, col):
        return row["c"][ids.index(col)]["v"]

    rows = [r for r in table["rows"]
            if cell(r, "host_or_device").lower() == "device"]
    rows.sort(key=lambda r: float(cell(r, "total_self_time") or 0), reverse=True)
    total = sum(float(cell(r, "total_self_time") or 0) for r in rows)
    print(f"device total self time {total / 1e3:.2f} ms over traced window "
          f"(5 steps, bs{batch_size})")
    print(f"{'self ms':>9} {'%':>5} {'occ':>5}  op")
    for r in rows[:top_k]:
        us = float(cell(r, "total_self_time") or 0)
        print(f"{us / 1e3:9.3f} {100 * us / total:5.1f} "
              f"{int(cell(r, 'occurrences')):5d}  "
              f"{str(cell(r, 'operation'))[:100]}")


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    main(bs, k, c)
