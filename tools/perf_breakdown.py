#!/usr/bin/env python
"""Per-component timing of the CLIP-FDT train step on the real chip.

Times each piece with host-transfer fencing (block_until_ready is unreliable
over the axon tunnel): vision fwd, text fwd, FDT heads, full fwd, grads,
optimizer update, full step.  Used to target perf work (VERDICT r2 item 1).
"""
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from iterated_learning_for_vlm_tpu.models import model_entry
from iterated_learning_for_vlm_tpu.train.optim import (
    adamw_init, adamw_update, build_wd_tree, trainable_mask_tree,
)
from iterated_learning_for_vlm_tpu.train.loss import clip_info_nce
from iterated_learning_for_vlm_tpu.train.schedule import cosine
from iterated_learning_for_vlm_tpu.train.step import make_train_step
from iterated_learning_for_vlm_tpu.train.train_state import TrainState

from bench import model_cfg  # noqa: E402  (repo root on path)


def timed(fn, *args, steps=20, warmup=2, fence=None):
    for _ in range(warmup):
        out = fn(*args)
    fence_val = fence(out) if fence else float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    fence_val = fence(out) if fence else float(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(fence_val)
    return dt * 1000  # ms


def main(batch_size=256, only=None):
    model = model_entry(model_cfg(remat=False, fused=True, flash=False,
                                  unroll=True, fused_attn=True,
                                  fused_attn_text=False))  # the shipping bench config
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((batch_size, 224, 224, 3), dtype=np.float32)),
        "tokens": jnp.asarray(rng.integers(1, 49407, (batch_size, 77)), jnp.int32),
        "pad_mask": jnp.zeros((batch_size, 77), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["image"][:2], batch["tokens"][:2],
                        batch["pad_mask"][:2])["params"]
    wd_tree = build_wd_tree(params, 0.1, {"ln_w": {"weight_decay": 0},
                                          "ln_b": {"weight_decay": 0},
                                          "bias": {"weight_decay": 0},
                                          "logit_scale": {"weight_decay": 0}})
    temp = jnp.asarray(1000.0, jnp.float32)

    vis_fwd = jax.jit(lambda p, im: model.apply(
        {"params": p}, im, method=lambda m, x: m.visual(x)["patches"]))
    txt_fwd = jax.jit(lambda p, tk, pm: model.apply(
        {"params": p}, tk, pm, method=lambda m, t, q: m.text(t, q)["words"]))
    img_sd = jax.jit(lambda p, im: model.apply(
        {"params": p}, im, method="extract_img_sd_ft")[1])
    txt_sd = jax.jit(lambda p, tk, pm: model.apply(
        {"params": p}, tk, pm, method="extract_txt_sd_ft")[1])
    full_fwd = jax.jit(lambda p, b: model.apply(
        {"params": p}, b["image"], b["tokens"], b["pad_mask"], sd_temperature=temp))

    def loss_fn(p, b):
        out = model.apply({"params": p}, b["image"], b["tokens"], b["pad_mask"],
                          sd_temperature=temp)
        loss, _ = clip_info_nce(out["image_embed"], out["text_embed"], out["logit_scale"])
        return loss

    grads_fn = jax.jit(lambda p, b: jax.grad(loss_fn)(p, b))
    vag = jax.jit(lambda p, b: jax.value_and_grad(loss_fn)(p, b))

    opt_state = adamw_init(params)
    trainable = trainable_mask_tree(params, frozenset())
    upd = jax.jit(lambda g, o, p: adamw_update(g, o, p, lr=jnp.float32(1e-4),
                                               wd_tree=wd_tree, trainable=trainable))

    schedule = cosine(5e-5, 5e-4, 0.0, 500, 80000, reset_steps=6000)
    state = TrainState.create(params, adamw_init(params), trainable, params["space_dict"])
    step_fn = make_train_step(model, schedule, wd_tree, is_fdt=True,
                              grad_clip_type="logit_scale_param_value",
                              grad_clip_value=3.0, grad_clip_max_value=6.0,
                              donate=False)

    components = {
        "vision_fwd": lambda: timed(vis_fwd, params, batch["image"]),
        "text_fwd": lambda: timed(txt_fwd, params, batch["tokens"], batch["pad_mask"]),
        "img_sd_fwd": lambda: timed(img_sd, params, batch["image"]),
        "txt_sd_fwd": lambda: timed(txt_sd, params, batch["tokens"], batch["pad_mask"]),
        "full_fwd": lambda: timed(full_fwd, params, batch,
                                  fence=lambda o: float(o["image_embed"].ravel()[0])),
        "grads": lambda: timed(grads_fn, params, batch,
                               fence=lambda o: float(o["logit_scale"][0])),
        "value_and_grad": lambda: timed(vag, params, batch,
                                        fence=lambda o: float(o[0])),
        "adamw_update": lambda: timed(upd, grads_fn(params, batch), opt_state, params,
                                      fence=lambda o: float(o[0]["logit_scale"][0])),
        "full_step": lambda: timed(step_fn, state, batch, temp,
                                   fence=lambda o: float(o[1]["loss"])),
    }
    for name, fn in components.items():
        if only and name not in only:
            continue
        ms = fn()
        print(f"{name:>16}: {ms:8.2f} ms   ({batch_size / (ms / 1000):.0f} pairs/s)",
              flush=True)


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    main(bs, only=sys.argv[2:] or None)
