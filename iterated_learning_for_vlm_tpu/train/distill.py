"""Vision-distillation phase (IL "transmission" variant).

Parity target: reference ``example/clip_fdt/train_solver.py:565-620``
(``vision_distillation``; present in the reference but not wired into
``train()``): snapshot the current model as a frozen teacher, swap/reset the
vision encoder (``swap_vision_encoder``, clip_fdt.py:268-278), freeze the
text tower + codebook, and train the fresh vision tower to match the
teacher's FDT image features under a cosine objective with a plain Adam
optimizer and its own LR schedule.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterator

import jax
import jax.numpy as jnp

from .loss import cosine_distill_loss
from .optim import adamw_init, adamw_update, build_wd_tree, trainable_mask_tree
from .train_state import TrainState


def make_distill_step(model, schedule: Callable, params_template):
    """Jitted ``(state, teacher_params, batch) -> (state, loss)`` step."""
    wd_tree = build_wd_tree(params_template, 0.0, {})

    def step_fn(state: TrainState, teacher_params, batch):
        def loss_fn(params):
            _, student_ft = model.apply(
                {"params": params}, batch["image"], method="extract_img_sd_ft"
            )
            _, teacher_ft = model.apply(
                {"params": teacher_params}, batch["image"], method="extract_img_sd_ft"
            )
            return cosine_distill_loss(student_ft, teacher_ft)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        lr = schedule(state.step + 1)
        new_params, new_opt = adamw_update(
            grads, state.opt_state, state.params,
            lr=lr, wd_tree=wd_tree, trainable=state.trainable,
            b1=0.9, b2=0.999, eps=1e-8,  # torch.optim.Adam defaults (solver:575)
        )
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), loss

    return jax.jit(step_fn, donate_argnums=(0,))


def run_vision_distillation(
    model,
    state: TrainState,
    il_controller,
    batches: Iterator[Dict[str, jnp.ndarray]],
    total_steps: int,
    schedule: Callable,
    logger=None,
) -> TrainState:
    """Full phase: teacher snapshot -> swap vision -> distill -> unfreeze."""
    teacher_params = jax.tree.map(jnp.copy, state.params)

    state = il_controller.swap_vision_encoder(state, int(state.step))
    # freeze text + codebook (freeze_unfreeze_text_weights(unfreeze=False,
    # freeze_codebook=True), solver:572)
    state = state.replace(
        trainable=trainable_mask_tree(
            state.params, frozenset({"text", "logit_scale", "codebook"})
        ),
        opt_state=adamw_init(state.params),
        step=jnp.zeros((), jnp.int32),
    )

    step_fn = make_distill_step(model, schedule, state.params)
    done = 0
    for batch in batches:
        if done >= total_steps:
            break
        state, loss = step_fn(state, teacher_params, batch)
        done += 1
        if logger is not None and done % 50 == 0:
            logger.info("distill step %d/%d loss %.4f", done, total_steps, float(loss))

    # unfreeze text, release codebook (solver:620)
    state = state.replace(trainable=trainable_mask_tree(state.params, frozenset()))
    return state
