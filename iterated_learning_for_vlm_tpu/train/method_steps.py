"""FILIP and SLIP training recipes (legacy method-zoo steps).

Parity targets (SURVEY §2.8): reference ``prototype/solver/filip_solver.py``
(token-wise late-interaction contrastive training) and ``slip_solver.py``
(CLIP + SimCLR on two augmented views).  Both reuse the shared masked-AdamW /
schedule machinery; models are the standard CLIP/CLIP-FDT modules (FILIP
consumes projected token features; SLIP needs the two-view pipeline).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from .contrastive_extras import filip_loss, slip_loss
from .optim import adamw_update, clip_grads
from .train_state import TrainState


def make_filip_train_step(
    model,
    schedule: Callable,
    wd_tree: Any,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-8,
    moment_rounding: str = "stochastic",
    grad_clip_type: str = "none",
    grad_clip_value: float = 0.0,
    donate: bool = True,
):
    """FILIP: fine-grained token-level contrastive step on CLIP models.

    Uses ``extract_patch_ft`` / ``extract_word_ft`` (projected token
    features, reference ``clip.py:98-115``) and the late-interaction loss.
    """

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], _temp=None):
        def loss_fn(params):
            patch_ft = model.apply({"params": params}, batch["image"],
                                   method="extract_patch_ft")
            word_ft, pad_mask = model.apply(
                {"params": params}, batch["tokens"], batch["pad_mask"],
                method="extract_word_ft",
            )
            scale = jnp.minimum(jnp.exp(params["logit_scale"][0]), 100.0)
            loss = filip_loss(patch_ft, word_ft, pad_mask, scale)
            return loss, {"filip_loss": loss}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = clip_grads(grads, grad_clip_type, grad_clip_value)
        lr = schedule(state.step + 1)
        new_params, new_opt = adamw_update(
            grads, state.opt_state, state.params, lr=lr, wd_tree=wd_tree,
            trainable=state.trainable, b1=b1, b2=b2, eps=eps, moment_rounding=moment_rounding,
        )
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), {"loss": loss, "lr": lr, **metrics}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_slip_train_step(
    model,
    schedule: Callable,
    wd_tree: Any,
    ssl_scale: float = 1.0,
    ssl_temperature: float = 0.1,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-8,
    moment_rounding: str = "stochastic",
    donate: bool = True,
):
    """SLIP: CLIP InfoNCE + scaled SimCLR NT-Xent between the two views.

    The SSL embeddings are the CLIP image embeddings of each view (the
    reference uses a projection head on raw features; with the shared
    projected space this matches the SLIP objective shape — a dedicated SSL
    MLP head can be layered via DeCLIPFDT's projector when needed).
    """

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], _temp=None):
        def loss_fn(params):
            out1 = model.apply({"params": params}, batch["image"], batch["tokens"],
                               batch.get("pad_mask"))
            v2 = model.apply({"params": params}, batch["image_v2"],
                             method="encode_image")
            total, parts = slip_loss(
                out1["image_embed"], out1["text_embed"], out1["logit_scale"],
                out1["image_embed"], v2.astype(jnp.float32),
                ssl_temperature=ssl_temperature, ssl_scale=ssl_scale,
            )
            return total, parts

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        lr = schedule(state.step + 1)
        new_params, new_opt = adamw_update(
            grads, state.opt_state, state.params, lr=lr, wd_tree=wd_tree,
            trainable=state.trainable, b1=b1, b2=b2, eps=eps, moment_rounding=moment_rounding,
        )
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), {"loss": loss, "lr": lr, **metrics}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
