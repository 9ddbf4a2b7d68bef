"""The jitted train step.

One compiled function covers the entire iterated-learning cycle: forward
(CLIP or CLIP-FDT), global-batch InfoNCE (XLA inserts the embedding
all-gather over ICI), gradient clipping, masked AdamW, logit-scale param
clamping, EMA clamping and codebook holding — all phase behavior is driven by
*runtime* inputs (trainable mask, hold flag, temperature), so IL phase
boundaries never recompile.

Reference hot loop being replaced: ``example/clip_fdt/train_solver.py:348-560``
(two explicit NCCL barriers per step, host-side closures for clipping, a
Python attribute for the FDT temperature — all gone).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from .loss import clip_info_nce
from .optim import adamw_update, clamp_logit_scale, clip_grads
from .train_state import TrainState


def _get_logit_scale(params) -> jnp.ndarray:
    return params["logit_scale"]


def _set_logit_scale(params, value):
    new = dict(params)
    new["logit_scale"] = value
    return new


def make_train_step(
    model,
    schedule: Callable,
    wd_tree: Any,
    *,
    is_fdt: bool,
    grad_clip_type: str = "logit_scale_param_value",
    grad_clip_value: float = 3.0,
    grad_clip_max_value: float = 6.0,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-8,
    moment_rounding: str = "stochastic",
    reference_scale: float = 1.0,
    donate: bool = True,
    spectral_norm: bool = False,
    lipreg_lambda: float = 0.0,
):
    """Build the jitted ``(state, batch, sd_temperature) -> (state, metrics)``.

    ``spectral_norm``: forward through the spectral-norm reparam (the ``_sp``
    variants); power vectors live in ``state.spectral_u``.
    ``lipreg_lambda``: add the power-iteration spectral-norm penalty
    (reference ``--lipreg``, example/clip/train_solver.py:388-390).
    """
    assert not (spectral_norm and lipreg_lambda > 0.0), (
        "spectral_norm reparam and lipreg penalty share the power-vector "
        "state; enable one at a time (as in the reference)"
    )

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], sd_temperature: jnp.ndarray):
        has_bn = state.batch_stats is not None

        def loss_fn(params):
            new_u = state.spectral_u
            if spectral_norm:
                from .lipreg import spectral_reparam

                params, new_u = spectral_reparam(params, state.spectral_u)
            kwargs = {"sd_temperature": sd_temperature} if is_fdt else {}
            variables = {"params": params}
            new_stats = None
            if has_bn:  # BN towers (ResNet): thread running stats
                variables["batch_stats"] = state.batch_stats
                out, mutated = model.apply(
                    variables, batch["image"], batch["tokens"],
                    batch.get("pad_mask"), train=True,
                    mutable=["batch_stats"], **kwargs,
                )
                new_stats = mutated["batch_stats"]
            else:
                out = model.apply(
                    variables,
                    batch["image"],
                    batch["tokens"],
                    batch.get("pad_mask"),
                    **kwargs,
                )
            loss, m = clip_info_nce(
                out["image_embed"], out["text_embed"], out["logit_scale"],
                reference_scale=reference_scale,
            )
            if "moe_aux" in out:  # Swin-MoE load-balancing term (weight 0.01,
                # the Swin-MoE default ``aux_loss_weight``)
                loss = loss + 0.01 * out["moe_aux"]
            if lipreg_lambda > 0.0:
                from .lipreg import spectral_penalty

                # warm-started power vectors also live in state.spectral_u
                penalty, new_u = spectral_penalty(params, state.spectral_u, lipreg_lambda)
                loss = loss + penalty
            return loss, (m, new_u, new_stats)

        (loss, (metrics, new_u, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        grads = clip_grads(grads, grad_clip_type, grad_clip_value)

        # param_clip_before (train_solver.py:374-382)
        params = clamp_logit_scale(
            state.params, grad_clip_type, grad_clip_value, grad_clip_max_value
        )
        before_ls = _get_logit_scale(params)

        lr = schedule(state.step + 1)
        new_params, new_opt = adamw_update(
            grads, state.opt_state, params,
            lr=lr, wd_tree=wd_tree, trainable=state.trainable,
            b1=b1, b2=b2, eps=eps, moment_rounding=moment_rounding,
        )

        # param_clip_after (train_solver.py:384-399)
        new_params = clamp_logit_scale(
            new_params, grad_clip_type, grad_clip_value, grad_clip_max_value
        )
        ema_buffer, clip_count = state.ema_buffer, state.ema_clip_count
        ls = _get_logit_scale(new_params)
        if grad_clip_type == "logit_scale_param":
            # Bound the per-step change of logit_scale (delta clamp).
            ls = jnp.clip(ls, before_ls - grad_clip_value, before_ls + grad_clip_value)
            new_params = _set_logit_scale(new_params, ls)
        elif grad_clip_type == "logit_scale_param_ema":
            # Reference EMA clamp (solver:61-84): clamp to buffer +- threshold,
            # then update buffer with momentum .9.
            hi = ema_buffer + grad_clip_value
            lo = ema_buffer - grad_clip_value
            clipped = jnp.clip(ls, lo, hi)
            clip_count = clip_count + jnp.sum((clipped != ls).astype(jnp.float32))
            ls = clipped
            new_params = _set_logit_scale(new_params, ls)
            ema_buffer = 0.9 * ema_buffer + 0.1 * jnp.mean(ls)
        elif grad_clip_type == "constant":
            new_params = _set_logit_scale(new_params, before_ls)

        # Codebook holding during smooth_steps (solver ``keep_codebook_value``).
        if is_fdt:
            held = jnp.where(
                state.hold_codebook > 0, state.stored_codebook, new_params["space_dict"]
            )
            new_params = dict(new_params)
            new_params["space_dict"] = held

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_buffer=ema_buffer,
            ema_clip_count=clip_count,
            spectral_u=new_u,
            batch_stats=new_stats if has_bn else state.batch_stats,
        )
        out_metrics = {
            "loss": loss,
            "lr": lr,
            "logit_scale": jnp.mean(_get_logit_scale(new_params)),
            **metrics,
        }
        return new_state, out_metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model, *, is_fdt: bool):
    """Jitted embedding forward for in-training eval / benchmarks."""

    @functools.partial(jax.jit, static_argnames=())
    def eval_step(params, batch):
        if is_fdt:
            _, img = model.apply(
                {"params": params}, batch["image"], method="extract_img_sd_ft"
            )
            _, txt = model.apply(
                {"params": params}, batch["tokens"], batch["pad_mask"],
                method="extract_txt_sd_ft",
            )
        else:
            img = model.apply({"params": params}, batch["image"], method="encode_image")
            txt = model.apply(
                {"params": params}, batch["tokens"], batch["pad_mask"],
                method="encode_text",
            )
        img = img / (jnp.linalg.norm(img, axis=-1, keepdims=True) + 1e-10)
        txt = txt / (jnp.linalg.norm(txt, axis=-1, keepdims=True) + 1e-10)
        return img, txt

    return eval_step
