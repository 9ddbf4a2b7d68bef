"""Learning-rate schedules as pure functions of the step (jit-safe).

Parity target: reference ``prototype/lr_scheduler/scheduler.py`` — step-driven
schedulers with linear warmup *plus reset-aware re-warmup*: after each
iterated-learning reset boundary the LR re-warms linearly, scaled by the outer
cosine value (``scheduler.py:79-94``, the LR half of the IL algorithm).

All schedules return the absolute LR for a (possibly traced) integer step, so
they can live inside the jitted train step (`optax.inject_hyperparams` style)
or be evaluated host-side for logging.
"""
from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _warmup_line(step, base_lr, warmup_lr, warmup_steps):
    # Reference's line (scheduler.py:83-84): passes through base_lr at step 1.
    return (warmup_lr - base_lr) / (warmup_steps - 1) * (step - 1.0) + base_lr


def cosine(
    base_lr: float,
    warmup_lr: float,
    min_lr: float,
    warmup_steps: int,
    max_iter: int,
    reset_steps: int = 0,
) -> Schedule:
    """Cosine anneal with warmup and IL re-warmup (reference ``Cosine``).

    - step < warmup_steps: linear base_lr -> warmup_lr.
    - else cosine from warmup_lr to min_lr over [warmup_steps, max_iter].
    - if reset_steps > 0 and (step % reset_steps) < warmup_steps: linear
      re-warmup scaled by the current cosine value
      (scheduler.py:87-92 ``outer_lr_scale``).
    """

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        ratio = (step - warmup_steps) / max(max_iter - warmup_steps, 1)
        cos_lr = min_lr + (warmup_lr - min_lr) * (1 + jnp.cos(jnp.pi * ratio)) / 2

        lr = cos_lr
        if warmup_steps >= 2:
            wl = _warmup_line(step, base_lr, warmup_lr, warmup_steps)
            lr = jnp.where(step < warmup_steps, wl, lr)
            if reset_steps > 0:
                in_rewarm = (step >= warmup_steps) & ((step % reset_steps) < warmup_steps)
                rewarm_line = _warmup_line(step % reset_steps, base_lr, warmup_lr, warmup_steps)
                rewarm = cos_lr * (rewarm_line / warmup_lr)
                lr = jnp.where(in_rewarm, rewarm, lr)
        # The reference's rewarm line evaluates below zero at the exact reset
        # boundary when warmup_lr > 2*base_lr and warmup_steps is small (its
        # shipped config stays positive); never step backwards.
        return jnp.maximum(lr, 0.0)

    return fn


def step_schedule(
    base_lr: float,
    warmup_lr: float,
    warmup_steps: int,
    lr_steps: list,
    lr_mults: list,
    max_iter: int,
    reset_steps: int = 0,
) -> Schedule:
    """Piecewise-constant decay (reference ``StepLRScheduler``)."""
    mults = [1.0]
    for m in lr_mults:
        mults.append(mults[-1] * m)
    boundaries = jnp.asarray(lr_steps, jnp.float32)
    values = jnp.asarray(mults, jnp.float32)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        pos = jnp.sum(step >= boundaries)  # bisect_right
        lr = warmup_lr * values[pos]
        if warmup_steps >= 2:
            wl = _warmup_line(step, base_lr, warmup_lr, warmup_steps)
            lr = jnp.where(step < warmup_steps, wl, lr)
        return lr

    return fn


def step_decay(
    base_lr: float,
    warmup_lr: float,
    warmup_steps: int,
    step_size: int,
    decay: float,
    max_iter: int,
    reset_steps: int = 0,
) -> Schedule:
    """Exponential stair decay (reference ``StepDecayLRScheduler``)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        num = jnp.floor((step - warmup_steps) / step_size)
        lr = (decay ** num) * warmup_lr
        if warmup_steps >= 2:
            wl = _warmup_line(step, base_lr, warmup_lr, warmup_steps)
            lr = jnp.where(step < warmup_steps, wl, lr)
        return lr

    return fn


def polynomial(
    base_lr: float,
    warmup_lr: float,
    warmup_steps: int,
    power: float,
    max_iter: int,
    reset_steps: int = 0,
) -> Schedule:
    """Polynomial decay (reference ``PolynomialLRScheduler``)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        factor = (1 - (step - warmup_steps) / float(max_iter)) ** power
        lr = factor * warmup_lr
        if warmup_steps >= 2:
            wl = _warmup_line(step, base_lr, warmup_lr, warmup_steps)
            lr = jnp.where(step < warmup_steps, wl, lr)
        return lr

    return fn


_REGISTRY = {
    "Cosine": cosine,
    "Step": step_schedule,
    "StepDecay": step_decay,
    "Poly": polynomial,
}


def epoch_to_iter(kwargs: dict) -> dict:
    """Epoch-based schedule kwargs -> iteration-based (reference
    ``lr_scheduler/__init__.py:4-15``): ``lr_epochs`` -> ``lr_steps`` and
    ``warmup_epoch`` -> ``warmup_steps`` (floor 2) scaled by
    ``max_iter / max_epoch``."""
    kwargs = dict(kwargs)
    ratio = kwargs["max_iter"] / kwargs.pop("max_epoch")
    if "lr_epochs" in kwargs:
        kwargs["lr_steps"] = [round(e * ratio) for e in kwargs.pop("lr_epochs")]
    if "warmup_epoch" in kwargs:
        kwargs["warmup_steps"] = max(round(kwargs.pop("warmup_epoch") * ratio), 2)
    return kwargs


def scheduler_entry(config) -> Schedule:
    """Build a schedule from the reference YAML block
    (``lr_scheduler: {type, kwargs}``); ``last_iter``/``optimizer`` kwargs from
    the torch API are ignored (the step is explicit here).  ``StepEpoch`` /
    ``CosineEpoch`` convert epoch kwargs via :func:`epoch_to_iter`
    (reference ``scheduler_entry``, ``lr_scheduler/__init__.py:18-21``)."""
    kwargs = dict(config["kwargs"])
    for dead in ("optimizer", "last_iter"):
        kwargs.pop(dead, None)
    stype = config["type"]
    if stype in ("StepEpoch", "CosineEpoch"):
        stype = stype.replace("Epoch", "")
        kwargs = epoch_to_iter(kwargs)
    return _REGISTRY[stype](**kwargs)
