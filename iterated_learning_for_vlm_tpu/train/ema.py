"""Exponential moving average of model weights.

Parity target: reference ``prototype/utils/ema.py`` (legacy model EMA used by
the DeCLIP solvers).  Pure-pytree form: ``ema = decay*ema + (1-decay)*params``
with optional warmup-adjusted decay, usable inside the jitted step.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_init(params: Any) -> Any:
    return jax.tree.map(jnp.asarray, params)


def ema_update(ema: Any, params: Any, decay: float = 0.999,
               step: jnp.ndarray | None = None) -> Any:
    """When ``step`` is given, uses the warmup schedule
    ``min(decay, (1+step)/(10+step))`` (timm/DeCLIP convention)."""
    if step is not None:
        d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    else:
        d = decay
    return jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, ema, params)
