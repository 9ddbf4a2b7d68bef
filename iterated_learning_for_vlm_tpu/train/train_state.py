"""Training state pytree.

The reference's mutable solver state (model params, torch-Adam state,
``last_iter``, the EMA logit-scale buffer, the stored codebook snapshot and
the freeze flags scattered across ``requires_grad`` attributes) becomes one
immutable pytree that flows through the jitted step and is checkpointed
whole (SURVEY §5 checkpoint/resume: the IL-phase state is part of state).
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar
    params: Any
    opt_state: Dict[str, Any]
    # 0/1 float mask pytree (runtime-traced): which leaves receive updates.
    trainable: Any
    # IL: codebook snapshot used during smooth_steps holding (zeros for CLIP).
    stored_codebook: Any
    # 1.0 while inside the smooth window -> space_dict overwritten each step.
    hold_codebook: jnp.ndarray
    # EMA logit-scale clamp state (reference EMA_logit_scale, solver:61-84).
    ema_buffer: jnp.ndarray
    ema_clip_count: jnp.ndarray
    # Spectral-norm power vectors for the _sp model variants (None otherwise).
    spectral_u: Any = None
    # BatchNorm running statistics for BN-bearing models
    # (ModifiedResNet towers, DeCLIP MLP heads); None for the pure-LN models.
    batch_stats: Any = None

    @classmethod
    def create(cls, params, opt_state, trainable, stored_codebook=None,
               spectral_u=None, batch_stats=None):
        if stored_codebook is None:
            stored_codebook = jnp.zeros((1, 1), jnp.float32)
        else:
            # never alias a params leaf: the train step donates the state and
            # a buffer appearing twice in a donated pytree is a use-after-free
            stored_codebook = jnp.copy(stored_codebook)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            trainable=trainable,
            stored_codebook=stored_codebook,
            hold_codebook=jnp.zeros((), jnp.float32),
            ema_buffer=jnp.asarray(3.125, jnp.float32),
            ema_clip_count=jnp.zeros((), jnp.float32),
            spectral_u=spectral_u,
            batch_stats=batch_stats,
        )
