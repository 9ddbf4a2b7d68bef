"""Parameter initializers matching the reference's PyTorch distributions.

The iterated-learning algorithm re-initializes whole submodules mid-training
(reference ``clip_fdt.py:40-48`` ``weight_reset`` -> ``m.reset_parameters()``),
so initialization *distributions* are part of the algorithm, not a detail:

- ``torch_linear_kaiming_uniform``: torch ``nn.Linear``/``nn.Conv2d`` default
  ``kaiming_uniform_(a=sqrt(5))`` == U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
- ``torch_linear_bias_uniform``: torch default bias U(-1/sqrt(fan_in), ..).
- ``normal(std)``: the CLIP-specific overrides (attn/fc/proj std schedules,
  reference ``visual_transformer.py:28-38`` / ``text_transformer.py:128-141``).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import random
from jax.nn.initializers import normal as normal_init  # noqa: F401  (re-export)


def torch_kaiming_uniform(in_axis: int = -2):
    """torch default weight init for Linear/Conv: U(+-1/sqrt(fan_in)).

    ``fan_in`` is inferred as the product of all dims except the output dim.
    For a flax Dense kernel of shape (in, out) -> fan_in = in.
    For a conv kernel (kh, kw, cin, cout) -> fan_in = kh*kw*cin.
    """

    def init(key, shape, dtype=jnp.float32):
        fan_out_axis = len(shape) - 1  # flax convention: last axis is output
        fan_in = 1
        for i, s in enumerate(shape):
            if i != fan_out_axis:
                fan_in *= s
        bound = 1.0 / (fan_in ** 0.5)
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_bias_uniform(fan_in: int):
    """torch default bias init: U(+-1/sqrt(fan_in)) with the weight's fan_in."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (fan_in ** 0.5)
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def scaled_normal(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * random.normal(key, shape, dtype)

    return init
