"""Shared helpers for the Pallas kernels in this package.

One definition of the interpret-mode switch: backend detection changes
(e.g. new experimental platform strings) must apply to every kernel at
once — a per-module copy that misses an update leaves that kernel silently
running in the wrong mode.
"""
from __future__ import annotations

import jax


def interpret_mode() -> bool:
    """Run kernels in Pallas interpret mode off-TPU (CPU mesh tests)."""
    return jax.default_backend() != "tpu"


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
