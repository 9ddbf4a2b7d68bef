"""Nearest-neighbour feature memory bank (NNCLR, DeCLIP legacy).

Parity target: reference ``prototype/model/utils/nnclr_modules/``
(``MemoryBankModule``/``NNMemoryBankModule``, lightly-derived, pure Python):
a FIFO ring buffer of past embeddings plus a nearest-neighbour lookup used by
DeCLIP's NN-supervision branch.

Functional form: the bank is explicit state ``(bank [N, D], ptr)`` flowing
through the step (no module mutation), so it jits and shards cleanly.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def bank_init(size: int, dim: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.zeros((size, dim), dtype), jnp.zeros((), jnp.int32)


def bank_update(
    bank: jnp.ndarray, ptr: jnp.ndarray, batch: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FIFO insert a [B, D] batch at ptr (wrapping)."""
    n = bank.shape[0]
    b = batch.shape[0]
    idx = (ptr + jnp.arange(b)) % n
    bank = bank.at[idx].set(batch.astype(bank.dtype))
    return bank, (ptr + b) % n


def nearest_neighbour(bank: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Return the bank entry with highest cosine similarity per query."""
    qb = queries / (jnp.linalg.norm(queries, axis=-1, keepdims=True) + 1e-10)
    kb = bank / (jnp.linalg.norm(bank, axis=-1, keepdims=True) + 1e-10)
    sim = qb @ kb.T  # [B, N]
    idx = jnp.argmax(sim, axis=-1)
    return bank[idx]
