"""Orbax checkpointing of the full train state.

Parity target: reference ``example/clip_fdt/train_solver.py:521-540`` —
``ckpt_{step}`` every ``save_freq`` steps plus a sparser ``_k_times`` archive
every 10x, resume via ``last_iter`` threading; eval-side multi-checkpoint
weight averaging ("model soup", ``CLIP_benchmark/models/fdt.py:28-40``).

Unlike the reference (whose ``stored_codebook``/EMA buffers lived outside the
checkpoint and were lost on resume), the ENTIRE :class:`TrainState` —
including IL-phase state — round-trips.
"""
from __future__ import annotations

import os
import re
from typing import List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train_state import TrainState

_CKPT_RE = re.compile(r"ckpt_(\d+)$")


def save_checkpoint(save_dir: str, state: TrainState, step: int, k_times_every: int = 0):
    path = os.path.join(os.path.abspath(save_dir), f"ckpt_{step}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)
    if k_times_every and step % k_times_every == 0:
        arch = os.path.abspath(save_dir.rstrip("/") + "_k_times")
        os.makedirs(arch, exist_ok=True)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.join(arch, f"ckpt_{step}"), state)
    return path


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)


def find_last_checkpoint(save_dir: str) -> Optional[str]:
    """Auto-resume helper (reference ``prototype/solver/clip_solver.py:179-189``)."""
    if not os.path.isdir(save_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(save_dir):
        m = _CKPT_RE.match(name)
        if m and int(m.group(1)) > best_step:
            best_step, best = int(m.group(1)), os.path.join(save_dir, name)
    return best


def restore_params_soup(paths: List[str], template: TrainState):
    """Average params over several checkpoints (reference eval-side soup)."""
    assert paths
    acc = None
    for p in paths:
        state = restore_checkpoint(p, template)
        params = state.params
        if acc is None:
            acc = jax.tree.map(lambda x: np.asarray(x, dtype=np.float64), params)
        else:
            acc = jax.tree.map(lambda a, x: a + np.asarray(x, np.float64), acc, params)
    return jax.tree.map(lambda a: (a / len(paths)).astype(np.float32), acc)
