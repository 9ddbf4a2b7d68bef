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
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from .train_state import TrainState

_CKPT_RE = re.compile(r"ckpt_(\d+)$")

# Singleton async checkpointer: device->host copy happens synchronously
# inside save() (so the train step may donate the state buffers right after),
# the disk write runs on a background thread — training no longer stalls for
# the multi-minute Orbax write of a 150M-param state over the tunnel.
_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until all in-flight async checkpoint writes are durable."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(save_dir: str, state: TrainState, step: int,
                    k_times_every: int = 0, use_async: bool = False):
    path = os.path.join(os.path.abspath(save_dir), f"ckpt_{step}")
    targets = [path]
    if k_times_every and step % k_times_every == 0:
        arch = os.path.abspath(save_dir.rstrip("/") + "_k_times")
        os.makedirs(arch, exist_ok=True)
        targets.append(os.path.join(arch, f"ckpt_{step}"))
    # force=True: re-running an experiment into the same output dir replaces
    # stale ckpt_{step} dirs (reference ``torch.save`` overwrites silently;
    # without it Orbax aborts the whole run on "destination already exists").
    if use_async:
        ckptr = _async_checkpointer()
        for t in targets:
            ckptr.wait_until_finished()  # at most one write in flight
            ckptr.save(t, args=ocp.args.StandardSave(state), force=True)
    else:
        for t in targets:
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(t, state, force=True)
    return path


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    wait_for_saves()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)


def modify_state(restored: TrainState, template: TrainState,
                 ignore) -> TrainState:
    """Drop pieces of a loaded checkpoint before finetuning (reference
    ``modify_state``, prototype/utils/misc.py:520-533, driven by the
    ``saver.pretrain.ignore`` config).  ``ignore.key`` entries:
    ``optimizer`` -> fresh optimizer state, ``last_iter`` -> step 0,
    ``ema`` -> fresh EMA-clamp buffers; ``ignore.model`` lists top-level
    param subtrees to keep at their fresh initialization (the reference
    pops them from the state dict; the functional equivalent is taking the
    template's leaves)."""
    keys = set((ignore or {}).get("key", ()) or ())
    state = restored
    if "optimizer" in keys:
        state = state.replace(opt_state=template.opt_state)
    if "last_iter" in keys:
        state = state.replace(step=jnp.zeros((), jnp.int32))
    if "ema" in keys:
        state = state.replace(ema_buffer=template.ema_buffer,
                              ema_clip_count=template.ema_clip_count)
    drop = (ignore or {}).get("model", ()) or ()
    if drop:
        params = dict(state.params)
        for name in drop:
            if name not in template.params:
                raise KeyError(f"saver.pretrain.ignore.model: no param "
                               f"subtree {name!r}")
            params[name] = template.params[name]
        state = state.replace(params=params)
    return state


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
