"""Iterated-learning engine: periodic resets, codebook holding, freezes.

Parity target: reference ``example/clip_fdt/train_solver.py:545-557`` +
``prototype/model/clip_fdt.py:40-48,256-321`` — with the reference's two
committed bugs fixed explicitly (SURVEY §2.2 "known wart"):

1. ``reset_text_encoder(seed)`` is called without a seed in the reference;
   here every reset derives a deterministic key ``fold_in(base_rng, step)``.
2. The reference's ``stored_codebook`` is only snapshotted on resume; here it
   is snapshotted at every reset boundary (it is also part of
   :class:`~..train.train_state.TrainState`, so checkpoints resume
   mid-smooth-window correctly).

``weight_reset`` semantics: torch's ``module.apply(weight_reset)`` only calls
``reset_parameters`` on Conv/Linear/LayerNorm modules, so the reference reset
*keeps* the token embedding, positional embeddings and the packed attention
``in_proj`` weights (they are bare Parameters of ``nn.MultiheadAttention``,
untouched by ``apply``), while Linears go back to *torch-default* kaiming
uniform (NOT the CLIP normal init).  ``semantics="reference"`` reproduces this
exactly; ``semantics="full"`` re-initialises the whole subtree from the CLIP
init distributions (the paper's stated intent).

Vision freezing: the shipped reference code unfreezes the vision encoder at
the smooth boundary but never froze it (the freeze call is absent from the
train loop) — ``freeze_vision_during_smooth=True`` (default) implements the
paper's transmission-phase freeze; ``False`` reproduces the shipped code.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

from .optim import VISION_ROOTS, TEXT_ROOTS, reset_opt_state_for, trainable_mask_tree
from .train_state import TrainState

# Dense submodule names whose torch counterparts are nn.Linear (reset by
# ``weight_reset``); ``in_proj`` maps to MHA's bare parameters (kept).
_RESET_DENSE = {"out_proj", "c_fc", "c_proj", "fc_1", "fc_2", "text_projection"}
_KEEP_LEAVES = {"token_embedding", "positional_embedding", "class_embedding", "proj",
                "logit_scale", "logit_scale_sd", "space_dict"}


def _kaiming_uniform(key, shape, fan_in):
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, jnp.float32, minval=-bound, maxval=bound)


def weight_reset_tree(
    params: Any,
    roots: Tuple[str, ...],
    rng: jax.Array,
    semantics: str = "reference",
    fresh_params: Optional[Any] = None,
) -> Tuple[Any, Any]:
    """Re-initialise the subtrees under ``roots``.

    Returns ``(new_params, reset_mask)`` where ``reset_mask`` is a 0/1 float
    pytree marking leaves that were actually re-drawn (used to zero their
    optimizer moments).
    """
    flat = traverse_util.flatten_dict(params)
    if semantics == "full":
        assert fresh_params is not None, "full semantics needs freshly-initialised params"
        fresh_flat = traverse_util.flatten_dict(fresh_params)

    new, mask = {}, {}
    for i, (path, leaf) in enumerate(sorted(flat.items())):
        p = tuple(str(x) for x in path)
        in_scope = p[0] in roots
        if not in_scope:
            new[path], mask[path] = leaf, jnp.zeros((), jnp.float32)
            continue

        if semantics == "full":
            new[path], mask[path] = fresh_flat[path], jnp.ones((), jnp.float32)
            continue

        key = jax.random.fold_in(rng, i)
        reset_leaf = None
        if "norm" in p:  # LayerNorm scale/bias
            if p[-1] == "scale":
                reset_leaf = jnp.ones_like(leaf)
            elif p[-1] == "bias":
                reset_leaf = jnp.zeros_like(leaf)
        elif len(p) >= 2 and p[-2] in _RESET_DENSE:
            if p[-1] == "kernel":
                reset_leaf = _kaiming_uniform(key, leaf.shape, leaf.shape[-2])
            elif p[-1] == "bias":
                kernel_path = path[:-1] + (path[-1].replace("bias", "kernel"),)
                fan_in = flat[kernel_path].shape[-2]
                reset_leaf = _kaiming_uniform(key, leaf.shape, fan_in)
        elif len(p) >= 2 and p[-2] == "conv1" and p[-1] == "kernel":
            fan_in = 1
            for s in leaf.shape[:-1]:
                fan_in *= s
            reset_leaf = _kaiming_uniform(key, leaf.shape, fan_in)

        if reset_leaf is None:  # kept: embeddings, in_proj, bare params
            new[path], mask[path] = leaf, jnp.zeros((), jnp.float32)
        else:
            new[path], mask[path] = reset_leaf.astype(leaf.dtype), jnp.ones((), jnp.float32)

    unf = traverse_util.unflatten_dict
    return unf(new), unf(mask)


@dataclasses.dataclass
class ResetConfig:
    """Reference ``config_cc3m.yaml:88-94`` ``reset`` block."""

    enable: bool = True
    reset_steps: int = 6000
    reset_nums: int = 12
    smooth_steps: int = 1500
    distil_steps: int = 0
    # extensions (documented divergences / knobs)
    semantics: str = "reference"  # "reference" | "full"
    reset_optimizer_state: bool = True  # False == keep stale torch-Adam moments
    freeze_vision_during_smooth: bool = True  # False == shipped-code behavior
    freeze_codebook_during_smooth: bool = True  # holding implies frozen


class ILController:
    """Host-side phase controller driving pure state transitions.

    Usage: after every optimizer step, call ``state = il.on_step(state)``.
    All transitions produce new TrainState pytrees; the jitted train step is
    never recompiled (masks/flags are runtime inputs).
    """

    def __init__(
        self,
        cfg: ResetConfig,
        base_rng: jax.Array,
        model=None,
        init_fn=None,
        logger=None,
    ):
        self.cfg = cfg
        self.base_rng = base_rng
        self.model = model
        self.init_fn = init_fn  # (rng) -> fresh params, for semantics="full"
        self.logger = logger
        self.stored_vision: Optional[Any] = None  # for swap_vision_encoder

    def _fresh(self, rng: jax.Array) -> Optional[Any]:
        """Fresh CLIP-init params for ``semantics="full"`` resets, drawn from a
        *deterministic* key derived from (base_rng, step) — every reset at the
        same step under the same solver seed reproduces bit-exactly (the
        reference leaves "full" reseeding undefined; SURVEY §7 hard part 1)."""
        if self.cfg.semantics != "full":
            return None
        try:
            return self.init_fn(jax.random.fold_in(rng, 0x66756C6C))  # "full"
        except TypeError:  # legacy zero-arg init_fn
            return self.init_fn()

    # -- primitive operations ----------------------------------------------
    @staticmethod
    def _match_shardings(new_params: Any, old_params: Any) -> Any:
        """Pin re-drawn leaves back onto the old leaves' shardings.

        Freshly-drawn leaves have no sharded operand, so under tensor
        parallelism (``parallel.model_parallel``) a reset would silently
        come back replicated — changing the train step's input shardings
        (recompile) and dropping the Megatron splits for the rest of the
        run.  No-op on untouched leaves and on single-device runs.

        The re-pin goes through ``parallel.mesh.put_global`` rather than
        plain ``jax.device_put``: on a multi-host pod the old leaf's
        sharding spans non-addressable devices and ``device_put`` onto it
        fails — ``put_global`` materializes per-process shards from the
        (deterministically seeded, hence identical-on-every-host) fresh
        draw, which is exactly its contract (``parallel/mesh.py:53``)."""
        from iterated_learning_for_vlm_tpu.parallel.mesh import put_global

        def put(n, o):
            if n is o:
                return n
            sh = getattr(o, "sharding", None)
            if sh is not None and getattr(sh, "mesh", None) is not None:
                return put_global(n, sh)
            return n

        return jax.tree.map(put, new_params, old_params)

    def _pin_mask(self, reset_mask: Any, state: TrainState) -> Any:
        """Reset-mask scalars are freshly drawn host-local arrays; before
        they meet the (global) optimizer moments in ``jnp.where`` on a pod
        they must live on the state's mesh (replicated — same re-pin as
        ``_match_shardings``, keyed off any replicated state scalar)."""
        return jax.tree.map(
            lambda m: self._match_shardings(m, state.hold_codebook), reset_mask)

    def reset_text_encoder(self, state: TrainState, step: int) -> TrainState:
        """Reference ``clip_fdt.py:256-261`` with deterministic seeding."""
        rng = jax.random.fold_in(self.base_rng, int(step))
        fresh = self._fresh(rng)
        new_params, reset_mask = weight_reset_tree(
            state.params, TEXT_ROOTS, rng, self.cfg.semantics, fresh
        )
        new_params = self._match_shardings(new_params, state.params)
        opt_state = state.opt_state
        if self.cfg.reset_optimizer_state:
            opt_state = reset_opt_state_for(opt_state, new_params,
                                            self._pin_mask(reset_mask, state))
        return state.replace(params=new_params, opt_state=opt_state)

    def reset_vision_encoder(self, state: TrainState, step: int) -> TrainState:
        """Reference ``clip_fdt.py:264-266``."""
        rng = jax.random.fold_in(jax.random.fold_in(self.base_rng, int(step)), 1)
        fresh = self._fresh(rng)
        new_params, reset_mask = weight_reset_tree(
            state.params, VISION_ROOTS, rng, self.cfg.semantics, fresh
        )
        new_params = self._match_shardings(new_params, state.params)
        opt_state = state.opt_state
        if self.cfg.reset_optimizer_state:
            opt_state = reset_opt_state_for(opt_state, new_params,
                                            self._pin_mask(reset_mask, state))
        return state.replace(params=new_params, opt_state=opt_state)

    def reset_codebook(self, state: TrainState, step: int) -> TrainState:
        """Reference ``clip_fdt.py:281-283``: space_dict ~ N(0, 1)."""
        rng = jax.random.fold_in(jax.random.fold_in(self.base_rng, int(step)), 2)
        sd = state.params["space_dict"]
        new_params = dict(state.params)
        fresh_sd = jax.random.normal(rng, sd.shape, sd.dtype)
        sh = getattr(sd, "sharding", None)
        if sh is not None and getattr(sh, "mesh", None) is not None:
            # put_global, not device_put: works when the codebook's row
            # sharding spans non-addressable devices (multi-host pod).
            from iterated_learning_for_vlm_tpu.parallel.mesh import put_global
            fresh_sd = put_global(fresh_sd, sh)  # keep the row sharding
        new_params["space_dict"] = fresh_sd
        return state.replace(params=new_params)

    def swap_vision_encoder(self, state: TrainState, step: int) -> TrainState:
        """Reference ``clip_fdt.py:268-278``: exchange current vision weights
        with the stored set (fresh-reset if none stored yet)."""
        flat = traverse_util.flatten_dict(state.params)
        current = {k: v for k, v in flat.items() if str(k[0]) in VISION_ROOTS}
        if self.stored_vision is None:
            state = self.reset_vision_encoder(state, step)
        else:
            merged = dict(flat)
            merged.update(self.stored_vision)
            state = state.replace(params=traverse_util.unflatten_dict(merged))
        self.stored_vision = current
        return state

    def set_frozen(self, state: TrainState, frozen_groups: frozenset) -> TrainState:
        # _match_shardings: trainable_mask_tree draws fresh HOST-LOCAL
        # scalars (SingleDeviceSharding); on a pod Orbax refuses to
        # serialize those ("Cannot serialize host local jax.Array") — found
        # by tools/mh_full_drill.py at the first smooth-end transition.
        return state.replace(
            trainable=self._match_shardings(
                trainable_mask_tree(state.params, frozen_groups),
                state.trainable)
        )

    def snapshot_codebook(self, state: TrainState) -> TrainState:
        # jnp.copy: stored_codebook must NOT alias params["space_dict"] — the
        # train step donates the state, and a buffer appearing twice in a
        # donated pytree is a use-after-free.  (The copy keeps space_dict's
        # mesh sharding; the fresh hold flag is re-pinned like set_frozen.)
        return state.replace(
            stored_codebook=jnp.copy(state.params["space_dict"]),
            hold_codebook=self._match_shardings(
                jnp.ones((), jnp.float32), state.hold_codebook),
        )

    def release_codebook(self, state: TrainState) -> TrainState:
        return state.replace(hold_codebook=self._match_shardings(
            jnp.zeros((), jnp.float32), state.hold_codebook))

    # -- the schedule --------------------------------------------------------
    def on_step(self, state: TrainState, step: int) -> TrainState:
        """Apply phase transitions *after* optimizer step ``step`` (1-based),
        mirroring the reference loop position (train_solver.py:545-557)."""
        cfg = self.cfg
        if not cfg.enable:
            return state
        if not (cfg.reset_steps < step < cfg.reset_steps * cfg.reset_nums):
            # Window over: make sure nothing stays held/frozen.
            if step == cfg.reset_steps * cfg.reset_nums:
                state = self.release_codebook(state)
                state = self.set_frozen(state, frozenset())
            return state

        if step % cfg.reset_steps == 0:
            self._log(f"step {step}: IL reset — snapshot codebook, reset text encoder")
            state = self.snapshot_codebook(state)
            state = self.reset_text_encoder(state, step)
            if cfg.freeze_vision_during_smooth:
                state = self.set_frozen(state, frozenset({"vision"}))
        elif step % cfg.reset_steps == cfg.smooth_steps:
            self._log(f"step {step}: IL smooth end — unfreeze vision, release codebook")
            state = self.release_codebook(state)
            state = self.set_frozen(state, frozenset())
        return state

    def _log(self, msg):
        if self.logger is not None:
            self.logger.info(msg)
