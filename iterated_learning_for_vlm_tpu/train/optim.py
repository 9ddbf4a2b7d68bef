"""Optimizer: masked AdamW with per-leaf step counts + param grouping.

Parity targets:

- ``param_group_all`` (reference ``prototype/utils/misc.py:285-462``) +
  ``config_cc3m.yaml:43-55``: zero weight decay on LayerNorm weights/biases,
  all biases, and ``logit_scale``; default decay elsewhere (including the
  codebook ``space_dict`` and embeddings, as in the reference).
- ``optim_entry`` AdamW (``prototype/optimizer/__init__.py``), betas (.9,.98),
  eps 1e-8, wd 0.1.
- Freeze semantics (``clip_fdt.py:285-321`` + permanent conv1 freeze,
  ``visual_transformer.py:12,45-52``): a frozen parameter receives NO update
  of any kind — no weight decay, no moment update, no per-param step count
  advance (torch keeps per-param Adam step counts; a scalar optax count would
  diverge after unfreezing).

TPU-first design: freezing is a *runtime* 0/1 mask pytree fed to the jitted
step, so iterated-learning phase changes never trigger recompilation — the
whole IL cycle runs through ONE compiled step function.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, FrozenSet, Mapping, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

Params = Any

VISION_ROOTS = ("visual", "img_query")
TEXT_ROOTS = ("text", "txt_query")


# -- parameter classification ------------------------------------------------
def param_category(path: Tuple[str, ...]) -> str:
    """Classify a flattened param path into the reference's pconfig buckets."""
    leaf = path[-1]
    if "logit_scale" in path[0] or leaf.startswith("logit_scale"):
        return "logit_scale"
    if leaf == "space_dict" or path[0] == "space_dict":
        return "space_dict"
    in_layernorm = any(p.startswith("ln_") or p == "norm" for p in path)
    if in_layernorm and leaf == "scale":
        return "ln_w"
    if in_layernorm and leaf == "bias":
        return "ln_b"
    if leaf == "bias":
        return "bias"
    return "default"


def build_wd_tree(params: Params, base_wd: float, pconfig: Mapping[str, Mapping] | None) -> Params:
    """Per-leaf weight-decay coefficients from the pconfig overrides."""
    pconfig = pconfig or {}
    flat = traverse_util.flatten_dict(params, sep=None)
    out = {}
    for path, leaf in flat.items():
        cat = param_category(tuple(str(p) for p in path))
        wd = base_wd
        if cat in pconfig and "weight_decay" in pconfig[cat]:
            wd = float(pconfig[cat]["weight_decay"])
        out[path] = wd
    return traverse_util.unflatten_dict(out)


def is_always_frozen(path: Tuple[str, ...]) -> bool:
    """conv1 is permanently frozen in the reference (never trained)."""
    return "conv1" in path


def trainable_mask_tree(
    params: Params,
    frozen_groups: FrozenSet[str] = frozenset(),
) -> Params:
    """0/1 float mask pytree. ``frozen_groups`` from
    {"vision", "text", "logit_scale", "codebook"}; conv1 always frozen."""
    flat = traverse_util.flatten_dict(params, sep=None)
    out = {}
    for path, leaf in flat.items():
        p = tuple(str(x) for x in path)
        frozen = is_always_frozen(p)
        if "vision" in frozen_groups and p[0] in VISION_ROOTS:
            frozen = True
        if "text" in frozen_groups and p[0] in TEXT_ROOTS:
            frozen = True
        if "logit_scale" in frozen_groups and param_category(p) == "logit_scale":
            frozen = True
        if "codebook" in frozen_groups and param_category(p) == "space_dict":
            frozen = True
        out[path] = jnp.asarray(0.0 if frozen else 1.0, jnp.float32)
    return traverse_util.unflatten_dict(out)


def _sr_hash(h: jnp.ndarray) -> jnp.ndarray:
    """32-bit murmur3-style finalizer (uint32 in/out)."""
    h = (h ^ (h >> 16)) * jnp.uint32(0x7FEB352D)
    h = (h ^ (h >> 15)) * jnp.uint32(0x846CA68B)
    return h ^ (h >> 16)


def stochastic_round_bf16(x: jnp.ndarray, salt: jnp.ndarray) -> jnp.ndarray:
    """Unbiased fp32 → bf16 store: add uniform [0, ulp) noise below the bf16
    mantissa, then truncate.

    Nearest-rounding a running average silently drops small updates once they
    fall under half an ulp of the accumulator (swamping) — measured on-chip to
    stall the bs32 plateau-break regime when AdamW moments are kept in plain
    bf16.  SR keeps the accumulation unbiased in expectation.  The 16 noise
    bits come from hashing (element index, per-leaf ``salt``) — independent of
    the value being rounded, a few fused VPU ops per element, no threefry
    traffic.  ``salt`` must change every step (we pass the AdamW step count).
    """
    x32 = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    idx = jax.lax.iota(jnp.uint32, x32.size).reshape(x32.shape)
    noise = _sr_hash(idx * jnp.uint32(0x9E3779B1) ^ salt.astype(jnp.uint32)) & jnp.uint32(0xFFFF)
    # inf/nan guard: leave non-finite values untouched (no carry into exponent)
    rounded = jax.lax.bitcast_convert_type(
        (bits + noise) & jnp.uint32(0xFFFF0000), jnp.float32)
    rounded = jnp.where(jnp.isfinite(x32), rounded, x32)
    return rounded.astype(jnp.bfloat16)


def _store_moment(x: jnp.ndarray, dtype, salt: jnp.ndarray, stochastic: bool) -> jnp.ndarray:
    if dtype == jnp.float32 or x.dtype == dtype:
        return x.astype(dtype)
    if stochastic and dtype == jnp.bfloat16:
        return stochastic_round_bf16(x, salt)
    return x.astype(dtype)


# -- masked AdamW ------------------------------------------------------------
def adamw_init(params: Params, moment_dtype: Any = None) -> Dict[str, Params]:
    """Zero AdamW state.

    ``moment_dtype`` (e.g. ``jnp.bfloat16``) stores the first/second moments
    compressed; ``adamw_update`` computes in fp32 and rounds back to the
    stored dtype, so the knob halves the optimizer's HBM traffic (the AdamW
    update is bandwidth-bound) at the cost of ~8-bit-mantissa moment noise.
    Default ``None`` keeps fp32 moments (reference numerics,
    ``prototype/optimizer/__init__.py`` torch AdamW).
    """
    def z(p):
        return jnp.zeros(p.shape, moment_dtype or p.dtype)

    counts = jax.tree.map(lambda _: jnp.zeros((), jnp.float32), params)
    return {"mu": jax.tree.map(z, params), "nu": jax.tree.map(z, params), "count": counts}


def adamw_update(
    grads: Params,
    state: Dict[str, Params],
    params: Params,
    *,
    lr: jnp.ndarray,
    wd_tree: Params,
    trainable: Params,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-8,
    moment_rounding: str = "stochastic",
):
    """One AdamW step; frozen leaves (mask 0) keep params/moments/counts.

    When the moments are stored compressed (``adamw_init(moment_dtype=...)``)
    the math still runs fp32 and the store-back uses stochastic rounding by
    default (``moment_rounding="nearest"`` opts out) — see
    ``stochastic_round_bf16`` for why nearest-rounding is not safe there.
    """
    stochastic = moment_rounding == "stochastic"

    def leaf(g, mu, nu, cnt, p, wd, t, li):
        g = g.astype(jnp.float32)
        mu_dt, nu_dt = mu.dtype, nu.dtype
        mu, nu = mu.astype(jnp.float32), nu.astype(jnp.float32)
        new_cnt = cnt + t
        new_mu = jnp.where(t > 0, b1 * mu + (1 - b1) * g, mu)
        new_nu = jnp.where(t > 0, b2 * nu + (1 - b2) * (g * g), nu)
        c = jnp.maximum(new_cnt, 1.0)
        mu_hat = new_mu / (1 - b1 ** c)
        nu_hat = new_nu / (1 - b2 ** c)
        step = mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * p
        new_p = jnp.where(t > 0, p - lr * step, p)
        # distinct noise streams per (leaf, step); mu/nu salted differently
        salt = new_cnt.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B) ^ jnp.uint32(li)
        return (new_p,
                _store_moment(new_mu, mu_dt, salt, stochastic),
                _store_moment(new_nu, nu_dt, salt ^ jnp.uint32(0x5BD1E995), stochastic),
                new_cnt)

    flat_g = traverse_util.flatten_dict(grads)
    flat_mu = traverse_util.flatten_dict(state["mu"])
    flat_nu = traverse_util.flatten_dict(state["nu"])
    flat_c = traverse_util.flatten_dict(state["count"])
    flat_p = traverse_util.flatten_dict(params)
    flat_wd = traverse_util.flatten_dict(wd_tree)
    flat_t = traverse_util.flatten_dict(trainable)

    new_p, new_mu, new_nu, new_c = {}, {}, {}, {}
    for li, k in enumerate(sorted(flat_p)):
        new_p[k], new_mu[k], new_nu[k], new_c[k] = leaf(
            flat_g[k], flat_mu[k], flat_nu[k], flat_c[k], flat_p[k], flat_wd[k], flat_t[k],
            li,
        )
    unf = traverse_util.unflatten_dict
    return unf(new_p), {"mu": unf(new_mu), "nu": unf(new_nu), "count": unf(new_c)}


def reset_opt_state_for(
    state: Dict[str, Params], params_template: Params, reset_mask: Params
) -> Dict[str, Params]:
    """Zero the Adam moments/counts for leaves where ``reset_mask`` is 1.

    Used by the IL engine when a submodule is re-initialised: fresh params
    must not inherit stale moments (the reference gets this implicitly —
    torch Adam state keys survive, which is itself a fidelity wart; zeroing
    matches 'a freshly constructed text encoder').
    """

    def z(mask, x):
        return jnp.where(mask > 0, jnp.zeros_like(x), x)

    def zc(mask, c):
        return jnp.where(mask > 0, jnp.zeros_like(c), c)

    return {
        "mu": jax.tree.map(z, reset_mask, state["mu"]),
        "nu": jax.tree.map(z, reset_mask, state["nu"]),
        "count": jax.tree.map(zc, reset_mask, state["count"]),
    }


# -- AdamW_SGD composite (reference prototype/optimizer/AdamW_SGD.py) --------
def sgd_momentum_update_leaf(g, m, p, wd, t, lr, momentum=0.9):
    g = g.astype(jnp.float32) + wd * p
    new_m = momentum * m + g
    new_p = jnp.where(t > 0, p - lr * new_m, p)
    return new_p, jnp.where(t > 0, new_m, m)


def adamw_sgd_init(params: Params) -> Dict[str, Params]:
    state = adamw_init(params)
    state["momentum"] = jax.tree.map(jnp.zeros_like, params)
    return state


def adamw_sgd_update(
    grads: Params,
    state: Dict[str, Params],
    params: Params,
    *,
    lr_adamw: jnp.ndarray,
    lr_sgd: jnp.ndarray,
    wd_tree: Params,
    trainable: Params,
    sgd_group: Callable[[Tuple[str, ...]], bool],
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-8,
    momentum: float = 0.9,
):
    """Two-group composite: leaves where ``sgd_group(path)`` is True take
    SGD-momentum steps, everything else AdamW — the reference's AdamW_SGD
    pattern (e.g. AdamW text tower + SGD vision tower)."""
    adam_p, adam_s = adamw_update(
        grads, {k: state[k] for k in ("mu", "nu", "count")}, params,
        lr=lr_adamw, wd_tree=wd_tree, trainable=trainable, b1=b1, b2=b2, eps=eps,
    )
    flat_g = traverse_util.flatten_dict(grads)
    flat_m = traverse_util.flatten_dict(state["momentum"])
    flat_p = traverse_util.flatten_dict(params)
    flat_w = traverse_util.flatten_dict(wd_tree)
    flat_t = traverse_util.flatten_dict(trainable)
    flat_ap = traverse_util.flatten_dict(adam_p)

    new_p, new_m = {}, {}
    for k in flat_p:
        if sgd_group(tuple(map(str, k))):
            new_p[k], new_m[k] = sgd_momentum_update_leaf(
                flat_g[k], flat_m[k], flat_p[k], flat_w[k], flat_t[k],
                lr_sgd, momentum,
            )
        else:
            new_p[k], new_m[k] = flat_ap[k], flat_m[k]
    unf = traverse_util.unflatten_dict
    out_state = dict(adam_s)
    out_state["momentum"] = unf(new_m)
    return unf(new_p), out_state


# -- LARS (reference prototype/optimizer/lars.py, legacy large-batch opt) ----
def lars_init(params: Params) -> Dict[str, Params]:
    return {"momentum": jax.tree.map(jnp.zeros_like, params)}


def lars_update(
    grads: Params,
    state: Dict[str, Params],
    params: Params,
    *,
    lr: jnp.ndarray,
    wd_tree: Params,
    trainable: Params,
    momentum: float = 0.9,
    trust_coefficient: float = 0.001,
    eps: float = 1e-8,
):
    """Layer-wise adaptive rate scaling: per-leaf trust ratio
    ``trust * ||w|| / (||g|| + wd*||w||)`` scales the LR; SGD-momentum update."""

    def leaf(g, m, p, wd, t):
        g = g.astype(jnp.float32) + wd * p
        w_norm = jnp.linalg.norm(p)
        g_norm = jnp.linalg.norm(g)
        ratio = jnp.where(
            (w_norm > 0) & (g_norm > 0),
            trust_coefficient * w_norm / (g_norm + eps),
            1.0,
        )
        new_m = momentum * m + lr * ratio * g
        new_p = jnp.where(t > 0, p - new_m, p)
        return new_p, jnp.where(t > 0, new_m, m)

    flat_g = traverse_util.flatten_dict(grads)
    flat_m = traverse_util.flatten_dict(state["momentum"])
    flat_p = traverse_util.flatten_dict(params)
    flat_w = traverse_util.flatten_dict(wd_tree)
    flat_t = traverse_util.flatten_dict(trainable)
    new_p, new_m = {}, {}
    for k in flat_p:
        new_p[k], new_m[k] = leaf(flat_g[k], flat_m[k], flat_p[k], flat_w[k], flat_t[k])
    unf = traverse_util.unflatten_dict
    return unf(new_p), {"momentum": unf(new_m)}


# -- gradient clipping (reference prototype/utils/grad_clip.py + solver modes)
def clip_grads(grads: Params, mode: str, value: float) -> Params:
    """Pre-step gradient clipping. Modes 'norm' | 'value' |
    'logit_scale_grad' (clip only the logit_scale grad, solver closure
    ``grad_clip_before``, train_solver.py:402-411); anything else: no-op."""
    if mode == "norm":
        norm = jnp.sqrt(
            sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(grads))
        )
        scale = jnp.minimum(1.0, value / (norm + 1e-6))
        return jax.tree.map(lambda g: g * scale, grads)
    if mode == "value":
        return jax.tree.map(lambda g: jnp.clip(g, -value, value), grads)
    if mode == "logit_scale_grad":
        flat = traverse_util.flatten_dict(grads)
        out = {
            k: (jnp.clip(g, -value, value) if param_category(tuple(map(str, k))) == "logit_scale" else g)
            for k, g in flat.items()
        }
        return traverse_util.unflatten_dict(out)
    return grads


def clamp_logit_scale(params: Params, mode: str, value: float, max_value: float) -> Params:
    """Post-step param clamping (solver closures ``param_clip_before/after``,
    train_solver.py:374-399). 'logit_scale_param_value': clamp to
    [value, max_value]; 'logit_scale_param_abs_min': clamp min."""
    if mode not in ("logit_scale_param_value", "logit_scale_param_abs_min"):
        return params
    flat = traverse_util.flatten_dict(params)
    out = {}
    for k, p in flat.items():
        if tuple(map(str, k))[-1] == "logit_scale":
            if mode == "logit_scale_param_value":
                p = jnp.clip(p, value, max_value)
            else:
                p = jnp.maximum(p, value)
        out[k] = p
    return traverse_util.unflatten_dict(out)
