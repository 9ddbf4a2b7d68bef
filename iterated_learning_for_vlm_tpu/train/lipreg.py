"""Lipschitz regularisation via power-iteration spectral norms.

Parity target: reference ``example/clip/train_solver.py:118-154``
(``LipRegManager``): a penalty ``lambda * sum_l sigma_max(W_l)`` over all 2-D
weight matrices, with the power-iteration vector ``v`` warm-started across
steps per layer.  Enabled by the baseline CLIP solver's ``--lipreg`` flag
(train_solver.py:388-390).

TPU-native form: the per-layer ``v`` vectors live in a pytree that flows
through the jitted step (no host dict of tensors), and the whole penalty is
one traced function.  Also exposes :func:`spectral_normalize_tree` — the
inference-time analogue of the ``CLIP_sp`` / ``Clip_FDT_SP`` model variants
(reference ``clip.py:174-177``, ``clip_fdt.py:436-441``), which divide every
Dense kernel by its spectral norm.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util


def _is_dense_kernel(path: Tuple[str, ...], leaf) -> bool:
    return path[-1] == "kernel" and getattr(leaf, "ndim", 0) >= 2


def init_power_vectors(params: Any, rng: jax.Array) -> Dict:
    """One unit vector per 2-D kernel (last-dim sized, matching W.T @ u)."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    i = 0
    for path, leaf in flat.items():
        p = tuple(map(str, path))
        if _is_dense_kernel(p, leaf):
            i += 1
            key = jax.random.fold_in(rng, i)
            v = jax.random.normal(key, (leaf.shape[-1],), jnp.float32)
            out[path] = v / jnp.linalg.norm(v)
    return traverse_util.unflatten_dict(out)


def _sigma_leaf(w: jnp.ndarray, v: jnp.ndarray, num_iterations: int):
    """Largest singular value of the (stacked) kernel via power iteration.
    w: [..., in, out]; v: [out]. Returns (sigma_sum, new_v) — for scanned
    layer-stacked kernels the per-layer sigmas are summed."""
    w2 = w.reshape((-1,) + w.shape[-2:]).astype(jnp.float32)  # [L, in, out]

    def one(wl, v):
        u = wl @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
        for _ in range(num_iterations):
            v = wl.T @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u = wl @ v
            u = u / (jnp.linalg.norm(u) + 1e-12)
        return jnp.dot(u, wl @ v), v

    sigmas, vs = jax.vmap(one, in_axes=(0, None))(w2, v)
    return jnp.sum(sigmas), vs.mean(axis=0) / (jnp.linalg.norm(vs.mean(axis=0)) + 1e-12)


def spectral_penalty(
    params: Any, power_vectors: Any, lambda_reg: float, num_iterations: int = 1
):
    """Returns (penalty, new_power_vectors).  Call inside the loss fn with
    ``stop_gradient`` on v (the reference iterates on ``weight.data``)."""
    flat_p = traverse_util.flatten_dict(params)
    flat_v = traverse_util.flatten_dict(power_vectors)
    total = jnp.zeros((), jnp.float32)
    new_v = {}
    for path, v in flat_v.items():
        w = flat_p[path]
        sigma, nv = _sigma_leaf(w, jax.lax.stop_gradient(v), num_iterations)
        total = total + sigma
        new_v[path] = jax.lax.stop_gradient(nv)
    return lambda_reg * total, traverse_util.unflatten_dict(new_v)


def spectral_reparam(
    params: Any, u_tree: Any, num_iterations: int = 1
) -> Tuple[Any, Any]:
    """Training-time spectral-norm reparameterisation (the ``_sp`` model
    variants — reference ``CLIP_sp``/``Clip_FDT_SP`` wrap every Linear except
    ``out_proj`` in ``torch.nn.utils.spectral_norm``).

    Exactly like torch: per kernel W, power-iterate the stored left vector u
    (stop-gradient), compute ``sigma = u . (W v)`` with u/v constant w.r.t.
    the gradient, and use ``W / sigma`` in the forward.  Returns the
    reparameterised params and the updated u vectors (thread them through
    TrainState like the torch buffer).
    """
    flat_p = traverse_util.flatten_dict(params)
    flat_u = traverse_util.flatten_dict(u_tree)
    out_p = dict(flat_p)
    out_u = {}
    for path, u in flat_u.items():
        w = flat_p[path]
        w2 = w.reshape((-1,) + w.shape[-2:]).astype(jnp.float32)  # [L, in, out]

        def one(wl, ul):
            for _ in range(num_iterations):
                v = wl @ ul
                v = v / (jnp.linalg.norm(v) + 1e-12)
                ul = wl.T @ v
                ul = ul / (jnp.linalg.norm(ul) + 1e-12)
            ul = jax.lax.stop_gradient(ul)
            v = jax.lax.stop_gradient(v)
            sigma = jnp.dot(v, wl @ ul)
            return wl / jnp.maximum(sigma, 1e-12), ul

        if w2.shape[0] == 1:
            wn, un = one(w2[0], u)
            out_p[path] = wn.reshape(w.shape).astype(w.dtype)
            out_u[path] = un
        else:  # scanned layer-stacked kernel: u has [L, out]
            wn, un = jax.vmap(one)(w2, u)
            out_p[path] = wn.reshape(w.shape).astype(w.dtype)
            out_u[path] = un
    return traverse_util.unflatten_dict(out_p), traverse_util.unflatten_dict(out_u)


def init_spectral_u(params: Any, rng: jax.Array, skip_out_proj: bool = True) -> Any:
    """Per-kernel right-side power vectors u[out] (stacked [L, out] for
    scanned kernels); out_proj excluded per the reference."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    i = 0
    for path, leaf in flat.items():
        p = tuple(map(str, path))
        # Dense kernels only: [in, out] or scanned [L, in, out]; convs (4-D)
        # are not Linears in the reference wrapper.
        if not _is_dense_kernel(p, leaf) or leaf.ndim > 3:
            continue
        if skip_out_proj and len(p) >= 2 and p[-2] == "out_proj":
            continue
        i += 1
        key = jax.random.fold_in(rng, i)
        shape = ((leaf.shape[0],) if leaf.ndim > 2 else ()) + (leaf.shape[-1],)
        u = jax.random.normal(key, shape, jnp.float32)
        u = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-12)
        out[path] = u
    return traverse_util.unflatten_dict(out)


def spectral_normalize_tree(params: Any, num_iterations: int = 5) -> Any:
    """Divide every Dense kernel by its spectral norm (SP model variants)."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        p = tuple(map(str, path))
        if _is_dense_kernel(p, leaf) and p[-2] != "out_proj":
            w2 = leaf.reshape((-1,) + leaf.shape[-2:]).astype(jnp.float32)

            def norm_one(wl):
                v = jnp.ones((wl.shape[-1],), jnp.float32)
                v = v / jnp.linalg.norm(v)
                for _ in range(num_iterations):
                    u = wl @ v
                    u = u / (jnp.linalg.norm(u) + 1e-12)
                    v = wl.T @ u
                    v = v / (jnp.linalg.norm(v) + 1e-12)
                sigma = jnp.dot(u, wl @ v)
                return wl / jnp.maximum(sigma, 1e-12)

            out[path] = jax.vmap(norm_one)(w2).reshape(leaf.shape).astype(leaf.dtype)
        else:
            out[path] = leaf
    return traverse_util.unflatten_dict(out)
