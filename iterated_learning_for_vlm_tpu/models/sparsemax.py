"""Sparsemax (Martins & Astudillo 2016) with a custom VJP.

Parity target: reference ``prototype/model/sparsemax.py:9-80`` (sort-based
projection, backward ``nz * (g - sum(g*nz)/k)``).

Two jit-safe implementations over the last axis:

- :func:`sparsemax` (sort-based): direct jit translation of the math; exact.
- :func:`sparsemax_bisect`: a TPU-first reformulation — the threshold ``tau``
  solves the monotone scalar equation ``sum(relu(z - tau)) = 1``, so instead
  of sorting 4096 logits per row (sort is expensive on the VPU) we run a
  fixed-iteration bisection that is pure elementwise math + reductions.
  Matches the sort version to ~1e-6 and is the default inside the fused
  Pallas codebook kernel.

Both share the exact sparsemax gradient, so training is identical either way.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sparsemax_grad(output: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    support = (output != 0).astype(g.dtype)
    k = jnp.sum(support, axis=-1, keepdims=True)
    mean_g = jnp.sum(g * support, axis=-1, keepdims=True) / jnp.maximum(k, 1.0)
    return support * (g - mean_g)


@jax.custom_vjp
def sparsemax(z: jnp.ndarray) -> jnp.ndarray:
    """Sort-based sparsemax over the last axis."""
    return _sparsemax_fwd_impl(z)


def _sparsemax_fwd_impl(z: jnp.ndarray) -> jnp.ndarray:
    z = z.astype(jnp.float32)
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=-1, keepdims=True))
    n = z.shape[-1]
    z_sorted = -jnp.sort(-z, axis=-1)  # descending
    rng = jnp.arange(1, n + 1, dtype=z.dtype)
    cumsum = jnp.cumsum(z_sorted, axis=-1)
    in_support = 1.0 + rng * z_sorted > cumsum
    k = jnp.max(jnp.where(in_support, rng, 0.0), axis=-1, keepdims=True)
    support_sum = jnp.sum(jnp.where(in_support, z_sorted, 0.0), axis=-1, keepdims=True)
    tau = (support_sum - 1.0) / k
    return jnp.maximum(z - tau, 0.0)


def _sparsemax_fwd(z):
    out = _sparsemax_fwd_impl(z)
    return out, out


def _sparsemax_bwd(out, g):
    return (_sparsemax_grad(out, g.astype(jnp.float32)).astype(g.dtype),)


sparsemax.defvjp(_sparsemax_fwd, _sparsemax_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def sparsemax_bisect(z: jnp.ndarray, n_iter: int = 40) -> jnp.ndarray:
    """Bisection sparsemax: solve sum(relu(z - tau)) = 1 without sorting."""
    return _bisect_impl(z, n_iter)


def _bisect_impl(z: jnp.ndarray, n_iter: int) -> jnp.ndarray:
    z = z.astype(jnp.float32)
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=-1, keepdims=True))
    n = z.shape[-1]
    # After the max shift: max(z)=0 so tau in [-1, 0]; with sum constraint 1,
    # tau_lo = min over rows of (max-1) = -1, tau_hi = 0.
    lo = jnp.full(z.shape[:-1] + (1,), -1.0, dtype=z.dtype)
    hi = jnp.zeros(z.shape[:-1] + (1,), dtype=z.dtype)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        f = jnp.sum(jnp.maximum(z - mid, 0.0), axis=-1, keepdims=True) - 1.0
        # f is decreasing in tau: f>0 -> tau too small -> move lo up.
        lo = jnp.where(f > 0, mid, lo)
        hi = jnp.where(f > 0, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    tau = 0.5 * (lo + hi)
    out = jnp.maximum(z - tau, 0.0)
    # Exact renormalisation to the simplex (guards vs finite-iteration error).
    out = out / jnp.maximum(jnp.sum(out, axis=-1, keepdims=True), 1e-12)
    return out


def _bisect_fwd(z, n_iter):
    out = _bisect_impl(z, n_iter)
    return out, out


def _bisect_bwd(n_iter, out, g):
    return (_sparsemax_grad(out, g.astype(jnp.float32)).astype(g.dtype),)


sparsemax_bisect.defvjp(_bisect_fwd, _bisect_bwd)
