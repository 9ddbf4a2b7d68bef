"""Contrastive losses.

Parity target: reference ``prototype/loss_functions/loss.py:24-47``
(``ClipInfoCELoss``): symmetric InfoNCE over (local x gathered-global) logits
with rank-offset labels ``rank*bs + arange(bs)`` when the gathered dim exceeds
the local dim.

TPU-native design: two equivalent formulations.

- :func:`clip_info_nce`: *global math*. Under ``jit`` with batch-sharded
  embeddings the plain matmul ``img @ txt.T`` IS the reference's AllGather
  trick — XLA's SPMD partitioner keeps the [B, B] logits sharded by row and
  inserts an all-gather of the column operand over ICI, overlapping it with
  compute.  Labels are simply ``arange(B_global)``.
- :func:`clip_info_nce_sharded`: explicit per-device formulation for use
  inside ``shard_map`` — ``lax.all_gather`` + ``axis_index``-offset labels,
  a literal SPMD restatement of the reference semantics (used by tests to
  pin the label math, and by the explicit-collective train step).

Loss scale convention: the reference divides the mean loss by ``world_size``
before backward while DDP *also* grad-averages (``train_solver.py:420`` +
SURVEY §2.3 quirk).  We use clean global-mean semantics; set
``reference_scale=world_size`` to reproduce the reference's effective
gradient scale exactly.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _softmax_xent(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def _topk_acc(logits: jnp.ndarray, labels: jnp.ndarray, k: int) -> jnp.ndarray:
    """Fraction of rows whose label ranks in the top-k logits (reference
    ``accuracy``, prototype/utils/misc.py:464-478), in [0, 100].

    Ties count AGAINST the label (rank past all tied non-label entries):
    under representation collapse all logits are equal and a tie-friendly
    rank would report 100% accuracy on garbage — observed with FDT at low
    sparsemax temperature. Conservative ranking surfaces the collapse.
    """
    label_logit = jnp.take_along_axis(logits, labels[:, None], axis=-1)
    n = logits.shape[-1]
    is_label = jax.nn.one_hot(labels, n, dtype=jnp.bool_)
    rank = jnp.sum(logits > label_logit, axis=-1) + jnp.sum(
        (logits == label_logit) & ~is_label, axis=-1
    )
    return 100.0 * jnp.mean((rank < k).astype(jnp.float32))


def clip_info_nce(
    image_embed: jnp.ndarray,
    text_embed: jnp.ndarray,
    logit_scale: jnp.ndarray,
    reference_scale: float = 1.0,
):
    """Global-batch symmetric InfoNCE on pre-normalised embeddings.

    Args:
      image_embed/text_embed: [B, D] L2-normalised, batch-sharded under jit.
      logit_scale: scalar multiplier (already exp'd + clamped by the model).
    Returns (loss, metrics) where metrics holds acc1/acc5 of the image->text
    logits (the reference's ``prec1/prec5``, train_solver.py:421).
    """
    b = image_embed.shape[0]
    logits_i = (image_embed @ text_embed.T) * logit_scale  # [B, B] row-sharded
    logits_t = (text_embed @ image_embed.T) * logit_scale
    labels = jnp.arange(b, dtype=jnp.int32)
    loss_i = jnp.mean(_softmax_xent(logits_i, labels))
    loss_t = jnp.mean(_softmax_xent(logits_t, labels))
    loss = 0.5 * (loss_i + loss_t) / reference_scale
    metrics = {
        "acc1": _topk_acc(logits_i, labels, 1),
        "acc5": _topk_acc(logits_i, labels, 5),
    }
    return loss, metrics


def clip_info_nce_sharded(
    image_embed: jnp.ndarray,
    text_embed: jnp.ndarray,
    logit_scale: jnp.ndarray,
    axis_name: str,
    reference_scale: float = 1.0,
):
    """Per-device InfoNCE for use inside ``shard_map``/``pmap``.

    image_embed/text_embed: local [b, D] shards.  Implements the reference's
    gather + rank-offset labels literally:
    ``labels = rank*b + arange(b)`` (loss.py:42) with gradients flowing
    through the all-gather exactly like the reference's AllGather backward
    (allreduce + slice == transpose of all_gather).
    """
    b = image_embed.shape[0]
    gathered_txt = jax.lax.all_gather(text_embed, axis_name, tiled=True)
    gathered_img = jax.lax.all_gather(image_embed, axis_name, tiled=True)

    logits_i = (image_embed @ gathered_txt.T) * logit_scale  # [b, B_global]
    logits_t = (text_embed @ gathered_img.T) * logit_scale

    rank = jax.lax.axis_index(axis_name)
    labels = rank * b + jnp.arange(b, dtype=jnp.int32)

    loss_i = jnp.mean(_softmax_xent(logits_i, labels))
    loss_t = jnp.mean(_softmax_xent(logits_t, labels))
    # Mean over devices -> global mean (each device holds b of B rows).
    loss = jax.lax.pmean(0.5 * (loss_i + loss_t), axis_name) / reference_scale
    metrics = {
        "acc1": jax.lax.pmean(_topk_acc(logits_i, labels, 1), axis_name),
        "acc5": jax.lax.pmean(_topk_acc(logits_i, labels, 5), axis_name),
    }
    return loss, metrics


def label_smooth_ce(logits: jnp.ndarray, labels: jnp.ndarray, smooth_ratio: float):
    """Reference ``LabelSmoothCELoss`` (loss.py:7-21)."""
    n = logits.shape[-1]
    v = smooth_ratio / n
    one_hot = jnp.full_like(logits, v)
    one_hot = one_hot.at[jnp.arange(len(labels)), labels].set(1 - smooth_ratio + v)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.sum(logp * one_hot) / logits.shape[0]


def orthogonal_loss(ft: jnp.ndarray) -> jnp.ndarray:
    """Codebook orthogonality penalty (reference ``orthgonal_loss_fn``,
    loss.py:84-102; defined but unused by the example solvers)."""
    n = ft.shape[0]
    ft = ft / (jnp.linalg.norm(ft, axis=-1, keepdims=True) + 1e-10)
    sim = ft @ ft.T
    return jnp.sum((sim - jnp.eye(n, dtype=ft.dtype)) ** 2) / (n ** 2)


def simsiam_loss(p1, z1, p2, z2, minimize_loss: bool = False):
    """Reference ``SimsiamLoss`` (loss.py:66-82), symmetric variant.

    ``minimize_loss``: the ``D_minimize`` variant (loss.py:58-63) — inputs
    are multi-candidate [N, K, D]; per row take the best-matching candidate
    pair (max cosine) before averaging."""

    def d(p, z):
        z = jax.lax.stop_gradient(z)
        p = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
        z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        return jnp.mean(jnp.sum(p * z, axis=-1))

    def d_min(p, z):
        z = jax.lax.stop_gradient(z)
        p = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
        z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        sim = jnp.einsum("nkd,nld->nkl", p, z)
        return jnp.mean(jnp.max(sim, axis=-1))

    fn = d_min if minimize_loss else d
    return -0.5 * (fn(p1, z2) + fn(p2, z1))


def cosine_distill_loss(student_ft: jnp.ndarray, teacher_ft: jnp.ndarray) -> jnp.ndarray:
    """Vision-distillation objective (reference ``train_solver.py:598-606``):
    negative mean cosine similarity against a frozen teacher."""
    s = student_ft / (jnp.linalg.norm(student_ft, axis=-1, keepdims=True) + 1e-10)
    t = teacher_ft / (jnp.linalg.norm(teacher_ft, axis=-1, keepdims=True) + 1e-10)
    return -jnp.mean(jnp.sum(s * jax.lax.stop_gradient(t), axis=-1))
