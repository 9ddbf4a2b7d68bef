"""Legacy contrastive losses (DeCLIP/SLIP capability surface).

Parity targets: reference ``prototype/loss_functions/nt_xent.py`` (NT_Xent and
NT_Xent_gather, SimCLR-style) and ``nt_xent_ConVIRT.py`` (ConVIRT NTXent).
These back the broader method zoo (SLIP/DeCLIP solvers, SURVEY §2.8); the
flagship CLIP/FDT paths use ``train/loss.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def nt_xent(z_i: jnp.ndarray, z_j: jnp.ndarray, temperature: float = 0.1):
    """SimCLR NT-Xent over two augmented views (local batch).

    z_i/z_j: [B, D] (unnormalised).  Positive pairs are (i, i+B); all other
    2B-2 samples are negatives.  Matches nt_xent.py:6-58 semantics.
    """
    b = z_i.shape[0]
    z = jnp.concatenate([z_i, z_j], axis=0)
    z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-10)
    sim = (z @ z.T) / temperature  # [2B, 2B]
    mask = jnp.eye(2 * b, dtype=bool)
    sim = jnp.where(mask, -jnp.inf, sim)
    pos_idx = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, pos_idx[:, None], axis=-1))


def nt_xent_gather(z_i: jnp.ndarray, z_j: jnp.ndarray, temperature: float,
                   axis_name: str):
    """NT-Xent with globally gathered negatives (reference NT_Xent_gather),
    for use inside ``shard_map``: z_i/z_j are local shards."""
    b = z_i.shape[0]
    zi = z_i / (jnp.linalg.norm(z_i, axis=-1, keepdims=True) + 1e-10)
    zj = z_j / (jnp.linalg.norm(z_j, axis=-1, keepdims=True) + 1e-10)
    gi = jax.lax.all_gather(zi, axis_name, tiled=True)  # [B_global, D]
    gj = jax.lax.all_gather(zj, axis_name, tiled=True)
    rank = jax.lax.axis_index(axis_name)
    offset = rank * b

    def one_side(local, g_same, g_other):
        sim_other = (local @ g_other.T) / temperature  # positives on diagonal
        sim_same = (local @ g_same.T) / temperature  # self-sim masked
        col = offset + jnp.arange(b)
        mask_self = jnp.zeros_like(sim_same, dtype=bool).at[jnp.arange(b), col].set(True)
        sim_same = jnp.where(mask_self, -jnp.inf, sim_same)
        logits = jnp.concatenate([sim_other, sim_same], axis=1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, col[:, None], axis=-1))

    loss = 0.5 * (one_side(zi, gi, gj) + one_side(zj, gj, gi))
    return jax.lax.pmean(loss, axis_name)


def filip_loss(
    patch_ft: jnp.ndarray,
    word_ft: jnp.ndarray,
    pad_mask: jnp.ndarray,
    logit_scale: jnp.ndarray,
):
    """FILIP fine-grained late-interaction contrastive loss (the loss behind
    the reference's legacy ``filip_solver.py``, SURVEY §2.8).

    patch_ft: [B, P, D] image token features; word_ft: [B, W, D] text token
    features; pad_mask: [B, W] additive (0 real / -inf pad).

    Pairwise similarity = mean over image tokens of (max over real text
    tokens of token cosine), symmetrised; InfoNCE over the [B, B] matrix.
    """
    p = patch_ft / (jnp.linalg.norm(patch_ft, axis=-1, keepdims=True) + 1e-10)
    w = word_ft / (jnp.linalg.norm(word_ft, axis=-1, keepdims=True) + 1e-10)
    keep = (pad_mask == 0).astype(p.dtype)  # [B, W]

    # token-level sims for every (image i, text j) pair: [Bi, Bj, P, W]
    sim = jnp.einsum("ipd,jwd->ijpw", p, w)
    neg = jnp.finfo(sim.dtype).min
    sim_masked = jnp.where(keep[None, :, None, :] > 0, sim, neg)

    i2t = jnp.mean(jnp.max(sim_masked, axis=3), axis=2)  # [Bi, Bj]
    denom = jnp.maximum(jnp.sum(keep, axis=1), 1.0)  # real words per text
    t2i = jnp.sum(jnp.max(sim, axis=2) * keep[None, :, :], axis=2) / denom[None, :]
    t2i = t2i.T  # [Bj_text, Bi_image] -> rows = texts

    labels = jnp.arange(sim.shape[0])

    def xent(lg):
        logp = jax.nn.log_softmax(lg * logit_scale, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

    return 0.5 * (xent(i2t) + xent(t2i))


def slip_loss(
    image_embed: jnp.ndarray,
    text_embed: jnp.ndarray,
    logit_scale: jnp.ndarray,
    view1_embed: jnp.ndarray,
    view2_embed: jnp.ndarray,
    ssl_temperature: float = 0.1,
    ssl_scale: float = 1.0,
):
    """SLIP objective (legacy ``slip_solver.py``): CLIP InfoNCE on
    (image, text) + scaled SimCLR NT-Xent between two augmented views."""
    from .loss import clip_info_nce

    clip_l, metrics = clip_info_nce(image_embed, text_embed, logit_scale)
    ssl = nt_xent(view1_embed, view2_embed, temperature=ssl_temperature)
    return clip_l + ssl_scale * ssl, {"clip_loss": clip_l, "ssl_loss": ssl, **metrics}


def nt_xent_convirt(z_i: jnp.ndarray, z_j: jnp.ndarray, temperature: float = 0.1):
    """ConVIRT-style bidirectional InfoNCE on paired modalities
    (reference nt_xent_ConVIRT.py): positives are aligned rows only."""
    zi = z_i / (jnp.linalg.norm(z_i, axis=-1, keepdims=True) + 1e-10)
    zj = z_j / (jnp.linalg.norm(z_j, axis=-1, keepdims=True) + 1e-10)
    sim = (zi @ zj.T) / temperature
    labels = jnp.arange(sim.shape[0])
    logp_i = jax.nn.log_softmax(sim, axis=-1)
    logp_j = jax.nn.log_softmax(sim.T, axis=-1)
    li = -jnp.mean(jnp.take_along_axis(logp_i, labels[:, None], axis=-1))
    lj = -jnp.mean(jnp.take_along_axis(logp_j, labels[:, None], axis=-1))
    return 0.5 * (li + lj)
