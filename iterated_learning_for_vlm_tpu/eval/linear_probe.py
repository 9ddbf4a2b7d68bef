"""Linear probing.

Parity target: reference ``CLIP_benchmark/clip_benchmark/metrics/
linear_probe.py``: cache frozen features, train a logistic-regression head
with AdamW + cosine LR, optional fewshot-k subsetting and a validation-based
weight-decay sweep; report acc1 / mean-per-class recall.

The probe head trains as one jitted full-batch loop (features fit in memory
at these scales), replacing the reference's torch DataLoader epochs.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .zeroshot_classification import accuracy_topk, mean_per_class_recall


def probe_cache_paths(prefix: str, split: str):
    return f"{prefix}_{split}_feats.npy", f"{prefix}_{split}_labels.npy"


def probe_cache_complete(prefix: Optional[str], include_val: bool = False) -> bool:
    """True when every needed split's features are on disk (``--skip_load``);
    ``include_val`` when an explicit ``--val_split`` will also be read."""
    if not prefix:
        return False
    splits = ("train", "test", "val") if include_val else ("train", "test")
    return all(os.path.exists(p) for s in splits
               for p in probe_cache_paths(prefix, s))


def _features(encoder, images, labels, prefix: Optional[str], split: str,
              normalize: bool = True):
    """Frozen features, disk-cached under ``feature_root`` when given
    (reference linear_probe.py Featurizer cache: features + targets saved
    per model x dataset x split, reused across WD sweeps and re-runs).
    ``normalize`` mirrors the reference ``--normalize`` flag, which only
    affects the probe featurizer (linear_probe.py:36-44)."""
    labels = np.asarray(labels)
    if prefix:
        fp, lp = probe_cache_paths(prefix, split)
        if os.path.exists(fp) and os.path.exists(lp):
            return np.load(fp), np.load(lp)
    if encoder is None:
        raise ValueError(
            f"--skip_load given but the probe feature cache is incomplete "
            f"(missing {split} split under prefix {prefix!r})")
    feats = encoder.encode_images(images, normalize=normalize)
    if prefix:
        os.makedirs(os.path.dirname(os.path.abspath(fp)), exist_ok=True)
        np.save(fp, feats)
        np.save(lp, labels)
    return feats, labels


def _train_head(
    feats: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    *,
    lr: float = 0.1,
    weight_decay: float = 0.0,
    steps: int = 500,
    seed: int = 0,
) -> np.ndarray:
    """Full-batch logistic regression; returns [D+1, C] (weights + bias)."""
    d = feats.shape[1]
    x = jnp.asarray(feats)
    y = jnp.asarray(labels)
    w0 = jnp.zeros((d, num_classes), jnp.float32)
    b0 = jnp.zeros((num_classes,), jnp.float32)

    def loss_fn(wb, step):
        w, b = wb
        logits = x @ w + b
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))
        return nll + weight_decay * jnp.sum(w * w)

    def body(i, carry):
        (w, b), (mw, mb) = carry
        gw, gb = jax.grad(lambda wb: loss_fn(wb, i))((w, b))
        lr_i = lr * 0.5 * (1 + jnp.cos(jnp.pi * i / steps))
        mw = 0.9 * mw + gw
        mb = 0.9 * mb + gb
        return (w - lr_i * mw, b - lr_i * mb), (mw, mb)

    (w, b), _ = jax.lax.fori_loop(
        0, steps, body, ((w0, b0), (jnp.zeros_like(w0), jnp.zeros_like(b0)))
    )
    return np.asarray(w), np.asarray(b)


def fewshot_subset(labels: np.ndarray, k: int, seed: int = 0) -> np.ndarray:
    """Indices of at most k examples per class (reference fewshot_k)."""
    rng = np.random.default_rng(seed)
    idxs = []
    for c in np.unique(labels):
        cand = np.where(labels == c)[0]
        rng.shuffle(cand)
        idxs.extend(cand[:k])
    return np.sort(np.asarray(idxs))


def evaluate_linear_probe(
    encoder,
    train_images,
    train_labels: np.ndarray,
    test_images,
    test_labels: np.ndarray,
    num_classes: Optional[int] = None,
    fewshot_k: int = -1,
    val_fraction: float = 0.0,
    wd_candidates=(0.0, 1e-6, 1e-4, 1e-2),
    steps: int = 500,
    seed: int = 0,
    lr: float = 0.1,
    feature_cache_prefix: Optional[str] = None,
    val_images=None,
    val_labels=None,
    normalize: bool = True,
) -> Dict[str, float]:
    train_feats, train_labels = _features(encoder, train_images, train_labels,
                                          feature_cache_prefix, "train", normalize)
    test_feats, test_labels = _features(encoder, test_images, test_labels,
                                        feature_cache_prefix, "test", normalize)
    num_classes = num_classes or int(train_labels.max()) + 1

    if fewshot_k > 0:
        idx = fewshot_subset(train_labels, fewshot_k, seed)
        train_feats, train_labels = train_feats[idx], train_labels[idx]

    # WD search validation set: an explicit val split (reference --val_split)
    # beats the --val_proportion carve-out of train
    val_feats = val_lbls = None
    if val_images is not None:
        val_feats, val_lbls = _features(encoder, val_images, val_labels,
                                        feature_cache_prefix, "val", normalize)
        tr_feats, tr_labels = train_feats, train_labels
    elif val_fraction > 0:
        rng = np.random.default_rng(seed)
        perm = rng.permutation(len(train_feats))
        n_val = max(1, int(len(perm) * val_fraction))
        val_idx, tr_idx = perm[:n_val], perm[n_val:]
        val_feats, val_lbls = train_feats[val_idx], train_labels[val_idx]
        tr_feats, tr_labels = train_feats[tr_idx], train_labels[tr_idx]

    best_wd = wd_candidates[0]
    if val_feats is not None and len(wd_candidates) > 1:
        best_acc = -1.0
        for wd in wd_candidates:
            w, b = _train_head(tr_feats, tr_labels, num_classes,
                               weight_decay=wd, steps=steps, seed=seed, lr=lr)
            acc = float(np.mean((val_feats @ w + b).argmax(-1) == val_lbls))
            if acc > best_acc:
                best_acc, best_wd = acc, wd

    w, b = _train_head(train_feats, train_labels, num_classes,
                       weight_decay=best_wd, steps=steps, seed=seed, lr=lr)
    logits = test_feats @ w + b
    metrics = accuracy_topk(logits, test_labels)
    metrics["mean_per_class_recall"] = mean_per_class_recall(logits, test_labels)
    metrics["weight_decay"] = float(best_wd)
    metrics["normalized"] = bool(normalize)  # reference linear_probe.py:307
    return metrics
