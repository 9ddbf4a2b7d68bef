"""NT-Xent family + FILIP + SLIP loss tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from iterated_learning_for_vlm_tpu.train.contrastive_extras import (
    filip_loss, nt_xent, nt_xent_convirt, slip_loss,
)


def _feats(b=6, d=16, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(b, d).astype(np.float32))


def test_nt_xent_positive_pairs_lower_loss():
    z = _feats()
    aligned = nt_xent(z, z + 0.01 * _feats(seed=1), temperature=0.5)
    random = nt_xent(z, _feats(seed=2), temperature=0.5)
    assert float(aligned) < float(random)


def test_nt_xent_convirt_matches_diagonal_structure():
    z = _feats()
    loss_aligned = nt_xent_convirt(z, z)
    loss_rand = nt_xent_convirt(z, _feats(seed=3))
    assert float(loss_aligned) < float(loss_rand)


def test_filip_loss_prefers_matching_tokens():
    rng = np.random.RandomState(0)
    b, p_tok, w_tok, d = 4, 5, 7, 8
    patches = rng.randn(b, p_tok, d).astype(np.float32)
    # matched words = subset of own patches; mismatched = rolled batch
    words = np.zeros((b, w_tok, d), np.float32)
    words[:, :p_tok] = patches
    words[:, p_tok:] = rng.randn(b, w_tok - p_tok, d)
    pad = np.zeros((b, w_tok), np.float32)
    pad[:, p_tok:] = -np.inf  # only matched tokens are real
    matched = filip_loss(jnp.asarray(patches), jnp.asarray(words), jnp.asarray(pad),
                         10.0)
    rolled = filip_loss(jnp.asarray(patches), jnp.asarray(np.roll(words, 1, 0)),
                        jnp.asarray(pad), 10.0)
    assert float(matched) < float(rolled)
    assert np.isfinite(float(matched))


def test_filip_pad_tokens_ignored():
    rng = np.random.RandomState(1)
    patches = jnp.asarray(rng.randn(3, 4, 8).astype(np.float32))
    words = rng.randn(3, 6, 8).astype(np.float32)
    pad = np.zeros((3, 6), np.float32)
    pad[:, 4:] = -np.inf
    l1 = filip_loss(patches, jnp.asarray(words), jnp.asarray(pad), 5.0)
    words2 = words.copy()
    words2[:, 4:] = 99.0  # junk in padded positions
    l2 = filip_loss(patches, jnp.asarray(words2), jnp.asarray(pad), 5.0)
    assert float(l1) == pytest.approx(float(l2), rel=1e-5)


def test_slip_loss_composition():
    img, txt = _feats(seed=0), _feats(seed=0)
    v1, v2 = _feats(seed=4), _feats(seed=5)
    total, parts = slip_loss(img / jnp.linalg.norm(img, axis=-1, keepdims=True),
                             txt / jnp.linalg.norm(txt, axis=-1, keepdims=True),
                             10.0, v1, v2, ssl_scale=0.5)
    assert float(total) == pytest.approx(
        float(parts["clip_loss"]) + 0.5 * float(parts["ssl_loss"]), rel=1e-5)
