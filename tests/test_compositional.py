"""Compositional colored-shapes task (data/compositional.py).

The substrate for the IL-effectiveness A/B (VERDICT r2 #5): factor split,
drawing determinism/validity, and the SugarCREPE-probe contract.
"""
import numpy as np
import pytest

from iterated_learning_for_vlm_tpu.data.compositional import (
    COLOR_NAMES, COLORS, SHAPES, caption_for, draw, is_held_out,
    negative_pair, seen_pairs, to_uint8, unseen_pairs,
)


def test_split_covers_every_factor():
    seen, unseen = seen_pairs(), unseen_pairs()
    assert len(seen) + len(unseen) == len(COLOR_NAMES) * len(SHAPES)
    assert len(unseen) == 16
    # every color and every shape appears in TRAINING (only combos are new)
    assert {c for c, _ in seen} == set(range(len(COLOR_NAMES)))
    assert {s for _, s in seen} == set(range(len(SHAPES)))
    assert not (set(seen) & set(unseen))


def test_draw_shapes_valid_and_distinct():
    rng = np.random.default_rng(0)
    imgs = {}
    for si, shape in enumerate(SHAPES):
        img = draw(0, si, 96, rng, noise=0.0)
        assert img.shape == (96, 96, 3) and img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 1.0
        # the red fill is present (shape mask non-empty)
        red = np.asarray(COLORS["red"], np.float32)
        hits = np.isclose(img, red, atol=1e-5).all(axis=-1).mean()
        assert 0.01 < hits < 0.6, (shape, hits)
        imgs[shape] = img
    # masks differ between shapes (same rng offset is fine — just not equal)
    flat = [imgs[s].sum() for s in SHAPES]
    assert len({round(v, 3) for v in flat}) == len(SHAPES)


def test_draw_color_binding():
    """The fill color is the caption's color — the factor the probe swaps."""
    rng = np.random.default_rng(1)
    for ci, cname in enumerate(COLOR_NAMES):
        img = draw(ci, 1, 64, rng, noise=0.0)  # square
        target = np.asarray(COLORS[cname], np.float32)
        assert np.isclose(img, target, atol=1e-5).all(axis=-1).any(), cname


def test_negative_pair_contract():
    rng = np.random.default_rng(2)
    for c, s in unseen_pairs():
        nc, ns = negative_pair(c, s, "color", rng)
        assert ns == s and nc != c
        assert not is_held_out(nc, ns), "negative must be a SEEN composition"
        nc2, ns2 = negative_pair(c, s, "shape", rng)
        assert nc2 == c and ns2 != s
        assert not is_held_out(nc2, ns2)
    with pytest.raises(ValueError):
        negative_pair(0, 0, "texture", rng)


def test_caption_and_uint8():
    assert caption_for("red", "circle") == "a photo of a red circle"
    u8 = to_uint8(np.zeros((4, 4, 3), np.float32))
    assert u8.dtype == np.uint8 and u8.max() == 0
    assert to_uint8(np.ones((1, 1, 3), np.float32)).min() == 255


def test_tokenizer_handles_captions():
    from iterated_learning_for_vlm_tpu.data.tokenizer import get_tokenizer

    tok = get_tokenizer()
    caps = [caption_for(COLOR_NAMES[c], SHAPES[s])
            for c, s in seen_pairs()[:8]]
    tokens, pad = tok(caps, context_length=16)
    assert tokens.shape == (8, 16)
    # short enough for the ctx-16 bucket (no truncation of the EOT)
    assert (pad[:, -1] != 0).all() or (tokens[:, -1] == 0).all()
