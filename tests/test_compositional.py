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


def test_two_object_scene_color_binding():
    from iterated_learning_for_vlm_tpu.data.compositional import (
        RELATIONS, caption_two, distinct_pair2, draw_two, opposite_relation,
    )

    rng = np.random.default_rng(0)
    p1, p2 = (0, 1), (2, 3)  # red square, blue ring
    # spatial relations place object 1 where the caption says
    img = draw_two(p1, p2, "left of", 96, rng, noise=0.0)
    left, right = img[:, :48], img[:, 48:]
    red = np.asarray(COLORS["red"])
    blue = np.asarray(COLORS["blue"])
    assert (np.abs(left - red).sum(-1) < 0.2).any(), "subject not on the left"
    assert (np.abs(right - blue).sum(-1) < 0.2).any(), "object not on the right"
    img_r = draw_two(p1, p2, "right of", 96, rng, noise=0.0)
    assert (np.abs(img_r[:, 48:] - red).sum(-1) < 0.2).any()
    img_a = draw_two(p1, p2, "above", 96, rng, noise=0.0)
    assert (np.abs(img_a[:48, :] - red).sum(-1) < 0.2).any()

    assert caption_two("red", "square", "blue", "ring") == \
        "a photo of a red square and a blue ring"
    assert caption_two("red", "square", "blue", "ring", "above") == \
        "a photo of a red square above a blue ring"
    for rel in RELATIONS:
        assert opposite_relation(opposite_relation(rel)) == rel

    # distinct_pair2 never shares a factor with the anchor
    seen = seen_pairs()
    for _ in range(50):
        q = distinct_pair2(p1, seen, rng)
        assert q[0] != p1[0] and q[1] != p1[1]


def test_data_generator_splits(tmp_path):
    """The exported probe set carries all 9 SugarCREPE-shaped splits with
    internally-consistent pos/neg captions."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "comp")
    subprocess.run(
        [sys.executable, os.path.join(repo, "tools/make_compositional_data.py"),
         out, "--shards", "1", "--per-shard", "20", "--eval-per-split", "8"],
        check=True, capture_output=True, text=True)
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert len(meta["splits"]) == 9
    for split in meta["splits"]:
        data = json.load(open(os.path.join(out, "eval", f"{split}.json")))
        assert len(data) == 8
        for rec in data.values():
            assert rec["caption"] != rec["negative_caption"]
            assert os.path.isfile(os.path.join(out, "eval", "images",
                                               rec["filename"]))
    # add_obj negatives extend the positive (assert an ABSENT object)
    add = json.load(open(os.path.join(out, "eval", "add_obj.json")))
    for rec in add.values():
        assert rec["negative_caption"].startswith(
            rec["caption"].replace("a photo of a", "a photo of a").split(" and ")[0])
        assert " and " in rec["negative_caption"]
    # swap negatives re-bind the same words
    for split in ("swap_att", "swap_obj"):
        d = json.load(open(os.path.join(out, "eval", f"{split}.json")))
        for rec in d.values():
            assert sorted(rec["caption"].split()) == \
                sorted(rec["negative_caption"].split())
