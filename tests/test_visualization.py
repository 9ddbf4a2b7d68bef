"""Codebook visualization tool tests (pure-python tracker + rendering)."""
import numpy as np

from iterated_learning_for_vlm_tpu.tools.visualization import (
    TopKCodeTracker, dump_text_codes, heatmap_overlay, render_code_grid,
    sweep_image_codes, sweep_text_codes,
)


def test_topk_tracker():
    tracker = TopKCodeTracker(num_codes=4, k=2)
    att = np.array([[0.9, 0.0, 0.1, 0.0],
                    [0.5, 0.4, 0.0, 0.1],
                    [0.95, 0.05, 0.0, 0.0]])
    tracker.update(att, ["a", "b", "c"])
    top0 = tracker.top(0)
    assert [t for _, t in top0] == ["c", "a"]  # highest weights kept
    assert 0 in tracker.active_codes()
    # each sample contributes to its own top-k codes only: code 1 collected
    # "b" (0.4) and "c" (0.05)
    assert tracker.top(1)[0][1] == "b"


def test_heatmap_overlay_shape():
    img = np.random.randint(0, 255, (56, 56, 3)).astype(np.uint8)
    att = np.random.rand(7, 7).astype(np.float32)
    out = heatmap_overlay(img, att)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_image_sweep_and_render(tmp_path):
    rng = np.random.RandomState(0)
    g, codes = 4, 8

    def encoder_fn(images):
        b = len(images)
        token_att = rng.rand(b, g * g, codes).astype(np.float32)
        att_weight = rng.rand(b, codes).astype(np.float32)
        return token_att, att_weight

    batches = [{"image": rng.randn(2, 32, 32, 3).astype(np.float32)} for _ in range(3)]
    tracker = sweep_image_codes(encoder_fn, batches, num_codes=codes, k=3)
    assert tracker.active_codes()
    path = render_code_grid(tracker, tracker.active_codes()[0], str(tmp_path))
    assert path and path.endswith(".png")
    import os

    assert os.path.getsize(path) > 0


def test_text_sweep_and_dump(tmp_path):
    rng = np.random.RandomState(1)

    def encoder_fn(tokens, pad_mask):
        return None, rng.rand(len(tokens), 6).astype(np.float32)

    batches = [{"tokens": np.zeros((2, 5), np.int32),
                "pad_mask": np.zeros((2, 5), np.float32)} for _ in range(2)]
    texts = [["cap a", "cap b"], ["cap c", "cap d"]]
    tracker = sweep_text_codes(encoder_fn, batches, texts, num_codes=6, k=2)
    out = dump_text_codes(tracker, str(tmp_path / "codes.json"), min_items=1)
    import json

    data = json.load(open(out))
    assert data and all("text" in item for v in data.values() for item in v)


def test_text_attention_dump(tmp_path):
    """Per-(caption, layer) attention PNGs from the return_attn surface
    (reference tools/text_visualize.py hook flow)."""
    import jax

    from iterated_learning_for_vlm_tpu.models.text import TextConfig, TextTransformer
    from iterated_learning_for_vlm_tpu.tools.visualization import (
        dump_text_attention, text_attention_maps,
    )

    cfg = TextConfig(context_length=12, vocab_size=200, width=32, heads=2,
                     layers=2, embed_dim=16)
    model = TextTransformer(cfg)
    rng = np.random.RandomState(0)
    tokens = np.zeros((2, 12), np.int32)
    pad_mask = np.full((2, 12), -np.inf, np.float32)
    for i, n in enumerate((5, 8)):
        tokens[i, :n] = rng.randint(1, 199, n)
        tokens[i, n - 1] = 199
        pad_mask[i, :n] = 0.0
    variables = model.init(jax.random.PRNGKey(0), tokens, pad_mask)

    attn = text_attention_maps(model, variables, tokens, pad_mask)
    assert attn.shape == (2, 2, 12, 12)

    paths = dump_text_attention(model, variables, tokens, pad_mask, str(tmp_path))
    assert len(paths) == 2 * 2  # 2 captions x 2 layers
    from PIL import Image as _Image

    im = _Image.open(paths[0])
    assert im.size == (5 * 24, 5 * 24)  # trimmed to caption length
