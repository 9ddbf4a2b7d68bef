"""imagenet1k CuPL prompt table: end-to-end 1000-class classifier build
(VERDICT r4 #6).

The table ships in ``eval/languages/cupl_prompts.json`` under the
``imagenet1k`` key (per-class prompt lists, the reference's
``--custom_template_file`` schema: CLIP_benchmark cli.py:57,
metrics/zeroshot_classification.py:43-46) and is generated deterministically
by ``tools/make_cupl_imagenet.py``.
"""
import json
import os

import numpy as np
import pytest

LANG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "iterated_learning_for_vlm_tpu", "eval", "languages")


def _load():
    with open(os.path.join(LANG, "cupl_prompts.json")) as f:
        table = json.load(f)
    with open(os.path.join(LANG, "en_classnames.json")) as f:
        classnames = json.load(f)["imagenet1k"]
    return table, classnames


def test_cupl_imagenet_table_covers_all_classes():
    table, classnames = _load()
    t = table["imagenet1k"]
    assert len(classnames) == 1000
    missing = [c for c in classnames if c not in t]
    assert not missing, missing[:5]
    for c in ("tench", "ostrich", "ambulance"):
        prompts = t[c]
        assert len(prompts) >= 3
        # class-specific sentences, not bare generic templates
        assert all(c in p for p in prompts), (c, prompts)
    # the CLI override path resolves the imagenet1k key
    from iterated_learning_for_vlm_tpu.eval.cli import _custom_override

    got = _custom_override(os.path.join(LANG, "cupl_prompts.json"),
                           "imagenet1k")
    assert got == t


@pytest.mark.slow
def test_cupl_imagenet_classifier_build_end_to_end():
    """Build the full 1000-class prompt-ensemble classifier through the real
    encoder + zeroshot path (tiny towers keep this CPU-tractable)."""
    import jax

    from iterated_learning_for_vlm_tpu.eval.encode import JitEncoder
    from iterated_learning_for_vlm_tpu.eval.zeroshot_classification import (
        build_zeroshot_classifier,
    )
    from iterated_learning_for_vlm_tpu.models import (
        CLIP, TextConfig, VisionConfig,
    )

    table, classnames = _load()
    V = VisionConfig(input_resolution=16, patch_size=8, width=32, layers=1,
                     heads=2, embed_dim=16)
    T = TextConfig(context_length=24, vocab_size=49409, width=32, heads=2,
                   layers=1, embed_dim=16)
    model = CLIP(vision_cfg=V, text_cfg=T)
    rng = np.random.RandomState(0)
    v = np.asarray(rng.randn(2, 16, 16, 3), np.float32)
    tokens = np.asarray(rng.randint(1, 1000, (2, 24)), np.int32)
    params = model.init(jax.random.PRNGKey(0), v, tokens,
                        np.zeros((2, 24), np.float32))["params"]
    enc = JitEncoder(model, params, is_fdt=False, batch_size=64,
                     text_buckets=(16,))
    w = build_zeroshot_classifier(enc, classnames, table["imagenet1k"])
    assert w.shape == (16, 1000)
    assert np.isfinite(w).all()
    np.testing.assert_allclose(np.linalg.norm(w, axis=0), 1.0, atol=1e-3)
    # class-specific prompts must yield distinct classifier columns
    assert np.linalg.matrix_rank(w.astype(np.float64)) == 16
