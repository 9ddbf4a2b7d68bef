"""Captioning metrics + task, `build` CSV aggregation, language mechanism,
CIFAR-style dataset loaders (VERDICT r1 missing #2/#3/#4)."""
import csv
import json
import pickle

import numpy as np
import pytest
from PIL import Image

from iterated_learning_for_vlm_tpu.eval.caption_metrics import (
    bleu, cider_d, rouge_l, score_captions, tokenize,
)


def test_tokenize():
    assert tokenize("A Photo, of THE dog!") == ["a", "photo", "of", "the", "dog"]


def test_bleu_perfect_match():
    c = [tokenize("a dog runs in the park")]
    r = [[tokenize("a dog runs in the park")]]
    scores = bleu(c, r)
    for s in scores:
        assert s == pytest.approx(1.0, abs=1e-6)


def test_bleu_known_value():
    # classic example: candidate "the the the the the the the" vs refs
    c = [["the"] * 7]
    r = [[tokenize("the cat is on the mat"), tokenize("there is a cat on the mat")]]
    scores = bleu(c, r, max_n=1)
    # clipped unigram precision = 2/7; BP: cand_len 7 > closest ref 7 -> 1
    assert scores[0] == pytest.approx(2 / 7, abs=1e-3)


def test_bleu_brevity_penalty():
    c = [tokenize("a dog")]
    r = [[tokenize("a dog runs in the park")]]
    s_full = bleu([tokenize("a dog runs in the park")], r)[0]
    s_short = bleu(c, r)[0]
    assert s_short < s_full  # penalized despite perfect precision


def test_rouge_l():
    c = [tokenize("the cat sat on the mat")]
    r = [[tokenize("the cat sat on the mat")]]
    assert rouge_l(c, r) == pytest.approx(1.0)
    c2 = [tokenize("entirely different words here")]
    assert rouge_l(c2, r) < 0.2


def test_cider_identical_beats_wrong():
    refs = [
        [tokenize("a brown dog plays with a ball")],
        [tokenize("two people ride bicycles down the street")],
    ]
    good = [tokenize("a brown dog plays with a ball"),
            tokenize("two people ride bicycles down the street")]
    bad = [tokenize("two people ride bicycles down the street"),
           tokenize("a brown dog plays with a ball")]
    assert cider_d(good, refs) > cider_d(bad, refs)
    assert cider_d(good, refs) > 1.0  # perfect matches score high (x10 scale)


def test_score_captions_keys():
    m = score_captions(["a dog"], [["a dog", "the dog"]])
    assert set(m) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "ROUGE_L", "CIDEr"}


def test_captioning_task_retrieval_generator():
    """With a discriminating encoder the retrieval generator picks the right
    caption and all metrics hit their maxima."""
    from iterated_learning_for_vlm_tpu.eval.captioning import evaluate_captioning
    from tests.test_eval import FakeEncoder

    # FakeEncoder: image direction = pixel-sum % 7; text direction from '#k'
    images = [Image.fromarray(np.full((8, 8, 3), k, np.uint8)) for k in (1, 2)]
    # pixel sums: 8*8*3*k -> 192k % 7 = 3k % 7
    refs = [[f"caption three #{(192 * 1) % 7}"], [f"caption six #{(192 * 2) % 7}"]]
    m = evaluate_captioning(FakeEncoder(), images, refs)
    assert m["Bleu_1"] == pytest.approx(1.0, abs=1e-6)
    assert m["CIDEr"] > 1.0


def test_cli_build_subcommand(tmp_path):
    from iterated_learning_for_vlm_tpu.eval import cli as eval_cli

    recs = [
        {"dataset": "dummy", "model": "m.yaml", "pretrained": "ckpt_1",
         "task": "zeroshot_classification", "metrics": {"acc1": 0.5, "acc5": 1.0},
         "language": "en"},
        {"dataset": "wds/x", "model": "m.yaml", "pretrained": "ckpt_2",
         "task": "zeroshot_retrieval",
         "metrics": {"image_retrieval_recall@1": 0.25}, "language": "en"},
    ]
    d = tmp_path / "results"
    d.mkdir()
    for i, r in enumerate(recs):
        (d / f"r{i}.json").write_text(json.dumps(r))
    out = tmp_path / "benchmark.csv"
    eval_cli.main(["build", str(d), "--output", str(out)])
    rows = list(csv.DictReader(out.open()))
    assert len(rows) == 2
    assert rows[0]["acc1"] == "0.5"
    assert rows[0]["model_fullname"] == "m.yaml ckpt_1"
    assert rows[1]["image_retrieval_recall@1"] == "0.25"


def test_apply_language():
    from iterated_learning_for_vlm_tpu.eval.builder import EvalDataset, apply_language

    ds = EvalDataset(name="cifar10", task="zeroshot_classification",
                     classnames=["airplane"], templates=["a photo of a {}."])
    out = apply_language(ds, "it")
    assert out.classnames[0] == "aeroplano"
    assert out.templates[0].startswith("una foto")
    # unknown language falls back untouched
    ds2 = EvalDataset(name="cifar10", task="zeroshot_classification",
                      classnames=["airplane"], templates=["t"])
    assert apply_language(ds2, "xx").classnames == ["airplane"]
    # all reference language sets ship (en default + it/cn/jp/ar JSONs,
    # reference datasets/{lang}_classnames.json)
    for lang, first in (("cn", "飞机"), ("jp", "飛行機"), ("ar", "طائرة")):
        ds3 = EvalDataset(name="cifar10", task="zeroshot_classification",
                          classnames=["airplane"], templates=["t"])
        out3 = apply_language(ds3, lang)
        assert out3.classnames[0] == first
        assert "{}" in out3.templates[0]


def test_cifar_pickle_and_npz_loaders(tmp_path):
    from iterated_learning_for_vlm_tpu.eval.builder import build_dataset

    # pickle layout
    d = tmp_path / "cifar"
    d.mkdir()
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, (10, 3 * 8 * 8), dtype=np.int64).astype(np.uint8)
    with open(d / "test_batch", "wb") as f:
        pickle.dump({b"data": data, b"labels": list(range(10))}, f)
    with open(d / "batches.meta", "wb") as f:
        pickle.dump({b"label_names": [f"c{i}".encode() for i in range(10)]}, f)
    ds = build_dataset(f"cifar:{d}")
    assert len(ds) == 10 and ds.classnames[3] == "c3"
    assert ds.images[0].size == (8, 8)

    # npz layout
    npz = tmp_path / "set.npz"
    np.savez(npz, images=rng.integers(0, 255, (4, 8, 8, 3), dtype=np.int64).astype(np.uint8),
             labels=np.arange(4), classnames=np.asarray(["a", "b", "c", "d"]))
    ds2 = build_dataset(f"npz:{npz}")
    assert len(ds2) == 4 and ds2.classnames == ["a", "b", "c", "d"]


@pytest.mark.slow  # re-tiered r4 (~35s); tests/test_languages.py covers the language path fast
def test_cli_language_loop(tmp_path, monkeypatch):
    """--language en it produces one record per language with Italian
    classnames actually applied."""
    import yaml

    from iterated_learning_for_vlm_tpu.eval import builder, cli as eval_cli
    from iterated_learning_for_vlm_tpu.models import (
        CLIP, TextConfig, VisionConfig, register_model,
    )

    V = VisionConfig(input_resolution=32, patch_size=8, width=32, layers=1,
                     heads=2, embed_dim=16)
    T = TextConfig(context_length=16, width=32, heads=2, layers=1, embed_dim=16)
    register_model("clip_tiny_lang", lambda **kw: CLIP(vision_cfg=V, text_cfg=T))

    def tiny_dummy(n=8):
        rng = np.random.default_rng(0)
        images = [Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype("uint8"))
                  for _ in range(2)]
        return builder.EvalDataset(
            name="dummy", task="zeroshot_classification", images=images,
            labels=np.asarray([0, 1]), classnames=["blank image", "noisy image"],
            templates=["a photo of {}"])

    monkeypatch.setattr(builder, "build_dummy", tiny_dummy)
    cfg = tmp_path / "model.yaml"
    cfg.write_text(yaml.safe_dump({"model": {"type": "clip_tiny_lang", "kwargs": {}}}))
    out = tmp_path / "{language}_result.json"
    recs = eval_cli.main([
        "eval", "--model_config", str(cfg), "--dataset", "dummy",
        "--batch_size", "4", "--language", "en", "it", "--output", str(out),
    ])
    assert [r["language"] for r in recs] == ["en", "it"]
    assert (tmp_path / "en_result.json").exists()
    assert (tmp_path / "it_result.json").exists()
