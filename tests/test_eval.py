"""Evaluation-harness math tests using a deterministic fake encoder (no jit)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from iterated_learning_for_vlm_tpu.eval.crepe import evaluate_crepe_items, one2many_metrics
from iterated_learning_for_vlm_tpu.eval.group_match import evaluate_group_items, group_scores
from iterated_learning_for_vlm_tpu.eval.sugar_crepe import evaluate_sugar_crepe
from iterated_learning_for_vlm_tpu.eval.zeroshot_classification import (
    accuracy_topk, build_zeroshot_classifier, evaluate_zeroshot_classification,
    mean_per_class_recall,
)
from iterated_learning_for_vlm_tpu.eval.zeroshot_retrieval import evaluate_retrieval


class FakeEncoder:
    """Embeds by hashing content into a fixed direction; 'matching' image/text
    pairs share the direction index, so similarity structure is controllable."""

    def __init__(self, dim=32):
        self.dim = dim

    def _onehot(self, idx):
        v = np.zeros(self.dim, np.float32)
        v[idx % self.dim] = 1.0
        return v

    def encode_images(self, images):
        out = []
        for im in images:
            if isinstance(im, Image.Image):
                arr = np.asarray(im)
            else:
                arr = np.asarray(im)
            out.append(self._onehot(int(arr.astype(np.int64).sum()) % 7))
        return np.stack(out)

    def encode_texts(self, texts):
        return np.stack([self._onehot(self._text_idx(t)) for t in texts])

    @staticmethod
    def _text_idx(t):
        return int(t.split("#")[-1]) if "#" in t else (len(t) % 7)


class DirectEncoder:
    """Encoder whose inputs ARE the embeddings (for exact metric math)."""

    def encode_images(self, images):
        return np.asarray(images, np.float32)

    def encode_texts(self, texts):
        return np.stack([np.asarray(json.loads(t), np.float32) for t in texts])


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def test_accuracy_and_recall():
    logits = np.array([[3.0, 1, 0], [0, 2, 1], [0, 1, 2], [5, 4, 3]])
    labels = np.array([0, 1, 0, 2])
    acc = accuracy_topk(logits, labels)
    assert acc["acc1"] == pytest.approx(0.5)
    r = mean_per_class_recall(logits, labels)
    # class0: 1/2 correct, class1: 1/1, class2: 0/1
    assert r == pytest.approx((0.5 + 1.0 + 0.0) / 3)


def test_retrieval_recall():
    # 3 images along axes e0,e1,e2; captions matching those axes
    imgs = np.eye(3, 4, dtype=np.float32)
    caps = [
        [json.dumps([1.0, 0, 0, 0]), json.dumps([0.9, 0.1, 0, 0])],  # img0: 2 caps
        [json.dumps([0, 1.0, 0, 0])],
        [json.dumps([0, 0, 0.2, 0.8])],  # img2 caption mostly wrong axis
    ]
    m = evaluate_retrieval(DirectEncoder(), imgs, caps, recall_ks=(1,))
    assert m["text_retrieval_recall@1"] >= 2 / 3  # image->text
    assert 0.0 <= m["image_retrieval_recall@1"] <= 1.0


def test_group_scores_winoground_rule():
    # item where everything matches correctly
    good_img = np.stack([np.stack([_unit([1, 0]), _unit([0, 1])])])
    good_txt = good_img.copy()
    m = group_scores(good_img, good_txt)
    assert m == {"text_score": 1.0, "image_score": 1.0, "group_score": 1.0}
    # swapped captions -> all zero
    bad_txt = good_txt[:, ::-1, :]
    m = group_scores(good_img, bad_txt)
    assert m["group_score"] == 0.0


def test_crepe_rank_metrics():
    ranks = np.array([0, 0, 1, 3, 5])
    m = one2many_metrics(ranks)
    assert m["image_to_text_R@1"] == pytest.approx(2 / 5)
    assert m["image_to_text_R@5"] == pytest.approx(4 / 5)
    assert m["image_to_text_mean_rank"] == pytest.approx(ranks.mean() + 1)


def test_crepe_items_scoring():
    items = [
        {"image": np.array([1.0, 0, 0]),
         "captions": [json.dumps([1.0, 0, 0]), json.dumps([0, 1.0, 0]),
                      json.dumps([0, 0, 1.0])]},
        {"image": np.array([0, 1.0, 0]),
         "captions": [json.dumps([0, 0.5, 0]), json.dumps([0, 0.9, 0.1]),
                      json.dumps([1.0, 0, 0])]},
    ]
    m = evaluate_crepe_items(DirectEncoder(), items)
    # item0 pos ranked 1st; item1 pos ranked 2nd (neg1 scores higher)
    assert m["image_to_text_R@1"] == pytest.approx(0.5)
    assert m["image_to_text_R@3"] == pytest.approx(1.0)


def test_sugar_crepe_files(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    # two images with controlled hash sums
    items = {}
    for i in range(2):
        arr = np.full((8, 8, 3), i + 1, np.uint8)  # sum % 7 = (192*(i+1)) % 7
        Image.fromarray(arr).save(img_dir / f"im{i}.jpg")
        idx = int(arr.astype(np.int64).sum()) % 7
        items[str(i)] = {
            "filename": f"im{i}.jpg",
            "caption": f"pos#{idx}",
            "negative_caption": f"neg#{(idx + 3) % 7}",
        }
    with open(data_dir / "swap_obj.json", "w") as f:
        json.dump(items, f)
    m = evaluate_sugar_crepe(FakeEncoder(), str(data_dir), str(img_dir),
                             splits=("swap_obj",))
    assert m["sugar-crepe-swap_obj"] == 1.0
    assert m["sugar-crepe-mean"] == 1.0


def test_zeroshot_classification_dummy():
    enc = FakeEncoder()
    images = [np.full((4, 4, 3), v, np.uint8) for v in (0, 1)]
    sums = [int(np.asarray(im).astype(np.int64).sum()) % 7 for im in images]
    classnames = [f"c#{sums[0]}", f"c#{sums[1]}"]
    templates = ["{}"]
    m = evaluate_zeroshot_classification(enc, images, np.array([0, 1]), classnames,
                                         templates)
    assert m["acc1"] == 1.0
    assert m["mean_per_class_recall"] == 1.0


def test_zeroshot_class_specific_prompt_dict():
    """CuPL-style templates: a dict keyed by classname with per-class prompt
    lists (reference zeroshot_classification.py:43-46) must build the same
    classifier as the equivalent specialised list prompts."""
    enc = FakeEncoder()
    classnames = ["c#3", "c#5"]
    as_dict = build_zeroshot_classifier(
        enc, classnames, {"c#3": ["c#3", "c#3"], "c#5": ["c#5"]})
    as_list = build_zeroshot_classifier(enc, classnames, ["{}"])
    np.testing.assert_allclose(as_dict, as_list, atol=1e-6)


def test_results_evaluators(tmp_path):
    """Offline JSONL scorers (reference prototype/data/metrics/)."""
    import json as _json

    import numpy as _np

    from iterated_learning_for_vlm_tpu.eval.results_evaluator import (
        imagenet_eval, multiclass_eval, topk_accuracy,
    )

    # 4 samples, 3 classes: rows 0,1 correct@1; row 2 correct@2; row 3 wrong
    scores = [[0.9, 0.05, 0.05], [0.1, 0.8, 0.1], [0.6, 0.3, 0.1], [0.1, 0.2, 0.7]]
    labels = [0, 1, 1, 0]
    f = tmp_path / "res.jsonl"
    with open(f, "w") as fh:
        for s, l in zip(scores, labels):
            fh.write(_json.dumps({"score": s, "label": l}) + "\n")
    res = imagenet_eval(str(f), topk=(1, 2))
    assert res["top1"] == 50.0
    assert res["top2"] == 75.0
    # numpy path agrees
    assert topk_accuracy(_np.asarray(scores), _np.asarray(labels), (1,))["top1"] == 50.0

    f2 = tmp_path / "multi.jsonl"
    with open(f2, "w") as fh:
        for n in range(2):
            fh.write(_json.dumps({
                "score": [[0.9, 0.1], [0.2, 0.8]],
                "label_list": [0, 1 if n == 0 else 0],
                "label_name_list": ["color", "shape"],
            }) + "\n")
    res2 = multiclass_eval(str(f2))
    assert res2["color"] == 100.0
    assert res2["shape"] == 50.0
