"""wds exporter -> eval builder roundtrip tests (the eval-set protocol)."""
import numpy as np
from PIL import Image

from iterated_learning_for_vlm_tpu.data.wds_export import (
    export_classification_dataset, export_retrieval_dataset,
)
from iterated_learning_for_vlm_tpu.eval.builder import build_dataset, build_wds_dataset


def _img(v):
    return Image.fromarray(np.full((16, 16, 3), v, np.uint8))


def test_classification_roundtrip(tmp_path):
    root = str(tmp_path / "cifar_like")
    samples = [(_img(i * 20), i % 3) for i in range(7)]
    n = export_classification_dataset(
        root, "test", iter(samples), classnames=["a", "b", "c"],
        templates=["a photo of a {}."], samples_per_shard=3,
    )
    assert n == 3  # 7 samples / 3 per shard
    ds = build_wds_dataset(root, "cifar_like", split="test")
    assert ds.task == "zeroshot_classification"
    assert len(ds.images) == 7
    assert ds.classnames == ["a", "b", "c"]
    assert ds.templates == ["a photo of a {}."]
    np.testing.assert_array_equal(ds.labels, [0, 1, 2, 0, 1, 2, 0])
    # dispatch via the generic entry too
    ds2 = build_dataset("wds/cifar_like", root=root)
    assert len(ds2.images) == 7


def test_retrieval_roundtrip(tmp_path):
    root = str(tmp_path / "coco_like")
    samples = [(_img(40), ["cap one", "cap two"]), (_img(90), ["only cap"])]
    export_retrieval_dataset(root, "test", iter(samples), samples_per_shard=10)
    ds = build_wds_dataset(root, "coco_like", split="test")
    assert ds.task == "zeroshot_retrieval"
    assert ds.captions_per_image == [["cap one", "cap two"], ["only cap"]]
