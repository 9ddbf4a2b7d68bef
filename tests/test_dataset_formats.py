"""Local dataset-format loaders: MNIST idx, VOC2007 (multilabel + cropped),
Flickr captions-txt (reference builder.py:222-227,336-366,407-410)."""
import gzip
import os
import struct

import numpy as np
import pytest
from PIL import Image

from iterated_learning_for_vlm_tpu.eval.builder import (
    VOC2007_CLASSNAMES, build_dataset,
)


def _write_idx_images(path, arr, compress=False):
    opener = gzip.open if compress else open
    with opener(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, arr.ndim))
        f.write(struct.pack(f">{arr.ndim}I", *arr.shape))
        f.write(arr.tobytes())


def _make_mnist_dir(tmp_path, n=6, compress=False):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (n, 28, 28), dtype=np.int64).astype(np.uint8)
    labels = (np.arange(n) % 10).astype(np.uint8)
    suffix = ".gz" if compress else ""
    _write_idx_images(tmp_path / f"t10k-images-idx3-ubyte{suffix}", images, compress)
    _write_idx_images(tmp_path / f"t10k-labels-idx1-ubyte{suffix}", labels, compress)
    return images, labels


@pytest.mark.parametrize("compress", [False, True])
def test_mnist_idx_loader(tmp_path, compress):
    images, labels = _make_mnist_dir(tmp_path, compress=compress)
    ds = build_dataset(f"mnist:{tmp_path}")
    assert len(ds) == 6
    assert ds.classnames == [str(i) for i in range(10)]
    assert "number" in ds.templates[0]
    assert list(ds.labels) == list(labels)
    got = np.asarray(ds.images[2].convert("L"))
    np.testing.assert_array_equal(got, images[2])


def test_mnist_train_split_missing(tmp_path):
    _make_mnist_dir(tmp_path)
    with pytest.raises(FileNotFoundError):
        build_dataset(f"mnist:{tmp_path}", split="train")


def _make_voc_tree(tmp_path):
    """Two test images: one with {dog, cat}, one with {dog} twice (dedup)."""
    base = tmp_path / "VOCdevkit" / "VOC2007"
    (base / "JPEGImages").mkdir(parents=True)
    (base / "Annotations").mkdir()
    (base / "ImageSets" / "Main").mkdir(parents=True)
    objs = {"000001": [("dog", (2, 3, 20, 22)), ("cat", (1, 1, 10, 12))],
            "000002": [("dog", (0, 0, 8, 8)), ("dog", (5, 5, 30, 28))]}
    rng = np.random.default_rng(1)
    for image_id, items in objs.items():
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.int64).astype(np.uint8)
        ).save(base / "JPEGImages" / f"{image_id}.jpg")
        xml = ["<annotation>"]
        for name, (l, t, r, b) in items:
            xml.append(
                f"<object><name>{name}</name><bndbox><xmin>{l}</xmin>"
                f"<ymin>{t}</ymin><xmax>{r}</xmax><ymax>{b}</ymax>"
                "</bndbox></object>"
            )
        xml.append("</annotation>")
        (base / "Annotations" / f"{image_id}.xml").write_text("".join(xml))
    (base / "ImageSets" / "Main" / "aeroplane_test.txt").write_text(
        "000001 -1\n000002 1\n"
    )
    return objs


def test_voc_multilabel(tmp_path):
    _make_voc_tree(tmp_path)
    ds = build_dataset(f"voc:{tmp_path}")
    assert ds.classnames == VOC2007_CLASSNAMES
    assert ds.labels.shape == (2, 20)
    dog = VOC2007_CLASSNAMES.index("dog")
    cat = VOC2007_CLASSNAMES.index("cat")
    assert ds.labels[0, dog] == 1 and ds.labels[0, cat] == 1
    assert ds.labels[1, dog] == 1 and ds.labels[1].sum() == 1
    # multihot targets route to the mAP path in the harness
    assert ds.labels.ndim == 2


def test_voc_cropped(tmp_path):
    objs = _make_voc_tree(tmp_path)
    ds = build_dataset(f"voc_cropped:{tmp_path}")
    assert len(ds) == 4  # one sample per bounding box
    assert ds.labels.ndim == 1
    # crop size matches the first box of 000001
    (l, t, r, b) = objs["000001"][0][1]
    assert ds.images[0].size == (r - l, b - t)


def test_multilabel_zeroshot_map():
    """[N, C] targets produce mean_average_precision (the reference infers
    multilabel from target.ndim == 2, zeroshot_classification.py:212-214)."""
    from iterated_learning_for_vlm_tpu.eval.zeroshot_classification import (
        evaluate_zeroshot_classification,
    )

    class PerfectEncoder:
        def encode_texts(self, texts):  # called per class with its prompts
            return np.stack([np.eye(3)["abc".index(t)] for t in texts])

        def encode_images(self, images):
            return np.asarray(images, np.float64)

    labels = np.array([[1, 0, 1], [0, 1, 0]])
    images = labels.astype(np.float64)  # image emb == its multihot target
    m = evaluate_zeroshot_classification(
        PerfectEncoder(), images, labels, ["a", "b", "c"], ["{}"],
        multilabel=True,
    )
    assert m == {"mean_average_precision": 1.0}


@pytest.mark.parametrize("name", ["multilingual_mscoco_captions", "xtd200"])
def test_multilingual_retrieval_loader(tmp_path, name):
    """Per-language annotation JSONs (reference multilingual_mscoco.py:18 /
    xtd200.py:20 templates): build_dataset resolves the file from
    --language."""
    from iterated_learning_for_vlm_tpu.eval.builder import ML_RETRIEVAL_TEMPLATES

    rng = np.random.default_rng(3)
    imgs = []
    for i in range(2):
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (8, 8, 3), dtype=np.int64).astype(np.uint8)
        ).save(p)
        imgs.append(f"img{i}.jpg")
    import json as _json

    for lang, caps in (("es", ["un perro", "un gato"]),
                       ("jp", ["犬", "猫"])):
        ann = tmp_path / ML_RETRIEVAL_TEMPLATES[name].format(lang)
        ann.write_text(_json.dumps({"image_paths": imgs, "annotations": caps}),
                       encoding="utf-8")
    ds = build_dataset(f"{name}:{tmp_path}", language="es")
    assert ds.task == "zeroshot_retrieval"
    assert ds.name == f"{name}-es"
    assert ds.captions_per_image == [["un perro"], ["un gato"]]
    ds_jp = build_dataset(f"{name}:{tmp_path}", language="jp")
    assert ds_jp.captions_per_image == [["犬"], ["猫"]]
    with pytest.raises(FileNotFoundError):
        build_dataset(f"{name}:{tmp_path}", language="de")


def test_flickr_txt_loader(tmp_path):
    img_root = tmp_path / "Images"
    img_root.mkdir()
    rng = np.random.default_rng(2)
    for name in ("a.jpg", "b.jpg"):
        Image.fromarray(
            rng.integers(0, 255, (8, 8, 3), dtype=np.int64).astype(np.uint8)
        ).save(img_root / name)
    ann = tmp_path / "captions.txt"
    ann.write_text(
        "image,caption\n"
        "a.jpg,a dog runs\n"
        "a.jpg,commas, inside, caption\n"
        "b.jpg,a cat sits\n"
    )
    ds = build_dataset(f"flickr_txt:{ann}", root=str(img_root))
    assert ds.task == "zeroshot_retrieval"
    assert len(ds) == 2
    assert ds.captions_per_image[0] == ["a dog runs", "commas, inside, caption"]
    assert ds.captions_per_image[1] == ["a cat sits"]
