"""Samplers, auto-augment, COCO loaders, hard negatives."""
import json

import numpy as np
from PIL import Image

from iterated_learning_for_vlm_tpu.data.auto_augment import (
    imagenet_auto_augment, rand_augment,
)
from iterated_learning_for_vlm_tpu.data.coco import COCOCaptionDataset
from iterated_learning_for_vlm_tpu.data.hard_negatives import swap_elements
from iterated_learning_for_vlm_tpu.data.samplers import (
    DistributedGivenIterationSampler, DistributedSampler, batched,
)


def test_distributed_sampler_partition():
    samplers = [DistributedSampler(10, rank=r, world_size=3, shuffle=True, seed=1)
                for r in range(3)]
    for s in samplers:
        s.set_epoch(2)
    parts = [list(s) for s in samplers]
    assert all(len(p) == 4 for p in parts)  # ceil(10/3)=4, padded
    # same epoch -> deterministic
    samplers[0].set_epoch(2)
    assert list(samplers[0]) == parts[0]


def test_given_iteration_sampler_resume():
    full = DistributedGivenIterationSampler(100, total_iter=10, batch_size=4,
                                            last_iter=0, seed=3)
    resumed = DistributedGivenIterationSampler(100, total_iter=10, batch_size=4,
                                              last_iter=6, seed=3)
    assert list(resumed) == list(full)[6 * 4:]
    bs = list(batched(iter(full), 4))
    assert len(bs) == 10 and len(bs[0]) == 4


def test_auto_augment_runs():
    rng = np.random.default_rng(0)
    img = Image.fromarray(np.random.randint(0, 255, (64, 64, 3), np.uint8))
    for _ in range(10):
        out = imagenet_auto_augment(img, rng)
        assert out.size == img.size
    out = rand_augment(img, rng, n=2, magnitude=9)
    assert out.size == img.size


def test_coco_karpathy(tmp_path):
    img_dir = tmp_path / "val2014"
    img_dir.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_dir / "x.jpg")
    data = {"images": [
        {"split": "test", "filepath": "val2014", "filename": "x.jpg",
         "sentences": [{"raw": "a thing"}, {"raw": "another"}]},
        {"split": "train", "filepath": "val2014", "filename": "x.jpg",
         "sentences": [{"raw": "skip me"}]},
    ]}
    ann = tmp_path / "dataset_coco.json"
    ann.write_text(json.dumps(data))
    ds = COCOCaptionDataset(str(tmp_path), str(ann), karpathy_split="test")
    assert len(ds) == 1
    img, caps = ds[0]
    assert caps == ["a thing", "another"]


def test_swap_elements_identity_or_swap():
    import random

    out = swap_elements("a red dog chases a blue cat", random.Random(0))
    # either swapped (nltk present) or identity (gated) — always same tokens
    assert sorted(out.split()) == sorted("a red dog chases a blue cat".split())


def test_correlated_synthetic_data():
    from iterated_learning_for_vlm_tpu.data.synthetic import SyntheticClipData

    d = SyntheticClipData(batch_size=8, image_size=32, context_length=24,
                          correlated=True, num_classes=16, seed=3)
    b0, b1 = d.batch(0), d.batch(1)
    assert b0["image"].shape == (8, 32, 32, 3)
    # deterministic per index
    import numpy as np

    np.testing.assert_array_equal(b0["image"], d.batch(0)["image"])
    assert not np.array_equal(b0["tokens"], b1["tokens"])
    # same class k across batches shares the visual prototype (low noise dist)
    img_a = d._class_image(3, np.random.default_rng(0))
    img_b = d._class_image(3, np.random.default_rng(1))
    img_c = d._class_image(7, np.random.default_rng(2))
    same = float(np.mean((img_a - img_b) ** 2))
    diff = float(np.mean((img_a - img_c) ** 2))
    assert same < diff
