"""Data pipeline tests: shards, shuffling determinism, augment shapes, batching."""
import io
import json
import os

import numpy as np
import pytest
from PIL import Image

from iterated_learning_for_vlm_tpu.data.augment import mocov2_single, onecrop
from iterated_learning_for_vlm_tpu.data.pipeline import get_wds_dataset
from iterated_learning_for_vlm_tpu.data.shards import (
    detshuffle, expand_shard_pattern, iter_tar_samples, split_shards, write_tar_shard,
)
from iterated_learning_for_vlm_tpu.utils.config import Config


def test_brace_expansion():
    paths = expand_shard_pattern("data/cc3m/{00000..00331}.tar")
    assert len(paths) == 332
    assert paths[0] == "data/cc3m/00000.tar"
    assert paths[-1] == "data/cc3m/00331.tar"
    assert expand_shard_pattern("plain.tar") == ["plain.tar"]


def test_detshuffle_deterministic():
    items = list(range(50))
    a = detshuffle(items, seed=0, epoch=3)
    b = detshuffle(items, seed=0, epoch=3)
    c = detshuffle(items, seed=0, epoch=4)
    assert a == b
    assert a != c
    assert sorted(a) == items


def test_split_shards_round_robin():
    shards = [f"s{i}" for i in range(10)]
    parts = [split_shards(shards, r, 4) for r in range(4)]
    assert sorted(sum(parts, [])) == sorted(shards)
    assert parts[0] == ["s0", "s4", "s8"]


def _jpeg_bytes(value, size=32):
    img = Image.fromarray(np.full((size, size, 3), value, np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return buf.getvalue()


def _make_shards(tmp_path, n_shards=2, per_shard=8):
    paths = []
    k = 0
    for s in range(n_shards):
        samples = []
        for i in range(per_shard):
            samples.append({
                "__key__": f"{k:06d}",
                "jpg": _jpeg_bytes((k * 23) % 255),
                "txt": f"caption number {k}".encode(),
            })
            k += 1
        path = str(tmp_path / f"{s:05d}.tar")
        write_tar_shard(path, iter(samples))
        paths.append(path)
    return paths


def test_tar_roundtrip(tmp_path):
    paths = _make_shards(tmp_path, 1, 4)
    samples = list(iter_tar_samples(paths[0]))
    assert len(samples) == 4
    assert samples[0]["__key__"] == "000000"
    assert b"caption number 0" == samples[0]["txt"]


def test_tar_throwless(tmp_path):
    bad = tmp_path / "bad.tar"
    bad.write_bytes(b"this is not a tar file at all")
    assert list(iter_tar_samples(str(bad))) == []


def test_augment_shapes():
    rng = np.random.default_rng(0)
    img = Image.fromarray(np.random.randint(0, 255, (300, 240, 3), np.uint8))
    out = mocov2_single(img, rng)
    assert out.shape == (224, 224, 3)
    assert out.dtype == np.float32
    out = onecrop(img)
    assert out.shape == (224, 224, 3)
    # normalization applied: values not in [0,1]
    assert out.min() < -0.5


def test_wds_pipeline_batches(tmp_path):
    paths = _make_shards(tmp_path, 2, 16)
    cfg = Config({
        "data_path": paths, "transforms": "MOCOV2_single", "num_samples": 32,
        "workers": 2, "batch_size": 8, "context_length": 32,
    })
    info = get_wds_dataset(cfg, world_size=1)
    assert info.num_batches == 4
    batches = list(info.dataloader)
    assert len(batches) == 4
    b = batches[0]
    assert b["image"].shape == (8, 224, 224, 3)
    assert b["tokens"].shape == (8, 32)
    assert b["pad_mask"].shape == (8, 32)
    assert b["tokens"].dtype == np.int32


def test_wds_pipeline_epoch_determinism(tmp_path):
    paths = _make_shards(tmp_path, 2, 16)
    cfg = Config({
        "data_path": paths, "transforms": "ONECROP", "num_samples": 32,
        "workers": 1, "batch_size": 16, "context_length": 16,
    })
    info = get_wds_dataset(cfg, world_size=1)
    info.set_epoch(0)
    a = [b["tokens"].copy() for b in info.dataloader]
    info.set_epoch(0)
    b = [bb["tokens"].copy() for bb in info.dataloader]
    info.set_epoch(1)
    c = [bb["tokens"].copy() for bb in info.dataloader]
    np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))
    assert not np.array_equal(np.concatenate(a), np.concatenate(c))


def test_multihost_loaders_disjoint_and_complete(tmp_path):
    """Two host ranks must read disjoint shard splits whose union covers the
    dataset (reference split_by_node semantics, clip_dataset_wsd.py:158-240).
    The solver threads jax.process_index()/process_count() into these args."""
    paths = _make_shards(tmp_path, 4, 8)
    cfg = Config({
        "data_path": paths, "transforms": "ONECROP", "num_samples": 32,
        "workers": 1, "batch_size": 8, "context_length": 16,
    })
    ranks = [get_wds_dataset(cfg, world_size=2, rank=r) for r in range(2)]
    # sizing: global batch 16 => 2 batches/epoch, each host emits 2 local batches
    assert all(info.num_batches == 2 for info in ranks)

    def sample_ids(info):
        from iterated_learning_for_vlm_tpu.data.tokenizer import get_tokenizer
        tok = get_tokenizer()
        ids = set()
        for b in info.dataloader:
            for row in b["tokens"]:
                text = tok.decode([t for t in row.tolist() if t])
                # caption is "caption number k" (BPE may split digits)
                ids.add(int("".join(c for c in text if c.isdigit())))
        return ids

    seen = [sample_ids(info) for info in ranks]
    # expected ownership: shards are detshuffled per (seed, epoch) THEN split
    # round-robin over hosts; each shard s holds samples [8s, 8s+8)
    shuffled = detshuffle(paths, 0, 0)
    own = []
    for r in range(2):
        ids = set()
        for shard in split_shards(shuffled, r, 2):
            s = paths.index(shard)
            ids |= set(range(8 * s, 8 * s + 8))
        own.append(ids)
    assert seen[0] and seen[0] <= own[0], seen[0] - own[0]
    assert seen[1] and seen[1] <= own[1], seen[1] - own[1]
    assert not (seen[0] & seen[1]), "hosts read overlapping samples"
    assert not (own[0] & own[1]) and (own[0] | own[1]) == set(range(32))


def test_jpeg_draft_decode():
    """Large JPEGs decode at a DCT-downscaled size (>= the 448 draft target);
    small JPEGs and PNGs are untouched."""
    import io as _io

    import numpy as _np
    from PIL import Image as _Image

    from iterated_learning_for_vlm_tpu.data.pipeline import _decode_image

    rng = _np.random.default_rng(0)

    def jpeg_bytes(h, w, fmt="JPEG"):
        buf = _io.BytesIO()
        _Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype("uint8")).save(buf, fmt)
        return buf.getvalue()

    big = _decode_image({"jpg": jpeg_bytes(1200, 1600)})
    assert big.mode == "RGB"
    assert max(big.size) < 1600 and min(big.size) >= 448  # downscaled, not tiny

    small = _decode_image({"jpg": jpeg_bytes(224, 224)})
    assert small.size == (224, 224)

    png = _decode_image({"png": jpeg_bytes(1024, 1024, fmt="PNG")})
    assert png.size == (1024, 1024)


def test_augment_image_size_override():
    """build_common_augmentation(image_size=N) reshapes both recipes (the
    solver threads the tower resolution into the loader)."""
    from PIL import Image

    from iterated_learning_for_vlm_tpu.data.augment import build_common_augmentation

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (96, 80, 3)).astype("uint8"))
    for name in ("MOCOV2_single", "ONECROP"):
        out = build_common_augmentation(name, image_size=32)(img, rng)
        assert out.shape == (32, 32, 3), (name, out.shape)
        out224 = build_common_augmentation(name)(img, rng)
        assert out224.shape == (224, 224, 3)


def test_uint8_wire_bit_identical_to_float_wire(tmp_path):
    """The uint8 wire format (default): augmented pixels ship as uint8 and
    are normalized on device — within 1 fp32 ulp of the host-normalized
    float32 wire (device FMA fusion) at 1/4 the host->device traffic (the
    tunnel-bound training bottleneck)."""
    import jax

    from iterated_learning_for_vlm_tpu.data.pipeline import (
        get_wds_dataset, normalize_device_batch,
    )

    shards = _make_shards(tmp_path, n_shards=1, per_shard=8)
    base = {"data_path": shards, "transforms": "MOCOV2_single",
            "image_size": 32, "num_samples": 8, "workers": 1, "batch_size": 4}
    d_u8 = get_wds_dataset({**base, "wire_dtype": "uint8"}, seed=3)
    d_f32 = get_wds_dataset({**base, "wire_dtype": "float32"}, seed=3)
    d_u8.set_epoch(0)
    d_f32.set_epoch(0)
    for b8, bf in zip(d_u8.dataloader, d_f32.dataloader):
        assert b8["image"].dtype == np.uint8
        assert bf["image"].dtype == np.float32
        norm = normalize_device_batch(
            {k: jax.numpy.asarray(v) for k, v in b8.items()})
        np.testing.assert_allclose(np.asarray(norm["image"]), bf["image"],
                                   rtol=3e-7, atol=3e-7)
        np.testing.assert_array_equal(b8["tokens"], bf["tokens"])


def test_unshuffled_loader_defaults_to_float32_wire(tmp_path):
    """ADVICE r4 #2: analysis consumers (tools/run_codebook_viz.py) iterate
    the unshuffled loader WITHOUT prefetch_to_device — the only place the
    uint8 wire's device-side normalize runs — so get_unshuffled_wds_dataset
    must default to host-normalized float32 pixels (uint8 stays opt-in)."""
    from iterated_learning_for_vlm_tpu.data.pipeline import (
        get_unshuffled_wds_dataset,
    )

    shards = _make_shards(tmp_path, n_shards=1, per_shard=8)
    base = {"data_path": shards, "transforms": "ONECROP", "image_size": 32,
            "num_samples": 8, "workers": 1, "batch_size": 4}
    d = get_unshuffled_wds_dataset(dict(base))
    batch = next(iter(d.dataloader))
    assert batch["image"].dtype == np.float32
    assert float(batch["image"].min()) < 0.0  # mean-subtracted, not raw
    # explicit opt-in still ships uint8
    d8 = get_unshuffled_wds_dataset({**base, "wire_dtype": "uint8"})
    assert next(iter(d8.dataloader))["image"].dtype == np.uint8
