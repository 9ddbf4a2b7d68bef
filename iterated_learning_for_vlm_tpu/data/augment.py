"""Image augmentation recipes (host-side, PIL + numpy).

Parity target: reference ``prototype/data/imagenet_dataloader.py:9-120``
``build_common_augmentation``:

- ``MOCOV2_single`` (the training recipe, ``config_cc3m.yaml:71``):
  RandomResizedCrop(224, scale=(0.2, 1)) -> ColorJitter(.4,.4,.4,.1)@p=.8 ->
  RandomGrayscale(p=.2) -> GaussianBlur(sigma U[.1,2])@p=.5 -> HFlip(p=.5) ->
  ToTensor -> ImageNet normalize (mean .485/.456/.406, std .229/.224/.225).
- ``ONECROP`` (eval): Resize(256) -> CenterCrop(224) -> normalize.

Outputs are NHWC float32 (TPU-native layout; the reference is NCHW).
Randomness is driven by an explicit ``np.random.Generator`` so the pipeline
is reproducible per (seed, epoch, shard, sample).
"""
from __future__ import annotations

import math
from typing import Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


# fused uint8 -> normalized float32: x/255 then (x-mean)/std collapses to
# one multiply-add pass (x * scale + offset) — ~0.3 ms/image on the ingest
# profile vs the three-pass form
_NORM_SCALE = (1.0 / (255.0 * IMAGENET_STD)).astype(np.float32)
_NORM_OFFSET = (-IMAGENET_MEAN / IMAGENET_STD).astype(np.float32)


def _to_array(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img, dtype=np.float32)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return arr * _NORM_SCALE + _NORM_OFFSET


def random_resized_crop(
    img: Image.Image,
    rng: np.random.Generator,
    size: int = 224,
    scale: Tuple[float, float] = (0.2, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> Image.Image:
    """torchvision RandomResizedCrop semantics (10 tries then center fallback)."""
    w, h = img.size
    area = w * h
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x = int(rng.integers(0, w - cw + 1))
            y = int(rng.integers(0, h - ch + 1))
            return img.resize((size, size), Image.BICUBIC, box=(x, y, x + cw, y + ch))
    # fallback: center crop to in-range aspect
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    x, y = (w - cw) // 2, (h - ch) // 2
    return img.resize((size, size), Image.BICUBIC, box=(x, y, x + cw, y + ch))


def _hue_shift(im: Image.Image, f: float) -> Image.Image:
    """Shift hue by ``f`` turns via a 256-entry LUT on the H channel.

    ``point()`` runs in C; this replaces a numpy HSV round-trip that cost
    ~2.4 ms/image (65% of the jitter budget on the ingest profile,
    tools/bench_ingest.py) with ~0.8 ms, same uint8 HSV transform."""
    hsv = im.convert("HSV")
    h, s, v = hsv.split()
    off = int(f * 255)
    lut = [(i + off) % 256 for i in range(256)]
    return Image.merge("HSV", (h.point(lut), s, v)).convert("RGB")


def color_jitter(img: Image.Image, rng: np.random.Generator,
                 brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1) -> Image.Image:
    ops = []
    if brightness > 0:
        f = rng.uniform(max(0, 1 - brightness), 1 + brightness)
        ops.append(lambda im, f=f: ImageEnhance.Brightness(im).enhance(f))
    if contrast > 0:
        f = rng.uniform(max(0, 1 - contrast), 1 + contrast)
        ops.append(lambda im, f=f: ImageEnhance.Contrast(im).enhance(f))
    if saturation > 0:
        f = rng.uniform(max(0, 1 - saturation), 1 + saturation)
        ops.append(lambda im, f=f: ImageEnhance.Color(im).enhance(f))
    if hue > 0:
        f = rng.uniform(-hue, hue)
        ops.append(lambda im, f=f: _hue_shift(im, f))
    order = rng.permutation(len(ops))
    for i in order:
        img = ops[i](img)
    return img


def mocov2_single(img: Image.Image, rng: np.random.Generator, size: int = 224) -> np.ndarray:
    img = img.convert("RGB")
    img = random_resized_crop(img, rng, size=size)
    if rng.random() < 0.8:
        img = color_jitter(img, rng)
    if rng.random() < 0.2:
        img = img.convert("L").convert("RGB")
    if rng.random() < 0.5:
        sigma = rng.uniform(0.1, 2.0)
        img = img.filter(ImageFilter.GaussianBlur(radius=sigma))
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    return _to_array(img)


def onecrop(img: Image.Image, rng: np.random.Generator | None = None,
            resize: int = 256, size: int = 224) -> np.ndarray:
    img = img.convert("RGB")
    w, h = img.size
    if w < h:
        nw, nh = resize, int(round(h * resize / w))
    else:
        nw, nh = int(round(w * resize / h)), resize
    img = img.resize((nw, nh), Image.BICUBIC)
    left, top = (nw - size) // 2, (nh - size) // 2
    img = img.crop((left, top, left + size, top + size))
    return _to_array(img)


_RECIPES = {
    "MOCOV2_single": mocov2_single,
    "MOCOV2": mocov2_single,
    "SIMCLR": mocov2_single,
    "SIMSIAM": mocov2_single,
    "ONECROP": onecrop,
}


def build_common_augmentation(name: str, image_size: int = None):
    """Name-compatible entry point (reference ``build_common_augmentation``).

    ``image_size`` overrides the recipes' 224 output (the reference is
    hard-coded to 224; models at other resolutions need matching crops —
    the solver threads ``vision_cfg.input_resolution`` through)."""
    if name not in _RECIPES:
        raise KeyError(f"unknown augmentation recipe {name!r}; known: {sorted(_RECIPES)}")
    fn = _RECIPES[name]
    if not image_size or image_size == 224:
        return fn
    import functools

    if fn is onecrop:
        # keep the reference's 256/224 resize-to-crop ratio
        return functools.partial(onecrop, resize=round(image_size * 256 / 224),
                                 size=image_size)
    return functools.partial(fn, size=image_size)
