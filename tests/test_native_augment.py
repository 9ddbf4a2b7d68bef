"""Native fused-augment kernel vs the PIL path.

The C kernel (``data/native/fused_augment.c``) must track the PIL execution
of the same :class:`AugmentPlan` — PIL implements the reference recipe
(``prototype/data/imagenet_dataloader.py:59-68`` MOCOV2_single, :100-106
ONECROP), so PIL-parity is reference-parity.  Ops with exact arithmetic
(gray, HSV roundtrip, ImageEnhance blends) are pinned bit-exact; resampling
ops (bicubic resize, blur) are pinned to small tolerances (float vs PIL
fixed-point; single final quantization vs per-pass rounding).
"""
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageFilter

from iterated_learning_for_vlm_tpu.data import augment, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native augment did not build")


def _rand_img(rng, h=137, w=211):
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


def test_gray_bit_exact():
    rng = np.random.default_rng(0)
    arr = _rand_img(rng)
    flat = np.ascontiguousarray(arr.reshape(-1, 3))
    out = np.empty(len(flat), dtype=np.uint8)
    native.get_lib().fused_gray(flat, out, len(flat))
    ref = np.asarray(Image.fromarray(arr).convert("L")).reshape(-1)
    np.testing.assert_array_equal(out, ref)


def test_hsv_roundtrip_bit_exact():
    # random 1M subset of the 16.7M cube (the full cube passes; too slow here)
    rng = np.random.default_rng(1)
    flat = rng.integers(0, 256, (1_000_000, 3)).astype(np.uint8)
    side = 1000
    img = flat.reshape(side, side, 3)
    lib = native.get_lib()
    ours = np.empty_like(flat)
    lib.fused_rgb2hsv(np.ascontiguousarray(flat), ours, len(flat))
    ref = np.asarray(Image.fromarray(img).convert("HSV")).reshape(-1, 3)
    np.testing.assert_array_equal(ours, ref)
    back = np.empty_like(flat)
    lib.fused_hsv2rgb(np.ascontiguousarray(flat), back, len(flat))
    ref2 = np.asarray(Image.fromarray(img, mode="HSV").convert("RGB")).reshape(-1, 3)
    np.testing.assert_array_equal(back, ref2)


@pytest.mark.parametrize("op,factor", [
    (augment.OP_BRIGHTNESS, 0.63), (augment.OP_BRIGHTNESS, 1.38),
    (augment.OP_CONTRAST, 0.61), (augment.OP_CONTRAST, 1.4),
    (augment.OP_SATURATION, 0.6), (augment.OP_SATURATION, 1.39),
    (augment.OP_HUE, 0.1), (augment.OP_HUE, -0.097),
])
def test_jitter_op_bit_exact(op, factor):
    rng = np.random.default_rng(2)
    arr = _rand_img(rng, 64, 64)
    plan = augment.AugmentPlan((0, 0, 64, 64), [(op, factor)], False, -1.0, False)
    a = augment._mocov2_pil(Image.fromarray(arr), plan, 64)
    b = augment._mocov2_native(arr, plan, 64)
    # identity resize (box == full image at same size) keeps resampling out
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_resize_box_close_to_pil():
    rng = np.random.default_rng(3)
    arr = _rand_img(rng, 300, 400)
    pil = Image.fromarray(arr)
    for seed in range(8):
        r = np.random.default_rng(seed)
        x, y, cw, ch = augment.rrc_box(400, 300, r)
        ref = np.asarray(pil.resize((224, 224), Image.BICUBIC,
                                    box=(x, y, x + cw, y + ch)), dtype=np.int16)
        ours = native.resize_box(arr, (x, y, cw, ch), 224, 224).astype(np.int16)
        assert np.abs(ref - ours).max() <= 2  # float vs PIL fixed-point taps


def test_blur_close_to_pil():
    rng = np.random.default_rng(4)
    arr = _rand_img(rng, 224, 224)
    for sigma in (0.1, 0.7, 1.3, 2.0):
        plan = augment.AugmentPlan((0, 0, 224, 224), [], False, sigma, False)
        a = augment._mocov2_pil(Image.fromarray(arr), plan, 224)
        b = augment._mocov2_native(arr, plan, 224)
        d = np.abs(a - b) / np.abs(augment._NORM_SCALE)
        # same extended-box cascade; PIL quantizes to uint8 per pass (at
        # sigma ~0.1 its blur rounds back to a near no-op), we quantize once
        assert d.max() <= 3.5, (sigma, d.max())
        assert d.mean() <= 1.2, (sigma, d.mean())


def test_mocov2_cross_path():
    rng = np.random.default_rng(5)
    arr = _rand_img(rng, 311, 467)
    pil = Image.fromarray(arr)
    worst_max, means = 0.0, []
    for seed in range(30):
        a = augment.mocov2_single(pil, np.random.default_rng(seed), native=False)
        b = augment.mocov2_single(arr, np.random.default_rng(seed), native=True)
        assert a.shape == b.shape == (224, 224, 3)
        d = np.abs(a - b) / np.abs(augment._NORM_SCALE)
        worst_max = max(worst_max, float(d.max()))
        means.append(float(d.mean()))
    assert worst_max <= 8.0  # blur-at-small-sigma divergence dominates
    assert np.mean(means) <= 0.5


def test_onecrop_cross_path():
    rng = np.random.default_rng(6)
    for h, w in ((300, 400), (500, 260), (256, 256)):
        arr = _rand_img(rng, h, w)
        a = augment.onecrop(Image.fromarray(arr), np.random.default_rng(0), native=False)
        b = augment.onecrop(arr, np.random.default_rng(0), native=True)
        d = np.abs(a - b) / np.abs(augment._NORM_SCALE)
        assert d.max() <= 2.0, (h, w, float(d.max()))


def test_plan_stream_is_shared():
    # both executions must draw the identical rng stream: a plan drawn with
    # the same seed is identical, so downstream gates/sigma/flip all agree
    p1 = augment.mocov2_plan(467, 311, np.random.default_rng(7))
    p2 = augment.mocov2_plan(467, 311, np.random.default_rng(7))
    assert p1 == p2


def test_env_gate_forces_pil(monkeypatch):
    monkeypatch.setenv("ILVLM_NATIVE_AUGMENT", "0")
    assert not native.available()
    monkeypatch.delenv("ILVLM_NATIVE_AUGMENT")
    assert native.available()
