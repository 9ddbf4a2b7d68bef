"""StableHLO serving export: serialize -> deserialize -> run == eager.

The TPU-native replacement for the reference's Caffe/NNIE deployment
converters (prototype/tools/caffe_converter.py; PARITY §2.9)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterated_learning_for_vlm_tpu.models import (
    CLIP, CLIPFDT, FDTConfig, TextConfig, VisionConfig,
)
from iterated_learning_for_vlm_tpu.tools.export_serving import (
    build_encode_fns, export_encoders, load_serialized, write_artifacts,
)

V = VisionConfig(input_resolution=32, patch_size=16, width=64, layers=2,
                 heads=2, embed_dim=32)
T = TextConfig(context_length=16, width=64, heads=2, layers=2, embed_dim=32)


def _init(model, img, tok, pad):
    return model.init(jax.random.PRNGKey(0), img[:2], tok[:2], pad[:2])["params"]


def _batch(bs, ctx=16, res=32, seed=0):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.standard_normal((bs, res, res, 3), dtype=np.float32))
    tok = jnp.asarray(rng.integers(1, 49407, (bs, ctx)), jnp.int32)
    pad = jnp.zeros((bs, ctx), jnp.float32)
    return img, tok, pad


@pytest.mark.parametrize("kind", ["clip", "fdt"])
def test_export_roundtrip_matches_eager(tmp_path, kind):
    img, tok, pad = _batch(4)
    if kind == "clip":
        model = CLIP(vision_cfg=V, text_cfg=T)
    else:
        f = FDTConfig(sd_num=64, sd_dim=32, raw_img_ft_dim=64, raw_txt_ft_dim=64,
                      sparsemax_method="bisect")
        model = CLIPFDT(vision_cfg=V, text_cfg=T, fdt_cfg=f)
    params = _init(model, img, tok, pad)

    blobs = export_encoders(model, params, image_size=32, context_length=16,
                            batch=4)
    paths = write_artifacts(blobs, str(tmp_path))

    image_fn, text_fn = build_encode_fns(model, params)
    want_img = np.asarray(image_fn(params, img), np.float32)
    want_txt = np.asarray(text_fn(params, tok, pad), np.float32)

    got_img = np.asarray(load_serialized(paths["encode_image"])(params, img),
                         np.float32)
    got_txt = np.asarray(load_serialized(paths["encode_text"])(params, tok, pad),
                         np.float32)
    np.testing.assert_allclose(got_img, want_img, atol=1e-5)
    np.testing.assert_allclose(got_txt, want_txt, atol=1e-5)


def test_export_symbolic_batch_serves_any_size(tmp_path):
    model = CLIP(vision_cfg=V, text_cfg=T)
    img, tok, pad = _batch(4)
    params = _init(model, img, tok, pad)
    blobs = export_encoders(model, params, image_size=32, context_length=16,
                            batch="symbolic")
    paths = write_artifacts(blobs, str(tmp_path))
    call = load_serialized(paths["encode_image"])
    for bs in (1, 3, 8):
        imgs = _batch(bs)[0]
        out = np.asarray(call(params, imgs), np.float32)
        assert out.shape == (bs, 32)
        # embeddings are L2-normalized on the serving path
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-3)
