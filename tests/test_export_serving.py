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


def test_serving_weight_cast_bitwise_exact():
    """weight_dtype='bfloat16' pre-casts matmul weights once (halved weight
    HBM reads for serving); outputs are BITWISE equal for bf16-compute
    models — the cast params are exactly those the towers already consume
    via .astype/promote_dtype."""
    import numpy as np

    from iterated_learning_for_vlm_tpu.eval.encode import (
        JitEncoder, serving_cast_params,
    )
    from iterated_learning_for_vlm_tpu.models import (
        CLIP, CLIPFDT, FDTConfig, TextConfig, VisionConfig,
    )

    V = VisionConfig(input_resolution=32, patch_size=16, width=64, layers=2,
                     heads=2, embed_dim=32)
    T = TextConfig(context_length=77, width=64, heads=2, layers=2, embed_dim=32)
    F = FDTConfig(sd_num=64, sd_dim=32, raw_img_ft_dim=64, raw_txt_ft_dim=64,
                  sparsemax_method="bisect")

    for model, is_fdt in (
        (CLIP(vision_cfg=V, text_cfg=T, dtype=jnp.bfloat16), False),
        (CLIPFDT(vision_cfg=V, text_cfg=T, fdt_cfg=F, dtype=jnp.bfloat16), True),
    ):
        img = jnp.zeros((1, 32, 32, 3), jnp.float32)
        tok = jnp.zeros((1, 77), jnp.int32)
        pad = jnp.zeros((1, 77), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), img, tok, pad)["params"]
        base = JitEncoder(model, params, is_fdt=is_fdt, batch_size=4)
        cast = JitEncoder(model, params, is_fdt=is_fdt, batch_size=4,
                          weight_dtype="bfloat16")
        rng = np.random.default_rng(0)
        imgs = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
        texts = ["a dog", "a photo of a cat", "words " * 20]
        np.testing.assert_array_equal(base.encode_images(imgs),
                                      cast.encode_images(imgs))
        np.testing.assert_array_equal(base.encode_texts(texts),
                                      cast.encode_texts(texts))

    # fp32-consumed params stayed fp32
    cp = serving_cast_params(params)
    flat = {"/".join(str(getattr(k, "key", k)) for k in p): v
            for p, v in jax.tree_util.tree_flatten_with_path(cp)[0]}
    assert all(v.dtype == jnp.float32 for k, v in flat.items()
               if "ln_" in k.lower() or "space_dict" in k.lower())
    assert any(v.dtype == jnp.bfloat16 for v in flat.values())
