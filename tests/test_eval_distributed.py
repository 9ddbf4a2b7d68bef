"""Data-parallel evaluation (the reference's ``--distributed`` eval flag).

The reference splits the eval set over GPU ranks (``cli.py --distributed``
via ``world_info_from_env``); the TPU-native form shards the fixed-shape
encode batch over a 1-axis device mesh and lets pjit partition the towers
(``eval/encode.py:JitEncoder(data_parallel=True)``).  These tests pin, on
the 8-device virtual CPU mesh, that the sharded encoder produces the same
embeddings as the single-device path — so every downstream metric is
unchanged by the flag.
"""
import jax
import jax.numpy as jnp
import numpy as np

from iterated_learning_for_vlm_tpu.eval.encode import JitEncoder
from iterated_learning_for_vlm_tpu.models import (
    CLIP, CLIPFDT, FDTConfig, TextConfig, VisionConfig,
)

V = VisionConfig(input_resolution=32, patch_size=16, width=64, layers=2,
                 heads=2, embed_dim=32)
T = TextConfig(context_length=77, width=64, heads=2, layers=2, embed_dim=32)
F = FDTConfig(sd_num=64, sd_dim=32, raw_img_ft_dim=64, raw_txt_ft_dim=64,
              sparsemax_method="bisect")

TEXTS = ["a cat", "a photo of a dog", "short", "a very slightly longer test caption"]


def _init(model):
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    tok = jnp.zeros((1, 77), jnp.int32)
    pad = jnp.zeros((1, 77), jnp.float32)
    return model.init(jax.random.PRNGKey(0), img, tok, pad)["params"]


def _images(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 32, 32, 3)).astype(np.float32)


def test_distributed_encoder_matches_single_device():
    model = CLIP(vision_cfg=V, text_cfg=T)
    params = _init(model)
    single = JitEncoder(model, params, is_fdt=False, batch_size=8)
    dist = JitEncoder(model, params, is_fdt=False, batch_size=8,
                      data_parallel=True)
    assert dist.mesh is not None and dist._batch_sharding is not None
    # 5 images: exercises the pad-to-batch path on the sharded encoder too
    imgs = _images(5)
    np.testing.assert_allclose(dist.encode_images(imgs),
                               single.encode_images(imgs),
                               rtol=1e-5, atol=5e-6)
    np.testing.assert_allclose(dist.encode_texts(TEXTS),
                               single.encode_texts(TEXTS),
                               rtol=1e-5, atol=5e-6)


def test_distributed_encoder_rounds_batch_to_devices():
    model = CLIP(vision_cfg=V, text_cfg=T)
    params = _init(model)
    ndev = jax.device_count()
    enc = JitEncoder(model, params, is_fdt=False, batch_size=5,
                     data_parallel=True)
    assert enc.batch_size % ndev == 0 and enc.batch_size >= 5
    # still correct at the rounded batch
    imgs = _images(3, seed=1)
    ref = JitEncoder(model, params, is_fdt=False, batch_size=4)
    np.testing.assert_allclose(enc.encode_images(imgs),
                               ref.encode_images(imgs), rtol=1e-5, atol=5e-6)


def test_model_parallel_mesh_rounds_to_data_axis_only():
    """On a dp×mp mesh the encode batch only needs to divide the DATA axis:
    rounding by total device count would pad every chunk 4× wider than the
    sharding requires."""
    from iterated_learning_for_vlm_tpu.parallel.mesh import DATA_AXIS, create_mesh

    model = CLIP(vision_cfg=V, text_cfg=T)
    params = _init(model)
    mesh = create_mesh(model_parallel=4)  # 8 devices -> data axis = 2
    enc = JitEncoder(model, params, is_fdt=False, batch_size=5, mesh=mesh)
    ndata = int(mesh.shape[DATA_AXIS])
    assert ndata == 2 and enc.batch_size == 6  # not 8 (total devices)
    imgs = _images(3, seed=3)
    ref = JitEncoder(model, params, is_fdt=False, batch_size=4)
    np.testing.assert_allclose(enc.encode_images(imgs),
                               ref.encode_images(imgs), rtol=1e-5, atol=5e-6)


def test_distributed_fdt_encoder_matches_single_device():
    """FDT path: codebook extract features under the sharded encode."""
    model = CLIPFDT(vision_cfg=V, text_cfg=T, fdt_cfg=F)
    params = _init(model)
    single = JitEncoder(model, params, is_fdt=True, batch_size=8)
    dist = JitEncoder(model, params, is_fdt=True, batch_size=8,
                      data_parallel=True)
    imgs = _images(4, seed=2)
    np.testing.assert_allclose(dist.encode_images(imgs),
                               single.encode_images(imgs),
                               rtol=1e-5, atol=5e-6)
    np.testing.assert_allclose(dist.encode_texts(TEXTS),
                               single.encode_texts(TEXTS),
                               rtol=1e-5, atol=5e-6)


def test_cli_distributed_flag_reaches_loader(monkeypatch, tmp_path):
    """--distributed plumbs through _load_encoder -> load_eval_encoder."""
    from iterated_learning_for_vlm_tpu.eval import cli as eval_cli

    seen = {}

    def fake_loader(*a, **kw):
        seen.update(kw)
        raise RuntimeError("stop")

    monkeypatch.setattr(
        "iterated_learning_for_vlm_tpu.eval.model_loader.load_eval_encoder",
        fake_loader)
    p = eval_cli.build_parser()
    args = p.parse_args(["eval", "--model_config", "x.yaml", "--dataset",
                         "dummy", "--distributed"])
    try:
        eval_cli._load_encoder(args)
    except RuntimeError:
        pass
    assert seen.get("data_parallel") is True
