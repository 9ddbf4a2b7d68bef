"""Swin + ModifiedResNet tower smoke tests (tiny configs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iterated_learning_for_vlm_tpu.models.resnet import ModifiedResNet, ResNetConfig
from iterated_learning_for_vlm_tpu.models.swin import SwinConfig, SwinTransformer


def test_swin_v2_tiny_forward():
    cfg = SwinConfig(input_resolution=32, patch_size=4, window_size=4, embed_dim=16,
                     depths=(1, 1), num_heads=(2, 4), v2=True, output_dim=24)
    model = SwinTransformer(cfg)
    imgs = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    # 32/4 = 8 -> stage1 merge -> 4x4 = 16 tokens, dim 32
    assert out["embed"].shape == (2, 24)
    assert out["patches"].shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out["embed"])).all()


def test_swin_v1_tiny_forward_shifted():
    cfg = SwinConfig(input_resolution=32, patch_size=4, window_size=4, embed_dim=16,
                     depths=(2,), num_heads=(2,), v2=False, output_dim=24)
    model = SwinTransformer(cfg)
    imgs = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    assert out["embed"].shape == (2, 24)
    assert np.isfinite(np.asarray(out["embed"])).all()


def test_resnet_tiny_forward():
    cfg = ResNetConfig(layers=(1, 1), width=16, input_resolution=32, embed_dim=24,
                       heads=4)
    model = ModifiedResNet(cfg)
    imgs = jnp.asarray(np.random.RandomState(2).randn(2, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(variables, imgs)
    assert out["embed"].shape == (2, 24)
    assert np.isfinite(np.asarray(out["embed"])).all()
    assert "batch_stats" in variables
